"""HTML/markup → text extraction + unicode normalization — the rung
every real web-corpus pipeline hits BEFORE q39's cleaning stages (the
reference stores already-processed JSON assets and has no markup
handling; this module is part of the builder's LLM-pipeline surface,
r12 verdict item #2).

The extraction is a DETERMINISTIC, engine-replayable spec — every
stage is a string/regex/array expression that exists in both Spark
and DuckDB, built from the SAME frozen pattern constants so the
graded oracle cannot drift from the operator:

1. control-char strip + raw-whitespace flattening (``PAT_CTRL`` /
   ``PAT_RAWWS`` — raw newlines are HTML whitespace, not line
   structure; line structure comes from block tags in stage 3);
2. comment / ``<script>`` / ``<style>`` block removal (lazy-dot
   patterns, case-insensitive);
3. anchor marking (``<a>``/``</a>`` → sentinel chars, so stage 5 can
   measure per-line link density AFTER the generic tag strip), block
   tags → newline, every remaining tag → space;
4. entity decoding: the FROZEN named set (``ENTITIES``), then
   numeric character references (``PAT_NUMENT`` — decimal and hex,
   decode window 32..0xFFFF minus DEL and the surrogate block;
   out-of-window references survive literally), then ``&amp;`` last
   so double-encoded text of either kind decodes one level (the
   standard order);
5. line-based boilerplate rules (the Gopher-family heuristics q59's
   stats feed): per line, collapse whitespace, drop empty lines
   silently, drop lines with fewer than ``MIN_LINE_WORDS`` words
   (nav crumbs, copyright tails), drop lines whose anchor-text
   characters exceed half the line (link farms / nav bars —
   ``lc * 2 > tot``, integer arithmetic so the rule is bit-exact on
   any engine);
6. optional NFC normalization — Spark has no unicode-normalize
   builtin, so this one stage is an Arrow-batched pandas UDF
   (ASCII fast path skips the normalize call; the oracle mirror is
   DuckDB's ``nfc_normalize``).

100 TB posture: stages 1-5 are a single narrow projection — no
shuffle, no UDF, whole-stage-codegen string ops; the plan test pins
zero exchanges. Stage 6 is one Arrow batch pass when enabled.

Graded: q127 (extraction report over HTML synthesized deterministically
from the documents table — id-derived boilerplate + the real text, so
the oracle replays byte-for-byte) and q128 (q39's clean-corpus
pipeline composed over raw-HTML input). Golden fixture test:
tests/test_markup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

MIN_LINE_WORDS = 3  # Gopher-style short-line rule
SOL = "\x01"  # anchor-open sentinel (survives the generic tag strip)
EOL = "\x02"  # anchor-close sentinel

# Frozen patterns — used VERBATIM by both the Spark expressions and
# the SQL oracle (raw strings: the \x.. escapes are interpreted by
# the regex engines themselves, identically in Java regex and RE2).
PAT_CTRL = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
PAT_RAWWS = r"[\r\n\t]"
PAT_COMMENT = r"(?s)<!--.*?-->"
PAT_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
PAT_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
PAT_A_OPEN = r"(?i)<a\b[^>]*>"
PAT_A_CLOSE = r"(?i)</a\s*>"
PAT_BLOCK = (
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|pre"
    r"|section|article|header|footer|nav|aside|title|head|body|html"
    r"|form|figure|figcaption|dl|dt|dd)\b[^>]*>"
)
PAT_TAG = r"<[^>]*>"
# whitespace collapse covers the UNICODE space family too (literal
# characters in the class, so Java regex and RE2 read it identically;
# \s alone is ASCII in both engines): NBSP and friends arrive both as
# decoded &nbsp; and as raw bytes in real web text, and a kept line
# must never carry edge whitespace Python's strip() would remove but
# ASCII trim() would not (property-tested)
PAT_WSPLUS = (
    "[\\s\u0085\u00a0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+"
)

# (encoded, decoded) in DECODE ORDER — &amp; last (see module doc).
# The numeric-reference stage (PAT_NUMENT below) runs BETWEEN the
# named non-&amp; replaces and the final &amp; replace, so
# double-encoded numeric text (&amp;#34;) decodes exactly one level,
# matching the named-entity convention. The former explicit &#34; /
# &#39; table entries are subsumed by the generic stage (same
# characters, same position in the order).
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# numeric character references: decimal (cap 7 digits) and hex (cap 6
# — both caps make the parsed value exact in any engine's integer and
# keep 8+-digit pseudo-references literal, since no ';' follows the
# 7th digit match position). Decode rule (deterministic, mirrored in
# SQL): code points 32..0xFFFF excluding DEL (127) and the surrogate
# block (0xD800-0xDFFF) decode to the character; everything else —
# C0 controls (stage 1 already stripped their raw bytes; decoding
# would reintroduce what the spec removed), astral planes, surrogates
# — survives literally (the string rung's quarantine). Replacement
# runs over the LEXICALLY SORTED distinct references present (both
# engines sort the same — pure-ASCII keys, binary collation), so the
# one re-decode edge (&#38; sorting before a reference it
# synthesizes) is deterministic and engine-identical. A related spec
# quirk, also deterministic on both engines: text synthesized BY the
# numeric stage is still visible to the later &amp; replace
# ("&#38;amp;" decodes to "&amp;" and then to "&" — one step deeper
# than a browser, which stops after the numeric decode). Real pages
# double-encode with &amp;# (handled exactly: stays literal one
# level), not &#38;amp;, so the quirk is accepted rather than
# special-cased.
PAT_NUMENT = r"&#(?:[0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"

# (pattern, spark replacement, sql replacement expr) for stages 1-3,
# in order — ONE table driving both engines
_REGEX_STAGES = (
    (PAT_CTRL, "", "''"),
    (PAT_RAWWS, " ", "' '"),
    (PAT_COMMENT, " ", "' '"),
    (PAT_SCRIPT, " ", "' '"),
    (PAT_STYLE, " ", "' '"),
    (PAT_A_OPEN, SOL, "chr(1)"),
    (PAT_A_CLOSE, EOL, "chr(2)"),
    (PAT_BLOCK, "\n", "chr(10)"),
    (PAT_TAG, " ", "' '"),
)


def _nument_cp(e) -> "F.Column":
    """Parsed code point (long) of a PAT_NUMENT match column."""
    body = e.substr(F.lit(3), F.length(e) - 3)  # strip '&#' and ';'
    is_hex = F.lower(body.substr(F.lit(1), F.lit(1))) == "x"
    return F.when(
        is_hex,
        F.conv(body.substr(F.lit(2), F.length(body) - 1), 16, 10).cast(
            "long"
        ),
    ).otherwise(body.cast("long"))


def _nument_decoded(e) -> "F.Column":
    """The replacement text for one numeric reference: the decoded
    character when the code point is in the allowed window, the
    reference itself otherwise. The character is built as explicit
    UTF-8 bytes (1-3 per the code-point range) because Spark's chr()
    is byte-valued; the invalid branch feeds a safe constant into the
    byte construction so neither engine ever materializes a surrogate
    (DuckDB's chr errors on them even under a CASE in vectorized
    eval — same clamp on both sides)."""
    cp = _nument_cp(e)
    valid = (
        (cp >= 32)
        & (cp <= 0xFFFF)
        & (cp != 127)
        & ~((cp >= 0xD800) & (cp <= 0xDFFF))
    )
    safe = F.when(valid, cp).otherwise(F.lit(32).cast("long"))
    hexs = (
        F.when(safe <= 0x7F, F.format_string("%02X", safe))
        .when(
            safe <= 0x7FF,
            F.format_string(
                "%02X%02X",
                F.lit(192) + F.floor(safe / 64),
                F.lit(128) + safe % 64,
            ),
        )
        .otherwise(
            F.format_string(
                "%02X%02X%02X",
                F.lit(224) + F.floor(safe / 4096),
                F.lit(128) + F.floor(safe / 64) % 64,
                F.lit(128) + safe % 64,
            )
        )
    )
    return F.when(valid, F.decode(F.unhex(hexs), "UTF-8")).otherwise(e)


def decode_numeric_entities_col(c) -> "F.Column":
    """Replace every decodable numeric reference in ``c`` (see
    PAT_NUMENT's decode rule). Single-reference discipline: ``c`` is
    bound ONCE through a one-element transform, because it is a deep
    expression by the time stage 4 runs (the stage 1-3 regex chain)
    and this stage needs it twice (extract + fold)."""
    return F.element_at(
        F.transform(
            F.array(c),
            lambda y: F.aggregate(
                F.array_sort(
                    F.array_distinct(
                        F.regexp_extract_all(y, F.lit(PAT_NUMENT), 0)
                    )
                ),
                y,
                lambda acc, e: F.replace(acc, e, _nument_decoded(e)),
            ),
        ),
        1,
    )


_NUMENT_CP_SQL = (
    "CASE WHEN lower(substr(__e, 3, 1)) = 'x' "
    "THEN CAST('0x' || substr(__e, 4, len(__e) - 4) AS BIGINT) "
    "ELSE CAST(substr(__e, 3, len(__e) - 3) AS BIGINT) END"
)

_NUMENT_VALID_SQL = (
    f"({_NUMENT_CP_SQL}) BETWEEN 32 AND 65535 "
    f"AND ({_NUMENT_CP_SQL}) <> 127 "
    f"AND ({_NUMENT_CP_SQL}) NOT BETWEEN 55296 AND 57343"
)

# chr() gets the clamped value so the invalid branch never
# materializes a surrogate under vectorized CASE evaluation
_NUMENT_DECODED_SQL = (
    f"CASE WHEN {_NUMENT_VALID_SQL} THEN chr(CAST("
    f"CASE WHEN {_NUMENT_VALID_SQL} THEN ({_NUMENT_CP_SQL}) "
    "ELSE 32 END AS INT)) ELSE __e END"
)


def _decode_numeric_entities_sql(expr: str) -> str:
    """SQL mirror of :func:`decode_numeric_entities_col` — the same
    one-element-list binding so ``expr`` appears exactly once (the
    oracle fixtures pass prepared-statement placeholders through)."""
    return (
        f"list_transform([{expr}], __y -> list_reduce("
        f"list_prepend(__y, list_sort(list_distinct("
        f"regexp_extract_all(__y, '{PAT_NUMENT}')))), "
        f"(__acc, __e) -> replace(__acc, __e, "
        f"{_NUMENT_DECODED_SQL})))[1]"
    )


def tagged_text_col(c) -> "F.Column":
    """Stages 1-4: the sentinel-marked, entity-decoded text with
    newline line structure — input to the line heuristics. Stage 4's
    order: named non-&amp; entities, numeric references, &amp; last
    (so double-encoded text of either kind decodes one level)."""
    x = c
    for pat, rep, _sql in _REGEX_STAGES:
        x = F.regexp_replace(x, pat, rep)
    for enc, dec in ENTITIES[:-1]:
        x = F.replace(x, F.lit(enc), F.lit(dec))
    x = decode_numeric_entities_col(x)
    enc, dec = ENTITIES[-1]
    return F.replace(x, F.lit(enc), F.lit(dec))


def _tagged_sql(expr: str) -> str:
    for pat, _rep, sql_rep in _REGEX_STAGES:
        expr = f"regexp_replace({expr}, '{pat}', {sql_rep}, 'g')"
    for enc, dec in ENTITIES[:-1]:
        d = dec.replace("'", "''")
        expr = f"replace({expr}, '{enc}', '{d}')"
    expr = _decode_numeric_entities_sql(expr)
    enc, dec = ENTITIES[-1]
    return f"replace({expr}, '{enc}', '{dec.replace(chr(39), chr(39) * 2)}')"


def line_structs_col(c) -> "F.Column":
    """Stage 5's measurement pass: array of per-line structs
    (clean, words, lc, tot) — ``clean`` is the whitespace-collapsed
    sentinel-free line, ``words`` its word count, ``lc`` the raw
    anchor-text character count (sum over sentinel-delimited
    fragments), ``tot`` the raw sentinel-free character count. The
    keep rule reads: ``words >= MIN_LINE_WORDS AND lc*2 <= tot``."""

    def per_line(line):
        stripped = F.replace(
            F.replace(line, F.lit(SOL), F.lit("")),
            F.lit(EOL),
            F.lit(""),
        )
        clean = F.trim(F.regexp_replace(stripped, PAT_WSPLUS, " "))
        words = F.size(
            F.filter(F.split(clean, " ", -1), lambda w: w != "")
        )
        frags = F.split(line, SOL, -1)
        lc = F.coalesce(
            F.aggregate(
                F.slice(frags, 2, F.size(frags)),
                F.lit(0),
                lambda acc, fr: acc
                + F.length(F.split(fr, EOL, -1).getItem(0)),
            ),
            F.lit(0),
        )
        return F.struct(
            clean.alias("clean"),
            words.alias("words"),
            lc.alias("lc"),
            F.length(stripped).alias("tot"),
        )

    return F.transform(
        F.split(tagged_text_col(c), "\n", -1), per_line
    )


_LINE_STRUCTS_SQL = (
    "list_transform(string_split({tagged}, chr(10)), l -> {{"
    "'clean': trim(regexp_replace("
    "replace(replace(l, chr(1), ''), chr(2), ''), "
    "'" + PAT_WSPLUS + "', ' ', 'g')), "
    "'words': len(list_filter(string_split(trim(regexp_replace("
    "replace(replace(l, chr(1), ''), chr(2), ''), "
    "'" + PAT_WSPLUS + "', ' ', 'g')), "
    "' '), w -> w != '')), "
    "'lc': coalesce(list_sum(list_transform("
    "string_split(l, chr(1))[2:], "
    "f -> len(string_split(f, chr(2))[1]))), 0), "
    "'tot': len(replace(replace(l, chr(1), ''), chr(2), ''))}})"
)


def html_extract(
    docs: DataFrame,
    html_col: str = "html",
    id_cols: tuple = ("doc_id",),
    nfc: bool = False,
) -> DataFrame:
    """One row per input doc: ``clean_text`` (kept lines joined by
    newline; '' when nothing survives) plus the per-doc line ledger
    (n_lines_kept / n_lines_dropped_short / n_lines_dropped_link —
    empty lines are block-tag artifacts and are discarded silently,
    uncounted; a line failing BOTH rules counts as short). Map-only:
    one narrow projection, no shuffle (plan-tested)."""
    with_lines = docs.withColumn("_ls", line_structs_col(F.col(html_col)))
    kept = F.filter(
        "_ls",
        lambda s: (s["words"] >= MIN_LINE_WORDS)
        & (s["lc"] * 2 <= s["tot"]),
    )
    text = F.array_join(F.transform(kept, lambda s: s["clean"]), "\n")
    if nfc:
        text = nfc_normalize_col(text)
    return with_lines.select(
        *id_cols,
        text.alias("clean_text"),
        F.size(kept).alias("n_lines_kept"),
        F.size(
            F.filter(
                "_ls",
                lambda s: (s["clean"] != "")
                & (s["words"] < MIN_LINE_WORDS),
            )
        ).alias("n_lines_dropped_short"),
        F.size(
            F.filter(
                "_ls",
                lambda s: (s["words"] >= MIN_LINE_WORDS)
                & (s["lc"] * 2 > s["tot"]),
            )
        ).alias("n_lines_dropped_link"),
    )


def html_to_text_col(c, nfc: bool = False) -> "F.Column":
    """The whole extraction as ONE column expression (kept lines,
    newline-joined) — the composition hook: any text operator accepts
    raw HTML by wrapping its text column in this (q128 runs q39's
    cleaning pipeline over it)."""
    kept = F.filter(
        line_structs_col(c),
        lambda s: (s["words"] >= MIN_LINE_WORDS)
        & (s["lc"] * 2 <= s["tot"]),
    )
    text = F.array_join(F.transform(kept, lambda s: s["clean"]), "\n")
    return nfc_normalize_col(text) if nfc else text


def _extract_sql_ctes(html_expr: str, source: str) -> str:
    """The stage-mirrored CTE chain shared by the q127 and q128
    oracles: ``h`` (synthesized html) → ``ls`` (line structs) →
    ``agg`` (clean_text + ledger). ``html_expr`` is a SQL expression
    over ``source``'s columns."""
    tagged = _tagged_sql("html")
    ls = _LINE_STRUCTS_SQL.format(tagged="tagged")
    keep = f"s -> s.words >= {MIN_LINE_WORDS} AND s.lc*2 <= s.tot"
    return f"""h AS (
  SELECT doc_id, lang, {html_expr} AS html
  FROM {source} WHERE text IS NOT NULL
), t AS (
  SELECT doc_id, lang, {tagged} AS tagged FROM h
), l AS (
  SELECT doc_id, lang, {ls} AS ls FROM t
), agg AS (
  SELECT doc_id, lang,
    coalesce(list_aggregate(list_transform(
      list_filter(ls, {keep}), s -> s.clean), 'string_agg', chr(10)),
      '') AS clean_text,
    len(list_filter(ls, {keep})) AS n_lines_kept,
    len(list_filter(ls, s -> s.clean != '' AND
        s.words < {MIN_LINE_WORDS})) AS n_lines_dropped_short,
    len(list_filter(ls, s -> s.words >= {MIN_LINE_WORDS} AND
        s.lc*2 > s.tot)) AS n_lines_dropped_link
  FROM l
)"""


def nfc_normalize_col(c) -> "F.Column":
    """Unicode NFC normalization — the one stage Spark's builtin
    surface cannot express, so it is an Arrow-batched pandas UDF
    (never row-at-a-time Python). ASCII fast path: already-normalized
    ASCII strings (the overwhelming share of any real corpus) skip
    the normalize call inside the batch. Oracle mirror: DuckDB
    ``nfc_normalize`` (both sides implement Unicode NFC; pinned by
    the golden fixture test on combining sequences)."""
    return _nfc_udf()(c)


_NFC = None


def _nfc_udf():
    global _NFC
    if _NFC is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _nfc(s):  # type: ignore[misc]
            import unicodedata

            return s.map(
                lambda x: x
                if x is None or x.isascii()
                else unicodedata.normalize("NFC", x)
            )

        _NFC = _nfc
    return _NFC


# --------------------------------------------------------------------------
# q127: extraction report over HTML synthesized DETERMINISTICALLY from
# the documents table — id/source-derived boilerplate (nav link farm,
# short crumbs, script/style/comment noise, frozen-set entities)
# wrapping the real text, so the whole pipeline is exercised and the
# oracle replays byte-for-byte. The fingerprint column pins the exact
# extracted text without shipping it through the artifact.

_HTML_PREFIX = (
    '<html><!-- generated: id=%d --><head><title>Doc page</title>'
    "<style>body { color: #fff; }</style>"
    '<script type="text/javascript">if (1 < 2) { nav("x"); }</script>'
    "</head>\n<body><ul><li><a href=\"/\">Home</a></li>"
    '<li><a href="/all">Read more about every other topic here</a>'
    " | </li></ul><h1>Corpus document from "
)
_HTML_MID = (
    "</h1><p>Tokens &lt;pad&gt; &amp; &quot;eos&quot; markers"
    "&nbsp;here</p><p>Numeric refs &#72;&#101;&#120; and &#x2713; "
    "stay&#160;close; literal leftovers &#9; &#55296; &#1114111; "
    "&amp;#34; end</p>\t<p>"
)
_HTML_SUFFIX = "</p><div>&copy; 2026</div></body></html>"


def synth_html_col() -> "F.Column":
    """documents row → deterministic HTML page (shared with the SQL
    twin below; the %d placeholder is the only id-varying byte run)."""
    pre = _HTML_PREFIX.split("%d")
    return F.concat(
        F.lit(pre[0]),
        F.col("doc_id").cast("string"),
        F.lit(pre[1]),
        F.col("source"),
        F.lit(_HTML_MID),
        F.col("text"),
        F.lit(_HTML_SUFFIX),
    )


def _synth_html_sql() -> str:
    pre = _HTML_PREFIX.split("%d")

    def q(s: str) -> str:
        # SQL string literal; the \n/\t bytes pass through verbatim
        return "'" + s.replace("'", "''") + "'"

    return (
        f"{q(pre[0])} || CAST(doc_id AS VARCHAR) || {q(pre[1])}"
        f" || source || {q(_HTML_MID)} || text || {q(_HTML_SUFFIX)}"
    )


def q127_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    out = html_extract(
        docs.withColumn("html", synth_html_col()), nfc=True
    )
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("text_fp"),
        F.length("clean_text").alias("n_chars"),
        "n_lines_kept",
        "n_lines_dropped_short",
        "n_lines_dropped_link",
    )


def _q127_sql() -> str:
    return f"""
WITH {_extract_sql_ctes(_synth_html_sql(), "documents")}
SELECT doc_id, md5(nfc_normalize(clean_text)) AS text_fp,
  len(nfc_normalize(clean_text)) AS n_chars,
  n_lines_kept, n_lines_dropped_short, n_lines_dropped_link
FROM agg
"""


# --------------------------------------------------------------------------
# q128: q39's clean-corpus pipeline COMPOSED over raw-HTML input —
# extract first, then exact-dedup + quality gate + per-language yield
# on the EXTRACTED text (token split on \s+ because extracted lines
# are newline-joined). The composition the verdict asked for: a user
# with raw pages runs this instead of q39.


def clean_html_corpus_report(
    docs: DataFrame, html_col: str = "html"
) -> DataFrame:
    from pyspark.sql import Window

    extracted = docs.select(
        "doc_id", "lang", F.col(html_col).alias("html")
    ).withColumn("clean_text", html_to_text_col(F.col("html")))
    deduped = (
        extracted.withColumn("fp", F.md5("clean_text"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    toks = F.filter(
        F.split("clean_text", PAT_WSPLUS, -1), lambda w: w != ""
    )
    scored = deduped.withColumn("n_tokens", F.size(toks)).withColumn(
        "stop_hits",
        F.size(
            F.filter(
                toks,
                lambda t: t.isin("the", "a", "of", "and"),
            )
        ),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= 20)
        & (
            F.col("stop_hits").cast("double") / F.col("n_tokens")
            < 0.5
        )
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("doc_id").alias("id_checksum"),
    )


def q128_html_clean_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    return clean_html_corpus_report(
        docs.withColumn("html", synth_html_col())
    )


def _q128_sql() -> str:
    return f"""
WITH {_extract_sql_ctes(_synth_html_sql(), "documents")},
deduped AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY md5(clean_text) ORDER BY doc_id) AS rn
  FROM agg
), scored AS (
  SELECT lang, doc_id,
    len(list_filter(regexp_split_to_array(clean_text,
        '{PAT_WSPLUS}'), w -> w != '')) AS n_tokens,
    len(list_filter(regexp_split_to_array(clean_text,
        '{PAT_WSPLUS}'), t -> t IN ('the', 'a', 'of', 'and'))) AS stop_hits
  FROM deduped WHERE rn = 1
)
SELECT lang, COUNT(*) AS n_docs_kept,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM scored
WHERE n_tokens >= 20 AND CAST(stop_hits AS DOUBLE) / n_tokens < 0.5
GROUP BY lang
"""


QUERIES = {
    "q127_html_extract": q127_html_extract,
    "q128_html_clean_report": q128_html_clean_report,
}

ORACLE = {
    "q127_html_extract": _q127_sql(),
    "q128_html_clean_report": _q128_sql(),
}
