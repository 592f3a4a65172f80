"""HTML → text extraction: golden fixture page, stage semantics,
NFC equivalence with the DuckDB oracle function, and the map-only
plan guarantee (r12 verdict item #2)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

FIXTURE = (
    "<html>\n"
    "<!-- multi\nline comment -->\n"
    "<head>\n"
    "  <title>Fixture Page</title>\n"
    '  <STYLE type="text/css">\n'
    "    p { margin: 0; }\n"
    "  </STYLE>\n"
    "  <script>\n"
    "    if (a < b && c > d) { alert('</div>'); }\n"
    "  </script>\n"
    "</head>\n"
    "<body>\n"
    '  <ul><li><a href="/">Home</a></li>\n'
    '      <li><a href="/products">All our products listed here</a> '
    "+</li></ul>\n"
    "  <h1>The quick brown fox</h1>\n"
    "  <p>It jumps over the lazy dog &amp; friends, "
    "who say &quot;hello&quot; &lt;quietly&gt;.</p>\n"
    "  <p>Short line</p>\n"
    "  <p>A sentence with an inline <a href=\"#\">link</a> stays "
    "because text dominates.</p>\n"
    "  <p>Café au lait tastes fine\x07\x1f today.</p>\n"
    "  <p>Greek &#945;&#x3B2; mix&#160;here; leftovers "
    "&#8; &#xD800; &#1114112; &amp;#60; kept.</p>\n"
    "  <div>&copy; 2026</div>\n"
    "</body>\n"
    "</html>"
)

# stage-by-stage expectation:
# - comment, style, script vanish (script despite '</div>' inside a
#   string literal: lazy match stops at the first '</script>')
# - "Fixture Page" (2 words) -> dropped short
# - "Home" -> dropped short (short rule wins over link rule)
# - "All our products listed here +" -> 6 words but 28/30 anchor
#   chars -> dropped link
# - headline + body sentences kept; entities decoded from the frozen
#   set; '&copy;' not in the set -> literal, but its line is short
# - control chars \x07\x1f stripped; combining e + U+0301 NFC-folds
#   to a single code point when nfc=True
# - numeric references: &#945;/&#x3B2; decode (α/β), &#160; decodes
#   to NBSP and collapses as whitespace; out-of-window references
#   (&#8; control, &#xD800; surrogate, &#1114112; astral) survive
#   literally; double-encoded &amp;#60; decodes ONE level to &#60;
EXPECTED_LINES = [
    "The quick brown fox",
    'It jumps over the lazy dog & friends, who say "hello" '
    "<quietly>.",
    "A sentence with an inline link stays because text dominates.",
    "Café au lait tastes fine today.",
    "Greek αβ mix here; leftovers &#8; &#xD800; &#1114112; &#60; "
    "kept.",
]


@pytest.fixture()
def fixture_df(spark):
    return spark.createDataFrame(
        [(1, FIXTURE)], "doc_id long, html string"
    )


def test_golden_fixture_extraction(spark, fixture_df):
    from aerovaldb_spark.operators.markup import html_extract

    row = html_extract(fixture_df, nfc=True).collect()[0]
    assert row["clean_text"] == "\n".join(EXPECTED_LINES)
    assert row["n_lines_kept"] == 5
    # "Fixture Page", "Home", "Short line", "© 2026"
    assert row["n_lines_dropped_short"] == 4
    assert row["n_lines_dropped_link"] == 1


def test_extraction_matches_duckdb_stage_mirror(spark, fixture_df):
    """The module's SQL CTE chain (the q127/q128 oracle body) over the
    same fixture page produces the identical extraction — the
    stage-mirroring contract, checked off the graded path too."""
    import duckdb

    from aerovaldb_spark.operators.markup import (
        _LINE_STRUCTS_SQL,
        MIN_LINE_WORDS,
        _tagged_sql,
        html_extract,
    )

    got = html_extract(fixture_df, nfc=True).collect()[0]
    con = duckdb.connect()
    keep = f"s -> s.words >= {MIN_LINE_WORDS} AND s.lc*2 <= s.tot"
    sql = f"""
WITH t AS (SELECT {_tagged_sql("?")} AS tagged),
l AS (SELECT {_LINE_STRUCTS_SQL.format(tagged="tagged")} AS ls FROM t)
SELECT coalesce(list_aggregate(list_transform(
  list_filter(ls, {keep}), s -> s.clean), 'string_agg', chr(10)), '')
FROM l
"""
    want = con.execute(sql, [FIXTURE]).fetchone()[0]
    import unicodedata

    assert got["clean_text"] == unicodedata.normalize("NFC", want)
    # and the two engines' NFC agree on the combining sequence
    assert (
        con.execute(
            "SELECT nfc_normalize(?)", ["Café"]
        ).fetchone()[0]
        == unicodedata.normalize("NFC", "Café")
        == "Café"
    )


def test_nfc_ascii_fast_path_and_nulls(spark):
    from aerovaldb_spark.operators.markup import nfc_normalize_col

    df = spark.createDataFrame(
        [("plain ascii",), ("Café",), (None,)], "s string"
    )
    got = [
        r["n"]
        for r in df.select(
            nfc_normalize_col(F.col("s")).alias("n")
        ).collect()
    ]
    assert got == ["plain ascii", "Café", None]


def test_html_extract_plan_is_map_only(spark, fixture_df):
    """Stages 1-5 are one narrow projection: the physical plan has no
    exchange and no Python evaluation (without nfc) — the property
    that makes extraction a free pre-pass at 100 TB."""
    from aerovaldb_spark.operators.markup import html_extract

    plan = (
        html_extract(fixture_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF of any kind in the pure path
    # with nfc, exactly one Arrow-batched eval and still no exchange
    plan_nfc = (
        html_extract(fixture_df, nfc=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan_nfc
    assert plan_nfc.count("ArrowEvalPython") == 1


def test_empty_and_degenerate_pages(spark):
    from aerovaldb_spark.operators.markup import html_extract

    df = spark.createDataFrame(
        [
            (1, ""),  # empty page
            (2, "<script>x</script>"),  # nothing survives
            (3, "no markup at all just six plain words"),
        ],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert rows[1]["clean_text"] == "" and rows[1]["n_lines_kept"] == 0
    assert rows[2]["clean_text"] == ""
    assert rows[3]["clean_text"] == (
        "no markup at all just six plain words"
    )
    assert rows[3]["n_lines_kept"] == 1


def test_q39_composition_accepts_raw_html(spark):
    """clean_html_corpus_report == extract-then-q39: the composed
    operator's yield over synthesized pages equals running the q39
    stages by hand over html_to_text_col output."""
    from aerovaldb_spark.operators.markup import (
        clean_html_corpus_report,
        html_to_text_col,
        synth_html_col,
    )
    from aerovaldb_spark.catalog import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .where(F.col("text").isNotNull())
        .withColumn("html", synth_html_col())
    )
    got = {
        r["lang"]: (r["n_docs_kept"], r["total_tokens"])
        for r in clean_html_corpus_report(docs).collect()
    }
    # hand-rolled: extract, then the q39 stages on the extraction
    from pyspark.sql import Window

    ex = docs.select(
        "doc_id", "lang", html_to_text_col(F.col("html")).alias("t")
    )
    dd = (
        ex.withColumn("fp", F.md5("t"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy("doc_id")
            ),
        )
        .filter("rn = 1")
    )
    toks = F.filter(F.split("t", r"\s+", -1), lambda w: w != "")
    sc = dd.withColumn("n", F.size(toks)).withColumn(
        "sh",
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))),
    )
    want = {
        r["lang"]: (r["k"], r["tt"])
        for r in sc.filter(
            "n >= 20 AND CAST(sh AS DOUBLE) / n < 0.5"
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum("n").alias("tt"),
        )
        .collect()
    }
    assert got == want and got


def test_extraction_invariants_on_adversarial_input(spark):
    """Property-style sweep over adversarial non-HTML and broken-HTML
    inputs: extraction never crashes, and the output carries the
    spec's invariants — no sentinel bytes leak (inputs containing the
    raw sentinel codepoints are neutralized by the stage-1 control
    strip BEFORE anchors are marked), no control chars, no raw
    CR/TAB, every kept line satisfies both line rules."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aerovaldb_spark.operators.markup import (
        MIN_LINE_WORDS,
        html_extract,
    )

    frag = st.one_of(
        st.text(max_size=40),
        st.sampled_from(
            [
                "<a href=x>", "</a>", "<script>", "</script>",
                "<p>", "</p>", "<!--", "-->", "&amp;", "&lt;",
                "&#39;", "<div", ">", "\x01", "\x02", "\x00\x07",
                "\r\n\t", "<<>>", "<a<a>", "é",
                # numeric references (r14): valid dec/hex, controls,
                # surrogate, astral, truncated, double-encoded
                "&#72;", "&#x2713;", "&#10;", "&#1;", "&#xD800;",
                "&#x110000;", "&#", "&#;", "&#x;", "&amp;#60;",
                "&#38;", "&#0160;",
            ]
        ),
    )
    docs = st.lists(
        st.lists(frag, max_size=12).map("".join), min_size=1, max_size=8
    )

    @given(docs)
    @settings(max_examples=15, deadline=None)
    def check(pages):
        df = spark.createDataFrame(
            [(i, p) for i, p in enumerate(pages)],
            "doc_id long, html string",
        )
        rows = html_extract(df, nfc=True).collect()
        assert len(rows) == len(pages)
        for r in rows:
            t = r["clean_text"]
            assert "\x01" not in t and "\x02" not in t
            assert not any(ord(c) < 32 and c != "\n" for c in t)
            lines = t.split("\n") if t else []
            assert len(lines) == r["n_lines_kept"]
            for ln in lines:
                assert len(ln.split(" ")) >= MIN_LINE_WORDS
                assert ln == ln.strip()

    check()


def test_html_extract_is_stream_safe(spark, tmp_path):
    """The extraction is a stateless projection, so the SAME operator
    runs under Structured Streaming unchanged — stream output equals
    batch output row for row (append mode, no watermark, no state)."""
    import os

    from aerovaldb_spark.operators.markup import html_extract

    pages = [
        (1, "<p>alpha beta gamma delta</p><li><a href=x>Nav</a></li>"),
        (2, "<script>x</script><h1>the quick brown fox</h1>"),
        (3, "plain words with no markup at all"),
    ]
    d = str(tmp_path / "in")
    os.makedirs(d)
    batch_df = spark.createDataFrame(pages, "doc_id long, html string")
    batch_df.coalesce(1).write.parquet(d, mode="append")
    want = sorted(map(tuple, html_extract(batch_df).collect()))

    stream = spark.readStream.schema("doc_id long, html string").parquet(d)
    q = (
        html_extract(stream)
        .writeStream.format("memory")
        .queryName("html_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM html_stream").collect())
    )
    assert got == want


def test_unicode_whitespace_collapses_and_mirrors(spark):
    """NBSP-family whitespace (raw bytes, not just &nbsp;) collapses
    like ASCII whitespace — kept lines never carry edge characters
    Python's strip() would remove — and the SQL twin agrees byte for
    byte on the same input."""
    import duckdb

    from aerovaldb_spark.operators.markup import (
        _LINE_STRUCTS_SQL,
        MIN_LINE_WORDS,
        _tagged_sql,
        html_extract,
    )

    page = (
        "<p> alpha beta gamma　delta </p>"
        "<p>wide spacing here</p>"
    )
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    row = html_extract(df).collect()[0]
    assert row["clean_text"] == (
        "alpha beta gamma delta\nwide spacing here"
    )
    con = duckdb.connect()
    keep = f"s -> s.words >= {MIN_LINE_WORDS} AND s.lc*2 <= s.tot"
    sql = f"""
WITH t AS (SELECT {_tagged_sql("?")} AS tagged),
l AS (SELECT {_LINE_STRUCTS_SQL.format(tagged="tagged")} AS ls FROM t)
SELECT coalesce(list_aggregate(list_transform(
  list_filter(ls, {keep}), s -> s.clean), 'string_agg', chr(10)), '')
FROM l
"""
    assert con.execute(sql, [page]).fetchone()[0] == row["clean_text"]


def test_numeric_entity_engine_differential(spark):
    """Byte-identical stage-4 output between the Spark expressions
    and the SQL mirror over ADVERSARIAL numeric references — every
    boundary of the decode window (31/32, 126/127/128, the surrogate
    block edges 0xD7FF/0xD800/0xDFFF/0xE000, 0xFFFF/0x10000), both
    radixes and cases, leading zeros, truncated pseudo-references,
    repeated and chained forms, and the documented &#38;-synthesis
    quirks. The UTF-8 byte construction (Spark) vs chr() (DuckDB)
    must agree on every multi-byte character."""
    import duckdb

    from aerovaldb_spark.operators.markup import (
        _tagged_sql,
        tagged_text_col,
    )

    cases = [
        "a &#31; &#32; b",          # control boundary: 31 literal, 32 = space
        "&#126;&#127;&#128;",       # DEL excluded, 0x80 two-byte
        "&#x7FF;&#x800;",            # two-byte/three-byte boundary
        "&#xD7FF; &#xD800; &#xDFFF; &#xE000;",  # surrogate block edges
        "&#xFFFF; &#x10000; &#65535; &#65536;",  # BMP cap both radixes
        "&#0000065;&#x00041;",      # leading zeros, 7/5 digits
        "&#X48;&#x48;&#X4a;",       # upper/lower radix marker + hex case
        "&#72;&#72;&#72; thrice",   # repeated identical reference
        "&#38;#60; and &amp;#60;",  # synthesis quirk vs standard double-enc
        "&# &#; &#x; &#xG; &#12",   # truncated / malformed stay literal
        "&#160;&#xA0; nbsp twins",  # whitespace family via both radixes
        "mixed &lt;&#60;&#x3C; lt", # named + dec + hex of the same char
        "&#945;&#x3B1; alpha",      # multi-byte Greek, both radixes
        "&#12354;&#x3042; kana",    # three-byte CJK range
        "&#9999999; &#999999999;",  # 7-digit valid-out-of-window, 9-digit no-match
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, html string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", tagged_text_col(F.col("html")).alias("t")
        ).collect()
    }
    con = duckdb.connect()
    for i, c in enumerate(cases):
        want = con.execute(
            f"SELECT {_tagged_sql('?')}", [c]
        ).fetchone()[0]
        assert got[i] == want, (c, got[i], want)
    # spot-check semantics, not just agreement
    assert got[0] == "a &#31;   b"          # 32 decodes to a space
    assert got[3] == "퟿ &#xD800; &#xDFFF; "
    # one-level decode both ways: &#38;#60; synthesizes a literal
    # &#60; (not re-decoded — it was never in the original distinct
    # set), exactly like &amp;#60;
    assert got[8] == "&#60; and &#60;"
