"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline surface (not present in the reference — it
stores unique-keyed assets; SURVEY.md §2.9). All variants are built on
shuffle-efficient primitives:

- exact: hash-groupBy on a content fingerprint (one shuffle on the
  16-byte hash, not the document text — at 100 TB only hashes move).
- n-gram Jaccard: shingle-explode → self-join on shingle → count. The
  join key is the shingle hash; frequent-shingle skew is the classic
  hazard, so `shingle_pairs` drops shingles above a document-frequency
  cap (stop-shingles), which bounds the quadratic blowup.
- MinHash+LSH: k permutation-style hashes → b bands of r rows →
  band-bucket join. Only band signatures shuffle; candidate pairs are
  verified with the signature-agreement estimate.
- SimHash: per-token hash bit-votes → 32-bit signature; near-dup if
  small Hamming distance.

The shared 60-bit integer hash is ``int(md5(x)[:15], 16)`` — chosen
because both Spark (`conv`) and DuckDB (hex cast) compute it
identically, so every step has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .._round import round6
from ._scope import scoped_persist

# Deterministic affine hash family over a Mersenne prime; coefficients
# fixed so Spark and the SQL oracle agree bit-for-bit.
MINHASH_PRIME = 2147483647  # 2^31 - 1
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
_A = [(2 * i + 1) * 2654435761 % MINHASH_PRIME for i in range(NUM_HASHES)]
_B = [(i * 40503 + 7) % MINHASH_PRIME for i in range(NUM_HASHES)]


def hash60(col: Column) -> Column:
    """Shared 60-bit integer hash: int(md5(x)[:15], 16)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def shingles_col(text: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column."""
    return F.expr(
        f"CASE WHEN size(split({text}, ' ')) < {n} THEN array()"
        f" ELSE array_distinct(transform(sequence(1, size(split({text}, ' ')) - {n - 1}),"
        f" i -> concat_ws(' ', slice(split({text}, ' '), i, {n})))) END"
    )


def shingles_sql(expr: str = "text", n: int = 3) -> str:
    toks = f"string_split({expr}, ' ')"
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)),"
        f" i -> array_to_string({toks}[i:i+{n - 1}], ' ')))"
    )


def exploded_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(shingles_col("text", n)).alias("shingle")
    )


def hashed_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, h): distinct 60-bit shingle hashes per document.

    Joining/grouping on the 8-byte hash instead of the shingle string
    shrinks the shuffle ~10× (the hash stands in for the text; the
    SQL oracle computes the identical hash so collisions — ~|S|²/2⁶⁰ —
    affect both engines identically).

    Map-only: ``shingles_col`` already applies array_distinct per
    document, so (doc_id, h) pairs are unique without a distinct()
    shuffle (up to a within-document hash collision, ~|doc shingles|²
    / 2⁶⁰ — measured win: dropping the redundant shuffle cuts q26 wall
    time ~30% at sf0.1, and at 100 TB removes a full |shingles|-row
    exchange).
    """
    return exploded_shingles(docs, n).select(
        "doc_id", hash60(F.col("shingle")).alias("h")
    )


def shingle_pairs(
    docs: DataFrame, n: int = 3, max_doc_freq: int | None = None
) -> DataFrame:
    """(doc_a, doc_b, shared) for doc pairs sharing ≥1 shingle.

    ``max_doc_freq`` drops stop-shingles before the self-join — the
    skew guard that keeps this from going quadratic at scale.
    """
    sh = scoped_persist(hashed_shingles(docs, n))
    if max_doc_freq is not None:
        # anti-join against the (tiny) over-cap set: AQE broadcasts it,
        # where the complementary rare-set inner join would shuffle the
        # whole vocabulary
        stop = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("h")
        )
        sh = sh.join(stop, "h", "left_anti")
    a = sh.select(F.col("doc_id").alias("doc_a"), "h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )


# Stop-shingle guard shared by the graded q26 -> q56/q60 chain: a
# shingle whose document frequency exceeds
#   max(MIN_STOP_DF, min(ABS_MAX_STOP_DF, n_docs div STOP_DF_DENOM))
# is boilerplate ("click here to subscribe"); left in, the pair
# self-join is quadratic in that shingle's document frequency. The
# cap is RELATIVE to corpus size at small corpora (computed in-plan
# from a one-row count, broadcast) but CLAMPED at an absolute ceiling:
# a purely relative n/4 cap still admits 2.5e8-doc fan-outs at a 1e9-
# doc corpus, where the absolute ceiling bounds the self-join at
# ABS_MAX_STOP_DF rows per hash — pair volume <= 256 * |distinct
# shingles|, LINEAR in corpus size. (Measured corpus max df: 25 at
# sf0.1 — the ceiling is value-neutral at every graded SF.)
STOP_DF_DENOM = 4
MIN_STOP_DF = 5
ABS_MAX_STOP_DF = 256


def stop_filtered_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, h) shingle hashes with stop-shingles dropped.

    Document frequency is computed per hash (one partial-combined
    aggregation over 8-byte keys) and the guard is applied as a LEFT
    ANTI join against the STOP set — the hashes *over* the cap. The
    stop set is tiny by construction (only boilerplate shingles exceed
    max(MIN_STOP_DF, n_docs/STOP_DF_DENOM)), so AQE turns the anti
    join into a broadcast at runtime; the complementary keep-set inner
    join would instead shuffle every (doc_id, h) row against a
    keep table as large as the distinct-shingle vocabulary. No
    explicit hint — the plan-level no-broadcast-hint guarantee of q26
    stays intact (a one-row corpus count and a boilerplate-only hash
    set are the only things Catalyst may broadcast; nothing
    corpus-sized).
    """
    sh = scoped_persist(hashed_shingles(docs, n))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stop = (
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(n_docs)
        .filter(
            F.col("df")
            > F.greatest(
                F.lit(MIN_STOP_DF),
                F.least(
                    F.lit(ABS_MAX_STOP_DF),
                    F.expr(f"n_docs div {STOP_DF_DENOM}"),
                ),
            )
        )
        .select("h")
    )
    return sh.join(stop, "h", "left_anti")


# SQL twin of stop_filtered_shingles: sh0 = distinct (doc_id, h), stop =
# hashes over the relative document-frequency cap, anti-joined away.
def _stop_filtered_sh_ctes(n: int = 3) -> str:
    return f"""sh0 AS (
  SELECT DISTINCT doc_id, {hash60_sql('shingle')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql('text', n)}) AS shingle FROM documents)
), stop AS (
  SELECT h FROM sh0 GROUP BY h
  HAVING COUNT(*) > greatest({MIN_STOP_DF},
                             least({ABS_MAX_STOP_DF},
                                   (SELECT COUNT(*) // {STOP_DF_DENOM} FROM documents)))
), sh AS (
  SELECT sh0.doc_id, sh0.h FROM sh0 ANTI JOIN stop USING (h)
)"""


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest-doc_id representative per exact content hash."""
    return (
        docs.withColumn("fp", F.md5(F.col(text_col)))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# q25: exact dedup summary.
def q25_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    groups = dedup_exact(docs)
    return groups.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n_copies").alias("n_docs"),
        (F.sum("n_copies") - F.count(F.lit(1))).alias("n_duplicates"),
        F.sum(F.col("keep_doc_id")).alias("keep_id_checksum"),
    )


Q25_SQL = """
WITH g AS (
  SELECT md5(text) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
  FROM documents GROUP BY md5(text)
)
SELECT COUNT(*) AS n_unique, CAST(SUM(n_copies) AS BIGINT) AS n_docs,
  CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_duplicates,
  CAST(SUM(keep_doc_id) AS BIGINT) AS keep_id_checksum
FROM g
"""


# --------------------------------------------------------------------------
# q26: n-gram Jaccard near-duplicate pairs. Jaccard is an exact integer
# ratio → deterministic double on both engines.
def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, min_shared: int = 3
) -> DataFrame:
    """(doc_a, doc_b, shared, jaccard) over the STOP-FILTERED shingle
    sets: both the pair counts and the per-doc sizes come from
    :func:`stop_filtered_shingles`, so ``jaccard`` is the exact Jaccard
    of the non-stop shingle sets (consistent numerator/denominator).

    One persisted filtered shingle-hash set feeds BOTH the pair join
    and the per-doc sizes: the md5-per-shingle projection (the CPU hot
    spot) runs once, and the self-join's two sides read the same cached
    partitions. The stop-shingle guard bounds the self-join fan-out at
    max(MIN_STOP_DF, n_docs div STOP_DF_DENOM) rows per hash — without
    it, one boilerplate shingle makes this quadratic in its document
    frequency.
    """
    sh = scoped_persist(stop_filtered_shingles(docs, n))
    a = sh.select(F.col("doc_id").alias("doc_a"), "h")
    b = sh.select(F.col("doc_id").alias("doc_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    # No broadcast hint on sizes: it has one row PER DOCUMENT, so a
    # baked-in hint is a guaranteed OOM at corpus scale. AQE broadcasts
    # at runtime when (and only when) the table actually fits.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        pairs.join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("n_shingles").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("n_shingles").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            round6(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))),
        )
        .filter(F.col("shared") >= min_shared)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


def q26_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, 3)


Q26_SQL = f"""
WITH {_stop_filtered_sh_ctes(3)}, sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, shared,
  ROUND(CAST(shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - shared), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared >= 3
"""


# --------------------------------------------------------------------------
# q27: MinHash signatures + LSH banding.
def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, seed, minhash): min over shingles of the affine hash.

    All k minimums are computed in ONE aggregation over the shingle
    set (k min-expressions), then unpivoted — no k× row explosion, so
    the shuffle carries |shingles| rows instead of k·|shingles|.
    """
    sh = exploded_shingles(docs, n).withColumn(
        "h", hash60(F.col("shingle")) % MINHASH_PRIME
    )
    # one F.expr per seed (not one Column DSL tree per seed): the DSL
    # builds each min through ~6 py4j round-trips, which at k seeds is
    # ~0.2 s of pure driver latency before the job even starts
    mins = sh.groupBy("doc_id").agg(
        *[
            F.expr(f"min(({_A[i]} * h + {_B[i]}) % {MINHASH_PRIME}) AS m{i}")
            for i in range(NUM_HASHES)
        ]
    )
    stack = ", ".join(f"CAST({i} AS INT), m{i}" for i in range(NUM_HASHES))
    return mins.selectExpr(
        "doc_id", f"stack({NUM_HASHES}, {stack}) AS (seed, minhash)"
    )


def minhash_band_cols(
    docs: DataFrame, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """MAP-ONLY banded minhash: adds ``bsig_0..bsig_{BANDS-1}`` string
    columns, byte-identical to the band signatures
    :func:`lsh_candidate_pairs` aggregates (same "seed:minhash" items,
    same array_sort, same comma join — asserted in tests).

    The agg-based :func:`minhash_signatures` distributes each doc's
    shingle set across partitions, which is the safe shape for
    arbitrarily large documents; this variant keeps the shingle array
    in-row (array transform + array_min), trading per-doc memory for
    ZERO shuffles — the only shape a stateless streaming gate can use,
    and fine wherever documents are bounded (they are, in curation
    pipelines that cap doc length upstream).
    """
    hashes = F.transform(
        shingles_col(text_col, n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % MINHASH_PRIME,
    )

    # single-arg closure per seed: a two-arg lambda would receive the
    # array INDEX as its second argument from F.transform
    def _affine(i):
        return lambda h: (F.lit(_A[i]) * h + F.lit(_B[i])) % MINHASH_PRIME

    out = docs
    for band in range(BANDS):
        items = F.array(
            *[
                F.concat_ws(
                    ":",
                    F.lit(str(i)),
                    F.array_min(F.transform(hashes, _affine(i))).cast("string"),
                )
                for i in range(
                    band * ROWS_PER_BAND, (band + 1) * ROWS_PER_BAND
                )
            ]
        )
        # Docs with no shingles get NULL (not a degenerate shared
        # signature): the agg path emits no signature rows for them,
        # and null never equi-joins, so behavior matches.
        out = out.withColumn(
            f"bsig_{band}",
            F.when(
                F.size(shingles_col(text_col, n)) > 0,
                F.concat_ws(",", F.array_sort(items)),
            ),
        )
    return out


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Band the signature and bucket-join: pairs agreeing on ≥1 band.

    Collision model: with the module dial (BANDS=4, ROWS_PER_BAND=4) a
    pair at shingle Jaccard J collides with p = 1-(1-J^4)^4 — and for
    SHINGLE minhash the model is EXACT (P[minhash match] = J is the
    classical MinHash identity), unlike the TF-IDF rungs where J is a
    calibrated proxy. ``text.band_collision_prob`` /
    ``text.choose_band_dial`` evaluate the same model for sizing a
    custom dial (the constants here are frozen — q27/q40's graded spec).

    The banded frame is persisted: it feeds BOTH sides of the bucket
    self-join, and without the persist the whole signature pipeline
    upstream (shingle md5 + k minhash aggregations — the CPU hot
    spot) executes twice."""
    banded = scoped_persist(
        signatures.withColumn("band", (F.col("seed") / ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list(F.concat_ws(":", "seed", "minhash")))
            ).alias("band_sig")
        )
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def q27_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    # Compact checksum view: per-seed aggregate over all docs (full
    # signatures are asserted via the checksum; pairs via q26).
    return sig.groupBy("seed").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("minhash").alias("min_minhash"),
        F.sum("minhash").alias("sum_minhash"),
    )


_SEED_TABLE = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(_A, _B)))

Q27_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, {hash60_sql('shingle')} % {MINHASH_PRIME} AS h
  FROM (SELECT doc_id, unnest({shingles_sql('text', 3)}) AS shingle FROM documents)
), seeds(seed, a, b) AS (VALUES {_SEED_TABLE}),
sig AS (
  SELECT doc_id, seed, MIN((a * h + b) % {MINHASH_PRIME}) AS minhash
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, seed
)
SELECT seed, COUNT(*) AS n_docs, MIN(minhash) AS min_minhash,
  CAST(SUM(minhash) AS BIGINT) AS sum_minhash
FROM sig GROUP BY seed
"""


# --------------------------------------------------------------------------
# q28: SimHash signatures (32-bit, token-level).
SIMHASH_BITS = 32


def simhash_col_df(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): bit-vote simhash over token hashes.

    All 32 bit-votes aggregate in ONE pass over the tokens (32 sum
    expressions) — no per-bit row explosion; the signature assembles
    from the vote columns without a second shuffle.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn("h", hash60(F.col("token")))
    # the whole signature is ONE expression (32 aggregate sub-trees):
    # a single py4j call instead of ~130, and the bit assembly fuses
    # into the aggregation projection — no second select
    sig = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (shiftright(h, {b}) & 1) = 1"
        f" THEN 1 ELSE -1 END) > 0"
        f" THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(SIMHASH_BITS)
    )
    return tok.groupBy("doc_id").agg(F.expr(f"({sig}) AS simhash"))


def q28_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_col_df(docs)


Q28_SQL = f"""
WITH tok AS (
  SELECT doc_id, {hash60_sql('token')} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
), bits AS (
  SELECT doc_id, bit,
    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit)
  GROUP BY doc_id, bit
)
SELECT doc_id,
  CAST(SUM(CASE WHEN votes > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Duplicate-cluster resolution: near-dup PAIRS are not enough for a
# pipeline — transitively connected docs must collapse to one
# canonical representative. Connected components via min-label
# propagation: every vertex repeatedly takes the minimum label among
# itself and its neighbors until fixpoint (O(graph diameter)
# iterations; each iteration is one shuffle on the vertex id).
# The driver-side loop is only the convergence check (a count) —
# label state itself never leaves the cluster, and localCheckpoint
# truncates lineage so plans don't grow with iterations.
def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """(v, component) with component = min vertex id in the component.

    The convergence loop issues several shuffles PER ITERATION, all
    keyed by vertex id, so the session-wide shuffle width multiplies
    across iterations (a vanilla 200-partition session turns a
    50-vertex graph into thousands of empty tasks). The loop therefore
    pins ``spark.sql.shuffle.partitions`` — to ``shuffle_partitions``
    if given, else the cluster's default parallelism — and restores
    the caller's setting afterwards; every iteration's state is
    localCheckpointed inside that window, so nothing re-executes under
    the restored conf. The pin applies ``shuffle_partitions`` if given;
    otherwise it replaces only the untouched 200 default with
    defaultParallelism and leaves any deliberately-set session width
    (narrow or wide) alone. At 100 TB pass an explicit width sized to
    the vertex count."""
    spark = edges.sparkSession
    # Respect an already-tuned session: the pin exists ONLY to protect
    # against the VANILLA 200-partition default multiplying across
    # iterations. A session whose shuffle width was deliberately SET —
    # narrower for bench, or WIDER than defaultParallelism for a large
    # cluster shuffle — keeps its value; clamping to defaultParallelism
    # unconditionally would silently narrow a tuned-wide cluster
    # session (the opposite of respecting it).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        session_width = int(prev)
    except (TypeError, ValueError):
        session_width = spark.sparkContext.defaultParallelism
    if shuffle_partitions:
        width = shuffle_partitions
    elif session_width == 200:  # the untouched Spark default
        width = spark.sparkContext.defaultParallelism
    else:
        width = session_width
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        sym = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("w")
        ).unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("w"))
        ).localCheckpoint()
        labels = (
            sym.select(F.col("u").alias("v"))
            .distinct()
            .withColumn("label", F.col("v"))
            .localCheckpoint()
        )
        changed = 1
        for it in range(max_iter):
            nbr_min = (
                sym.join(labels, sym.w == labels.v)
                .groupBy("u")
                .agg(F.min("label").alias("nbr_min"))
            )
            prop = labels.join(nbr_min, labels.v == nbr_min.u, "left").select(
                "v",
                # carry the iteration's STARTING label so convergence is
                # a narrow filter over the checkpointed result instead of
                # a join of two label frames: at 100 TB labels outgrow
                # the broadcast threshold and that join is a full
                # |V|-vs-|V| shuffle PER ITERATION (guide §2.4 — remove
                # shuffles outright); labels only ever decrease, so
                # label < prev over `new` is exactly the old
                # new-vs-labels comparison.
                F.col("label").alias("prev"),
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
            # POINTER JUMPING (path compression): label values are
            # vertex ids, so one self-join replaces each label with its
            # label's label — the propagation frontier doubles per
            # iteration and convergence drops from O(diameter) to
            # O(log diameter) shuffles. A percolating near-dup graph
            # (the q93 threshold graph at 10x data) has chain
            # components hundreds of vertices long; plain min-label
            # propagation blew the 25-iteration guard there, this
            # converges in ~8.
            lut = prop.select(
                F.col("v").alias("_lv"), F.col("label").alias("_ll")
            )
            # the convergence count rides INSIDE the checkpoint job as
            # an observed metric (CollectMetrics accumulates while the
            # checkpoint materializes), so each iteration is ONE Spark
            # job instead of a checkpoint + count pair — the count's
            # separate narrow rescan of the checkpointed partitions
            # (and its per-job scheduling floor) is gone
            from pyspark.sql import Observation

            obs = Observation()
            new = (
                prop.join(lut, prop.label == lut._lv, "left")
                .select(
                    "v",
                    "prev",
                    F.least(
                        F.col("label"), F.coalesce("_ll", F.col("label"))
                    ).alias("label"),
                )
                .observe(
                    obs,
                    F.count(
                        F.when(F.col("label") < F.col("prev"), F.lit(1))
                    ).alias("changed"),
                )
                .localCheckpoint()
            )
            labels = new.select("v", "label")
            # the metric is free, so it is read every iteration (the
            # previous shape skipped iteration 0's count to save its
            # job; there is no longer a job to save)
            changed = int(obs.get["changed"])
            if changed == 0:
                break
        if changed != 0:
            # A component with diameter > 2^max_iter would silently
            # split into multiple labels — never hand that to a dedup
            # pipeline as a final clustering.
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                f"iterations ({changed} labels still changing); raise "
                "max_iter (iterations needed ~ log2(graph diameter))"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return labels.select(F.col("v"), F.col("label").alias("component"))


def q56_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the q26 near-dup pair graph (jaccard >= 0.2) and emit
    one row per clustered doc with its canonical representative.

    The Spark side is iterative min-label propagation with pointer
    jumping (O(log diameter) shuffles — the 100 TB shape); the DuckDB oracle computes the same
    fixpoint declaratively with a recursive reachability CTE (fine at
    oracle scale, quadratic in component size), so even the iterative
    operator is value-checked. Union-find equivalence is additionally
    asserted in tests."""
    pairs = q26_ngram_jaccard_pairs(spark, sf_dir).filter(F.col("jaccard") >= 0.2)
    return connected_components(pairs).withColumnRenamed("v", "doc_id").orderBy(
        "doc_id"
    )


def q60_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection: each near-dup cluster keeps
    its highest-quality document (q22's score; ties → lowest doc_id).

    The step a dedup pipeline runs AFTER clustering — pairs (q26) →
    components (q56) → one keep/drop decision per clustered doc.
    Scale shape: clusters are a narrow (doc_id, component) projection;
    the quality join shuffles only that projection on doc_id, and the
    representative choice is one window over component. No extra
    full-corpus pass beyond what q56 already does.
    """
    from .text import quality_columns

    docs = load_table(spark, sf_dir, "documents")
    clusters = q56_dedup_clusters(spark, sf_dir)
    quality = quality_columns(docs).select("doc_id", "quality_score")
    joined = clusters.join(quality, "doc_id")
    full = (
        Window.partitionBy("component")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        joined.withColumn("canonical_id", F.first("doc_id").over(full))
        .withColumn(
            "is_canonical",
            (F.col("doc_id") == F.col("canonical_id")).cast("int"),
        )
        .select(
            "doc_id", "component", "quality_score", "canonical_id",
            "is_canonical",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q62: the composed 100 TB dedup pipeline. q56/q60 build clusters from
# the EXACT all-pairs shingle join (the right oracle baseline at test
# scale, quadratic at corpus scale); this is the shape you actually run
# at 100 TB: banded-LSH candidate generation (q40's operator — expected
# pairs ~ n²/2^bands, not n²) followed by exact-Jaccard verification of
# CANDIDATES ONLY, then the same component/canonical steps. The full
# shingle self-join never appears in this plan, and nothing corpus-sized
# is broadcast (verified by tests/test_plans.py).
def verified_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    n: int = 3,
    min_shared: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Exact Jaccard for an explicit candidate-pair set only.

    Joins the candidate list against the per-doc shingle-hash sets —
    first on doc_a (one shuffle keyed by doc), then on (doc_b, h) — so
    the join cardinality is |candidates| x avg shingles, never
    |shingles|² / bucket. Output matches q26's columns/filters, so the
    same thresholds compose.
    """
    sh = scoped_persist(hashed_shingles(docs, n))
    shared = (
        candidates.select("doc_a", "doc_b")
        .join(sh.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("n_shingles").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("n_shingles").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            round6(
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))),
        )
        .filter(
            (F.col("shared") >= min_shared) & (F.col("jaccard") >= min_jaccard)
        )
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


def dedup_pipeline(
    docs: DataFrame,
    n: int = 3,
    min_shared: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """(doc_id, component): end-to-end near-dup clustering, scale path.

    Candidates from banded MinHash-LSH, verified with exact Jaccard on
    candidates only, clustered by min-label propagation. Verified edges
    are a subset of the exact pair graph, so any difference vs q56 is
    exactly the LSH recall loss — measured in tests, mirrored by the
    q62 oracle which follows the same banding.
    """
    cand = lsh_candidate_pairs(minhash_signatures(docs, n))
    edges = verified_jaccard_pairs(
        docs, cand, n, min_shared=min_shared, min_jaccard=min_jaccard
    )
    return connected_components(edges).withColumnRenamed("v", "doc_id")


def q62_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup_pipeline(docs).orderBy("doc_id")


# Banded-signature LSH candidate pairs — the SQL twin of
# lsh_candidate_pairs() over q27's signatures (q40's oracle; lives here
# next to the shared hash fragments).
Q40_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, {hash60_sql('shingle')} % {MINHASH_PRIME} AS h
  FROM (SELECT doc_id, unnest({shingles_sql('text', 3)}) AS shingle FROM documents)
), seeds(seed, a, b) AS (VALUES {_SEED_TABLE}),
sig AS (
  SELECT doc_id, seed, MIN((a * h + b) % {MINHASH_PRIME}) AS minhash
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, seed
), banded AS (
  SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
    array_to_string(
      list_sort(list(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))),
      ',') AS band_sig
  FROM sig GROUP BY doc_id, band
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a
JOIN banded b ON a.band = b.band AND a.band_sig = b.band_sig
            AND a.doc_id < b.doc_id
"""


# Shared cluster CTE chain (q56, q60): q26 pair graph (jaccard >= 0.2,
# stop-filtered shingles — same guard chain as Q26_SQL) → symmetric
# edges → recursive reachability → component = min reachable vertex id.
_CLUSTER_CTES = f"""
WITH RECURSIVE {_stop_filtered_sh_ctes(3)}, sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), near AS (
  SELECT doc_a, doc_b FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE shared >= 3
    AND ROUND(CAST(shared AS DOUBLE)
              / (sa.n_shingles + sb.n_shingles - shared), 6) >= 0.2
), edges AS (
  SELECT doc_a AS u, doc_b AS w FROM near
  UNION
  SELECT doc_b AS u, doc_a AS w FROM near
), reach(u, w) AS (
  SELECT u, w FROM edges
  UNION
  SELECT r.u, e.w FROM reach r JOIN edges e ON r.w = e.u
)"""

Q56_SQL = (
    _CLUSTER_CTES
    + """
SELECT u AS doc_id, LEAST(u, MIN(w)) AS component FROM reach GROUP BY u
"""
)


def _q60_sql() -> str:
    from .text import QUALITY_SCORE_SQL

    return (
        _CLUSTER_CTES
        + f"""
, comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(w)) AS component FROM reach GROUP BY u
), quality AS ({QUALITY_SCORE_SQL})
SELECT doc_id, component, quality_score, canonical_id,
  CAST(doc_id = canonical_id AS INT) AS is_canonical
FROM (
  SELECT c.doc_id, c.component, q.quality_score,
    FIRST_VALUE(c.doc_id) OVER (
      PARTITION BY c.component
      ORDER BY q.quality_score DESC, c.doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    ) AS canonical_id
  FROM comp c JOIN quality q ON q.doc_id = c.doc_id
)
"""
    )


# q62 oracle: the SAME pipeline declaratively — banded LSH candidates,
# exact-Jaccard verification of candidates only, recursive-CTE
# components. Mirrors the Spark path stage for stage so LSH recall
# differences vs q56 cancel out.
Q62_SQL = f"""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, {hash60_sql('shingle')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql('text', 3)}) AS shingle FROM documents)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), shp AS (
  SELECT DISTINCT doc_id, h % {MINHASH_PRIME} AS h FROM sh
), seeds(seed, a, b) AS (VALUES {_SEED_TABLE}),
sig AS (
  SELECT doc_id, seed, MIN((a * h + b) % {MINHASH_PRIME}) AS minhash
  FROM shp CROSS JOIN seeds
  GROUP BY doc_id, seed
), banded AS (
  SELECT doc_id, seed // {ROWS_PER_BAND} AS band,
    array_to_string(
      list_sort(list(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))),
      ',') AS band_sig
  FROM sig GROUP BY doc_id, band
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
  GROUP BY c.doc_a, c.doc_b
), near AS (
  SELECT doc_a, doc_b FROM verified
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE shared >= 3
    AND ROUND(CAST(shared AS DOUBLE)
              / (sa.n_shingles + sb.n_shingles - shared), 6) >= 0.2
), edges AS (
  SELECT doc_a AS u, doc_b AS w FROM near
  UNION
  SELECT doc_b AS u, doc_a AS w FROM near
), reach(u, w) AS (
  SELECT u, w FROM edges
  UNION
  SELECT r.u, e.w FROM reach r JOIN edges e ON r.w = e.u
)
SELECT u AS doc_id, LEAST(u, MIN(w)) AS component FROM reach GROUP BY u
"""


# --------------------------------------------------------------------------
# q82: cross-source shingle-overlap matrix — Jaccard similarity
# between the distinct-shingle SETS of every source pair. The corpus-
# level view of q77's per-document contamination: which sources share
# boilerplate/content with which. Scale shape: the corpus collapses to
# one (source, h) row per distinct 8-byte shingle hash per source
# BEFORE any join (partial-combined distinct), the source×source
# intersection is an equi-join on h whose output is |sources|² rows,
# and the per-source set sizes (a |sources|-row frame) broadcast onto
# the pair counts.
def source_overlap_matrix(docs: DataFrame, n: int = 3) -> DataFrame:
    """(source_a, source_b, n_a, n_b, n_common, jaccard) per pair.

    ``n_a``/``n_b`` are distinct-shingle-set sizes, ``jaccard`` is
    |A∩B| / |A∪B| rounded to 6. Pairs with an empty intersection are
    absent (at scale you don't materialize the zero cells of a
    sources² matrix; absence == disjoint).
    """
    sh = scoped_persist(
        docs.select("source", F.explode(shingles_col("text", n)).alias("shingle"))
        .select("source", hash60(F.col("shingle")).alias("h"))
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_set"))
    a = sh.select(F.col("source").alias("source_a"), "h")
    b = sh.select(F.col("source").alias("source_b"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.toDF("source_a", "n_a")), "source_a"
        )
        .join(F.broadcast(sizes.toDF("source_b", "n_b")), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            round6(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
        )
    )


def q82_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_matrix(docs)


Q82_SQL = f"""
WITH sh AS (
  SELECT DISTINCT source, {hash60_sql('shingle')} AS h
  FROM (SELECT source, unnest({shingles_sql('text', 3)}) AS shingle FROM documents)
), sizes AS (
  SELECT source, COUNT(*) AS n_set FROM sh GROUP BY source
), common AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT c.source_a, c.source_b,
  sa.n_set AS n_a, sb.n_set AS n_b, c.n_common,
  ROUND(CAST(c.n_common AS DOUBLE) / (sa.n_set + sb.n_set - c.n_common), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.source = c.source_a
JOIN sizes sb ON sb.source = c.source_b
"""


QUERIES = {
    "q25_dedup_exact": q25_dedup_exact,
    "q26_ngram_jaccard_pairs": q26_ngram_jaccard_pairs,
    "q27_minhash_signatures": q27_minhash_signatures,
    "q28_simhash": q28_simhash,
    "q56_dedup_clusters": q56_dedup_clusters,
    "q60_canonical_docs": q60_canonical_docs,
    "q62_dedup_pipeline": q62_dedup_pipeline,
    "q82_source_overlap": q82_source_overlap,
}

ORACLE = {
    "q82_source_overlap": Q82_SQL,
    "q25_dedup_exact": Q25_SQL,
    "q26_ngram_jaccard_pairs": Q26_SQL,
    "q27_minhash_signatures": Q27_SQL,
    "q28_simhash": Q28_SQL,
    "q56_dedup_clusters": Q56_SQL,
    "q60_canonical_docs": _q60_sql(),
    "q62_dedup_pipeline": Q62_SQL,
}
