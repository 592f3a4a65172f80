"""Second wave of relational/pipeline operators: pivot, exact
percentiles, correlated subqueries, sliding windows, LSH buckets,
ranked top-k per group, unions, and the end-to-end corpus-cleaning
pipeline. Same oracle-parity conventions as operators/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table

MONEY = "decimal(18,2)"


# --------------------------------------------------------------------------
# q32: pivot — order counts per priority (rows) × order status (columns).
def q32_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


Q32_SQL = """
SELECT o_orderpriority,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p
FROM orders GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q33: exact percentiles (percentile_disc picks actual data values →
# deterministic across engines, unlike interpolating approximations).
def q33_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "median_price"
        ),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").alias(
            "p90_price"
        ),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


Q33_SQL = """
SELECT o_orderstatus,
  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_price,
  percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_price,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q34: correlated scalar subquery — customers richer than their
# nation's average. Spark expresses it as a broadcast join against the
# per-nation aggregate (what a decorrelation rule produces anyway).
def q34_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast(MONEY)).cast("double")
            / F.count(F.lit(1))
        ).alias("nation_avg")
    )
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


Q34_SQL = """
SELECT c_nationkey, COUNT(*) AS n_above_avg
FROM customer c
WHERE c_acctbal > (
  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
GROUP BY c_nationkey
"""


# --------------------------------------------------------------------------
# q35: sliding window — 1-hour windows every 15 minutes. F.window with
# slideDuration; oracle expands each event into its 4 covering windows.
def q35_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_events",
        )
    )


Q35_SQL = """
SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS window_start,
  COUNT(*) AS n_events
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q36: sign-random-projection LSH bucket histogram (the candidate
# generator of the scale-path similarity search, operators/similarity).
def q36_srp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import NUM_PLANES, srp_signature_col

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("bucket", srp_signature_col("embedding", 64, NUM_PLANES))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("vec_id").alias("id_checksum"),
        )
    )


def _srp_proj_sql(p: int, dim: int = 64) -> str:
    return (
        "list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"list_transform(generate_series(0, {dim - 1}), "
        f"i -> CASE WHEN (CAST('0x' || substring(md5('p{p}_' || i), 1, 15) AS BIGINT) & 1) = 0 "
        "THEN 1.0 ELSE -1.0 END))"
    )


Q36_SQL = (
    "SELECT "
    + " + ".join(
        f"(CASE WHEN {_srp_proj_sql(p)} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(8)
    )
    + """ AS bucket,
  COUNT(*) AS n_vectors, CAST(SUM(vec_id) AS BIGINT) AS id_checksum
FROM embeddings GROUP BY 1
"""
)


# --------------------------------------------------------------------------
# q37: dense_rank top-k per group with ties (part prices per brand).
def q37_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 2)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


Q37_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
    DENSE_RANK() OVER (PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part
) WHERE rnk <= 2
"""


# --------------------------------------------------------------------------
# q38: UNION ALL across heterogeneous activity sources.
def q38_activity_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    a = ev.select(
        F.col("user_id").alias("actor_id"),
        F.lit("event").alias("kind"),
        F.col("value").cast(MONEY).alias("amount"),
    )
    b = orders.select(
        F.col("o_custkey").alias("actor_id"),
        F.lit("order").alias("kind"),
        F.col("o_totalprice").cast(MONEY).alias("amount"),
    )
    return (
        a.unionAll(b)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_actions"),
            F.countDistinct("actor_id").alias("n_actors"),
            F.sum("amount").cast("double").alias("total_amount"),
        )
    )


Q38_SQL = """
WITH activity AS (
  SELECT user_id AS actor_id, 'event' AS kind,
         CAST(value AS DECIMAL(18,2)) AS amount FROM events
  UNION ALL
  SELECT o_custkey AS actor_id, 'order' AS kind,
         CAST(o_totalprice AS DECIMAL(18,2)) AS amount FROM orders
)
SELECT kind, COUNT(*) AS n_actions, COUNT(DISTINCT actor_id) AS n_actors,
  CAST(SUM(amount) AS DOUBLE) AS total_amount
FROM activity GROUP BY kind
"""


# --------------------------------------------------------------------------
# q39: the end-to-end corpus-cleaning pipeline: exact-dedup → quality
# gate → per-language yield report. This is the composition a training
# data pipeline runs; each stage is a pushdown-friendly DataFrame op.
def q39_clean_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    deduped = (
        docs.withColumn("fp", F.md5("text"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("fp").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    scored = deduped.withColumn(
        "n_tokens", F.size(F.split("text", " "))
    ).withColumn(
        "stop_hits",
        F.expr("size(filter(split(text, ' '), t -> t IN ('the', 'a', 'of', 'and')))"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("stop_hits").cast("double") / F.col("n_tokens") < 0.5)
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("doc_id").alias("id_checksum"),
    )


Q39_SQL = """
WITH deduped AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
), scored AS (
  SELECT lang, doc_id,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_filter(string_split(text, ' '),
        t -> t IN ('the', 'a', 'of', 'and'))) AS stop_hits
  FROM deduped WHERE rn = 1
)
SELECT lang, COUNT(*) AS n_docs_kept, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM scored
WHERE n_tokens >= 20 AND CAST(stop_hits AS DOUBLE) / n_tokens < 0.5
GROUP BY lang
"""


# --------------------------------------------------------------------------
# q40: MinHash-LSH candidate pairs (banded bucket join). The oracle
# (dedup.Q40_SQL) recomputes the identical banding + bucket join in
# SQL over q27's signature fragments.
def q40_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    return lsh_candidate_pairs(minhash_signatures(docs))


# --------------------------------------------------------------------------
# q41: range join — for each error event, clicks by the same user in
# the preceding 5 minutes. A band/interval join: equi on user_id plus a
# range predicate; Spark executes equi-hash + range filter (the
# scalable shape — never a pure cross product).
def q41_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("err_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") < F.col("err_ts"))
        & (
            F.unix_micros("click_ts")
            >= F.unix_micros("err_ts") - 300_000_000
        ),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("click_ts").alias("clicks_before_error")
    )


Q41_SQL = """
SELECT e.event_id, e.user_id, COUNT(c.ts) AS clicks_before_error
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
  AND c.ts < e.ts AND epoch_us(c.ts) >= epoch_us(e.ts) - 300000000
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id
"""


# --------------------------------------------------------------------------
# q42: GROUPING SETS with grouping() disambiguation.
def q42_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_prio,
               COUNT(*) AS n_orders
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


Q42_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
       CAST(grouping(o_orderpriority) AS TINYINT) AS g_prio,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# q43: lead/lag/first_value navigation functions.
def q43_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            F.first("o_orderkey").over(w).alias("first_orderkey"),
            (
                F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate"))
            ).alias("days_to_next"),
        )
    )


Q43_SQL = """
SELECT o_custkey, o_orderkey,
  LEAD(o_orderkey) OVER w AS next_orderkey,
  FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
  CAST(date_diff('day', o_orderdate, LEAD(o_orderdate) OVER w) AS INT) AS days_to_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --------------------------------------------------------------------------
# q44: array aggregation — deterministic sorted collect.
def q44_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey")
        .agg(
            F.array_sort(F.collect_list("o_orderkey")).alias("orderkeys"),
            F.size(F.collect_list("o_orderkey")).alias("n_orders"),
        )
        .select(
            "o_custkey",
            F.expr("concat_ws(',', transform(orderkeys, x -> CAST(x AS STRING)))").alias(
                "orderkeys_csv"
            ),
            "n_orders",
        )
    )


Q44_SQL = """
SELECT o_custkey,
  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys_csv,
  COUNT(*) AS n_orders
FROM orders WHERE o_custkey < 50
GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# q45: regexp extraction + numeric cast.
def q45_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "prio_num",
            F.regexp_extract("o_orderpriority", "^([0-9]+)-", 1).cast("int"),
        )
        .groupBy("prio_num")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderpriority").alias("prio_label"),
        )
    )


Q45_SQL = """
SELECT CAST(regexp_extract(o_orderpriority, '^([0-9]+)-', 1) AS INT) AS prio_num,
  COUNT(*) AS n_orders,
  MIN(o_orderpriority) AS prio_label
FROM orders GROUP BY 1
"""


# --------------------------------------------------------------------------
# q49: CUBE — all grouping combinations of (returnflag, linestatus).
def q49_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast(MONEY)).cast("double").alias("sum_qty"),
    )


Q49_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q47: INTERSECT — customers active in both halves of the order history.
def q47_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    early = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    late = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    return early.intersect(late)


Q47_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
"""


# --------------------------------------------------------------------------
# q48: calendar decomposition — year/quarter/month/day-of-week stats.
def q48_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            # ISO day-of-week (Mon=1..Sun=7) matches DuckDB's isodow
            F.expr("EXTRACT(DAYOFWEEK_ISO FROM o_orderdate)").alias("dow"),
            F.col("o_totalprice"),
        )
        .groupBy("yr", "qtr", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(MONEY)).cast("double").alias(
                "total_price"
            ),
        )
    )


Q48_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(quarter FROM o_orderdate) AS qtr,
       CAST(EXTRACT(isodow FROM o_orderdate) AS INT) AS dow,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q132: the unified curation manifest — the pipeline's rungs (clean →
# exact dedup → near-dup clustering → split) composed into ONE
# operator emitting a row PER INPUT DOC with its fate and provenance:
# what a production curation run publishes alongside the exported
# corpus, so every drop is attributable and every kept doc carries its
# fold-in count. Stage rules are the graded rungs' own (q39's quality
# gate, q25's exact-dup fold, q62's banded-LSH near-dup pipeline,
# q53's deterministic split), so the manifest cannot drift from the
# operators it summarizes.
#
# 100 TB shape: the per-doc derived columns (fp, token stats) compute
# in ONE pass over the corpus and the base frame is persisted — no
# later stage rescans raw text (plan-tested); the near-dup stage runs
# only on exact-canonical survivors and keeps q62's
# banded-candidates-then-verify discipline (never all-pairs).
QUALITY_MIN_TOKENS = 20
QUALITY_STOP_RATIO = 0.5


def quality_stage_cols(df: DataFrame, text_col: str = "text"):
    """The q39 quality stage's derived columns (fp / n_tokens /
    stop_hits) plus the drop predicate — ONE definition shared by the
    batch manifest (q132) and ``streaming.curation_manifest_gate`` so
    the stream/batch twins cannot drift (r14 review: this rule
    previously existed as four inline copies, and the gate's
    stream ≡ batch test compares the gate against ITSELF — only a
    shared expression pins it to the manifest). The stop list is the
    canonical ``text.STOPWORDS['en']``. Returns ``(frame_with_cols,
    bad_quality_predicate)``."""
    from .text import STOPWORDS

    toks = F.split(text_col, " ")
    out = (
        df.withColumn("fp", F.md5(text_col))
        .withColumn("n_tokens", F.size(toks))
        .withColumn(
            "stop_hits",
            F.size(
                F.filter(
                    toks, lambda t: t.isin(*STOPWORDS["en"])
                )
            ),
        )
    )
    bad = (
        F.col(text_col).isNull()
        | (F.col("n_tokens") < QUALITY_MIN_TOKENS)
        | (
            F.col("stop_hits").cast("double") / F.col("n_tokens")
            >= QUALITY_STOP_RATIO
        )
    )
    return out, bad


def curation_manifest(docs: DataFrame) -> DataFrame:
    """One row per input doc: (doc_id, source, lang, n_tokens,
    verdict, canonical_id, n_copies, split) where verdict ∈ {'keep',
    'quality', 'exact_dup', 'near_dup'} names the FIRST stage that
    dropped the doc, canonical_id names the doc it lost to (dup drops
    only), n_copies is the doc's exact-content group size among
    quality survivors, and split is assigned to kept docs only."""
    from ._scope import scoped_persist
    from .dedup import dedup_pipeline
    from .text import split_col

    with_q, bad_quality = quality_stage_cols(
        docs.select("doc_id", "source", "lang", "text")
    )
    base = scoped_persist(with_q)
    qok = base.filter(~bad_quality)
    grp = qok.groupBy("fp").agg(
        F.min("doc_id").alias("canonical"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    withg = scoped_persist(qok.join(grp, "fp"))
    canon = withg.filter(F.col("doc_id") == F.col("canonical"))
    nl = dedup_pipeline(canon).filter(
        F.col("doc_id") != F.col("component")
    )

    nul_l = F.lit(None).cast("bigint")
    nul_s = F.lit(None).cast("string")

    def shape(df, verdict, canonical_id, n_copies, split):
        return df.select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            F.lit(verdict).alias("verdict"),
            canonical_id.alias("canonical_id"),
            n_copies.alias("n_copies"),
            split.alias("split"),
        )

    quality_drops = shape(
        base.filter(bad_quality), "quality", nul_l, nul_l, nul_s
    )
    exact_drops = shape(
        withg.filter(F.col("doc_id") != F.col("canonical")),
        "exact_dup",
        F.col("canonical"),
        F.col("n_copies"),
        nul_s,
    )
    # no broadcast hint on the loser frame: near-dup drops scale with
    # the corpus (web dedup routinely drops 20-40%), so forcing it
    # through the driver would be the plan's scale ceiling — a plain
    # shuffle join is right at size, and AQE upgrades small cases
    near_drops = shape(
        canon.join(nl, "doc_id"),
        "near_dup",
        F.col("component"),
        F.col("n_copies"),
        nul_s,
    )
    keeps = shape(
        canon.join(nl.select("doc_id"), "doc_id", "left_anti"),
        "keep",
        nul_l,
        F.col("n_copies"),
        split_col(),
    )
    return (
        quality_drops.unionByName(exact_drops)
        .unionByName(near_drops)
        .unionByName(keeps)
    )


def q132_curation_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return curation_manifest(load_table(spark, sf_dir, "documents"))


def _q132_sql() -> str:
    from .dedup import (
        MINHASH_PRIME,
        ROWS_PER_BAND,
        _SEED_TABLE,
        hash60_sql,
        shingles_sql,
    )

    split_case = (
        "CASE WHEN CAST('0x' || substring(md5('split_' || "
        "CAST(c.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90 "
        "THEN 'train' WHEN CAST('0x' || substring(md5('split_' || "
        "CAST(c.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 95 "
        "THEN 'val' ELSE 'test' END"
    )
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, source, lang, text, md5(text) AS fp,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_filter(string_split(text, ' '),
        t -> t IN ('the', 'a', 'of', 'and'))) AS stop_hits
  FROM documents
), qok AS (
  SELECT * FROM base
  WHERE text IS NOT NULL AND n_tokens >= 20
    AND CAST(stop_hits AS DOUBLE) / n_tokens < 0.5
), grp AS (
  SELECT fp, MIN(doc_id) AS canonical, COUNT(*) AS n_copies
  FROM qok GROUP BY fp
), withg AS (
  SELECT q.doc_id, q.source, q.lang, q.text, q.n_tokens,
         g.canonical, g.n_copies
  FROM qok q JOIN grp g USING (fp)
), canon AS (
  SELECT * FROM withg WHERE doc_id = canonical
), sh AS (
  SELECT DISTINCT doc_id, {hash60_sql('shingle')} AS h
  FROM (SELECT doc_id, unnest({shingles_sql('text', 3)}) AS shingle
        FROM canon)
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
), comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(w)) AS component FROM reach GROUP BY u
), nl AS (
  SELECT doc_id, component FROM comp WHERE doc_id <> component
)
SELECT doc_id, source, lang, n_tokens, 'quality' AS verdict,
  CAST(NULL AS BIGINT) AS canonical_id,
  CAST(NULL AS BIGINT) AS n_copies, CAST(NULL AS VARCHAR) AS split
FROM base
WHERE text IS NULL OR n_tokens < 20
   OR CAST(stop_hits AS DOUBLE) / n_tokens >= 0.5
UNION ALL
SELECT doc_id, source, lang, n_tokens, 'exact_dup', canonical,
  n_copies, CAST(NULL AS VARCHAR)
FROM withg WHERE doc_id <> canonical
UNION ALL
SELECT c.doc_id, c.source, c.lang, c.n_tokens, 'near_dup',
  nl.component, c.n_copies, CAST(NULL AS VARCHAR)
FROM canon c JOIN nl ON nl.doc_id = c.doc_id
UNION ALL
SELECT c.doc_id, c.source, c.lang, c.n_tokens, 'keep',
  CAST(NULL AS BIGINT), c.n_copies, {split_case}
FROM canon c LEFT JOIN nl ON nl.doc_id = c.doc_id
WHERE nl.doc_id IS NULL
"""


QUERIES = {
    "q32_pivot_status": q32_pivot_status,
    "q33_percentiles": q33_percentiles,
    "q34_above_nation_avg": q34_above_nation_avg,
    "q35_sliding_window": q35_sliding_window,
    "q36_srp_buckets": q36_srp_buckets,
    "q37_rank_parts": q37_rank_parts,
    "q38_activity_union": q38_activity_union,
    "q39_clean_corpus_report": q39_clean_corpus_report,
    "q40_lsh_candidates": q40_lsh_candidates,
    "q41_range_join": q41_range_join,
    "q42_grouping_sets": q42_grouping_sets,
    "q43_order_gaps": q43_order_gaps,
    "q44_order_arrays": q44_order_arrays,
    "q45_regexp_extract": q45_regexp_extract,
    "q47_set_intersect": q47_set_intersect,
    "q48_date_parts": q48_date_parts,
    "q49_cube": q49_cube,
    "q132_curation_manifest": q132_curation_manifest,
}

from .dedup import Q40_SQL  # noqa: E402  (shared hash fragments live there)

ORACLE = {
    "q32_pivot_status": Q32_SQL,
    "q33_percentiles": Q33_SQL,
    "q34_above_nation_avg": Q34_SQL,
    "q35_sliding_window": Q35_SQL,
    "q36_srp_buckets": Q36_SQL,
    "q37_rank_parts": Q37_SQL,
    "q38_activity_union": Q38_SQL,
    "q39_clean_corpus_report": Q39_SQL,
    "q40_lsh_candidates": Q40_SQL,
    "q41_range_join": Q41_SQL,
    "q42_grouping_sets": Q42_SQL,
    "q43_order_gaps": Q43_SQL,
    "q44_order_arrays": Q44_SQL,
    "q45_regexp_extract": Q45_SQL,
    "q47_set_intersect": Q47_SQL,
    "q48_date_parts": Q48_SQL,
    "q49_cube": Q49_SQL,
    "q132_curation_manifest": _q132_sql(),
}
