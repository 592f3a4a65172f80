"""Event-stream operators: as-of join, sessionization, time windows.

The reference has no streaming/temporal surface (SURVEY.md §2.9), so
these are the Spark-first temporal operators a consumer of this engine
needs over the ``events`` table. Each is expressed with built-in window
/ join operators so Catalyst picks the physical plan; the as-of join
uses the union+last_value pattern (one shuffle on user_id, no range
explosion), which scales linearly instead of the quadratic correlated
subquery a naive port would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts < left.ts`` for the same key (strict as-of backward join).

    Implementation: union both sides tagged, sort within key by time,
    propagate the last seen right value with ``last(..., ignorenulls)``
    over an unbounded-preceding window. One shuffle on the key — this is
    the scalable pattern (a correlated subquery / range join would be
    quadratic in events per key).
    """
    lt = left.withColumn("_is_left", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.withColumn("_is_left", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
        .select(
            on,
            "_is_left",
            "_ts",
            *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        )
    )
    # Align schemas for the union.
    for c in [f.name for f in rt.schema.fields if f.name.startswith("_r_")]:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    lt = lt.select(*[f.name for f in rt.schema.fields], *[c for c in left.columns if c != on])
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # Left rows sort BEFORE right rows at identical _ts (is_left asc puts
    # right=0 first... we need strictly-before: right rows at the same
    # timestamp must NOT match, so order right rows after left rows on ties.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_is_left").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return matched.filter(F.col("_is_left") == 1).drop(
        "_is_left", "_ts", *[f"_r_{c}" for c in right_cols]
    )


# --------------------------------------------------------------------------
# q18: for each purchase event, the timestamp of the user's most recent
# strictly-earlier click.
def q18_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks.withColumnRenamed("ts", "click_ts"),
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("asof_click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_click_ts"
        ),
    )


PAIR_LOOKBACK_HOURS = 24


def purchase_click_pairs(
    events: DataFrame, lookback_hours: int = PAIR_LOOKBACK_HOURS
) -> DataFrame:
    """Every (purchase, click) pair per user with the click strictly
    before the purchase and within a BOUNDED lookback window — the
    attribution-pair join underlying q18's as-of reduction, with the
    bound that makes it streamable: an unbounded "any click before"
    needs infinite join state on a stream, while a lookback window
    bounds both sides' state to window + watermark (the streaming twin
    :func:`aerovaldb_spark.streaming.stream_purchase_click_pairs` runs
    THIS predicate as a watermarked stream-stream join, equivalence-
    tested). Batch shape: one keyed shuffle on user_id; the range
    predicates ride the join as filters — never a cross product."""
    p, c = pair_join_sides(events)
    return pair_join_output(
        p.join(c, pair_join_condition(lookback_hours))
    )


# the three pieces below are SHARED with the streaming twin
# (streaming.stream_purchase_click_pairs wraps the sides with
# event-time watermarks and reuses the condition and projection
# verbatim), so the batch/stream equivalence the tests assert cannot
# drift out from under either form
def pair_join_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return p, c


def pair_join_condition(lookback_hours: int):
    return (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts")
            - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
        )
    )


def pair_join_output(joined: DataFrame) -> DataFrame:
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "purchase_ts"
        ),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "click_ts"
        ),
    )


def q104_purchase_click_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return purchase_click_pairs(load_table(spark, sf_dir, "events"))


def purchase_click_pairs_outer(
    events: DataFrame, lookback_hours: int = PAIR_LOOKBACK_HOURS
) -> DataFrame:
    """q104's LEFT-OUTER twin: every purchase appears exactly once per
    qualifying click, and purchases with NO click in the lookback
    window appear once with NULL click_id/click_ts — the production
    attribution shape (unattributed conversions are data, not absence).
    Same shared sides/condition/projection as the inner form, so the
    streaming twin (:func:`aerovaldb_spark.streaming.
    stream_purchase_click_pairs_outer` — a watermarked left-outer
    stream-stream join, where unmatched purchases emit after watermark
    expiry) cannot drift from this batch shape."""
    p, c = pair_join_sides(events)
    return pair_join_output(
        p.join(c, pair_join_condition(lookback_hours), "left")
    )


def q107_purchase_click_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return purchase_click_pairs_outer(load_table(spark, sf_dir, "events"))


Q107_SQL = f"""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts < p.ts
 AND c.ts >= p.ts - INTERVAL {PAIR_LOOKBACK_HOURS} HOUR
"""


Q104_SQL = f"""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts < p.ts
 AND c.ts >= p.ts - INTERVAL {PAIR_LOOKBACK_HOURS} HOUR
"""


Q18_SQL = """
SELECT p.event_id, p.user_id,
  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
  strftime((SELECT max(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts),
           '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts
FROM events p
WHERE p.event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# q19: sessionization — a new session starts after a >30 min gap.
def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Assign a per-user session_id via the lag-gap-cumsum pattern."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def q19_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        sessionize(ev)
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q19_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM sessions GROUP BY user_id
"""


# --------------------------------------------------------------------------
# q20: tumbling time window (the batch twin of the streaming aggregation
# in aerovaldb_spark.streaming). F.window is the same operator Structured
# Streaming uses — identical semantics at 100 TB with a watermark.
def tumbling_window_stats(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def q20_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_stats(load_table(spark, sf_dir, "events"))


Q20_SQL = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q31: the built-in session_window operator (batch mode; identical
# semantics streaming with a watermark — see aerovaldb_spark.streaming).
# Oracle: classic lag-gap-cumsum sessionization. Boundary convention:
# session_window treats an event at exactly start+gap as a NEW session
# (window end is exclusive), hence >= in the oracle.
def q31_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import session_window_stats

    return session_window_stats(load_table(spark, sf_dir, "events"))


Q31_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# Approximate distinct counts (HyperLogLog++). The scale twin of q09's
# exact distinct: at 100 TB an exact COUNT(DISTINCT) shuffles every
# distinct value; HLL shuffles one ~kB sketch per partition and
# merges. RETIRED from the graded query surface in round 9 (it was
# q55, the surface's only rows-only entry — HLL sketch internals are
# engine-specific, so no DuckDB oracle can exist): its capability is
# fully hash-graded by the deterministic KMV siblings q106/q109, and
# a permanently-green rows-only slot spends a correctness-window check
# that can't go red. Kept as a library function; the accuracy bound
# against the exact answer stays asserted in tests/test_properties.py
# (test_approx_distinct_within_rsd).
def q55_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# q106: deterministic bottom-k (KMV) distinct sketch — q55's
# engine-exact sibling. HLL's sketch internals are engine-specific
# (q55 is rows-only graded by design); the KMV estimator is pure
# order-free arithmetic over md5-derived hashes, so the SAME estimate
# is replayable in any engine (full rows+schema+hash grade). The
# sketch state (the k smallest distinct hashes) is mergeable — the
# bottom-k of a union is the bottom-k of the concatenated bottom-k's —
# which is the one-sketch-per-partition promise at 100 TB; this
# DataFrame form expresses the merge as a two-level window (hash-split
# buckets bound every window partition at k rows regardless of how
# many distinct values one key has; uniform hashes keep the split
# balanced) after the same dedup shuffle an exact COUNT(DISTINCT)
# pays. What KMV buys over exact distinct is bounded OUTPUT per key
# (k hashes, resumable/mergeable across corpus increments), and over
# HLL it buys cross-engine exactness of the estimate itself.
KMV_K = 64
KMV_SPLIT = 16
_POW2_60 = float(1 << 60)  # hash60 values are uniform in [0, 2^60)


def kmv_estimate_py(kept: list[int], k: int) -> float:
    """Driver/executor-side Python twin of :func:`_kmv_estimate`'s
    arithmetic over a sorted kept-hash list — the ONE Python
    definition (streaming state stores can't run the Spark column
    form), shared by every stateful sketch closure so a convention
    change can't fork them. Empty kept -> 0.0 (no distinct values
    seen).

    >>> kmv_estimate_py([], 64)
    0.0
    >>> kmv_estimate_py([10, 20, 30], 64)
    3.0
    """
    from .._round import round6_py

    n_kept = len(kept)
    if n_kept == 0:
        return 0.0
    if n_kept < k:
        return float(n_kept)
    return round6_py((k - 1.0) * _POW2_60 / float(kept[-1]))


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = KMV_K,
    n_split: int = KMV_SPLIT,
) -> DataFrame:
    """(key, n_kept, kmv_estimate): per-key distinct-count estimate
    from the k smallest 60-bit hashes of ``value_col``.

    With fewer than k distinct values the kept-set size IS the exact
    count; otherwise the classic KMV estimator (k-1)/U_(k) applies,
    with U_(k) the k-th smallest hash normalized to [0, 1). Relative
    error ~ 1/sqrt(k-2). Both branches are deterministic IEEE double
    arithmetic on both engines (the (k-1)*2^60 numerator is exact in
    a double; the single divide is correctly rounded), rounded with
    the shared cross-engine :func:`round6` convention.

    NULL values are ignored, matching COUNT(DISTINCT) semantics —
    also a cross-engine necessity: a NULL hash would sort FIRST under
    Spark's window (NULLS FIRST on ASC) but LAST under DuckDB's
    ROW_NUMBER default, silently skewing the k-th hash.
    """
    return _kmv_estimate(
        kmv_kept_hashes(df, key_col, value_col, k, n_split), ["key"], k
    ).withColumnRenamed("key", key_col)


def kmv_kept_hashes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = KMV_K,
    n_split: int = KMV_SPLIT,
) -> DataFrame:
    """(key, h): the KMV sketch STATE — each key's k smallest distinct
    60-bit value hashes. Exposed separately because this is the
    mergeable object: the bottom-k of a union equals the bottom-k of
    the concatenated per-increment kept sets (tested), which is what
    lets sketches be computed per partition / per corpus increment and
    merged."""
    from .dedup import hash60

    hashes = df.select(
        F.col(key_col).alias("key"),
        hash60(F.col(value_col).cast("string")).alias("h"),
    ).filter(F.col("h").isNotNull()).distinct()
    # level 1: lossless bottom-k per (key, h % n_split) — the global
    # bottom-k survives any split, and no window partition ever holds
    # more than its bucket's distinct hashes
    w1 = Window.partitionBy(
        "key", F.pmod(F.col("h"), F.lit(n_split))
    ).orderBy("h")
    lvl1 = (
        hashes.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    # level 2: bottom-k of the <= n_split*k survivors per key
    w2 = Window.partitionBy("key").orderBy("h")
    return (
        lvl1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .select("key", "h")
    )


def _kmv_estimate(
    kept: DataFrame,
    group_cols: list[str],
    k: int,
    estimate_name: str = "kmv_estimate",
) -> DataFrame:
    """(group_cols..., n_kept, <estimate_name>) from a kept-hash frame
    — the ONE Spark-side definition of the estimator arithmetic (the
    SQL twin lives in Q106_SQL/Q109_SQL), shared by the per-key
    sketch and the pairwise union sketch so a convention change can't
    fork them."""
    from .._round import round6

    numer = F.lit((k - 1.0) * _POW2_60)
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("_kth"),
        )
        .select(
            *group_cols,
            "n_kept",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(round6(numer / F.col("_kth").cast("double")))
            .alias(estimate_name),
        )
    )


def kmv_overlap(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = KMV_K,
    n_split: int = KMV_SPLIT,
) -> DataFrame:
    """Pairwise sketch ALGEBRA over the KMV kept sets: for every
    unordered key pair, estimated distinct values of each side, of the
    UNION (bottom-k of the two kept sets — a pure sketch-state
    operation), the inclusion-exclusion INTERSECTION, and the Jaccard
    ratio. This is the 100 TB point of a mergeable sketch: the raw
    data is touched ONCE to build one sketch per key; every pairwise
    overlap question afterwards is answered from k-row kept sets
    (here: a tiny pairs × kept-hashes join, windows over <= 2k rows
    per pair — no second scan, no pairwise re-shuffle of values).
    Estimates are the same deterministic arithmetic as
    :func:`kmv_distinct` (exact below k, (k-1)/U_(k) above, round6),
    so the whole report is cross-engine hash-checkable. Negative
    inclusion-exclusion noise is clamped at 0 on both engines.
    """
    return kmv_overlap_from_kept(
        kmv_kept_hashes(df, key_col, value_col, k, n_split), k
    )


def kmv_overlap_from_kept(kept: DataFrame, k: int = KMV_K) -> DataFrame:
    """:func:`kmv_overlap`'s algebra stage over an already-built
    (key, h) kept-hash frame — the sketch STATE is the only input, so
    the same report is computable from a live streaming snapshot
    (:func:`aerovaldb_spark.streaming.kmv_live_overlap`) or a persisted
    sketch table without ever re-reading the raw data."""
    from .._round import round6
    from ._scope import scoped_persist

    # the kept frame feeds the estimate build plus BOTH union-sketch
    # joins, and est feeds both sides of the pair frame — persisted,
    # whatever produced the kept sets (scan + dedup shuffle + windows,
    # or a sketch-array explode) runs ONCE (making the "raw data is
    # touched once" promise true in the plan, not just the algebra)
    kept = scoped_persist(kept)
    est = scoped_persist(_kmv_estimate(kept, ["key"], k))
    pairs = (
        est.select(F.col("key").alias("type_a"), F.col("kmv_estimate").alias("users_a"))
        .join(
            est.select(
                F.col("key").alias("type_b"),
                F.col("kmv_estimate").alias("users_b"),
            ),
            F.col("type_a") < F.col("type_b"),
        )
    )
    # union sketch: bottom-k of the two kept sets (distinct absorbs
    # hashes present in both). Two hash EQUI-joins + union, not one
    # OR-of-equalities join — the OR condition can't hash-partition
    # and planned as a nested loop over pairs × kept
    pk = pairs.select("type_a", "type_b")
    uh = (
        pk.join(kept, F.col("key") == F.col("type_a"))
        .select("type_a", "type_b", "h")
        .unionAll(
            pk.join(kept, F.col("key") == F.col("type_b")).select(
                "type_a", "type_b", "h"
            )
        )
        .distinct()
    )
    uw = Window.partitionBy("type_a", "type_b").orderBy("h")
    uest = (
        _kmv_estimate(
            uh.withColumn("_rn", F.row_number().over(uw))
            .filter(F.col("_rn") <= k)
            .select("type_a", "type_b", "h"),
            ["type_a", "type_b"],
            k,
            estimate_name="union_users",
        )
        .drop("n_kept")
    )
    inter_raw = F.greatest(
        F.col("users_a") + F.col("users_b") - F.col("union_users"),
        F.lit(0.0),
    )
    return pairs.join(uest, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "users_a",
        "users_b",
        "union_users",
        round6(inter_raw).alias("intersect_users"),
        round6(inter_raw / F.col("union_users")).alias("jaccard"),
    )


def kmv_overlap_from_sketches(
    sketches: DataFrame, k: int = KMV_K
) -> DataFrame:
    """:func:`kmv_overlap` from MATERIALIZED sketches: one row per key
    with its kept set as an ``array<long>`` column (the streaming
    operator's state shape, or a persisted per-increment sketch
    table). Explodes the arrays back to the (key, h) kept frame and
    runs the identical algebra — the k used to BUILD the sketches must
    be passed so the exact-below-k branch agrees."""
    return kmv_overlap_from_kept(
        sketches.select("key", F.explode("kept").alias("h")), k
    )


class KMVSketchTable:
    """Persisted, incrementally-updatable KMV sketch store — the
    events-family analogue of the index families' ``add``: the raw
    event log is scanned ONCE per increment, and every distinct-count
    (q106 arithmetic) or pairwise-overlap (q109 algebra) question
    afterwards is answered from k-row sketches, never a replay.

    State is one row per key: (key, kept array<long>) — each key's k
    smallest distinct 60-bit value hashes, the mergeable object
    (:func:`kmv_kept_hashes`). ``update`` merges a NEW increment's
    sketch into the stored state as the bottom-k of the union, which
    by KMV mergeability is EXACTLY the sketch a full rebuild over all
    data would produce (bit-equal, tested across overlapping
    increments and the n_kept < k / = k boundary) — unlike the
    frozen-idf screen index there is no staleness of any kind.

    On disk: ``sketches/`` parquet + one-row ``meta/`` pinning (k,
    key_col, value_col) so a loaded table can't be updated with
    mismatched hash semantics. A disk ``update`` stages the merged
    table to a sibling directory and swaps it in with filesystem
    renames (write-then-rename; the old state is never read and
    overwritten in one job). The swap window is not transactional —
    a concurrent reader can catch the rename; serialize updates with
    readers at the caller (or update in memory and save elsewhere).
    """

    def __init__(
        self, sketches: DataFrame, k: int, key_col: str, value_col: str
    ) -> None:
        self.sketches = sketches
        self.k = k
        self.key_col = key_col
        self.value_col = value_col

    @staticmethod
    def build(
        events: DataFrame,
        key_col: str,
        value_col: str,
        k: int = KMV_K,
    ) -> "KMVSketchTable":
        kept = kmv_kept_hashes(events, key_col, value_col, k)
        return KMVSketchTable(
            kept.groupBy("key").agg(
                F.sort_array(F.collect_list("h")).alias("kept")
            ),
            k,
            key_col,
            value_col,
        )

    def update(
        self, events: DataFrame, path: str | None = None
    ) -> "KMVSketchTable":
        """Merge a new increment: sketch ONLY ``events`` (the stored
        state is never re-derived from raw data), union the kept sets
        per key, keep the bottom-k. Exact: equals ``build`` over the
        concatenated data bit-for-bit. With ``path`` (the directory
        this table was saved to/loaded from), the merged table is
        staged and swapped in via renames and the returned table reads
        from disk; without it the merge is in-memory."""
        new_kept = kmv_kept_hashes(
            events, self.key_col, self.value_col, self.k
        )
        all_h = (
            self.sketches.select("key", F.explode("kept").alias("h"))
            .unionAll(new_kept)
            .distinct()
        )
        w = Window.partitionBy("key").orderBy("h")
        merged = (
            all_h.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= self.k)
            .groupBy("key")
            .agg(F.sort_array(F.collect_list("h")).alias("kept"))
        )
        out = KMVSketchTable(merged, self.k, self.key_col, self.value_col)
        if path is None:
            return out
        import os as _os

        from ._staging import resolve_live, swap_in

        spark = events.sparkSession
        live = _os.path.join(path, "sketches")
        if not _os.path.isdir(resolve_live(live)):
            raise ValueError(
                f"no saved sketch table under {path!r} — save() there "
                "first (a disk update swaps the existing state)"
            )
        staging = _os.path.join(path, "sketches.staging")
        # the staging write is the job that READS the old live files;
        # the swap happens only after it succeeds (crash recovery in
        # _staging — resolve_live/swap_in)
        merged.write.mode("overwrite").parquet(staging)
        swap_in(live, staging)
        return KMVSketchTable.load(spark, path)

    def save(self, path: str) -> None:
        import os as _os

        from ._staging import clear_stale

        spark = self.sketches.sparkSession
        # stale sketches.old must not outlive a re-save (see
        # _staging.clear_stale)
        clear_stale(_os.path.join(path, "sketches"))
        self.sketches.write.mode("overwrite").parquet(
            _os.path.join(path, "sketches")
        )
        spark.createDataFrame(
            [(
                self.k,
                self.key_col,
                self.value_col,
                self.sketches.schema["key"].dataType.simpleString(),
            )],
            "k int, key_col string, value_col string, key_type string",
        ).write.mode("overwrite").parquet(_os.path.join(path, "meta"))

    @staticmethod
    def load(spark: SparkSession, path: str) -> "KMVSketchTable":
        import os as _os

        meta = spark.read.parquet(_os.path.join(path, "meta")).collect()[0]
        # crash-recovery fallback (see _staging.resolve_live): a crash
        # inside update()'s rename window leaves the consistent
        # pre-update state in sketches.old — reading it loses only the
        # interrupted increment (re-run update to re-apply it)
        from ._staging import resolve_live

        live = resolve_live(_os.path.join(path, "sketches"))
        # explicit schema (key type pinned in meta): an empty event
        # log yields an empty sketch table with no part files to infer
        # from (the screen-index lesson)
        return KMVSketchTable(
            spark.read.schema(
                f"key {meta['key_type']}, kept array<bigint>"
            ).parquet(live),
            int(meta["k"]),
            meta["key_col"],
            meta["value_col"],
        )

    def distinct(self) -> DataFrame:
        """(key_col, n_kept, kmv_estimate): q106's estimator over the
        stored sketches — exact below k, (k-1)/U_(k) above, round6."""
        return _kmv_estimate(
            self.sketches.select("key", F.explode("kept").alias("h")),
            ["key"],
            self.k,
        ).withColumnRenamed("key", self.key_col)

    def overlap(self) -> DataFrame:
        """q109's pairwise union/intersect/Jaccard report over the
        stored sketches (:func:`kmv_overlap_from_sketches`)."""
        return kmv_overlap_from_sketches(self.sketches, self.k)


def q109_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return kmv_overlap(events, "event_type", "user_id")


def kmv_overlap_sql(
    table: str = "events",
    key_col: str = "event_type",
    value_col: str = "CAST(user_id AS VARCHAR)",
    names: tuple[str, ...] = (
        "type_a", "type_b", "users_a", "users_b",
        "union_users", "intersect_users",
    ),
    extra_select: str = "",
    prelude: str = "",
) -> str:
    """The q109 pairwise-KMV-overlap SQL, templated on (table, key,
    value expression, output names) so every overlap-shaped graded
    query (q109 over events, q123 over documents) replays the ONE
    algebra — a convention change cannot fork the oracles.
    ``extra_select`` appends derived columns (e.g. q123's containment
    ratios) with ``p``/``u`` in scope and ``inter_raw`` available as
    the unrounded clamped intersection expression; ``prelude``
    prepends CTEs so ``table`` can be a derived relation (q126's
    unnested shingles) — it is spliced RAW between ``WITH`` and the
    first internal CTE, so it MUST end with "), " (name AS (...)
    comma space); anything else yields a SQL syntax error at oracle
    time."""
    ka, kb, ea, eb, un, inter = names
    numer = f"({KMV_K}.0 - 1.0) * {_POW2_60:.1f}"
    inter_raw = f"greatest(p.{ea} + p.{eb} - u.{un}, 0.0)"
    extra = extra_select.replace("inter_raw", inter_raw)
    return f"""
WITH {prelude}h AS (
  SELECT DISTINCT {key_col} AS key,
    CAST('0x' || substring(md5({value_col}), 1, 15) AS BIGINT) AS h
  FROM {table} WHERE {value_col} IS NOT NULL
), ranked AS (
  SELECT key, h,
    ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) AS rn
  FROM h
), kept AS (
  SELECT key, h FROM ranked WHERE rn <= {KMV_K}
), est AS (
  SELECT key, COUNT(*) AS n_kept,
    CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
         ELSE ROUND({numer} / CAST(MAX(h) AS DOUBLE), 6)
    END AS est
  FROM kept GROUP BY key
), pairs AS (
  SELECT a.key AS {ka}, a.est AS {ea},
         b.key AS {kb}, b.est AS {eb}
  FROM est a JOIN est b ON a.key < b.key
), uh AS (
  SELECT DISTINCT p.{ka}, p.{kb}, k.h
  FROM pairs p JOIN kept k
    ON k.key = p.{ka} OR k.key = p.{kb}
), uranked AS (
  SELECT {ka}, {kb}, h,
    ROW_NUMBER() OVER (PARTITION BY {ka}, {kb} ORDER BY h) AS rn
  FROM uh
), uest AS (
  SELECT {ka}, {kb},
    CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
         ELSE ROUND({numer} / CAST(MAX(h) AS DOUBLE), 6)
    END AS {un}
  FROM uranked WHERE rn <= {KMV_K} GROUP BY {ka}, {kb}
)
SELECT p.{ka}, p.{kb}, p.{ea}, p.{eb}, u.{un},
  ROUND({inter_raw}, 6) AS {inter},
  ROUND({inter_raw} / u.{un}, 6) AS jaccard{extra}
FROM pairs p JOIN uest u USING ({ka}, {kb})
"""


Q109_SQL = kmv_overlap_sql()


def q106_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return kmv_distinct(events, "event_type", "user_id").select(
        "event_type",
        "n_kept",
        F.col("kmv_estimate").alias("kmv_users"),
    )


Q106_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
), ranked AS (
  SELECT event_type, h,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
)
SELECT event_type, COUNT(*) AS n_kept,
  CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
       ELSE ROUND(({KMV_K}.0 - 1.0) * {_POW2_60:.1f} / CAST(MAX(h) AS DOUBLE), 6)
  END AS kmv_users
FROM ranked WHERE rn <= {KMV_K}
GROUP BY event_type
"""


def q113_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grades the :class:`KMVSketchTable` MERGE path cross-engine:
    build a sketch table on the even-event_id half of the log, update
    it with the odd half, report per-key estimates. By mergeability
    this equals q106 over the whole log — but the ORACLE replays the
    TWO-STAGE form literally (bottom-k per half, distinct union,
    bottom-k again, estimate), so a merge bug cannot hide behind the
    mergeability identity: both engines must compute the staged
    semantics and agree on every hash."""
    events = load_table(spark, sf_dir, "events")
    t = KMVSketchTable.build(
        events.where("event_id % 2 = 0"), "event_type", "user_id"
    )
    return (
        t.update(events.where("event_id % 2 = 1"))
        .distinct()
        .select(
            "event_type",
            "n_kept",
            F.col("kmv_estimate").alias("kmv_users"),
        )
    )


Q113_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type, event_id % 2 AS half,
    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
), half_kept AS (
  -- stage 1: each increment's own bottom-k sketch
  SELECT event_type, h FROM (
    SELECT event_type, half, h,
      ROW_NUMBER() OVER (PARTITION BY event_type, half ORDER BY h) AS rn
    FROM h
  ) WHERE rn <= {KMV_K}
), merged AS (
  -- stage 2: the update() merge — distinct union of kept sets,
  -- bottom-k of the result
  SELECT DISTINCT event_type, h FROM half_kept
), ranked AS (
  SELECT event_type, h,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM merged
)
SELECT event_type, COUNT(*) AS n_kept,
  CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
       ELSE ROUND(({KMV_K}.0 - 1.0) * {_POW2_60:.1f} / CAST(MAX(h) AS DOUBLE), 6)
  END AS kmv_users
FROM ranked WHERE rn <= {KMV_K}
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q71: cohort retention — users grouped by first-seen month, distinct
# active users per (cohort month, activity month). Two aggregations:
# per-user first event (one shuffle on user_id), then the cohort
# matrix (one shuffle on the month pair). The cohort table is narrow
# (one row per user) so its join back to activity broadcasts at small
# scale and shuffles on user_id at large — both correct.
def q71_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_format(F.date_trunc("month", F.min("ts")), "yyyy-MM").alias(
            "cohort_month"
        )
    )
    activity = ev.select(
        "user_id",
        F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM").alias(
            "active_month"
        ),
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_month", "active_month")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


Q71_SQL = """
WITH cohort AS (
  SELECT user_id, strftime(date_trunc('month', MIN(ts)), '%Y-%m') AS cohort_month
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, strftime(date_trunc('month', ts), '%Y-%m') AS active_month
  FROM events
)
SELECT cohort_month, active_month, COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q72: sessionized funnel — per 30-minute-gap session, how deep did
# the user get through view → click → purchase? Depth compares the
# conditional MIN timestamp per stage inside the session (<= because
# simultaneous events count as progression). Reuses the q19
# sessionizer, then one aggregation per session and one tiny one per
# depth: the funnel is two shuffles over the events table total.
def q72_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = sessionize(load_table(spark, sf_dir, "events"))
    per_session = ev.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    depth = (
        F.when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & F.col("t_buy").isNotNull()
            & (F.col("t_view") <= F.col("t_click"))
            & (F.col("t_click") <= F.col("t_buy")),
            3,
        )
        .when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_view") <= F.col("t_click")),
            2,
        )
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        per_session.withColumn("funnel_depth", depth)
        .groupBy("funnel_depth")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


Q72_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_type,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM sessions GROUP BY user_id, session_id
)
SELECT CASE
    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_buy IS NOT NULL
         AND t_view <= t_click AND t_click <= t_buy THEN 3
    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_view <= t_click THEN 2
    WHEN t_view IS NOT NULL THEN 1
    ELSE 0 END AS funnel_depth,
  COUNT(*) AS n_sessions
FROM per_session
GROUP BY 1
"""


QUERIES = {
    "q18_asof_purchase_click": q18_asof_purchase_click,
    "q19_sessionize": q19_sessionize,
    "q20_tumbling_window": q20_tumbling_window,
    "q31_session_window": q31_session_window,
    "q71_cohort_retention": q71_cohort_retention,
    "q72_session_funnel": q72_session_funnel,
    "q104_purchase_click_pairs": q104_purchase_click_pairs,
    "q106_kmv_distinct": q106_kmv_distinct,
    "q107_purchase_click_outer": q107_purchase_click_outer,
    "q109_kmv_overlap": q109_kmv_overlap,
    "q113_kmv_incremental": q113_kmv_incremental,
}

ORACLE = {
    "q18_asof_purchase_click": Q18_SQL,
    "q19_sessionize": Q19_SQL,
    "q20_tumbling_window": Q20_SQL,
    "q31_session_window": Q31_SQL,
    "q71_cohort_retention": Q71_SQL,
    "q72_session_funnel": Q72_SQL,
    "q104_purchase_click_pairs": Q104_SQL,
    "q106_kmv_distinct": Q106_SQL,
    "q107_purchase_click_outer": Q107_SQL,
    "q109_kmv_overlap": Q109_SQL,
    "q113_kmv_incremental": Q113_SQL,
}
