"""Relational operator library over the harness star schema.

Reference parity note: metno/aerovaldb implements *no* relational
algebra (SURVEY.md §2.9 — no joins, aggregations, windows, sorts, or
set ops; see /root/reference/src/aerovaldb/aerovaldb.py). Its data
processing surface is point reads + catalog scans. This module supplies
the full relational capability Spark-first, as SURVEY.md §7.1 dictates:
every query is a declarative DataFrame plan so Catalyst handles
predicate pushdown, partition/column pruning, join strategy selection,
and whole-stage codegen. Dimension tables are explicitly broadcast.

Oracle-parity convention (DuckDB value-hash must match bit-for-bit):
- All money/quantity columns hold exact 2-decimal values, so sums are
  computed in DECIMAL(18,2) (exact, order-independent) and cast to
  DOUBLE at the end — bit-identical in Spark and DuckDB.
- Averages: exact decimal sum → double → divide by exact count →
  round(6). Double division on identical inputs is IEEE-deterministic.
- Timestamps are formatted to strings so timezone conventions can't
  differ between engines.
- Every computed column is aliased identically in the DataFrame code
  and in the oracle SQL.
- ROUND(computed double, 6): Spark's F.round and DuckDB's ROUND
  disagree ~1/10^5 rows on near-half edges (DuckDB rounds the scaled
  product, Spark the exact value). Use aerovaldb_spark/_round.round6 —
  Spark-side scaled rounding, bit-validated against DuckDB both
  signs — for any 6dp round of a computed ratio/log/score an oracle
  mirrors. Values already exact at 6dp (decimal-summed averages like
  the convention above) agree under either form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .._round import round6
from ._scope import scoped_persist

MONEY = "decimal(18,2)"


def _money(col: str):
    return F.col(col).cast(MONEY)


def _dsum(col, alias: str):
    """Exact decimal sum surfaced as a double."""
    return F.sum(col).cast("double").alias(alias)


def _davg(col, alias: str):
    """Deterministic average: exact decimal sum → double / count, round(6)."""
    return round6(F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)


def _revenue():
    # Column exprs need a live SparkContext, so build lazily per query.
    return _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))


_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


# --------------------------------------------------------------------------
# q01: full-scan aggregation (TPC-H Q1 shape). Map-side partial agg; the
# shipdate predicate is pushed into the parquet scan.
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_money("l_quantity"), "sum_qty"),
            _dsum(_money("l_extendedprice"), "sum_base_price"),
            _dsum(_revenue(), "sum_disc_price"),
            _dsum(
                _revenue() * (F.lit(1) + _money("l_tax")),
                "sum_charge",
            ),
            _davg(_money("l_quantity"), "avg_qty"),
            _davg(_money("l_extendedprice"), "avg_price"),
            _davg(_money("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({_REVENUE_SQL} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q02: 3-way join + top-k (TPC-H Q3 shape). customer is broadcast; the
# orders⋈lineitem join shuffles on the key both sides already need.
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(_revenue(), "revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q02_SQL = f"""
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority,
  CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-03-15'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q03: star join with broadcast dimensions (TPC-H Q5 shape): revenue per
# nation. nation+region are tiny and broadcast; no shuffle for them.
def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(_dsum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


Q03_SQL = f"""
SELECT r_name, n_name,
  CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# q04: highly selective scan-agg (TPC-H Q6 shape) — every predicate is
# pushed down to the parquet reader (check PushedFilters in explain).
def q04_selective_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(_money("l_extendedprice") * _money("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q04_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q05: left-semi join (TPC-H Q4 shape): orders having at least one late
# line item, counted per priority.
def q05_order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q05_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q06: anti join: customers that never placed an order, per segment.
def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(_money("c_acctbal"), "total_acctbal"),
        )
    )


Q06_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q07: window function — top-3 orders per customer by price. Deterministic
# tiebreak on o_orderkey so the row_number is stable across engines.
def q07_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", "o_totalprice")
    )


Q07_SQL = """
SELECT o_custkey, o_orderkey, rn, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# q08: running total per customer (cumulative window frame).
def q08_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_money("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


Q08_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


# --------------------------------------------------------------------------
# q64: RANGE-interval window frame — trailing 7-day revenue per
# customer. Distinct from q08's ROWS frame: RANGE bounds are over the
# ORDER BY *values* (all date ties included; the frame width is time,
# not row count). One shuffle on o_custkey; the frame is evaluated
# with a sliding aggregate inside the sorted partition — no
# self-join/range-join explosion, which is what makes a time-bounded
# rolling metric viable on a 100 TB fact table.
def q64_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(_money("o_totalprice")).over(w).cast("double").alias(
            "trailing_7d_spend"
        ),
    )


Q64_SQL = """
SELECT o_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate
    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS trailing_7d_spend
FROM orders
"""


# --------------------------------------------------------------------------
# q67: market share (TPC-H Q8 shape) — per order year, the fraction of
# ASIA-market revenue supplied from NATION_1. Six-table join: every
# dimension (part, supplier, customer, both nation copies, region)
# broadcasts; the fact table shuffles once for the year aggregation;
# the share is a conditional DECIMAL ratio so both engines agree
# exactly after round(6).
def q67_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    joined = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("cn_region") == region.r_regionkey)
    )
    rev = _revenue()
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            round6(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
                        F.lit(0).cast(MONEY)
                    )
                ).cast("double")
                / F.sum(rev).cast("double")).alias("mkt_share"),
            _dsum(rev, "total_revenue"),
        )
    )


Q67_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
  ROUND(
    CAST(SUM(CASE WHEN sn.n_name = 'NATION_1' THEN {_REVENUE_SQL}
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM({_REVENUE_SQL}) AS DOUBLE), 6) AS mkt_share,
  CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q68: group-by with a HAVING bound from a global scalar subquery
# (TPC-H Q11 shape) — parts whose NATION_1-supplied revenue exceeds
# 0.1% of the nation's total. The scalar total is a 1-row aggregate
# cross-joined in (broadcast of one row); both aggregations reuse the
# same filtered join, and every sum is DECIMAL-exact.
def q68_top_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    suppliers_n1 = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    base = li.join(F.broadcast(suppliers_n1), li.l_suppkey == F.col("s_suppkey"))
    # persisted: the per-part aggregate feeds BOTH the output and the
    # global total — without it the fact-table join runs twice
    per_part = scoped_persist(base.groupBy("l_partkey").agg(
        F.sum(_revenue()).alias("_val")
    ))
    total = per_part.agg(F.sum("_val").alias("_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_val").cast("double") > F.col("_total").cast("double") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_val").cast("double").alias("part_value"),
        )
    )


Q68_SQL = f"""
WITH base AS (
  SELECT l_partkey, {_REVENUE_SQL} AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
), per_part AS (
  SELECT l_partkey, SUM(rev) AS val FROM base GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) FROM per_part) * 0.001
"""


# --------------------------------------------------------------------------
# q69: promo revenue ratio (TPC-H Q14 shape) — one month's revenue
# fraction from PROMO parts. Single conditional aggregation over a
# date-pruned scan with a broadcast part join.
def q69_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _revenue()
    joined = li.filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    ).join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        round6(
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast(MONEY)
                )
            ).cast("double")
            / F.sum(rev).cast("double")).alias("promo_pct"),
        _dsum(rev, "total_revenue"),
    )


Q69_SQL = f"""
SELECT
  ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL}
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM({_REVENUE_SQL}) AS DOUBLE), 6) AS promo_pct,
  CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= '1997-03-01' AND l_shipdate < '1997-04-01'
"""


# --------------------------------------------------------------------------
# q70: NOT EXISTS + global-scalar threshold (TPC-H Q22 shape) —
# wealthy-but-inactive customers per market segment: above the average
# positive balance AND no orders since 2000-01-01 (every customer in
# this corpus has SOME order, so plain "no orders" is vacuously empty —
# the date predicate both makes the result non-trivial and pushes down
# to the orders scan, shrinking the anti-join's build side). The scalar
# threshold is an exact DECIMAL sum / count broadcast as one row; the
# NOT EXISTS is a left-anti join (no correlated per-row subquery — at
# scale that would be a nested loop).
Q70_CUTOFF = "2000-01-01"


def q70_inactive_wealthy(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = _money("c_acctbal")
    threshold = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("_thr")
    )
    recent = orders.filter(F.col("o_orderdate") >= Q70_CUTOFF)
    return (
        customer.crossJoin(F.broadcast(threshold))
        .filter(bal.cast("double") > F.col("_thr"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(bal, "total_balance"),
        )
    )


Q70_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer c
WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) >
      (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= '{Q70_CUTOFF}')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q09: exact distinct aggregation.
def q09_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q09_SQL = """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q10: grouping sets / rollup.
def q10_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dsum(_money("l_quantity"), "sum_qty"),
    )


Q10_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q11: set operation (EXCEPT DISTINCT): well-funded customers that never
# placed a high-value order.
def q11_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return rich.exceptAll(big.distinct()).distinct()


Q11_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""


# --------------------------------------------------------------------------
# q12: CASE-expression bucketing.
def q12_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        cust.withColumn("balance_bucket", bucket)
        .groupBy("balance_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(_money("c_acctbal"), "total_balance"),
        )
    )


Q12_SQL = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS balance_bucket,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q13: date bucketing on the events table (month as string → no tz drift).
def q13_monthly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(_money("value"), "total_value"),
            _davg(_money("value"), "avg_value"),
        )
    )


Q13_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q14: string functions + filter pushdown on part.
def q14_part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").like("%a%"))
        .withColumn("brand_upper", F.upper("p_brand"))
        .withColumn("type_prefix", F.substring("p_type", 1, 3))
        .groupBy("brand_upper", "type_prefix")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _davg(_money("p_retailprice"), "avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


Q14_SQL = """
SELECT UPPER(p_brand) AS brand_upper, SUBSTRING(p_type, 1, 3) AS type_prefix,
  COUNT(*) AS n_parts,
  ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  MAX(p_size) AS max_size
FROM part
WHERE p_name LIKE '%a%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q15: semi-structured access — extract a field from the JSON props column.
# Mirrors the reference's sub-document filtering (utils/filter.py) done
# relationally: get_json_object is the Spark analog of its JSON path reads.
def q15_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "k", F.get_json_object("props", "$.k").cast("bigint")
        )
        .withColumn("k_mod", F.col("k") % 10)
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(_money("value"), "total_value"),
        )
    )


Q15_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q16: exact-key point read — THE reference access pattern (every
# get_<asset> in aerovaldb.py:126-1398 is a key-equality lookup). On a
# partitioned/sorted table Catalyst turns this into partition pruning +
# min-max skipping.
def q16_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 997).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
        "o_orderpriority",
    )


Q16_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
  o_orderpriority
FROM orders WHERE o_orderkey = 997
"""


# --------------------------------------------------------------------------
# q17: top customers by lifetime spend (join + agg + top-k).
def q17_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            _dsum(_money("o_totalprice"), "lifetime_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment", "lifetime_spend", "n_orders")
        .orderBy(F.col("lifetime_spend").desc(), F.col("c_custkey"))
        .limit(25)
    )


Q17_SQL = """
SELECT c_custkey, c_name, c_mktsegment,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_spend,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, c_mktsegment
ORDER BY lifetime_spend DESC, c_custkey
LIMIT 25
"""


# --------------------------------------------------------------------------
# q86: "suppliers who kept orders waiting" — the TPC-H Q21 shape
# (inner join + correlated EXISTS + correlated NOT-EXISTS), adapted to
# this schema's columns: a line is LATE if it shipped more than 60
# days after its order date; a supplier kept a finished order waiting
# if it has a late line on that order, ANOTHER supplier also supplied
# the order (EXISTS), and NO other supplier's line on it was late
# (NOT EXISTS) — sole blame. Scale shape: the late-line set is
# computed once and persisted (it feeds the probe side AND the
# NOT-EXISTS side), both correlated predicates become shuffle
# semi/anti joins on l_orderkey with the suppkey-inequality as a join
# residual, and the tiny supplier dim broadcasts at the end.
Q86_LATE_DAYS = 60


def q86_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = scoped_persist(
        lineitem.join(
            finished, lineitem.l_orderkey == finished.o_orderkey
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q86_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    blamed = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        blamed.join(
            F.broadcast(supplier), blamed.l_suppkey == supplier.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


Q86_SQL = f"""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL {Q86_LATE_DAYS} DAY
), blamed AS (
  SELECT l1.l_orderkey, l1.l_suppkey
  FROM late l1
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
)
SELECT s.s_name, COUNT(*) AS numwait
FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# q87: customer order-count distribution — the TPC-H Q13 shape (LEFT
# OUTER join + double aggregation): orders-per-customer INCLUDING the
# zero-order customers the inner join would drop, then the histogram
# of those counts. Scale shape: one outer shuffle join on custkey, a
# partial-combined count per customer, then a second (tiny) agg over
# at most max-orders-per-customer distinct values.
def q87_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q87_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# q88: small-quantity-order revenue — the TPC-H Q17 shape (correlated
# per-group scalar subquery): lines of one brand's parts whose
# quantity is below 20% of that part's average quantity. Spark-first
# the correlation becomes a pre-aggregated per-part threshold frame
# joined back to the fact table; the brand filter prunes the part dim
# BEFORE both the threshold agg and the probe join, so only that
# brand's lines ever aggregate or join (the thresholds frame is tiny —
# ~|parts in brand| rows — and broadcasts). Threshold follows the
# DECIMAL-sum convention: exact sum → double ÷ count × 0.2 → round 6,
# identical in the oracle, so the float comparison can't diverge.
Q88_BRAND = "Brand#1"


def q88_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == Q88_BRAND).select(
        "p_partkey"
    )
    # project BEFORE the persist: the cached frame (and the parquet
    # scan) must carry only the three columns the query touches, not
    # the full lineitem row (plan_report showed an 11-column scan
    # without this)
    brand_lines = scoped_persist(
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
            F.broadcast(brand_parts),
            F.col("l_partkey") == brand_parts.p_partkey,
            "left_semi",
        )
    )
    thresholds = brand_lines.groupBy("l_partkey").agg(
        round6(
            F.sum(_money("l_quantity")).cast("double")
            / F.count(F.lit(1))
            * 0.2).alias("qty_threshold")
    )
    return (
        brand_lines.join(F.broadcast(thresholds), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            round6(
                F.sum(_money("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
        )
    )


Q88_SQL = f"""
WITH brand_lines AS (
  SELECT l.* FROM lineitem l
  WHERE EXISTS (SELECT 1 FROM part p
                WHERE p.p_partkey = l.l_partkey AND p.p_brand = '{Q88_BRAND}')
), th AS (
  SELECT l_partkey,
    ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 0.2, 6) AS qty_threshold
  FROM brand_lines GROUP BY l_partkey
)
SELECT COUNT(*) AS n_lines,
  ROUND(CAST(SUM(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM brand_lines b JOIN th ON th.l_partkey = b.l_partkey
WHERE b.l_quantity < th.qty_threshold
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_top_revenue_orders": q02_top_revenue_orders,
    "q03_revenue_by_nation": q03_revenue_by_nation,
    "q04_selective_filter_agg": q04_selective_filter_agg,
    "q05_order_priority_semijoin": q05_order_priority_semijoin,
    "q06_customers_without_orders": q06_customers_without_orders,
    "q07_window_topk_per_customer": q07_window_topk_per_customer,
    "q08_running_total": q08_running_total,
    "q09_distinct_counts": q09_distinct_counts,
    "q10_rollup_agg": q10_rollup_agg,
    "q11_set_except": q11_set_except,
    "q12_case_buckets": q12_case_buckets,
    "q13_monthly_event_stats": q13_monthly_event_stats,
    "q14_part_type_stats": q14_part_type_stats,
    "q15_json_extract_agg": q15_json_extract_agg,
    "q16_point_read": q16_point_read,
    "q17_top_customers": q17_top_customers,
    "q64_trailing_revenue": q64_trailing_revenue,
    "q67_market_share": q67_market_share,
    "q68_top_part_values": q68_top_part_values,
    "q69_promo_revenue": q69_promo_revenue,
    "q70_inactive_wealthy": q70_inactive_wealthy,
    "q86_waiting_suppliers": q86_waiting_suppliers,
    "q87_custdist": q87_custdist,
    "q88_small_qty_revenue": q88_small_qty_revenue,
}

ORACLE = {
    "q86_waiting_suppliers": Q86_SQL,
    "q87_custdist": Q87_SQL,
    "q88_small_qty_revenue": Q88_SQL,
    "q01_pricing_summary": Q01_SQL,
    "q02_top_revenue_orders": Q02_SQL,
    "q03_revenue_by_nation": Q03_SQL,
    "q04_selective_filter_agg": Q04_SQL,
    "q05_order_priority_semijoin": Q05_SQL,
    "q06_customers_without_orders": Q06_SQL,
    "q07_window_topk_per_customer": Q07_SQL,
    "q08_running_total": Q08_SQL,
    "q09_distinct_counts": Q09_SQL,
    "q10_rollup_agg": Q10_SQL,
    "q11_set_except": Q11_SQL,
    "q12_case_buckets": Q12_SQL,
    "q13_monthly_event_stats": Q13_SQL,
    "q14_part_type_stats": Q14_SQL,
    "q15_json_extract_agg": Q15_SQL,
    "q16_point_read": Q16_SQL,
    "q17_top_customers": Q17_SQL,
    "q64_trailing_revenue": Q64_SQL,
    "q67_market_share": Q67_SQL,
    "q68_top_part_values": Q68_SQL,
    "q69_promo_revenue": Q69_SQL,
    "q70_inactive_wealthy": Q70_SQL,
}
