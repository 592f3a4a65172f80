"""Scale techniques: salted joins for skew, bucketed co-located joins.

These are the knobs the 100 TB deployment turns when AQE alone isn't
enough (SURVEY.md §4; brief: "skewed keys → salting or AQE skew-join",
"bucketing for co-located joins"). Both are exercised by
tests/test_scale.py with plan-level assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key of ``left`` over
    ``n_salts`` shuffle partitions; replicate ``right`` across salts.

    Use when one join key dominates (a hot user, a null-heavy key) and
    a single reducer would own the whole key. Costs n_salts× the right
    side's shuffle volume — use for dimension-sized right sides, or
    after isolating the hot keys.
    """
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_right = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = salted_left.join(salted_right, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table: co-partitioned on
    ``bucket_col`` so joins/aggregations on that key skip the shuffle
    entirely (each bucket pair joins locally)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two equally-bucketed tables on their bucket key — the
    co-located join: zero Exchange operators in the physical plan."""
    return spark.table(left_table).join(spark.table(right_table), on)
