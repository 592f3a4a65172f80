"""Register the relational harness tables as Spark SQL views.

The driver provides a deterministic TPC-H-ish star schema plus
``events``/``documents``/``embeddings`` at /root/testdata/sf*/ (one
parquet per table, see TESTDATA.md). The engine exposes them through
``spark.sql`` so generic relational queries ride on Catalyst —
reference parity for "expose a queryable catalog" (SURVEY.md §2.3, §7.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor: the
# TPC-H spec keeps region/nation constant-size and supplier/part growing
# far slower than the fact tables.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects. Footer-only pyarrow inspection — no data read."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:  # noqa: BLE001 — non-local or odd layout: let Spark try
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


# Optional in-memory table cache: the harness parquet is one file with
# ONE row group per table, so a bare scan is single-threaded no matter
# how many cores exist. cache_tables() loads each table once,
# repartitions to the session parallelism, and persists — every query
# then runs against evenly-spread in-memory partitions. (At real scale
# the table would already be many files/row-groups and this is moot.)
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def cache_tables(
    spark: SparkSession, sf_dir: str, parallelism: int | None = None
) -> None:
    parallelism = parallelism or spark.sparkContext.defaultParallelism
    staged: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        # Fact tables and the CPU-heavy text/vector tables get full
        # parallelism (documents fans out ~100 shingle-hashes per row —
        # its *work* per partition is large even though its row count is
        # small); true dimensions stay narrow to avoid empty tasks.
        wide = ("lineitem", "orders", "events", "documents", "embeddings")
        n = parallelism if name in wide else max(parallelism // 4, 2)
        staged[name] = df.repartition(n).persist()
    # Materialize all tables CONCURRENTLY: each source file is one
    # row group (one scan task), so sequential counts leave the
    # cluster idle; overlapping the jobs bounds warm-up by the
    # largest table instead of the sum.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(len(staged), 1)) as pool:
        list(pool.map(lambda df: df.count(), staged.values()))
    for name, df in staged.items():
        _TABLE_CACHE[(sf_dir, name)] = df


def clear_table_cache() -> None:
    for df in _TABLE_CACHE.values():
        df.unpersist()
    _TABLE_CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cached = _TABLE_CACHE.get((sf_dir, name))
    if cached is not None:
        return cached
    return _load_table_uncached(spark, sf_dir, name)


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one harness table and normalize every timestamp column to
    plain ``TIMESTAMP`` (session-tz, pinned UTC), whatever unit/typing
    the parquet writer chose:

    - TIMESTAMP(NANOS): Spark's reader rejects it; read via the legacy
      long conf and truncate to micros (same semantics as DuckDB).
    - TIMESTAMP(MICROS) without tz: Spark reads TIMESTAMP_NTZ, which
      half the temporal function surface (``unix_micros``, interval
      arithmetic against TIMESTAMP, …) rejects. Under a UTC session tz
      the cast is a pure relabel — identical wall-clock values, and
      identical to DuckDB's reading of the same file.

    Downstream operators can therefore assume ``TimestampType``
    unconditionally; the unit lives only here."""
    # Deterministic timestamp semantics even on a caller-built session
    # (the verify driver constructs its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    from pyspark.sql.types import TimestampNTZType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every harness table and register a temp view per table.

    Returns the DataFrames keyed by table name. Views mean the whole
    surface is also reachable via ``spark.sql(...)``.
    """
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
