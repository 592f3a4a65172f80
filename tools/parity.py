"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a scale factor and
compares against ``oracle_sql()`` via DuckDB: row count, sorted column
names, an order-insensitive value comparison (exact on everything,
including doubles — our parity convention is bit-exactness), AND a
per-column type-signature comparison (the driver's value hash encodes
serialization types, so DuckDB HUGEINT vs Spark BIGINT fails there
even when Python values compare equal — round 1 lost 8 queries to
exactly that).

Usage: python tools/parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import re
import sys
import time

import duckdb


def _canon_arrow_type(t) -> str:
    """Canonical signature of a DuckDB-arrow column type."""
    import pyarrow as pa

    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_canon_arrow_type(t.value_type)}>"
    if pa.types.is_integer(t):
        # The driver's value hash passes through Python ints, so signed
        # int WIDTH doesn't matter (q22 was green with int32-vs-int64 in
        # round 1); int-vs-float/decimal/hugeint does.
        return "int"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_date(t):
        return "date"
    return str(t)  # bool, ...


_SPARK_CANON = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float64", "float": "float32",
    "boolean": "bool", "date": "date",
}


def _canon_spark_type(dt) -> str:
    s = dt.simpleString()
    if s in _SPARK_CANON:
        return _SPARK_CANON[s]
    m = re.match(r"array<(.*)>$", s)
    if m:
        inner = _SPARK_CANON.get(m.group(1), m.group(1))
        return f"array<{inner}>"
    return s  # string, timestamp, decimal(p,s), binary


def type_problems(spark_df, oracle_arrow_schema) -> list[str]:
    spark_types = {f.name: _canon_spark_type(f.dataType) for f in spark_df.schema.fields}
    out = []
    for field in oracle_arrow_schema:
        st = spark_types.get(field.name)
        ot = _canon_arrow_type(field.type)
        if st is not None and st != ot:
            out.append(f"type[{field.name}]: spark={st} oracle={ot}")
    return out


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, bytes):
        return v.hex()
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(name: str, spark_df, oracle_rows, oracle_cols) -> list[str]:
    problems = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    if sorted(scols) != sorted(oracle_cols):
        problems.append(f"schema: spark={sorted(scols)} oracle={sorted(oracle_cols)}")
        return problems
    if len(srows) != len(oracle_rows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(oracle_rows)}")
    a = _canon(srows, scols)
    b = _canon(oracle_rows, oracle_cols)
    if a != b:
        n_bad = 0
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                if n_bad < 3:
                    problems.append(f"row {i}: spark={x!r} oracle={y!r}")
                n_bad += 1
        if len(a) != len(b):
            problems.append(f"row multiset sizes differ: {len(a)} vs {len(b)}")
        if n_bad:
            problems.append(f"total mismatched rows: {n_bad}")
        if not problems:
            problems.append("value mismatch (row ordering canonicalization)")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import os

    import __spark_entry__ as entry_mod
    from aerovaldb_spark.catalog import TESTDATA_TABLES

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # Simulate the external driver's environment: a bare session
        # with default confs (200 shuffle partitions, no engine
        # settings) — engine code must self-apply whatever it needs.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from aerovaldb_spark.session import get_spark

        spark = get_spark("parity", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = {}
    n_run = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  {name}: NO-ORACLE rows={n} ({time.time() - t0:.1f}s)")
                continue
            arrow = con.execute(oracles[name]).arrow()
            oracle_cols = arrow.schema.names
            cols_data = [c.to_pylist() for c in arrow.columns]
            oracle_rows = [
                tuple(col[i] for col in cols_data)
                for i in range(arrow.num_rows)
            ]
            problems = type_problems(df, arrow.schema)
            problems += compare(name, df, oracle_rows, oracle_cols)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:300]}"]
        dt = time.time() - t0
        from aerovaldb_spark.operators._scope import release_scoped_persists

        release_scoped_persists()
        if problems:
            failures[name] = problems
            print(f"  {name}: FAIL ({dt:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"  {name}: ok ({dt:.1f}s)")

    print(f"\n{len(failures)} failures / {n_run} queries run")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
