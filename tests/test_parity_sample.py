"""Pytest-side replica of the driver's correctness gate at sf0.001.

The external gate records rows for only the first 50 ``queries()``
entries; this test runs EVERY declared query against its DuckDB oracle
(row count + sorted-column schema + order-insensitive exact values +
canonical type signatures) so entries rotated past the driver's cap
keep a value-level correctness check in CI.

sf0.001 keeps the whole sweep to ~1 min; the driver re-checks the
first 50 at sf0.01.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

SF_DIR = "/root/testdata/sf0.001"

import __spark_entry__ as entry_mod  # noqa: E402
from parity import compare, type_problems  # noqa: E402

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(autouse=True)
def _release_persists():
    # scoped persists (shingle/signature/model frames) are per-query
    # intermediates; drop them between the 79 sweeps so the suite's
    # executor memory stays flat instead of relying on LRU eviction
    yield
    from aerovaldb_spark.operators._scope import release_scoped_persists

    release_scoped_persists()


@pytest.fixture(scope="module")
def duck():
    from aerovaldb_spark.catalog import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_every_query_has_an_oracle_or_documented_exemption():
    # r9: the last rows-only entry (q55's HLL demo) was RETIRED to a
    # library function + accuracy test — its capability is hash-graded
    # by the deterministic KMV siblings q106/q109. Every declared
    # query now carries a full DuckDB oracle.
    missing = set(_QUERIES) - set(_ORACLES)
    assert missing == set()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_DIR)
    if name not in _ORACLES:
        assert df.count() >= 0  # rows-only entries must at least run
        return
    arrow = duck.execute(_ORACLES[name]).arrow()
    cols_data = [c.to_pylist() for c in arrow.columns]
    oracle_rows = [
        tuple(col[i] for col in cols_data) for i in range(arrow.num_rows)
    ]
    problems = type_problems(df, arrow.schema)
    problems += compare(name, df, oracle_rows, list(arrow.schema.names))
    assert not problems, problems
