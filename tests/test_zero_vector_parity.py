"""Cross-engine parity with a ZERO-NORM vector in the corpus.

The generated testdata never contains an all-zero embedding, so the
graded oracle runs can't exercise the division-by-zero edge: Spark's
double 0.0/0.0 is NaN while DuckDB's is NULL, and any emitted
cosine / quantization scale would hash-diverge the moment a zero
vector entered the corpus. Every similarity operator therefore NULLs
its result explicitly (nullif on the divisor, or a CASE on the q89
scale); this test injects a zero vector and runs the REAL oracle SQL
against the REAL Spark operators to prove both engines emit NULL.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from parity import compare  # noqa: E402

from aerovaldb_spark.operators import similarity  # noqa: E402

DIM = 8


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """A tiny embeddings table whose vec_id=3 row is all zeros."""
    rows = []
    for vid in range(6):
        if vid == 3:
            vec = [0.0] * DIM
        else:
            # deterministic, non-trivial floats
            vec = [((vid * 31 + j * 7) % 13 - 6) / 4.0 for j in range(DIM)]
        rows.append((vid, vec, vid % 2))
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    d = tmp_path_factory.mktemp("zerovec")
    pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(corpus_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{corpus_dir}/embeddings.parquet'"
    )
    yield con
    con.close()


def _assert_matches(name, spark_df, duck, sql):
    arrow = duck.execute(sql).arrow()
    cols = [c.to_pylist() for c in arrow.columns]
    oracle_rows = [
        tuple(col[i] for col in cols) for i in range(arrow.num_rows)
    ]
    problems = compare(name, spark_df, oracle_rows, list(arrow.schema.names))
    assert not problems, problems


@pytest.mark.parametrize(
    "qname",
    [
        "q29_cosine_topk",
        "q50_cosine_near_dup",
        "q79_knn_join",
        "q83_label_cohesion",
        "q89_quantization_audit",
        "q90_label_outliers",
    ],
)
def test_zero_vector_oracle_parity(qname, spark, duck, corpus_dir):
    df = similarity.QUERIES[qname](spark, corpus_dir)
    _assert_matches(qname, df, duck, similarity.ORACLE[qname])


def test_zero_vector_rows_are_null_not_nan(spark, corpus_dir):
    """The zero vector's cosine/rmse must be NULL, not NaN."""
    import math

    audit = {
        r["vec_id"]: r
        for r in similarity.QUERIES["q89_quantization_audit"](
            spark, corpus_dir
        ).collect()
    }
    assert audit[3]["sum_codes"] is None
    assert audit[3]["rmse"] is None
    assert audit[3]["q_scale"] == 0.0
    for vid, r in audit.items():
        if vid != 3:
            assert r["rmse"] is not None and not math.isnan(r["rmse"])

    knn = similarity.QUERIES["q79_knn_join"](spark, corpus_dir).collect()
    zero_cos = [r["cosine"] for r in knn if 3 in (r["query_id"], r["neighbor_id"])]
    assert zero_cos and all(c is None for c in zero_cos)
