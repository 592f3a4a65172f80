"""Residual vs raw PQ, measured honestly — the experiment behind the
SCALING.md r14 operating points.

Standard IVF-PQ (residual encoding) lifts recall in proportion to the
variance the COARSE quantizer explains: codes quantize v − c(v), so
whatever the coarse step captures stops consuming code resolution.
On the synthetic test corpus the frozen 16-list coarse quantizer
explains ~3% of variance (the corpus is iid — KMeans finds no
structure), so residual ≈ raw BY CONSTRUCTION there; the frozen-book
operating-point table (tools/ann_operating_points.py) shows exactly
that tie, and pretending otherwise would be fiction.

This tool demonstrates the lift where it actually lives: an ANCHORED
twin of the corpus (each vector shrunk toward its assigned coarse
centroid, v' = c(v) + ALPHA·(v − c(v)) — deterministic, no RNG) whose
coarse step explains 1 − ALPHA²·(1 − 0.03) ≈ 88% of variance — the
shape real, clusterable embedding corpora have. Both families get
per-corpus codebooks (seeded numpy Lloyd KMeans over the anchored
corpus — per-corpus training is how PQ is actually deployed; the
frozen module books are tied to the iid corpus), so the comparison
isolates the ENCODING, not the training data.

Usage: python tools/pq_residual_demo.py [sf_dir] [n_queries]
Prints the variance-explained diagnostic and a recall table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA = 0.35
SEED = 42


def fit_books_numpy(X, M: int, K: int, dsub: int, seed: int = SEED):
    """Per-sub-space Lloyd KMeans (25 iterations, seeded random-row
    init, empty clusters re-seeded deterministically) — a throwaway
    per-corpus codebook fit for MEASUREMENT; the graded/served
    artifacts use the frozen Spark ML fits (tools/gen_pq_*.py)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    books = []
    for m in range(M):
        S = X[:, m * dsub:(m + 1) * dsub]
        C = S[rng.choice(len(S), K, replace=False)].copy()
        for _ in range(25):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for k in range(K):
                mask = a == k
                if mask.any():
                    C[k] = S[mask].mean(axis=0)
                else:
                    C[k] = S[rng.randint(len(S))]
        books.append([[float(x) for x in c] for c in C])
    return books


def custom_family(base_cls, books):
    """A PQ family serving CUSTOM codebooks — only the ``_books``
    hook changes; encode/probe/ADC/layout are the production code."""

    class _Custom(base_cls):
        _BOOKS = books

        @classmethod
        def _books(cls):
            return cls._BOOKS

    _Custom.__name__ = f"Custom{base_cls.__name__}"
    return _Custom


def anchored_corpus(emb, cents, alpha: float = ALPHA):
    """v' = c(v) + alpha·(v − c(v)): deterministic clusterable twin —
    same ids, same dim, coarse step now explains ~1−alpha² of the
    variance."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import ivf_assign

    a = ivf_assign(emb, cents).join(F.broadcast(cents), "list_id")
    v = F.col("embedding").cast("array<double>")
    anchored = F.zip_with(
        v, "centroid", lambda x, c: c + F.lit(alpha) * (x - c)
    )
    return a.select(
        "vec_id",
        anchored.cast("array<float>").alias("embedding"),
    )


def variance_explained(emb, cents) -> float:
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import ivf_assign

    v = F.col("embedding").cast("array<double>")
    a = ivf_assign(emb, cents).join(F.broadcast(cents), "list_id")
    res2 = F.aggregate(
        F.zip_with(v, "centroid", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    within = a.agg(F.avg(res2).alias("w")).collect()[0]["w"]
    mean = (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("m"))
        .orderBy("i")
        .collect()
    )
    mv = emb.sparkSession.createDataFrame(
        [([r["m"] for r in mean],)], "centroid array<double>"
    )
    total = (
        emb.crossJoin(F.broadcast(mv))
        .agg(F.avg(res2).alias("t"))
        .collect()[0]["t"]
    )
    return 1.0 - within / total


def measure(spark, emb, n_queries: int):
    """(raw_recall, residual_recall) probed at n_probe=4 with
    per-corpus books fit on ``emb``."""
    import numpy as np

    from pyspark.sql import functions as F

    from ann_operating_points import exact_l2_topk
    from aerovaldb_spark.operators.pq import (
        PQ_DSUB,
        PQ_K,
        PQ_M,
        PQIVFIndex,
        ResidualPQIVFIndex,
    )
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
        ivf_assign,
    )

    cents = frozen_ivf_centroids(spark)
    emb = emb.cache()
    rows = (
        emb.select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .collect()
    )
    X = np.array([r[1] for r in rows])
    raw_books = fit_books_numpy(X, PQ_M, PQ_K, PQ_DSUB)
    assigned = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assign(emb, cents).select("vec_id", "list_id").collect()
    }
    C = {
        r["list_id"]: np.array(r["centroid"])
        for r in cents.collect()
    }
    R = np.array([r[1] - C[assigned[r[0]]] for r in rows])
    res_books = fit_books_numpy(R, PQ_M, PQ_K, PQ_DSUB)

    q = emb.orderBy("vec_id").limit(n_queries)
    exact = exact_l2_topk(emb, q, k=10).select(
        "query_id", "neighbor_id"
    ).cache()
    n_exact = exact.count()

    out = []
    for base, books in (
        (PQIVFIndex, raw_books),
        (ResidualPQIVFIndex, res_books),
    ):
        idx = custom_family(base, books).build(emb, cents)
        hits = (
            idx.topk(q, k=10, n_probe=4)
            .join(exact, ["query_id", "neighbor_id"], "left_semi")
            .count()
        )
        out.append(hits / n_exact)
    exact.unpersist()
    emb.unpersist()
    return tuple(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )
    from aerovaldb_spark.session import get_spark

    spark = get_spark("pq_residual_demo", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    cents = frozen_ivf_centroids(spark)

    print("| corpus | coarse var explained | raw codes recall@10 "
          "| residual codes recall@10 |")
    print("|---|---|---|---|")
    for label, corpus in (
        ("iid (as-is)", emb),
        (f"anchored (alpha={ALPHA})", anchored_corpus(emb, cents)),
    ):
        ve = variance_explained(corpus, cents)
        raw_r, res_r = measure(spark, corpus, n_queries)
        print(
            f"| {label} | {ve:.3f} | {raw_r:.3f} | {res_r:.3f} |"
        )


if __name__ == "__main__":
    main()
