"""ANN recall/cost operating points — the table a user picks defaults
from (recorded in SCALING.md; defaults asserted in
tests/test_bpe_and_ann.py::test_ann_default_operating_point).

For each ANN family, sweeps the probe dial and reports mean recall@10
against the brute-force baseline plus the measured fraction of the
corpus actually scored (candidate volume / (n_queries * n_corpus) —
the cost that matters at 100 TB, where touched fraction IS the read
volume of the directory-pruned index scan):

- SRP Hamming-1 (``srp_ivf_topk``) at planes in {6, 8, 10}
- SRP margin-probe (``srp_margin_topk``) planes=8,
  n_flip in {3, 5, 8} (n_flip=planes equals Hamming-1 exactly)
- IVFIndex (KMeans, n_lists=16) at n_probe in {1, 2, 4, 8}

Two corpora: the sf embeddings as-is (iid — LSH's documented
worst case) and a deterministic CLUSTERED variant (each base vector
spawns tight neighbors, the shape real embedded corpora have), so the
table records both ends of the recall range.

Usage: python tools/ann_operating_points.py [sf_dir] [n_queries]
Prints a markdown table per corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_corpus(emb, variants: int = 4, scale: float = 0.35):
    """Deterministic clustered twin of an embedding frame: each base
    vector spawns ``variants`` near copies (base + scale * circular
    shift — near-orthogonal perturbation, cosine ~ 1/sqrt(1+scale^2)
    ~ 0.94 to the base). No RNG, so the corpus is reproducible."""
    from pyspark.sql import functions as F

    n = emb.count()
    parts = [emb.select("vec_id", "embedding")]
    for j in range(1, variants + 1):
        shifted = F.expr(
            f"transform(sequence(0, size(embedding) - 1), i -> "
            f"CAST(embedding[i] + {scale} * "
            f"embedding[(i + {j}) % size(embedding)] AS FLOAT))"
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(j * n)).alias("vec_id"),
                shifted.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mean_recall(spark, approx, exact) -> float:
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import ann_recall

    row = (
        ann_recall(approx, exact)
        .agg(F.avg("recall").alias("r"))
        .collect()[0]
    )
    return float(row["r"])


def touched_fraction_srp(emb, queries, dim, planes, n_flip=None) -> float:
    """Avg fraction of corpus vectors in the probed buckets."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import (
        _srp_probe_frame,
        srp_margin_probe_frame,
        srp_signature_col,
    )

    if n_flip is None:
        probe = _srp_probe_frame(queries, dim, planes, "embedding", "vec_id")
    else:
        probe = srp_margin_probe_frame(
            queries, dim, planes, n_flip, "embedding", "vec_id"
        )
    occupancy = (
        emb.withColumn("bucket", srp_signature_col("embedding", dim, planes))
        .groupBy("bucket")
        .count()
    )
    total = (
        probe.select("query_id", "bucket")
        .distinct()
        .join(occupancy, "bucket")
        .agg(F.sum("count").alias("c"))
        .collect()[0]["c"]
    )
    nq = queries.count()
    n = emb.count()
    return float(total or 0) / (nq * n)


def touched_fraction_ivf(index, queries, n_probe) -> float:
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import _probe_lists

    qdf = _probe_lists(
        queries, index.centroids, n_probe, "embedding", "vec_id"
    )
    occupancy = index.assignments.groupBy("list_id").count()
    total = (
        qdf.select("query_id", "list_id")
        .distinct()
        .join(occupancy, "list_id")
        .agg(F.sum("count").alias("c"))
        .collect()[0]["c"]
    )
    nq = queries.count()
    n = index.assignments.count()
    return float(total or 0) / (nq * n)


def sweep(spark, emb, label: str, n_queries: int) -> None:
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        brute_force_topk,
        srp_ivf_topk,
        srp_margin_topk,
    )

    emb = emb.cache()
    n = emb.count()
    qids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(n_queries).collect()]
    queries = emb.filter(F.col("vec_id").isin(qids)).cache()
    exact = brute_force_topk(emb, queries, k=10).cache()
    exact.count()

    print(f"\n### {label} (n={n}, {n_queries} queries, k=10)\n")
    print("| family | setting | recall@10 | corpus touched |")
    print("|---|---|---|---|")
    for planes in (6, 8, 10):
        r = mean_recall(
            spark, srp_ivf_topk(emb, queries, k=10, dim=64, planes=planes), exact
        )
        f = touched_fraction_srp(emb, queries, 64, planes)
        print(f"| SRP Hamming-1 | planes={planes} | {r:.3f} | {f:.3f} |")
    for n_flip in (3, 5, 8):
        r = mean_recall(
            spark,
            srp_margin_topk(
                emb, queries, k=10, dim=64, planes=8, n_flip=n_flip
            ),
            exact,
        )
        f = touched_fraction_srp(emb, queries, 64, 8, n_flip=n_flip)
        print(f"| SRP margin-probe | planes=8 n_flip={n_flip} | {r:.3f} | {f:.3f} |")
    index = IVFIndex.build(emb, n_lists=16)
    index.assignments = index.assignments.cache()
    for n_probe in (1, 2, 4, 8):
        r = mean_recall(
            spark, index.topk(queries, k=10, n_probe=n_probe), exact
        )
        f = touched_fraction_ivf(index, queries, n_probe)
        print(f"| IVF (16 lists) | n_probe={n_probe} | {r:.3f} | {f:.3f} |")
    emb.unpersist()
    queries.unpersist()
    exact.unpersist()


def exact_l2_topk(emb, queries, k=10):
    """Brute-force L2 top-k — the PQ family's baseline (PQ/ADC ranks
    by approximate L2, so its recall is measured against exact L2,
    not the cosine baseline the other families use)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    v = F.col("embedding").cast("array<double>")
    c = emb.select(F.col("vec_id").alias("neighbor_id"), v.alias("cv"))
    probes = queries.select(
        F.col("vec_id").alias("query_id"), v.alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    return (
        c.join(
            F.broadcast(probes), F.col("neighbor_id") != F.col("query_id")
        )
        .withColumn("_d", d2)
        .withColumn("ann_rank", F.row_number().over(w))
        .filter(f"ann_rank <= {k}")
        .select("query_id", "ann_rank", "neighbor_id")
    )


def sweep_pq(spark, emb, label: str, n_queries: int) -> None:
    """PQ operating points: codes-only ADC, the re-rank ladder, and
    the IVF-pruned serve — recall vs exact L2 plus the BYTES story
    (the PQ axis the other families don't have: stored bytes/vector
    and raw-vector rows touched)."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.pq import (
        PQ_DSUB,
        PQ_K,
        PQ_M,
        PQIVFIndex,
        ResidualPQIVFIndex,
        pq_adc_rerank_topk,
        pq_adc_topk,
    )
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    emb = emb.cache()
    n = emb.count()
    qids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    ]
    queries = emb.filter(F.col("vec_id").isin(qids)).cache()
    exact = exact_l2_topk(emb, queries, k=10).cache()
    exact.count()
    raw_bytes = PQ_M * PQ_DSUB * 4
    # ephemeral rung: one tinyint per code; persisted PQIVFIndex:
    # nibble-packed, two codes per byte
    code_bytes, packed_bytes = PQ_M, PQ_M // 2
    print(
        f"\n### PQ (M={PQ_M}, K={PQ_K} -> {code_bytes} B/vec ephemeral"
        f" / {packed_bytes} B persisted-packed vs {raw_bytes} B "
        f"float32, {raw_bytes // packed_bytes}x stored) — "
        f"{label} (n={n}, {n_queries} queries, k=10)\n"
    )
    print("| rung | setting | recall@10 | raw rows touched/query |")
    print("|---|---|---|---|")
    r = mean_recall(spark, pq_adc_topk(emb, queries, k=10), exact)
    print(f"| ADC codes-only | — | {r:.3f} | 0 |")
    for expand in (3, 5, 10, 20):
        r = mean_recall(
            spark,
            pq_adc_rerank_topk(emb, queries, k=10, expand=expand),
            exact,
        )
        print(
            f"| ADC + exact re-rank | expand={expand} | {r:.3f} "
            f"| {10 * expand} |"
        )
    index = PQIVFIndex.build(emb, frozen_ivf_centroids(spark))
    index.assignments = index.assignments.cache()
    for n_probe in (2, 4, 8):
        r = mean_recall(
            spark, index.topk(queries, k=10, n_probe=n_probe), exact
        )
        f = touched_fraction_ivf(index, queries, n_probe)
        print(
            f"| PQ-IVF (16 lists, codes) | n_probe={n_probe} "
            f"| {r:.3f} | {f:.3f} of CODE rows |"
        )
    # residual encoding (true IVF-PQ): same bytes, same probes —
    # the recall delta at equal n_probe is the codes' contribution
    ridx = ResidualPQIVFIndex.build(emb, frozen_ivf_centroids(spark))
    ridx.assignments = ridx.assignments.cache()
    for n_probe in (2, 4, 8):
        r = mean_recall(
            spark, ridx.topk(queries, k=10, n_probe=n_probe), exact
        )
        f = touched_fraction_ivf(ridx, queries, n_probe)
        print(
            f"| Residual PQ-IVF (16 lists, codes) | n_probe={n_probe} "
            f"| {r:.3f} | {f:.3f} of CODE rows |"
        )
    # composed production serve: probes + packed ADC shortlist +
    # exact re-rank (q134/q135's graded shape)
    for idx, name in ((index, "PQ-IVF"), (ridx, "Residual PQ-IVF")):
        for expand in (5, 10, 20):
            r = mean_recall(
                spark,
                idx.topk(
                    queries, k=10, n_probe=4,
                    rerank_expand=expand, vectors=emb,
                ),
                exact,
            )
            print(
                f"| {name} + exact re-rank | n_probe=4 "
                f"expand={expand} | {r:.3f} | {10 * expand} |"
            )
    emb.unpersist()
    queries.unpersist()
    exact.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.session import get_spark

    spark = get_spark("ann_points", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    sweep(spark, emb, f"iid embeddings ({sf_dir})", n_queries)
    sweep_pq(spark, emb, f"iid embeddings ({sf_dir})", n_queries)
    sweep(
        spark,
        clustered_corpus(emb),
        f"clustered embeddings (5 variants per base, {sf_dir})",
        n_queries,
    )
    sweep_pq(
        spark,
        clustered_corpus(emb),
        f"clustered embeddings (5 variants per base, {sf_dir})",
        n_queries,
    )


if __name__ == "__main__":
    main()
