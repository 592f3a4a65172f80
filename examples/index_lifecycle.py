"""The persisted-index lifecycle, end to end: build -> serve ->
append -> measure staleness -> apply the rebuild rule -> recalibrate.

This is the operational loop a 100 TB deployment runs around any of
the frozen-parameter index families (the round-11 additions close
it): staleness() turns "is my index still good?" into measured drift,
*_rebuild_verdict applies the SCALING.md-measured rules to that
report, and calibrate_band_dial re-derives the LSH dial from the
grown corpus in one call when a rebuild IS due.

Run: python examples/index_lifecycle.py   (sf0.001 inputs; ~1 min)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def main() -> None:
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        ann_recall,
        brute_force_topk,
        ivf_rebuild_verdict,
    )
    from aerovaldb_spark.operators.text import (
        TfidfScreenIndex,
        calibrate_band_dial,
        screen_rebuild_verdict,
    )
    from aerovaldb_spark.session import get_spark

    spark = get_spark("index_lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"

    # ---- IVF: build on half, snapshot the build-time report --------
    emb = load_table(spark, sf, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    root = tempfile.mkdtemp(prefix="ivf-")
    IVFIndex.build(old, n_lists=8).save(root)
    idx = IVFIndex.load(spark, root)
    build_report = idx.staleness().collect()[0]
    print("build-time report:", build_report.asDict())

    # serve a query batch; sanity-check recall vs brute force
    queries = emb.filter(F.col("vec_id") % 50 == 1)
    rec = (
        ann_recall(
            idx.topk(queries, k=5),
            brute_force_topk(old, queries, k=5, single_query=False),
        )
        .agg(F.avg("recall"))
        .collect()[0][0]
    )
    print(f"recall@5 vs brute force on the build corpus: {rec:.3f}")

    # ---- append under frozen centroids, re-measure ------------------
    idx = idx.add(emb.filter(F.col("vec_id") % 2 == 1))
    grown_report = idx.staleness().collect()[0]
    verdict = ivf_rebuild_verdict(grown_report, build_report)
    print("after 2x same-distribution append:", verdict)
    assert not verdict.rebuild  # measured: diffusion this small is fine

    # a hard distribution shift trips the occupancy trigger
    elem = emb.schema["embedding"].dataType.elementType.simpleString()
    shifted = emb.withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(3.0)).cast(elem)),
    ).withColumn("vec_id", F.col("vec_id") + 10_000)
    drifted = idx.add(shifted).staleness().collect()[0]
    verdict = ivf_rebuild_verdict(drifted, build_report)
    print("after a shifted append:", verdict.rebuild, verdict.reasons[:1])

    # ---- maybe_rebuild: the loop above in ONE call ------------------
    # (r12) staleness -> verdict -> staged rebuild+swap: persist the
    # build-time baseline, append the shifted mass ON DISK, and let
    # the index decide and act. The swap is the rename protocol
    # (_staging.rebuild_root): loaders fall back across the crash
    # window and streaming ingest markers survive.
    idx_disk = IVFIndex.load(spark, root)
    idx_disk.save_build_report(root)
    idx_disk.add(shifted, path=root)
    rebuilt, verdict, report = IVFIndex.maybe_rebuild(spark, root)
    print(
        f"maybe_rebuild: rebuilt={verdict.rebuild} "
        f"(load_factor_max {report['load_factor_max']})"
    )
    _, v2, _ = IVFIndex.maybe_rebuild(spark, root)
    assert verdict.rebuild and not v2.rebuild  # re-baselined

    # ---- maybe_compact: the third maintenance trigger ---------------
    # (r12) staleness says "re-fit the parameters"; fragmentation says
    # "the append litter itself is the cost" — measured from
    # filesystem metadata only, compacted under the same swap protocol
    from aerovaldb_spark.operators._staging import maybe_compact

    compacted, cv, frag = maybe_compact(
        spark, root, IVFIndex, max_files_per_dir=2
    )
    print(
        f"maybe_compact: compacted={cv.rebuild} (max files/dir was "
        f"{frag['datasets']['assignments']['max_files_per_dir']})"
    )

    # ...or the whole triangle in one scheduled-job call: recover any
    # torn streaming append, rebuild if stale, compact if fragmented
    from aerovaldb_spark.operators._staging import maintain

    summary = maintain(spark, root, IVFIndex, max_files_per_dir=2)
    print(
        f"maintain: recovered={summary['recovered']} "
        f"rebuilt={summary['rebuilt']} compacted={summary['compacted']}"
    )

    # ---- screen: same loop, plus dial recalibration -----------------
    docs = load_table(spark, sf, "documents")
    screen = TfidfScreenIndex.build(docs.filter(F.col("doc_id") < 250))
    screen = screen.add(docs.filter(F.col("doc_id") >= 250))
    rep = screen.staleness().collect()[0]
    print("screen staleness:", screen_rebuild_verdict(rep))

    # one-call form on a persisted screen index (weights cannot be
    # inverted to text, so the current corpus is a required input)
    sroot = tempfile.mkdtemp(prefix="screen-")
    TfidfScreenIndex.build(docs.filter(F.col("doc_id") < 250)).save(sroot)
    TfidfScreenIndex.load(spark, sroot).add(
        docs.filter(F.col("doc_id") >= 250), path=sroot
    )
    _, sv, srep = TfidfScreenIndex.maybe_rebuild(spark, sroot, docs=docs)
    print(
        f"screen maybe_rebuild: rebuilt={sv.rebuild} "
        f"(idf_drift_mad {srep['idf_drift_mad']})"
    )

    # when a rebuild IS due, re-derive the banded dial from the grown
    # corpus in one call (measure -> invert -> choose)
    cal = calibrate_band_dial(docs, threshold=0.8, target_recall=0.95)
    print(
        f"recalibrated dial: ({cal.bands}, {cal.rows_per_band}) from "
        f"measured recall {cal.measured_recall} "
        f"(J_eff {cal.effective_jaccard})"
    )

    # ---- PQ serving ladder (r14): the composed production serve ----
    # Stored bytes drop 32x (nibble-packed codes); the ONE topk call
    # below runs directory-pruned probes -> packed-ADC shortlist ->
    # exact re-rank reading only |Q|*k*expand raw rows. Residual
    # encoding (true IVF-PQ) is the same layout/lifecycle with codes
    # quantizing vector - coarse centroid — pick it when the coarse
    # step explains real variance (see SCALING.md r14 and
    # tools/pq_residual_demo.py for the measured decision rule).
    from aerovaldb_spark.operators.pq import ResidualPQIVFIndex
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    proot = tempfile.mkdtemp(prefix="pq-")
    ResidualPQIVFIndex.build(emb, frozen_ivf_centroids(spark)).save(
        proot
    )
    pidx = ResidualPQIVFIndex.load(spark, proot)
    queries = emb.filter(F.col("vec_id") < 3)
    served = pidx.topk(
        queries, k=5, n_probe=4, rerank_expand=10, vectors=emb
    )
    print("composed PQ serve (probes+ADC+re-rank), top-5 for 3 queries:")
    for r in served.orderBy("query_id", "ann_rank").collect()[:6]:
        print(
            f"  q{r['query_id']} #{r['ann_rank']}: "
            f"{r['neighbor_id']} (l2 {r['l2_d2']:.3f})"
        )


if __name__ == "__main__":
    main()
