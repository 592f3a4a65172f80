"""Measure what the index staleness reports PREDICT: serving quality
of a frozen-parameter index at Nx appended corpus vs a fresh rebuild.

Two experiments, one JSON line per scenario:

1. IVF (frozen KMeans centroids): build centroids on a base corpus,
   append same-distribution and distribution-shifted vectors at
   several growth ratios, and compare top-10 recall (vs brute force,
   100-query sample) of the STALE index (frozen centroids, grown
   assignments) against a FRESH rebuild on the same final corpus —
   next to the staleness() metrics (centroid shift, assignment churn,
   occupancy skew) that are supposed to predict the gap.

2. TF-IDF screen (frozen idf stats): build a TfidfScreenIndex on a
   base reference corpus, add() same-distribution and vocabulary-
   shifted documents, and compare the screen verdicts (tfidf_dup
   flags and match_cosine) for the SAME incoming batch under the
   stale index vs a fresh rebuild — next to staleness() (idf drift,
   new-term mass, top-term churn).

Usage: python tools/staleness_recall.py [ivf|screen|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def _mean_recall(approx, exact):
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import ann_recall

    row = ann_recall(approx, exact).agg(
        F.avg("recall").alias("r")
    ).collect()[0]
    return round(float(row["r"]), 4)


def run_ivf(spark, out):
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators._scope import (
        release_scoped_persists,
        scoped_persist,
    )
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        brute_force_topk,
        ivf_assign,
    )

    emb = load_table(spark, SF1, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 == 0)  # 400 vectors
    builder = IVFIndex.build(base, n_lists=16)
    cents = builder.centroids  # frozen at build time

    scenarios = {
        # growth 2x: one more fifth of the pool, same distribution
        "same_2x": emb.filter(F.col("vec_id") % 5 == 1),
        # growth 5x: the whole rest of the pool, same distribution
        "same_5x": emb.filter(F.col("vec_id") % 5 != 0),
        # growth 5x, shifted: constant offset moves nearest centroids
        "shift_5x": emb.filter(F.col("vec_id") % 5 != 0).withColumn(
            "embedding", F.transform("embedding", lambda x: x + F.lit(3.0))
        ),
    }
    for name, appended in scenarios.items():
        t0 = time.time()
        full = scoped_persist(base.unionByName(appended))
        # query sample from BOTH sides of the append: %20==0 lands in
        # the base fifth, %20==6 in the appended pool (6 % 5 == 1)
        queries = full.filter(
            (F.col("vec_id") % 20 == 0) | (F.col("vec_id") % 20 == 6)
        )
        exact = scoped_persist(
            brute_force_topk(full, queries, k=10, single_query=False)
        )
        stale = IVFIndex(cents, ivf_assign(full, cents), "embedding", "vec_id")
        fresh = IVFIndex.build(full, n_lists=16)
        rep = stale.staleness().collect()[0].asDict()

        def cand_per_query(idx, n_probe):
            # serving cost: rows scored per query = sum of probed
            # lists' sizes (the join fan-in before top-k)
            from aerovaldb_spark.operators.similarity import _probe_lists

            probes = _probe_lists(
                queries, idx.centroids, n_probe, "embedding", "vec_id"
            ).select("query_id", "list_id")
            occ = idx.assignments.groupBy("list_id").agg(
                F.count(F.lit(1)).alias("c")
            )
            row = (
                probes.join(occ, "list_id")
                .groupBy("query_id")
                .agg(F.sum("c").alias("s"))
                .agg(F.avg("s").alias("a"))
                .collect()[0]
            )
            return round(float(row["a"]), 1)

        row = {
            "experiment": "ivf",
            "scenario": name,
            "n_base": base.count(),
            "n_full": full.count(),
            "n_queries": queries.count(),
            "recall_stale": _mean_recall(stale.topk(queries, k=10), exact),
            "recall_fresh": _mean_recall(fresh.topk(queries, k=10), exact),
            "recall_stale_p1": _mean_recall(
                stale.topk(queries, k=10, n_probe=1), exact
            ),
            "recall_fresh_p1": _mean_recall(
                fresh.topk(queries, k=10, n_probe=1), exact
            ),
            "cand_per_query_stale": cand_per_query(stale, 4),
            "cand_per_query_fresh": cand_per_query(fresh, 4),
            "centroid_shift_mean": rep["centroid_shift_mean"],
            "centroid_shift_max": rep["centroid_shift_max"],
            "assignment_churn": rep["assignment_churn"],
            "load_factor_max": rep["load_factor_max"],
            "top_mass": rep["top_mass"],
            "sec": round(time.time() - t0, 1),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        release_scoped_persists()


def run_screen(spark, out):
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators._scope import (
        release_scoped_persists,
        scoped_persist,
    )
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    docs = load_table(spark, SF1, "documents")
    base = docs.filter(F.col("doc_id") % 5 == 0)  # 1000 docs
    # incoming batch: an independent-id sample of the base reference
    # corpus itself (guaranteed true matches exist under EVERY index
    # variant), re-keyed out of the reference id space
    incoming = scoped_persist(
        docs.filter(F.col("doc_id") % 10 == 5).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    )

    def vocab_shift(df, every=1):
        # prefix every ``every``-th token: every=1 is an entirely new
        # vocabulary (new domain), every=10 a mild ~10% domain drift
        return df.withColumn(
            "text",
            F.array_join(
                F.expr(
                    "transform(split(text, ' '), (t, j) -> "
                    f"CASE WHEN j % {every} = 0 THEN concat('zz', t) "
                    "ELSE t END)"
                ),
                " ",
            ),
        )

    scenarios = {
        "same_2x": docs.filter(F.col("doc_id") % 5 == 1),
        "same_5x": docs.filter(F.col("doc_id") % 5 != 0),
        "mildshift_5x": vocab_shift(
            docs.filter(F.col("doc_id") % 5 != 0).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
            ),
            every=10,
        ),
        "shift_5x": vocab_shift(
            docs.filter(F.col("doc_id") % 5 != 0).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
            )
        ),
    }
    for name, appended in scenarios.items():
        t0 = time.time()
        stale = TfidfScreenIndex.build(base).add(appended)
        fresh = TfidfScreenIndex.build(
            base.select("doc_id", "text").unionByName(
                appended.select("doc_id", "text")
            )
        )
        rep = stale.staleness().collect()[0].asDict()
        # the incoming batch must ALSO probe the appended (frozen-idf
        # OOV) side of the reference — matches against base docs are
        # weighted under the idf they were built with and cannot show
        # drift; matches against appended docs carry the frozen-stats
        # error in full. And EXACT copies can't show weight drift at
        # all (cosine of identical term multisets is 1 under any unit
        # weighting), so each side also probes with a PERTURBED twin
        # (every 4th token replaced by doc-unique noise), which puts
        # the true cosine near the threshold where frozen-vs-fresh
        # idf can flip the verdict.
        def perturb(df, offset, every):
            return df.select(
                (F.col("doc_id") + offset).alias("doc_id"),
                F.array_join(
                    F.expr(
                        "transform(split(text, ' '), (w, j) -> "
                        f"CASE WHEN j % {every} = 1 THEN "
                        "concat('nz', cast(doc_id AS STRING), '_', "
                        "cast(j AS STRING)) ELSE w END)"
                    ),
                    " ",
                ).alias("text"),
            )

        app_sample = appended.filter(F.col("doc_id") % 10 == 6)
        base_sample = docs.filter(F.col("doc_id") % 10 == 5)
        probe = scoped_persist(
            incoming
            .unionByName(
                app_sample.select(
                    (F.col("doc_id") + 100_000_000).alias("doc_id"),
                    "text",
                )
            )
            .unionByName(perturb(base_sample, 200_000_000, 4))
            .unionByName(perturb(app_sample, 300_000_000, 4))
            .unionByName(perturb(base_sample, 400_000_000, 8))
            .unionByName(perturb(app_sample, 500_000_000, 8))
        )
        sr = scoped_persist(
            stale.screen(probe, exclude_same_id=False).select(
                "doc_id", "tfidf_dup", "match_id", "match_cosine"
            )
        )
        fr = scoped_persist(
            fresh.screen(probe, exclude_same_id=False).select(
                F.col("doc_id").alias("f_doc_id"),
                F.col("tfidf_dup").alias("f_dup"),
                F.col("match_id").alias("f_match_id"),
                F.col("match_cosine").alias("f_cosine"),
            )
        )
        j = sr.join(fr, sr.doc_id == fr.f_doc_id).withColumn(
            "side",
            F.when(F.col("doc_id") >= 500_000_000, "appended_pert8")
            .when(F.col("doc_id") >= 400_000_000, "base_pert8")
            .when(F.col("doc_id") >= 300_000_000, "appended_pert4")
            .when(F.col("doc_id") >= 200_000_000, "base_pert4")
            .when(F.col("doc_id") >= 100_000_000, "appended")
            .otherwise("base"),
        )
        aggs = (
            j.groupBy("side")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("tfidf_dup") != F.col("f_dup"), 1).otherwise(0)).alias("flag_diff"),
                F.sum(F.when(F.col("f_dup") & ~F.col("tfidf_dup"), 1).otherwise(0)).alias("missed_by_stale"),
                F.sum(F.when(F.col("f_dup").cast("int") == 1, 1).otherwise(0)).alias("fresh_dups"),
                F.sum(
                    F.when(
                        F.col("f_dup")
                        & F.col("tfidf_dup")
                        & (F.col("match_id") != F.col("f_match_id")),
                        1,
                    ).otherwise(0)
                ).alias("match_id_diff"),
                F.avg(
                    F.when(
                        F.col("f_dup") & F.col("tfidf_dup"),
                        F.abs(F.col("match_cosine") - F.col("f_cosine")),
                    )
                ).alias("cos_mad"),
                F.max(
                    F.when(
                        F.col("f_dup") & F.col("tfidf_dup"),
                        F.abs(F.col("match_cosine") - F.col("f_cosine")),
                    )
                ).alias("cos_max"),
            )
            .collect()
        )
        row = {
            "experiment": "screen",
            "scenario": name,
            "n_ref_base": 1000,
            "idf_drift_mad": rep["idf_drift_mad"],
            "idf_drift_max": rep["idf_drift_max"],
            "new_term_mass": rep["new_term_mass"],
            "top_term_churn": rep["top_term_churn"],
            "growth_ratio": rep["growth_ratio"],
            "sec": round(time.time() - t0, 1),
        }
        for a in aggs:
            s = a["side"]
            row[f"{s}_n"] = a["n"]
            row[f"{s}_fresh_dups"] = a["fresh_dups"]
            row[f"{s}_missed_by_stale"] = a["missed_by_stale"]
            row[f"{s}_flag_diff"] = a["flag_diff"]
            row[f"{s}_match_id_diff"] = a["match_id_diff"]
            row[f"{s}_dup_recall"] = round(
                1.0 - a["missed_by_stale"] / max(a["fresh_dups"], 1), 4
            )
            row[f"{s}_cos_mad"] = (
                None if a["cos_mad"] is None else round(float(a["cos_mad"]), 6)
            )
            row[f"{s}_cos_max"] = (
                None if a["cos_max"] is None else round(float(a["cos_max"]), 6)
            )
        out.append(row)
        print(json.dumps(row), flush=True)
        release_scoped_persists()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from aerovaldb_spark.session import get_spark

    spark = get_spark("staleness_recall")
    spark.sparkContext.setLogLevel("ERROR")
    out: list = []
    if which in ("ivf", "all"):
        run_ivf(spark, out)
    if which in ("screen", "all"):
        run_screen(spark, out)


if __name__ == "__main__":
    main()
