"""Scaling experiment: replicate sf0.1 in memory with key-remapped
copies and measure the headline queries at 1x/2x/4x/10x.

Replication preserves the workload's *structure* — join fan-out,
group cardinality growth, per-row compute — instead of just stacking
duplicate rows:

- fact/dim keys get a per-replica offset, so joins match exactly the
  rows they matched at 1x (selectivity constant, output scales
  linearly);
- constant-size dims (region/nation) stay single-copy, like TPC-H;
- document words get a per-replica suffix, so shingle/minhash/simhash
  structure is per-replica (cross-replica text would otherwise be
  100% near-duplicate and the pair count would grow quadratically —
  a different experiment, covered by the skew utilities instead);
- embeddings replicate by vec_id only (top-k scoring cost is linear
  in rows regardless of values).

Scaled tables are registered straight into the catalog cache under a
virtual ``scale://<m>x`` sf_dir, so every query runs unmodified.

Usage: python tools/scaleup.py [multipliers ...]   (default 1 2 4 10)
Prints one JSON line per multiplier and a final summary table
(sec per query, and the 10x/1x ratio — ~1.0x means perfectly
amortized overhead, ~10x means linear work at fixed parallelism).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
OFF = 10**9

# (table, key columns to offset per replica)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ("region", "nation")


def replicate(df: DataFrame, name: str, m: int) -> DataFrame:
    if name in SINGLE_COPY or m <= 1:
        return df
    parts = []
    for i in range(m):
        rep = df
        for k in KEYED.get(name, []):
            rep = rep.withColumn(k, F.col(k) + F.lit(i * OFF))
        if name == "documents" and i > 0:
            # per-replica vocabulary: suffix every word so shingle sets
            # are disjoint across replicas (see module docstring)
            rep = rep.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"_{i}"))),
                ),
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 10]
    from aerovaldb_spark import catalog
    from aerovaldb_spark.operators import ALL_QUERIES
    from aerovaldb_spark.session import get_spark
    from bench import HEADLINE

    # SCALEUP_QUERIES=q62_dedup_pipeline,q63_bigram_novelty overrides
    # the query set (the bench HEADLINE by default).
    names = [
        n for n in os.environ.get("SCALEUP_QUERIES", "").split(",") if n
    ] or HEADLINE

    spark = get_spark("scaleup", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[int, dict[str, float]] = {}
    for m in mults:
        vdir = f"scale://{m}x"
        for name in catalog.TESTDATA_TABLES:
            base = catalog.load_table(spark, BASE, name)
            scaled = replicate(base, name, m).repartition(32).persist()
            scaled.count()  # materialize before timing
            catalog._TABLE_CACHE[(vdir, name)] = scaled
        per: dict[str, float] = {}
        for qname in names:
            ALL_QUERIES[qname](spark, vdir).write.mode("overwrite").format("noop").save()  # warm
            samples = []
            for _ in range(3):
                t0 = time.time()
                ALL_QUERIES[qname](spark, vdir).write.mode("overwrite").format("noop").save()
                samples.append(time.time() - t0)
            per[qname] = round(sorted(samples)[1], 3)
        results[m] = per
        print(json.dumps({"multiplier": m, "total_sec": round(sum(per.values()), 3), "queries": per}))
        for name in catalog.TESTDATA_TABLES:
            catalog._TABLE_CACHE.pop((vdir, name), None)
        spark.catalog.clearCache()

    lo = min(mults)
    hi = max(mults)
    print(f"\n| query | {' | '.join(f'{m}x' for m in mults)} | {hi}x/{lo}x |")
    print(f"|---|{'---|' * (len(mults) + 1)}")
    for qname in names:
        ratio = results[hi][qname] / max(results[lo][qname], 1e-9)
        cells = " | ".join(f"{results[m][qname]:.2f}" for m in mults)
        print(f"| {qname} | {cells} | {ratio:.1f}x |")
    total_ratio = sum(results[hi].values()) / max(sum(results[lo].values()), 1e-9)
    totals = " | ".join(f"{sum(results[m].values()):.2f}" for m in mults)
    print(f"| **total** | {totals} | {total_ratio:.1f}x |")


if __name__ == "__main__":
    main()
