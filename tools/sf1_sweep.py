"""Time a set of queries end-to-end (noop sink) at an arbitrary
ON-DISK sf dir — the companion to bench.py for the non-headline
chains (dedup pipeline, LM, BM25, round-5 additions) at the real-file
sf1 artifact produced by tools/gen_sf1.py.

Usage: python tools/sf1_sweep.py <sf_dir> [query ...]
Prints one JSON line {query: {"sec": median_of_3, "rows": n}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q56_dedup_clusters",
    "q62_dedup_pipeline",
    "q76_bigram_lm_nll",
    "q78_bm25_topk",
    "q91_srp_ann_topk",
    "q92_bpe_token_stats",
    "q93_semantic_dedup",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    names = sys.argv[2:] or DEFAULT

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from aerovaldb_spark.operators._scope import release_scoped_persists

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    out = {}
    for name in names:
        fn = queries[name]
        rows = None
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.monotonic() - t0, 3))
            release_scoped_persists()
        rows = fn(spark, sf_dir).count()
        release_scoped_persists()
        out[name] = {"sec": statistics.median(times), "rows": rows}
        print(f"  {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
