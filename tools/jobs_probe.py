"""Measure Spark jobs + wall per graded serve query — the job-floor
probe backing the optimization notes (r14 measured q133 = 9 jobs via
the same statusTracker recipe). Usage:

    python tools/jobs_probe.py [sf_dir] [query ...]

Runs each query once cold-constructed and twice warm (same session,
scoped persists released between runs), printing jobs/wall for each
run; bench session knobs (32 shuffle partitions, AQE on).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or ["q133_pq_residual_ivf_topk"]

    from aerovaldb_spark.operators import ALL_QUERIES
    from aerovaldb_spark.operators._scope import release_scoped_persists
    from aerovaldb_spark.session import get_spark

    spark = get_spark("jobs_probe", shuffle_partitions=32)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    for name in names:
        fn = ALL_QUERIES[name]
        for trial in range(3):
            group = f"{name}_t{trial}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.time() - t0
            release_scoped_persists()
            spark.sparkContext.setJobGroup(None, None)
            jobs = st.getJobIdsForGroup(group)
            print(
                f"{name} trial={trial} jobs={len(jobs)} "
                f"wall={dt:.2f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
