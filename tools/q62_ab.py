"""q62 steady-wall recheck (r10 verdict follow-up): r9 3.2 s -> r10
4.0 s at similar section load with FLAT cold walls. Rerun under the
bench's quiet-host bracket and report cold + steady walls with the
calibration factor, so the delta can be attributed (noise vs plan).

Usage: python tools/q62_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from bench import _calibrate

    from aerovaldb_spark.operators._scope import release_scoped_persists
    from aerovaldb_spark.operators.dedup import q62_dedup_pipeline
    from aerovaldb_spark.session import get_spark

    spark = get_spark("q62_ab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    out: dict = {"sf_dir": sf_dir, "cal_before": _calibrate()}
    t0 = time.time()
    n = q62_dedup_pipeline(spark, sf_dir).count()
    out["cold_sec"] = round(time.time() - t0, 2)
    out["rows"] = n
    release_scoped_persists()
    walls = []
    for _ in range(reps):
        t0 = time.time()
        q62_dedup_pipeline(spark, sf_dir).count()
        walls.append(round(time.time() - t0, 2))
        release_scoped_persists()
    out["steady_walls"] = walls
    out["steady_min"] = min(walls)
    out["cal_after"] = _calibrate()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
