"""Cross-process read-modify-write under advisory locking — the
reference's lock stress pattern (tests/lock/test_lock.py:38-66:
N processes increment a shared counter; the sum must come out exact)."""

from __future__ import annotations

import os
import subprocess
import sys

N_PROCS = 3
N_INCR = 4

WORKER = """
import sys
sys.path.insert(0, "/root/repo")
import aerovaldb_spark as av

root = sys.argv[1]
db = av.open("spark:" + root)
db.spark.sparkContext.setLogLevel("ERROR")
for _ in range({n_incr}):
    with db.lock():
        db.refresh()
        cur = db.get_config("p", "e", default={{"counter": 0}})["counter"]
        db.put_config({{"counter": cur + 1}}, "p", "e")
        db.flush()
print("WORKER-DONE")
"""


def test_multiprocess_counter(tmp_path):
    env = dict(
        os.environ,
        AVDB_USE_LOCKING="1",
        AVDB_LOCK_DIR=str(tmp_path / "locks"),
        SPARK_GRAFT_CPUS="4",
    )
    root = str(tmp_path / "db")
    script = WORKER.format(n_incr=N_INCR)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, root],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(N_PROCS)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out
        assert b"WORKER-DONE" in out

    sys.path.insert(0, "/root/repo")
    import aerovaldb_spark as av

    db = av.open(f"spark:{root}")
    assert db.get_config("p", "e")["counter"] == N_PROCS * N_INCR
