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


LOCKFREE_WORKER = """
import sys
sys.path.insert(0, "/root/repo")
import aerovaldb_spark as av

root = sys.argv[1]
db = av.open("spark:" + root)
db.spark.sparkContext.setLogLevel("ERROR")

def bump(db):
    cur = db.get_config("p", "e", default={{"counter": 0}})["counter"]
    db.put_config({{"counter": cur + 1}}, "p", "e")

for _ in range({n_incr}):
    db.transact(bump)
print("WORKER-DONE")
"""


def test_multiprocess_counter_lockfree(tmp_path):
    """The reference's 6-process counter shape
    (tests/lock/test_lock.py:38-66) WITHOUT the advisory lock: commits
    go through the optimistic claim-file protocol, conflicts retry the
    read-modify-write, and no increment is lost."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    env.pop("AVDB_USE_LOCKING", None)  # locking OFF: optimistic path
    root = str(tmp_path / "db")
    script = LOCKFREE_WORKER.format(n_incr=N_INCR)
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
    # every commit resolved; at least N_PROCS * N_INCR committed claims
    commits = [db._read_claim(n) for n in db._scan_claim_numbers()]
    assert all(c is not None for c in commits)
    n_committed = sum(1 for c in commits if c.get("status") == "committed")
    assert n_committed == N_PROCS * N_INCR
    # committed seq chain is strictly increasing (no seq collisions)
    seqs = [c["max_seq"] for c in commits if c.get("status") == "committed"]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


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
