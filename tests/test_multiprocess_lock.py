"""Cross-process read-modify-write under advisory locking — the
reference's lock stress pattern (tests/lock/test_lock.py:38-66:
N processes increment a shared counter; the sum must come out exact)."""

from __future__ import annotations

import os
import subprocess
import sys
import time

N_PROCS = 3
N_INCR = 4

WORKER = """
import sys
import time
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
import time
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


def _mkdb(tmp_path, name="db"):
    sys.path.insert(0, "/root/repo")
    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.session import get_spark

    spark = get_spark("claims-test", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    return AerovalSparkDB(spark, str(tmp_path / name))


def test_claim_resolution_is_exclusive(tmp_path):
    """A claim can be resolved exactly once: the second resolver loses
    and the first resolution's content stands."""
    db = _mkdb(tmp_path)
    n = db._claim_next()
    assert db._resolve_claim(n, {"status": "aborted", "who": "first"})
    assert not db._resolve_claim(n, {"status": "committed", "who": "second"})
    meta = db._read_claim(n)
    assert meta["status"] == "aborted" and meta["who"] == "first"


def test_presumed_abort_is_durable(tmp_path, monkeypatch):
    """Timing out on a pending claim WRITES the aborted resolution —
    the slow owner's later commit attempt must lose, not race."""
    db = _mkdb(tmp_path)
    monkeypatch.setattr(type(db), "_CLAIM_RESOLVE_TIMEOUT", 0.05)
    n = db._claim_next()  # owner never resolves (simulated hang)
    meta = db._wait_resolved(n)
    assert meta["status"] == "aborted" and meta.get("presumed_crashed")
    # durable: visible to a fresh reader, and the owner's commit loses
    assert db._read_claim(n)["status"] == "aborted"
    assert not db._resolve_claim(n, {"status": "committed", "max_seq": 1})


def test_slow_writer_does_not_lose_update(tmp_path, monkeypatch):
    """The review scenario: writer A's flush outlives the presumption
    timeout while writer B commits from the same snapshot. With
    durable exclusive resolutions, A's first attempt is void and A
    RETRIES — both increments land (no lost update)."""
    import threading

    from aerovaldb_spark.db import AerovalSparkDB

    db_a = _mkdb(tmp_path, "shared")
    db_b = AerovalSparkDB(db_a.spark, db_a.root)
    monkeypatch.setattr(AerovalSparkDB, "_CLAIM_RESOLVE_TIMEOUT", 1.0)

    db_a.put_config({"counter": 0}, "p", "e")
    db_a.flush()

    real_flush = AerovalSparkDB._flush_unlocked
    slow_once = {"armed": True}

    def slow_flush(self):
        if self is db_a and slow_once["armed"]:
            slow_once["armed"] = False
            time.sleep(2.5)  # > timeout: B will durably presume A dead
        real_flush(self)

    monkeypatch.setattr(AerovalSparkDB, "_flush_unlocked", slow_flush)

    def bump(db):
        n = db.get_config("p", "e")["counter"]
        db.put_config({"counter": n + 1}, "p", "e")

    t_a = threading.Thread(target=lambda: db_a.transact(bump))
    t_a.start()
    time.sleep(0.8)  # let A claim and enter its slow flush
    db_b.transact(bump)  # presumes A crashed, commits counter=1
    t_a.join(timeout=120)
    assert not t_a.is_alive()

    db_a.refresh()
    assert db_a.get_config("p", "e")["counter"] == 2


def test_compact_aborts_on_concurrent_commit(tmp_path, monkeypatch):
    """Compaction must not publish a fold that misses a commit landing
    between its read and its claim: forced into that interleaving, the
    first attempt aborts and the retry folds the committed row in."""
    from aerovaldb_spark.db import AerovalSparkDB

    db = _mkdb(tmp_path)
    db2 = AerovalSparkDB(db.spark, db.root)
    db.put_config({"v": 1}, "p", "e")
    db.flush()

    real_stage = AerovalSparkDB._compact_stage
    hook = {"armed": True}

    def stage_then_commit(self):
        staged = real_stage(self)
        if hook["armed"]:
            hook["armed"] = False
            db2.transact(lambda d: d.put_config({"v": 2}, "p", "e"))
        return staged

    monkeypatch.setattr(AerovalSparkDB, "_compact_stage", stage_then_commit)
    db.compact()
    db.refresh()
    assert db.get_config("p", "e") == {"v": 2}  # commit survived
    # both attempts' claims resolved (none left pending)
    for n in db._scan_claim_numbers():
        assert db._read_claim(n) is not None


def test_transact_fn_exception_discards_partial_puts(tmp_path):
    db = _mkdb(tmp_path)
    db.put_config({"v": 1}, "p", "e")
    db.flush()

    def bad(d):
        d.put_config({"v": 666}, "p", "e")
        raise RuntimeError("validation failed")

    try:
        db.transact(bad)
    except RuntimeError:
        pass
    db.put_menu({"m": 1}, "p", "e")  # unrelated later write
    db.flush()
    assert db.get_config("p", "e") == {"v": 1}  # aborted put NOT committed


def test_fsck_detects_and_repairs(tmp_path, monkeypatch):
    """fsck flags crashed-writer leftovers (stale pending claim,
    orphan rewrite dirs) and repairs them; a clean store is ok."""
    from aerovaldb_spark.db import AerovalSparkDB

    db = _mkdb(tmp_path)
    db.put_config({"v": 1}, "p", "e")
    db.flush()
    assert db.fsck()["ok"]

    # A FRESH staging dir (in-flight rewrite in another process) is
    # presumed live under the real timeout: not reported, not removed.
    live = os.path.join(db.root, "config.tmp-inflight")
    os.makedirs(live)
    rep_live = db.fsck(repair=True)
    assert rep_live["ok"] and not rep_live["orphan_dirs"]
    assert os.path.isdir(live)
    os.rmdir(live)

    # simulate a crashed writer: claim without resolution, old tmp dir
    monkeypatch.setattr(AerovalSparkDB, "_CLAIM_RESOLVE_TIMEOUT", 0.0)
    n = db._claim_next()
    os.makedirs(os.path.join(db.root, "config.tmp-deadbeef"))

    rep = db.fsck()
    assert not rep["ok"]
    assert n in rep["stale_pending_claims"]
    assert "config.tmp-deadbeef" in rep["orphan_dirs"]

    rep2 = db.fsck(repair=True)
    assert rep2["ok"]
    assert db._read_claim(n)["status"] == "aborted"
    assert db.fsck()["ok"]  # clean after repair
    assert db.get_config("p", "e") == {"v": 1}  # data untouched
