"""Async facade, advisory locking, shredded analytics, distributed
import, and edge-case keys (FIXTURES.md §3)."""

from __future__ import annotations

import asyncio
import os

import pytest

from aerovaldb_spark.db import AerovalSparkDB
from aerovaldb_spark.routes import Route


# --- async facade ---------------------------------------------------------

def test_async_facade(tmpdb):
    from aerovaldb_spark.aio import AsyncAerovalSparkDB

    adb = AsyncAerovalSparkDB(tmpdb)

    async def flow():
        await adb.put_config({"c": 1}, "p", "e")
        got = await adb.get_config("p", "e")
        uris = await adb.list_all()
        return got, uris

    got, uris = asyncio.run(flow())
    assert got == {"c": 1}
    assert uris == ["/v0/config/p/e"]
    assert adb.sync is tmpdb


def test_async_query_iter(tmpdb):
    from aerovaldb_spark.aio import AsyncAerovalSparkDB
    from aerovaldb_spark.routes import Route

    tmpdb.put_config({"c": 1}, "p", "e1")
    tmpdb.put_config({"c": 2}, "p", "e2")
    adb = AsyncAerovalSparkDB(tmpdb)

    async def flow():
        uris = [e.uri async for e in adb.query_iter(Route.CONFIG)]
        one = [e.uri async for e in adb.query_iter(Route.CONFIG, limit=1)]
        return uris, one

    uris, one = asyncio.run(flow())
    assert sorted(uris) == ["/v0/config/p/e1", "/v0/config/p/e2"]
    assert len(one) == 1 and one[0] in uris


# --- locking --------------------------------------------------------------

def test_fake_lock_default():
    from aerovaldb_spark.lock import FakeLock, make_lock

    assert isinstance(make_lock("/tmp/x"), FakeLock)


def test_file_lock_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("AVDB_USE_LOCKING", "1")
    monkeypatch.setenv("AVDB_LOCK_DIR", str(tmp_path / "locks"))
    from aerovaldb_spark.lock import FileLock, make_lock

    lock = make_lock(str(tmp_path / "db"))
    assert isinstance(lock, FileLock)
    with lock:
        assert os.listdir(tmp_path / "locks")
    with lock:  # reacquirable after release
        pass


def test_db_flush_under_locking(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("AVDB_USE_LOCKING", "true")
    monkeypatch.setenv("AVDB_LOCK_DIR", str(tmp_path / "locks"))
    db = AerovalSparkDB(spark, str(tmp_path / "db"))
    db.put_config({"c": 1}, "p", "e")
    db.flush()
    assert db.get_config("p", "e") == {"c": 1}


# --- shredded glob_stats --------------------------------------------------

GLOB = {
    "var1": {
        "net1": {
            "lay1": {
                "mod1": {
                    "mv1": {
                        "regA": {"2020": {"bias": 0.5, "rmse": 1.25}},
                        "regB": {"2021": {"bias": float("nan")}},
                    }
                }
            }
        }
    }
}


def test_glob_stats_long(tmpdb):
    tmpdb.put_glob_stats(GLOB, "p", "e", "monthly")
    tmpdb.put_glob_stats({"v2": {"n": {"l": {"m": {"mv": {"r": {"t": {"x": 2.0}}}}}}}},
                         "p", "e2", "monthly")
    long = tmpdb.glob_stats_long()
    rows = long.collect()
    assert len(rows) == 4  # bias+rmse+nan-bias for e, x for e2
    r = {
        (row["experiment"], row["region"], row["time"], row["stat_name"]): row["value"]
        for row in rows
    }
    assert r[("e", "regA", "2020", "bias")] == 0.5
    assert r[("e", "regA", "2020", "rmse")] == 1.25
    assert r[("e", "regB", "2021", "bias")] is None  # NaN → null
    # filter-pushdown analytics path: heatmap as a WHERE clause
    from aerovaldb_spark.filters import glob_stats_shredded_filter

    hm = glob_stats_shredded_filter(long, region="regA", time="2020")
    assert hm.count() == 2
    # project filter prunes
    assert tmpdb.glob_stats_long(experiment="e2").count() == 1


# --- distributed import ---------------------------------------------------

def test_distributed_import_matches_loop(spark, tmp_path):
    from aerovaldb_spark.sources import (
        import_jsondb_tree,
        import_jsondb_tree_distributed,
    )

    testdb = "/root/reference/tests/test-db/json"
    if not os.path.isdir(testdb):
        pytest.skip("reference test-db not present")
    a = AerovalSparkDB(spark, str(tmp_path / "loop"))
    b = AerovalSparkDB(spark, str(tmp_path / "dist"))
    ra = import_jsondb_tree(a, testdb)
    rb = import_jsondb_tree_distributed(b, testdb)
    assert rb.imported == ra.imported
    assert sorted(a.list_all()) == sorted(b.list_all())
    assert b.get_config("project", "experiment") == a.get_config(
        "project", "experiment"
    )


# --- IVF similarity --------------------------------------------------------

def test_ivf_topk_recall(spark):
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    query = emb.filter("vec_id = 0")
    exact = {r["neighbor_id"] for r in brute_force_topk(emb, query, k=10).collect()}
    approx = {r["neighbor_id"] for r in
              ivf_topk(emb, query, k=10, n_lists=8, n_probe=4).collect()}
    # probing half the lists should recover most of the true top-10
    assert len(exact & approx) >= 5, (exact, approx)


def test_ivf_topk_batch_of_queries_single_plan(spark):
    """A multi-row query set scores in ONE plan (no per-query union):
    every query gets exactly k ranked neighbors, and the plan contains
    a single scan-join, not a UNION of per-query jobs."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import ivf_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id IN (0, 1, 2, 3, 4)")
    out = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in by_q.values())
    # n_probe == n_lists probes everything -> exact: neighbor sets must
    # match brute force for a spot-checked query
    from aerovaldb_spark.operators.similarity import brute_force_topk

    exact = {r["neighbor_id"]
             for r in brute_force_topk(emb, emb.filter("vec_id = 2"), k=5).collect()}
    assert {r["neighbor_id"] for r in by_q[2]} == exact


def test_cosine_near_dup_guard(spark):
    """The all-pairs baseline refuses production-size inputs."""
    import pytest as _pytest

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import cosine_near_dup_pairs

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with _pytest.raises(ValueError, match="validation baseline"):
        cosine_near_dup_pairs(emb, max_rows=10)
    # explicit override still works
    assert cosine_near_dup_pairs(emb.limit(20), max_rows=None).count() >= 0


# --- edge-case keys (FIXTURES.md §3) --------------------------------------

@pytest.mark.parametrize(
    "experiment",
    ["FFire2022_eea", "with/slash", "pct%val", "mix/of_all%three"],
)
def test_tricky_key_values_roundtrip(tmpdb, experiment):
    tmpdb.put_config({"e": experiment}, "proj", experiment)
    assert tmpdb.get_config("proj", experiment) == {"e": experiment}
    tmpdb.flush()
    assert tmpdb.get_config("proj", experiment) == {"e": experiment}
    entries = tmpdb.query(Route.CONFIG, experiment=experiment)
    assert len(entries) == 1
    # URI round-trips through encode/parse
    assert tmpdb.get_by_uri(entries[0].uri) == {"e": experiment}


def test_tricky_project_partition_value(tmpdb):
    # project is a PARTITION column — special chars must survive
    # Spark's partition-dir escaping too.
    tmpdb.put_config({"x": 1}, "pro/ject %odd", "e")
    tmpdb.flush()
    assert tmpdb.get_config("pro/ject %odd", "e") == {"x": 1}


def test_brute_force_topk_multi_query_ranks_per_query(spark):
    """With a multi-row query set, every query gets its own k
    neighbors (not a global top-k across queries)."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter("vec_id IN (0, 1, 2)")
    rows = brute_force_topk(emb, queries, k=4).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {0, 1, 2}
    assert all(len(v) == 4 for v in by_q.values())
    # each query's set matches its own single-query run
    solo = {r["neighbor_id"]
            for r in brute_force_topk(emb, emb.filter("vec_id = 1"), k=4).collect()}
    assert set(by_q[1]) == solo
