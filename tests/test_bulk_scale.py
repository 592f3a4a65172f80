"""Volume smoke: the asset store at thousands of keys — bulk import,
partition-pruned point reads, catalog scans, selective deletes."""

from __future__ import annotations

from pyspark.sql import functions as F

from aerovaldb_spark.db import AerovalSparkDB
from aerovaldb_spark.routes import Route

N_PROJECTS = 4
N_EXPERIMENTS = 5
N_TS = 100  # timeseries per (project, experiment)


def test_bulk_import_and_access(spark, tmp_path):
    db = AerovalSparkDB(spark, str(tmp_path / "big"))
    rows = spark.range(N_PROJECTS * N_EXPERIMENTS * N_TS).select(
        F.concat(F.lit("proj"), (F.col("id") % N_PROJECTS)).alias("project"),
        F.concat(F.lit("exp"), ((F.col("id") / N_PROJECTS).cast("long") % N_EXPERIMENTS)).alias(
            "experiment"
        ),
        F.concat(F.lit("loc"), F.col("id")).alias("location"),
        F.lit("net").alias("network"),
        F.lit("ov").alias("obsvar"),
        F.lit("lay").alias("layer"),
        F.concat(F.lit('{"n": '), F.col("id"), F.lit("}")).alias("payload"),
    )
    db.bulk_import(Route.TIMESERIES, rows)

    total = N_PROJECTS * N_EXPERIMENTS * N_TS
    # catalog scan with equality predicates
    entries = db.query(Route.TIMESERIES, project="proj1")
    assert len(entries) == total // N_PROJECTS

    # point read hits exactly one row (partition-pruned on project)
    e = entries[0]
    doc = db.get_by_uri(e.uri)
    assert set(doc) == {"n"}

    # typed getter against bulk-imported data
    assert db.get_timeseries(
        "proj0", "exp0", "loc0", "net", "ov", "lay"
    ) == {"n": 0}

    # per-experiment delete removes exactly that slice
    db.rm_experiment_data("proj1", "exp2")
    left = db.query(Route.TIMESERIES, project="proj1")
    assert len(left) == total // N_PROJECTS - len(
        [1 for x in entries if x.meta["experiment"] == "exp2"]
    )
    # other projects untouched
    assert len(db.query(Route.TIMESERIES, project="proj2")) == total // N_PROJECTS


def test_connected_components_matches_union_find(spark):
    """Distributed min-label propagation == driver union-find on the
    same edge set (chains force multi-iteration convergence)."""
    from aerovaldb_spark.operators.dedup import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),      # a 5-chain
        (10, 11), (11, 12),                  # a triangle-ish path
        (20, 21),                            # a pair
        (30, 31), (31, 32), (30, 32),        # a triangle
    ]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["v"]: r["component"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {v: find(v) for v in parent}
    assert got == want


def test_q56_clusters_on_documents(spark):
    from aerovaldb_spark.operators.dedup import q56_dedup_clusters

    rows = q56_dedup_clusters(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    comp = {r["doc_id"]: r["component"] for r in rows}
    # canonical representative is a member of its own cluster
    for c in set(comp.values()):
        assert comp[c] == c
    # deterministic across runs
    again = {r["doc_id"]: r["component"]
             for r in q56_dedup_clusters(spark, "/root/testdata/sf0.001").collect()}
    assert comp == again
