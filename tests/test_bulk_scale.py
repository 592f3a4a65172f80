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


def _parquet_files(root):
    import pathlib

    return [
        p for p in pathlib.Path(root).rglob("*.parquet") if p.is_file()
    ]


def test_rewrite_and_copy_write_in_parallel(spark, tmp_path):
    """Neither _rewrite_table nor copy_db_contents may funnel a table
    through one task: with one scan partition per source file, a
    multi-file table must produce multiple output files."""
    from aerovaldb_spark.db import copy_db_contents
    from aerovaldb_spark.routes import table_name

    db = AerovalSparkDB(spark, str(tmp_path / "src"))
    for i in range(6):
        db.put_config({"i": i}, "p", f"exp{i}")
        db.flush()  # one file per flush -> 6 files in the project dir
    table_dir = f"{db.root}/{table_name(Route.CONFIG)}"
    assert len(_parquet_files(table_dir)) >= 2

    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = spark.conf.get("spark.sql.files.openCostInBytes")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "2048")
    # AQE legitimately coalesces this tiny shuffle to one partition;
    # disable it so a hard coalesce(1) in the write path is the only
    # thing that could produce a single file.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # rewrite path (also exercised by rm_experiment_data/compact)
        db.rm_experiment_data("p", "exp0")
        assert len(_parquet_files(table_dir)) >= 2, "rewrite funneled to one task"
        assert len(db.list_all()) == 5

        dest = AerovalSparkDB(spark, str(tmp_path / "dst"))
        copy_db_contents(db, dest)
        dest_dir = f"{dest.root}/{table_name(Route.CONFIG)}"
        assert len(_parquet_files(dest_dir)) >= 2, "copy funneled to one task"
        assert len(dest.list_all()) == 5
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_open)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_bulk_import_dedupes_keys_within_batch(spark, tmp_path):
    """Two batch rows for one key share the batch seq — the import must
    keep exactly one (latest write_ts) so LWW stays deterministic."""
    import datetime as dt

    db = AerovalSparkDB(spark, str(tmp_path / "dd"))
    rows = spark.createDataFrame(
        [
            ("p", "e", '{"v": "old"}', dt.datetime(2024, 1, 1)),
            ("p", "e", '{"v": "new"}', dt.datetime(2024, 1, 2)),
            ("p", "e2", '{"v": "other"}', dt.datetime(2024, 1, 1)),
        ],
        "project string, experiment string, payload string, write_ts timestamp",
    )
    db.bulk_import(Route.CONFIG, rows)
    assert db.get_config("p", "e") == {"v": "new"}
    assert db.get_config("p", "e2") == {"v": "other"}
    # exactly one stored row per key — the tie never reaches the LWW window
    disk = spark.read.parquet(f"{db.root}/{_table_name(Route.CONFIG)}")
    assert disk.filter(F.col("experiment") == "e").count() == 1


def _table_name(route):
    from aerovaldb_spark.routes import table_name

    return table_name(route)


def test_compact_sidecar_has_null_payload(spark, tmp_path):
    """Compaction must not store live payloads twice: the ctime sidecar
    row carries NULL payload, so a single-version table stays ~constant
    in row width after compact()."""
    db = AerovalSparkDB(spark, str(tmp_path / "cp"))
    db.put_config({"v": 1}, "p", "e")
    db.flush()
    ctime = db.get_config("p", "e", access_type="CTIME")
    db.compact()
    disk = spark.read.parquet(f"{db.root}/{_table_name(Route.CONFIG)}")
    rows = disk.collect()
    assert len(rows) == 2  # live row + ctime sidecar
    payloads = [r["payload"] for r in rows]
    assert sum(p is not None for p in payloads) == 1
    assert db.get_config("p", "e") == {"v": 1}
    assert db.get_config("p", "e", access_type="CTIME") == ctime


def test_connected_components_raises_on_non_convergence(spark):
    import pytest

    from aerovaldb_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)


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


def test_lsh_pipeline_edges_subset_with_high_recall(spark):
    """The q62 scale path must be a sound approximation of the exact
    pair graph: every LSH-verified edge is an exact near-dup edge
    (verification guarantees soundness), and banded LSH at these
    parameters recovers ~all of them (recall bound; measured 1.0 at
    this SF — bounded at 0.8 to absorb corpus regeneration)."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators import dedup

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.q26_ngram_jaccard_pairs(spark, SF)
        .filter(F.col("jaccard") >= 0.2)
        .collect()
    }
    cand = dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))
    verified = {
        (r.doc_a, r.doc_b)
        for r in dedup.verified_jaccard_pairs(docs, cand).collect()
    }
    assert verified <= exact  # soundness: no false edges survive verify
    assert len(verified) >= 0.8 * len(exact) > 0  # recall


def test_q62_components_refine_q56(spark):
    """q62 clusters on an edge SUBSET of q56's graph, so each q62
    component must sit entirely inside one q56 component (missing
    edges can split clusters, never merge them)."""
    from aerovaldb_spark.operators.dedup import (
        q56_dedup_clusters,
        q62_dedup_pipeline,
    )

    SF = "/root/testdata/sf0.001"
    exact = {r["doc_id"]: r["component"] for r in q56_dedup_clusters(spark, SF).collect()}
    lsh = [(r["doc_id"], r["component"]) for r in q62_dedup_pipeline(spark, SF).collect()]
    assert lsh, "pipeline produced no clustered docs"
    by_lsh_comp: dict[int, set[int]] = {}
    for doc, comp in lsh:
        by_lsh_comp.setdefault(comp, set()).add(exact[doc])
    for comp, exact_comps in by_lsh_comp.items():
        assert len(exact_comps) == 1, (
            f"q62 component {comp} spans q56 components {exact_comps}"
        )


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 1000-vertex PATH graph (diameter 999) converges inside the
    25-iteration guard: pointer jumping makes the frontier double per
    iteration (~log2(diameter) rounds), where plain min-label
    propagation needs one round per hop and would raise. This is the
    percolating-near-dup-graph shape (q93 at 10x data) that exposed
    the O(diameter) behavior."""
    from aerovaldb_spark.operators.dedup import connected_components

    edges = spark.sql(
        "SELECT id AS doc_a, id + 1 AS doc_b FROM range(999)"
    )
    comp = connected_components(edges)
    rows = comp.collect()
    assert len(rows) == 1000
    assert all(r["component"] == 0 for r in rows)


def test_connected_components_converges_at_exact_budget(spark):
    """r14 optimization regression pin: the convergence check is now a
    narrow ``label < prev`` filter over the just-checkpointed label
    frame (no new-vs-old join — at scale that join is a per-iteration
    |V|-vs-|V| shuffle). A star graph (diameter 2) must settle within
    max_iter=2: iteration 0 lowers every leaf (its count is skipped),
    iteration 1's count sees zero changes and breaks WITHOUT raising —
    if the new check ever under-counts, the guard would fire here; if
    it over-counts (e.g. compares against the wrong iteration's
    labels), convergence would never be detected."""
    from aerovaldb_spark.operators.dedup import connected_components

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], ["doc_a", "doc_b"]
    )
    comp = connected_components(star, max_iter=2)
    rows = comp.collect()
    assert len(rows) == 8
    assert all(r["component"] == 0 for r in rows)
