"""Scale-technique tests: salted joins preserve semantics; bucketed
joins eliminate the shuffle (asserted on the physical plan)."""

from __future__ import annotations

import pytest

from aerovaldb_spark.operators.scale import bucketed_join, salted_join, write_bucketed
from aerovaldb_spark.plans import shuffle_count


@pytest.fixture()
def skewed(spark):
    # 10k rows of one hot key + a uniform tail
    left = spark.sql(
        "SELECT CASE WHEN id < 10000 THEN 7 ELSE id END AS k, id AS v"
        " FROM range(12000)"
    )
    right = spark.sql("SELECT id AS k, id * 10 AS w FROM range(3000)")
    return left, right


def test_salted_join_matches_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").selectExpr("k", "v", "w")
    salted = salted_join(left, right, "k").selectExpr("k", "v", "w")
    assert plain.count() == salted.count()
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_left_outer(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", how="left")
    assert plain.count() == salted.count()


def test_bucketed_join_no_shuffle(spark):
    # managed tables land in the default warehouse dir; dropped in finally
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # disable broadcast so the test observes bucketing, not broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "orderkey"),
            "b_orders", "orderkey", 4,
        )
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "orderkey"),
            "b_lineitem", "orderkey", 4,
        )
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "orderkey")
        n_shuffles = shuffle_count(joined)
        plain = orders.join(
            li, orders.o_orderkey == li.l_orderkey
        )
        assert n_shuffles == 0, f"bucketed join still shuffles: {n_shuffles}"
        assert shuffle_count(plain) >= 2  # both sides shuffle without buckets
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_stop_shingle_cap_bounds_pair_blowup(spark):
    """A shingle shared by every document makes the self-join
    quadratic; max_doc_freq drops it while pairs from rare shingles
    survive untouched."""
    from aerovaldb_spark.operators.dedup import shingle_pairs

    stop = "the quick brown"  # 3-gram present in every doc
    rows = [(i, f"{stop} doc{i} unique words here") for i in range(40)]
    # docs 0 and 1 additionally share a RARE 5-word tail
    rows[0] = (0, f"{stop} alpha beta gamma delta epsilon")
    rows[1] = (1, f"{stop} alpha beta gamma delta epsilon")
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = shingle_pairs(docs, 3).count()
    assert uncapped == 40 * 39 // 2  # stop shingle links every pair

    capped = shingle_pairs(docs, 3, max_doc_freq=10)
    capped_rows = {(r["doc_a"], r["doc_b"]): r["shared"] for r in capped.collect()}
    assert set(capped_rows) == {(0, 1)}  # only the genuinely similar pair
    # all 5 rare shingles survive (3 tail shingles + the 2 bridge
    # shingles that straddle the stop phrase); only the stop shingle
    # itself is dropped
    assert capped_rows[(0, 1)] == 5


def test_graded_jaccard_chain_survives_hot_shingle_corpus(spark):
    """The graded q26 chain must carry the stop-shingle guard itself:
    on a corpus where one boilerplate phrase appears in EVERY document,
    the guarded pair set stays linear (only the genuinely-similar pair
    survives) instead of the quadratic C(n,2) blowup — and the DuckDB
    oracle, given the same corpus, agrees value-for-value."""
    import duckdb

    from aerovaldb_spark.operators.dedup import Q26_SQL, ngram_jaccard_pairs

    boiler = "click here to subscribe now"  # 5-word tail, in every doc
    rows = [
        (i, f"uw{i}a uw{i}b uw{i}c uw{i}d uw{i}e uw{i}f {boiler}")
        for i in range(40)
    ]
    # docs 0 and 1 share a rare 7-word body -> the one real near-dup
    rare = "alpha beta gamma delta epsilon zeta eta"
    rows[0] = (0, f"{rare} {boiler}")
    rows[1] = (1, f"{rare} {boiler}")
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    got = {
        (r["doc_a"], r["doc_b"]): (r["shared"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, 3).collect()
    }
    # guard active: the 3 boilerplate shingles (df=40 > cap=10) are
    # dropped, so the 778 boilerplate-only pairs vanish; the rare pair
    # keeps its 7 surviving shingles (5 body + 2 body/boiler bridges)
    assert set(got) == {(0, 1)}
    assert got[(0, 1)][0] == 7

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    oracle = {
        (a, b): (s, j)
        for a, b, s, j in con.execute(Q26_SQL).fetchall()
    }
    assert oracle == got


def test_stop_shingle_absolute_ceiling_binds_at_large_corpora(spark):
    """The cap is min(ABS_MAX_STOP_DF, n/4) above small corpora: on a
    1500-doc corpus (relative cap 375) a boilerplate shingle with
    df=300 must STILL be dropped — the absolute ceiling (256) is what
    keeps per-shingle fan-out bounded at 1e9-doc scale, where a purely
    relative cap would admit quadratic joins."""
    from aerovaldb_spark.operators.dedup import (
        ABS_MAX_STOP_DF,
        STOP_DF_DENOM,
        stop_filtered_shingles,
    )

    n = 1500
    assert n // STOP_DF_DENOM > ABS_MAX_STOP_DF  # ceiling is the binding cap
    boiler = "click here now"
    rows = [
        (i, f"uw{i}a uw{i}b uw{i}c {boiler}" if i < 300 else f"uw{i}a uw{i}b uw{i}c uw{i}d")
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    kept = stop_filtered_shingles(docs, 3)
    # the boilerplate shingle (df=300 > 256) is gone; unique shingles stay
    from aerovaldb_spark.operators.dedup import hash60

    from pyspark.sql import functions as F

    boiler_h = (
        docs.limit(0)
        .sparkSession.createDataFrame([(boiler,)], ["s"])
        .select(hash60(F.col("s")).alias("h"))
        .collect()[0]["h"]
    )
    assert kept.filter(F.col("h") == boiler_h).count() == 0
    assert kept.count() > 0
    # per-hash fan-out in the kept set respects the ceiling
    max_df = (
        kept.groupBy("h").count().agg(F.max("count").alias("m")).collect()[0]["m"]
    )
    assert max_df <= ABS_MAX_STOP_DF


def test_ivf_index_save_load_matches_ephemeral(spark, tmp_path):
    """IVFIndex build→save→load→topk returns exactly what the
    ephemeral ivf_topk computes (same seeded KMeans), and the on-disk
    probe scan is partition-pruned to the probed lists."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import IVFIndex, ivf_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)

    ephemeral = sorted(
        map(tuple, ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3).collect())
    )

    idx = IVFIndex.build(emb, n_lists=8)
    path = str(tmp_path / "ivf")
    idx.save(path)
    loaded = IVFIndex.load(spark, path)

    got_df = loaded.topk(queries, k=5, n_probe=3)
    got = sorted(map(tuple, got_df.collect()))
    assert got == ephemeral and len(got) == 15

    # layout: one directory per list; probe scan prunes partitions
    import os as _os

    dirs = {d for d in _os.listdir(path + "/assignments")
            if d.startswith("list_id=")}
    assert len(dirs) == 8
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_frozen_ivf_save_load_matches_q66(spark, tmp_path):
    """q66's frozen-centroid serve path survives the full persisted
    lifecycle: an IVFIndex built from ivf_assign over the FROZEN
    centroids, saved and reloaded, serves bit-identical results to
    the graded q66 query (which constructs the index in memory)."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        Q66_K,
        Q66_N_PROBE,
        frozen_ivf_centroids,
        ivf_assign,
        q66_ivf_topk,
    )

    sf = "/root/testdata/sf0.001"
    direct = sorted(map(tuple, q66_ivf_topk(spark, sf).collect()))
    assert len(direct) == 5 * Q66_K

    emb = load_table(spark, sf, "embeddings")
    cents = frozen_ivf_centroids(spark)
    idx = IVFIndex(cents, ivf_assign(emb, cents), "embedding", "vec_id")
    path = str(tmp_path / "frozen_ivf")
    idx.save(path)
    loaded = IVFIndex.load(spark, path)
    got = sorted(
        map(
            tuple,
            loaded.topk(
                emb.filter(F.col("vec_id") < 5), k=Q66_K, n_probe=Q66_N_PROBE
            ).collect(),
        )
    )
    assert got == direct


def test_ivf_index_add_under_frozen_centroids(spark, tmp_path):
    """Incremental append, KMeans family: with centroids FROZEN,
    assignment is deterministic (ivf_assign's round6 + tie-break), so
    an index over `old` plus add(new) must serve bit-identically to a
    one-shot assignment over the union — in memory, after a parquet
    append, and for the quantized variant. Centroids are never
    rewritten by the append."""
    import os as _os

    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        QuantizedIVFIndex,
        frozen_ivf_centroids,
        ivf_assign,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    old = emb.filter(F.col("vec_id") % 3 != 0)
    new = emb.filter(F.col("vec_id") % 3 == 0)
    queries = emb.filter(F.col("vec_id") < 5)
    cents = frozen_ivf_centroids(spark)

    want = sorted(
        map(
            tuple,
            IVFIndex(cents, ivf_assign(emb, cents), "embedding", "vec_id")
            .topk(queries, k=5, n_probe=3)
            .collect(),
        )
    )
    idx = IVFIndex(cents, ivf_assign(old, cents), "embedding", "vec_id")
    got_mem = sorted(
        map(tuple, idx.add(new).topk(queries, k=5, n_probe=3).collect())
    )
    assert got_mem == want

    path = str(tmp_path / "ivf_grow")
    idx.save(path)
    cent_mtime = max(
        _os.path.getmtime(_os.path.join(path, "centroids", f))
        for f in _os.listdir(_os.path.join(path, "centroids"))
    )
    disk = IVFIndex.load(spark, path).add(new, path=path)
    assert (
        sorted(map(tuple, disk.topk(queries, k=5, n_probe=3).collect()))
        == want
    )
    # centroids untouched by the append (frozen model files unchanged)
    assert cent_mtime == max(
        _os.path.getmtime(_os.path.join(path, "centroids", f))
        for f in _os.listdir(_os.path.join(path, "centroids"))
    )
    assert (
        sorted(
            map(
                tuple,
                IVFIndex.load(spark, path)
                .topk(queries, k=5, n_probe=3)
                .collect(),
            )
        )
        == want
    )

    want_q = sorted(
        map(
            tuple,
            QuantizedIVFIndex.build(emb, cents)
            .topk(queries, k=5, n_probe=3)
            .collect(),
        )
    )
    qidx = QuantizedIVFIndex.build(old, cents)
    assert (
        sorted(
            map(
                tuple,
                qidx.add(new).topk(queries, k=5, n_probe=3).collect(),
            )
        )
        == want_q
    )
    qpath = str(tmp_path / "qivf_grow")
    qidx.save(qpath)
    qdisk = QuantizedIVFIndex.load(spark, qpath).add(new, path=qpath)
    assert (
        sorted(
            map(tuple, qdisk.topk(queries, k=5, n_probe=3).collect())
        )
        == want_q
    )


def test_quantized_ivf_save_load_matches_ephemeral(spark, tmp_path):
    """QuantizedIVFIndex build→save→load→topk bit-equals the graded
    q108 (which serves from the in-memory build), and the on-disk
    probe scan is partition-pruned to the probed lists — the
    n_probe/n_lists × 1/4-bytes promise is physical, not notional."""
    import os as _os

    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        Q66_K,
        Q66_N_PROBE,
        QuantizedIVFIndex,
        frozen_ivf_centroids,
        q108_quantized_ivf_ann,
    )

    sf = "/root/testdata/sf0.001"
    direct = sorted(map(tuple, q108_quantized_ivf_ann(spark, sf).collect()))
    assert len(direct) == 5 * Q66_K

    emb = load_table(spark, sf, "embeddings")
    idx = QuantizedIVFIndex.build(emb, frozen_ivf_centroids(spark))
    path = str(tmp_path / "qivf")
    idx.save(path)
    loaded = QuantizedIVFIndex.load(spark, path)
    got_df = loaded.topk(
        emb.filter(F.col("vec_id") < 5), k=Q66_K, n_probe=Q66_N_PROBE
    )
    got = sorted(map(tuple, got_df.collect()))
    assert got == direct

    # tinyint codes on disk (the 1/4-bytes half of the promise) and a
    # partition-pruned scan (the n_probe/n_lists half)
    schema = spark.read.parquet(path + "/assignments").schema
    assert schema["codes"].dataType.simpleString() == "array<tinyint>"
    assert any(
        d.startswith("list_id=")
        for d in _os.listdir(path + "/assignments")
    )
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_probe_assignment_is_executor_side(spark):
    """Probe-list assignment runs as a distributed plan (broadcast
    centroid join + window), matches an independent numpy
    nearest-centroid computation exactly (including list_id
    tie-breaks), and handles a 100k-query batch whose rows never
    touch the driver — the shape that replaced the per-query Python
    loop."""
    import numpy as np
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import _probe_lists

    dim, n_lists, n_probe = 8, 16, 4
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(n_lists, dim)).round(3)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    )

    # small batch: exact numpy cross-check (stable sort == list_id
    # ascending tie-break)
    qv = rng.normal(size=(50, dim)).round(3)
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(qv)],
        "vec_id long, embedding array<double>",
    )
    probes = _probe_lists(qdf, centroids, n_probe, "embedding", "vec_id")

    plan = probes._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" in plan

    got = {}
    for r in probes.collect():
        got.setdefault(r["query_id"], []).append(r["list_id"])
    for i, v in enumerate(qv):
        d2 = ((cents - v) ** 2).sum(axis=1)
        want = list(np.argsort(d2, kind="stable")[:n_probe])
        assert sorted(got[i]) == sorted(int(w) for w in want), i

    # 100k-query batch built entirely executor-side (spark.range →
    # expression-generated vectors): one distributed job, driver holds
    # no per-query state
    big = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            "j -> cast(pmod(id * 37 + j * 11, 19) - 9 as double) / 3.0)"
        ).alias("embedding"),
    )
    big_probes = _probe_lists(big, centroids, n_probe, "embedding", "vec_id")
    assert (
        big_probes.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("query_id").alias("q"),
        ).collect()[0]
    ) == (100_000 * n_probe, 100_000)


def test_index_add_refuses_unsaved_path(spark, tmp_path):
    """Review regression: add(path=...) into a directory with no saved
    index used to write half a layout before load() failed on the
    missing meta/centroids — every family must refuse BEFORE writing."""
    import os as _os

    import pytest
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        SRPIndex,
        frozen_ivf_centroids,
        ivf_assign,
    )
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    new = emb.filter(F.col("vec_id") % 7 == 0)
    fresh = str(tmp_path / "nowhere")

    srp = SRPIndex.build(emb, dim=64)
    with pytest.raises(ValueError, match="no saved index"):
        srp.add(new, path=fresh)
    cents = frozen_ivf_centroids(spark)
    ivf = IVFIndex(cents, ivf_assign(emb, cents), "embedding", "vec_id")
    with pytest.raises(ValueError, match="no saved index"):
        ivf.add(new, path=fresh)
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = TfidfScreenIndex.build(docs.limit(50))
    with pytest.raises(ValueError, match="no saved screen index"):
        idx.add(docs.limit(5), path=fresh)
    # nothing was written to any of the refused paths
    assert not _os.path.exists(fresh)


def test_compact_crash_window_recovery(spark, tmp_path):
    """A crash inside compact's rename window (live moved to .old,
    staging not yet moved in) must be recoverable: load() falls back
    to the .old state, add() REFUSES (an append would create a fresh
    live dir with only the new rows), and re-running compact()
    completes the swap."""
    import os as _os
    import shutil as _shutil

    import pytest
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "srp_crash")
    SRPIndex.build(emb, dim=64).save(path)
    want = sorted(
        map(tuple, SRPIndex.load(spark, path).topk(queries, k=5).collect())
    )

    # simulate the crash: live renamed away, staging incomplete
    live = _os.path.join(path, "assignments")
    _os.replace(live, live + ".old")
    _os.makedirs(live + ".staging")

    got = sorted(
        map(tuple, SRPIndex.load(spark, path).topk(queries, k=5).collect())
    )
    assert got == want  # .old fallback serves the consistent state
    with pytest.raises(ValueError, match="interrupted compaction"):
        SRPIndex.load(spark, path).add(
            emb.filter(F.col("vec_id") % 9 == 0), path=path
        )
    _shutil.rmtree(live + ".staging")
    recovered = SRPIndex.compact(spark, path)
    assert _os.path.isdir(live) and not _os.path.exists(live + ".old")
    assert (
        sorted(map(tuple, recovered.topk(queries, k=5).collect())) == want
    )

    # the NEITHER-exists window (a crashed re-save deleted live before
    # committing): an append must refuse — it would otherwise create a
    # fresh live dir holding only the new rows, silently dropping the
    # reference
    _shutil.rmtree(live)
    with pytest.raises(ValueError, match="missing dataset"):
        SRPIndex(
            recovered.assignments, 64, recovered.planes, "embedding",
            "vec_id",
        ).add(emb.filter(F.col("vec_id") % 9 == 0), path=path)
    assert not _os.path.exists(live)  # nothing was written

    # save() clears stale .old leftovers so a later crashed re-save
    # can't silently serve the pre-rebuild state
    SRPIndex.build(emb, dim=64).save(path)
    _os.replace(live, live + ".old")  # simulate interrupted compact
    SRPIndex.build(emb, dim=64).save(path)
    assert _os.path.isdir(live) and not _os.path.exists(live + ".old")
