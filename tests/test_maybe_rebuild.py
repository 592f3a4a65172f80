"""maybe_rebuild(): staleness -> verdict -> staged rebuild+swap, end
to end for every persisted index family — the r11 verdict's Missing
#2 ("a user gets a True verdict and then hand-rolls the swap the
compact() machinery already knows how to do"). Each test appends
drifted data past a measured threshold, calls maybe_rebuild, and
asserts the swapped index equals a fresh rebuild (bit-equal where the
builder is deterministic), that ingest markers survive the swap, and
that the post-rebuild report reads fresh."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release_persists():
    yield
    from aerovaldb_spark.operators._scope import release_scoped_persists

    release_scoped_persists()


def _emb_halves(spark):
    from aerovaldb_spark.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.where("vec_id % 2 = 0")
    # keep the stored element type: x + 3.0 would promote the
    # array<float> column to array<double> and poison the parquet
    # dataset for later reads
    elem = emb.schema["embedding"].dataType.elementType.simpleString()
    shifted = emb.withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x + F.lit(3.0)).cast(elem)),
    ).withColumn("vec_id", F.col("vec_id") + 10_000)
    return emb, old, shifted


def test_screen_maybe_rebuild_swaps_and_matches_fresh_build(
    spark, tmp_path
):
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    # drifted appends: an entirely new vocabulary, comparable mass ->
    # new_term_mass far past the 0.05 threshold
    new = spark.createDataFrame(
        [
            (700_000 + i, " ".join(f"zz{i}_{j}" for j in range(30)))
            for i in range(300)
        ],
        "doc_id long, text string",
    )
    grown = docs.unionByName(new)
    probes = docs.where("doc_id % 7 = 3")

    p = str(tmp_path / "screen")
    TfidfScreenIndex.build(docs).save(p)
    # a checkpointed stream's epoch markers must survive the swap
    mdir = os.path.join(p, "_ingest_epochs", "run1")
    os.makedirs(mdir)
    open(os.path.join(mdir, "0"), "w").close()
    TfidfScreenIndex.load(spark, p).add(new, path=p)

    idx, verdict, report = TfidfScreenIndex.maybe_rebuild(
        spark, p, docs=grown
    )
    assert verdict.rebuild
    assert report["new_term_mass"] > 0.05
    assert os.path.exists(os.path.join(mdir, "0"))  # markers preserved
    assert not os.path.exists(p + ".old")  # swap completed clean
    want = sorted(
        map(
            tuple,
            TfidfScreenIndex.build(grown).screen(probes).collect(),
        )
    )
    got = sorted(map(tuple, idx.screen(probes).collect()))
    assert got == want
    # idf stats are re-frozen over the grown corpus: drift reads zero
    idx2, v2, r2 = TfidfScreenIndex.maybe_rebuild(spark, p, docs=grown)
    assert not v2.rebuild
    assert r2["idf_drift_mad"] == 0.0 and r2["new_term_mass"] == 0.0


def test_ivf_maybe_rebuild_trips_on_shift_and_refits(spark, tmp_path):
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        ivf_rebuild_verdict,
    )

    _, old, shifted = _emb_halves(spark)
    p = str(tmp_path / "ivf")
    built = IVFIndex.build(old, n_lists=8)
    built.save(p)
    built.save_build_report(p)

    # fresh-enough path first: nothing moved, no swap
    idx0, v0, _ = IVFIndex.maybe_rebuild(spark, p)
    assert not v0.rebuild

    IVFIndex.load(spark, p).add(shifted, path=p)
    idx, verdict, report = IVFIndex.maybe_rebuild(spark, p)
    assert verdict.rebuild, report
    # the refit covers the whole grown corpus
    n_all = old.count() + shifted.count()
    assert idx.assignments.count() == n_all
    assert idx.centroids.count() == 8
    # the rebuild re-baselined: the same call is now fresh
    idx2, v2, r2 = IVFIndex.maybe_rebuild(spark, p)
    assert not v2.rebuild, r2
    # and the stored baseline is the fresh index's own report
    from aerovaldb_spark.operators.similarity import _read_baseline

    base = _read_baseline(spark, p, "build_report").collect()[0]
    assert ivf_rebuild_verdict(r2, base).rebuild is False


def test_srp_maybe_rebuild_replans_with_more_planes_bitequal(
    spark, tmp_path
):
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb, old, shifted = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    built = SRPIndex.build(old, dim, planes=4)
    built.save(p)
    built.save_build_report(p)

    idx0, v0, _ = SRPIndex.maybe_rebuild(spark, p)
    assert not v0.rebuild

    SRPIndex.load(spark, p).add(shifted, path=p)
    idx, verdict, report = SRPIndex.maybe_rebuild(spark, p)
    assert verdict.rebuild, report
    assert idx.planes == 5  # re-planned: one more plane by default
    # the deterministic quantizer makes the swapped index bit-equal
    # to a fresh build at the new dial over the same corpus
    fresh = SRPIndex.build(
        old.unionByName(shifted.select(*old.columns)), dim, planes=5
    )
    queries = emb.where("vec_id % 50 = 1").limit(3)
    assert sorted(map(tuple, idx.topk(queries, k=5).collect())) == sorted(
        map(tuple, fresh.topk(queries, k=5).collect())
    )
    assert idx.assignments.count() == fresh.assignments.count()


def test_srp_maybe_rebuild_without_baseline_stays_fresh(spark, tmp_path):
    """No stored baseline -> the growth/new-bucket triggers have
    nothing to compare against; the verdict stays fresh (documented)
    rather than guessing."""
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb, old, shifted = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    SRPIndex.build(old, dim, planes=4).save(p)  # no save_build_report
    SRPIndex.load(spark, p).add(shifted, path=p)
    idx, verdict, report = SRPIndex.maybe_rebuild(spark, p)
    assert not verdict.rebuild
    assert idx.planes == 4


def test_quantized_srp_maybe_rebuild_resigns_codes_bitequal(
    spark, tmp_path
):
    from aerovaldb_spark.operators.similarity import QuantizedSRPIndex

    emb, old, shifted = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "qsrp")
    built = QuantizedSRPIndex.build(old, dim, planes=4)
    built.save(p)
    built.save_build_report(p)
    QuantizedSRPIndex.load(spark, p).add(shifted, path=p)

    idx, verdict, report = QuantizedSRPIndex.maybe_rebuild(spark, p)
    assert verdict.rebuild, report
    assert idx.planes == 5
    # re-signing the stored codes == build(raw, planes') bit-for-bit
    fresh = QuantizedSRPIndex.build(
        old.unionByName(shifted.select(*old.columns)), dim, planes=5
    )
    key = lambda rows: sorted(  # noqa: E731
        (r["vec_id"], tuple(r["codes"]), r["bucket"]) for r in rows
    )
    assert key(idx.assignments.collect()) == key(
        fresh.assignments.collect()
    )


def test_quantized_ivf_maybe_rebuild_requires_raw_vectors(
    spark, tmp_path
):
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        QuantizedIVFIndex,
    )

    emb, old, shifted = _emb_halves(spark)
    grown = old.unionByName(shifted.select(*old.columns))
    p = str(tmp_path / "qivf")
    centroids = IVFIndex.build(old, n_lists=8).centroids
    built = QuantizedIVFIndex.build(old, centroids)
    built.save(p)
    built.save_build_report(p)
    QuantizedIVFIndex.load(spark, p).add(shifted, path=p)

    # the verdict trips, but codes cannot be inverted: explicit raise
    with pytest.raises(ValueError, match="raw vectors"):
        QuantizedIVFIndex.maybe_rebuild(spark, p)
    idx, verdict, _ = QuantizedIVFIndex.maybe_rebuild(
        spark, p, vectors=grown
    )
    assert verdict.rebuild
    assert idx.assignments.count() > 0
    # refit centroids cover the shifted mass: the same call is fresh
    idx2, v2, r2 = QuantizedIVFIndex.maybe_rebuild(
        spark, p, vectors=grown
    )
    assert not v2.rebuild, r2


def test_rebuild_root_crash_window_is_load_recoverable(spark, tmp_path):
    """Simulate a crash inside rebuild_root's swap (live renamed to
    .old, staging not yet moved in): load() serves the intact
    pre-rebuild state via the root-level resolve_live fallback."""
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb, old, _ = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    SRPIndex.build(old, dim, planes=4).save(p)
    n = SRPIndex.load(spark, p).assignments.count()
    os.replace(p, p + ".old")  # the mid-swap state
    recovered = SRPIndex.load(spark, p)
    assert recovered.assignments.count() == n


def test_rebuild_root_preserves_markers_from_old_after_crashed_swap(
    tmp_path,
):
    """Re-running a rebuild after a crash inside the swap window (only
    <path>.old exists) must still carry the ingest markers over —
    reading them from the RESOLVED root, not the missing live one
    (review finding: the unresolved read silently dropped every
    marker with the .old cleanup)."""
    from aerovaldb_spark.operators._staging import rebuild_root

    p = str(tmp_path / "idx")
    os.makedirs(os.path.join(p, "_ingest_epochs", "run1"))
    open(os.path.join(p, "_ingest_epochs", "run1", "0"), "w").close()
    os.replace(p, p + ".old")  # the mid-swap crash state

    def save_fn(staging):
        os.makedirs(os.path.join(staging, "data"))
        open(os.path.join(staging, "data", "part-0"), "w").close()

    rebuild_root(p, save_fn)
    assert os.path.exists(os.path.join(p, "_ingest_epochs", "run1", "0"))
    assert not os.path.exists(p + ".old")


def test_rebuild_root_never_carries_intent_files(tmp_path):
    """A stale .intent snapshot describes the PRE-rebuild layout;
    carrying it across the swap would make the next recovery delete
    every freshly rebuilt file as 'torn' (review finding, reproduced)
    — intents are dropped at the copy."""
    from aerovaldb_spark.operators._staging import (
        rebuild_root,
        recover_ingest_intents,
    )

    p = str(tmp_path / "idx")
    run = os.path.join(p, "_ingest_epochs", "run1")
    os.makedirs(run)
    open(os.path.join(run, "0"), "w").close()
    import json

    with open(os.path.join(run, "1.intent"), "w") as f:
        json.dump({os.path.join(p, "data"): []}, f)

    def save_fn(staging):
        os.makedirs(os.path.join(staging, "data"))
        open(os.path.join(staging, "data", "part-rebuilt"), "w").close()

    rebuild_root(p, save_fn)
    assert not os.path.exists(os.path.join(run, "1.intent"))
    assert os.path.exists(os.path.join(run, "0"))
    # and even a direct recovery now finds nothing to roll back
    assert recover_ingest_intents(p) == {}
    assert os.path.exists(os.path.join(p, "data", "part-rebuilt"))


def test_maybe_rebuild_rolls_back_torn_append_before_rebuilding(
    spark, tmp_path, monkeypatch
):
    """A torn streaming append pending at rebuild time must be rolled
    back FIRST: otherwise the rebuild bakes the unmarked rows in and
    the redelivered batch appends them again (duplicates). End to
    end: tear an append, maybe_rebuild (trips), redeliver — no
    duplicate ids, count exact."""
    import aerovaldb_spark.streaming as st
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb, old, shifted = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    built = SRPIndex.build(old, dim, planes=4)
    built.save(p)
    built.save_build_report(p)
    # a COMMITTED shifted append arms the drift verdict
    SRPIndex.load(spark, p).add(shifted, path=p)

    # now a TORN append of extra vectors (crash before the marker)
    extra = old.withColumn("vec_id", F.col("vec_id") + 5_000_000)
    fn = st.index_ingest_fn(SRPIndex.load(spark, p), p, run_id="r")

    def boom_marker(marker):
        raise RuntimeError("injected")

    monkeypatch.setattr(st, "_commit_marker", boom_marker)
    with pytest.raises(RuntimeError, match="injected"):
        fn(extra, 0)
    monkeypatch.undo()

    idx, verdict, _ = SRPIndex.maybe_rebuild(spark, p)
    assert verdict.rebuild
    # the torn rows were rolled back, NOT baked into the rebuild
    n_clean = old.count() + shifted.count()
    assert idx.assignments.count() == n_clean
    # redelivery after the rebuild appends the batch exactly once
    fn2 = st.index_ingest_fn(SRPIndex.load(spark, p), p, run_id="r")
    fn2(extra, 0)
    served = SRPIndex.load(spark, p)
    assert served.assignments.count() == n_clean + extra.count()
    assert (
        served.assignments.groupBy("vec_id").count().where("count > 1")
        .count()
        == 0
    )


def test_recover_index_ingest_refuses_mid_swap_state(spark, tmp_path):
    from aerovaldb_spark.streaming import recover_index_ingest

    p = str(tmp_path / "idx")
    os.makedirs(p)
    os.replace(p, p + ".old")
    with pytest.raises(ValueError, match="interrupted rebuild"):
        recover_index_ingest(p, spark)


def test_maybe_compact_triggers_on_append_litter_and_preserves_rows(
    spark, tmp_path
):
    """The maintenance triangle's third leg: many small appends trip
    the fragmentation verdict, maybe_compact rewrites (one file per
    partition dir) bit-preservingly, and a fresh call reads as clean.
    Torn intents are rolled back before the rewrite — compacting torn
    rows would bake them into the new files."""
    from aerovaldb_spark.operators._staging import (
        fragmentation_report,
        maybe_compact,
    )
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb, old, _ = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    SRPIndex.build(old, dim, planes=2).save(p)
    # 10 micro-appends of 3 vectors each = file litter per bucket dir
    for i in range(10):
        batch = old.limit(3).withColumn(
            "vec_id", F.col("vec_id") + (i + 1) * 1_000_000
        )
        SRPIndex.load(spark, p).add(batch, path=p)
    n_before = SRPIndex.load(spark, p).assignments.count()
    rep = fragmentation_report(p, SRPIndex.APPEND_DATASETS)
    assert rep["datasets"]["assignments"]["max_files_per_dir"] > 4

    idx, verdict, _ = maybe_compact(
        spark, p, SRPIndex, max_files_per_dir=4
    )
    assert verdict.rebuild and idx is not None
    assert idx.assignments.count() == n_before
    rep2 = fragmentation_report(p, SRPIndex.APPEND_DATASETS)
    assert rep2["datasets"]["assignments"]["max_files_per_dir"] <= 4
    # clean state: verdict stays fresh, index untouched (None)
    idx2, v2, _ = maybe_compact(spark, p, SRPIndex, max_files_per_dir=4)
    assert idx2 is None and not v2.rebuild


def test_maybe_compact_rolls_back_torn_intent_first(
    spark, tmp_path, monkeypatch
):
    import aerovaldb_spark.streaming as st
    from aerovaldb_spark.operators._staging import maybe_compact
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb, old, _ = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    SRPIndex.build(old, dim, planes=2).save(p)
    n_clean = old.count()
    extra = old.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    fn = st.index_ingest_fn(SRPIndex.load(spark, p), p, run_id="r")

    def boom(marker):
        raise RuntimeError("injected")

    monkeypatch.setattr(st, "_commit_marker", boom)
    with pytest.raises(RuntimeError, match="injected"):
        fn(extra, 0)
    monkeypatch.undo()

    idx, verdict, _ = maybe_compact(
        spark, p, SRPIndex, max_files_per_dir=1
    )
    # torn rows rolled back BEFORE the rewrite — not baked in
    assert (idx or SRPIndex.load(spark, p)).assignments.count() == n_clean


def test_maintain_runs_the_triangle_in_order(spark, tmp_path, monkeypatch):
    """One call: a torn intent is recovered, staleness is measured
    (fresh -> no rebuild), fragmentation trips -> compact runs; after
    a drifting append the SAME call rebuilds and skips the redundant
    compact."""
    import aerovaldb_spark.streaming as st
    from aerovaldb_spark.operators._staging import maintain
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb, old, shifted = _emb_halves(spark)
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    built = SRPIndex.build(old, dim, planes=2)
    built.save(p)
    built.save_build_report(p)
    # append litter (same distribution — staleness stays fresh)
    for i in range(6):
        SRPIndex.load(spark, p).add(
            old.limit(3).withColumn(
                "vec_id", F.col("vec_id") + (i + 1) * 1_000_000
            ),
            path=p,
        )
    n_clean = SRPIndex.load(spark, p).assignments.count()
    # plus one torn attempt
    fn = st.index_ingest_fn(SRPIndex.load(spark, p), p, run_id="r")

    def boom(marker):
        raise RuntimeError("injected")

    monkeypatch.setattr(st, "_commit_marker", boom)
    with pytest.raises(RuntimeError, match="injected"):
        fn(old.limit(2).withColumn(
            "vec_id", F.col("vec_id") + 9_000_000
        ), 0)
    monkeypatch.undo()

    out = maintain(spark, p, SRPIndex, max_files_per_dir=2)
    assert out["recovered"] == 1  # the torn intent rolled back
    assert not out["rebuilt"] and out["compacted"]
    assert out["index"].assignments.count() == n_clean
    frag = out["fragmentation"]["datasets"]["assignments"]
    assert frag["max_files_per_dir"] > 2  # measured pre-compact

    # drift past the threshold: the same call rebuilds, no compact
    SRPIndex.load(spark, p).add(shifted, path=p)
    out2 = maintain(spark, p, SRPIndex, max_files_per_dir=2)
    assert out2["rebuilt"] and not out2["compacted"]
    assert out2["index"].planes == 3  # the re-plan
    out3 = maintain(spark, p, SRPIndex, max_files_per_dir=2)
    assert not out3["rebuilt"]  # re-baselined
