"""Crash-injection tests for the streaming-ingest append-intent
protocol (streaming.index_ingest_fn + _staging.write_append_intent /
recover_append_intent) — the r11 verdict's "implement, don't just
document" item: a micro-batch append that dies ANYWHERE between its
intent and its epoch marker must be rolled back bit-for-bit when the
batch is redelivered, so a replay can never double-append reference
rows (duplicate weights paired with signatures silently corrupt every
downstream dot product). Reference analog: its writes are single-file
atomic (jsonfiledb.py:386-413) — no torn window exists there at all.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.readwriter import DataFrameWriter

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release_persists():
    yield
    from aerovaldb_spark.operators._scope import release_scoped_persists

    release_scoped_persists()


def _screen_rows(spark, path, probes):
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    return sorted(
        map(
            tuple,
            TfidfScreenIndex.load(spark, path).screen(probes).collect(),
        )
    )


def _listing(path):
    out = []
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            out.append(
                os.path.relpath(os.path.join(dirpath, f), path)
            )
    return sorted(out)


def _split_docs(spark):
    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    ref = docs.where("doc_id % 4 = 0")
    new = docs.where("doc_id % 4 = 2").withColumn(
        "doc_id", F.col("doc_id") + 500_000
    )
    probes = docs.where("doc_id % 2 = 1")
    return ref, new, probes


def _expected_after_add(spark, ref, new, probes):
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    return sorted(
        map(
            tuple,
            TfidfScreenIndex.build(ref).add(new).screen(probes).collect(),
        )
    )


class Boom(RuntimeError):
    pass


def _fail_parquet_on(monkeypatch, suffix):
    """Make the NEXT DataFrameWriter.parquet call whose target ends
    with ``suffix`` raise (the real add() path runs up to that exact
    write job — genuine crash injection, not a re-implementation)."""
    orig = DataFrameWriter.parquet

    def patched(self, path, *a, **kw):
        if path.rstrip("/").endswith(suffix):
            raise Boom(f"injected crash before writing {suffix}")
        return orig(self, path, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", patched)


def test_crash_between_weights_and_signatures_recovers_bitequal(
    spark, tmp_path, monkeypatch
):
    """THE r11 window: die after the weights append, before the
    signatures append. The redelivered batch must roll the orphaned
    weight files back and re-append — screen results bit-equal to a
    clean run, zero duplicate doc_ids."""
    from aerovaldb_spark.operators.text import TfidfScreenIndex
    from aerovaldb_spark.streaming import tfidf_index_ingest_fn

    ref, new, probes = _split_docs(spark)
    p = str(tmp_path / "idx")
    TfidfScreenIndex.build(ref).save(p)
    want = _expected_after_add(spark, ref, new, probes)

    loaded = TfidfScreenIndex.load(spark, p)
    fn = tfidf_index_ingest_fn(loaded, p, run_id="r")
    pre_weights = _listing(os.path.join(p, "weights"))

    _fail_parquet_on(monkeypatch, "/signatures")
    with pytest.raises(Boom):
        fn(new, 0)
    monkeypatch.undo()

    # torn state: weights grew, no marker, intent present
    assert _listing(os.path.join(p, "weights")) != pre_weights
    mdir = os.path.join(p, "_ingest_epochs", "r")
    assert not os.path.exists(os.path.join(mdir, "0"))
    assert os.path.exists(os.path.join(mdir, "0.intent"))

    # redelivery (same epoch id, Structured Streaming's contract)
    fn(new, 0)
    assert os.path.exists(os.path.join(mdir, "0"))
    assert not os.path.exists(os.path.join(mdir, "0.intent"))
    assert _screen_rows(spark, p, probes) == want
    dup = (
        TfidfScreenIndex.load(spark, p)
        .weights.groupBy("doc_id", "term")
        .count()
        .where("count > 1")
        .count()
    )
    assert dup == 0


def test_crash_between_add_and_marker_recovers_bitequal(
    spark, tmp_path, monkeypatch
):
    """The add→marker window: BOTH datasets appended, marker lost —
    the naive retry double-appends everything. The intent rollback
    restores both datasets first, so redelivery lands exactly once."""
    import aerovaldb_spark.streaming as st
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    ref, new, probes = _split_docs(spark)
    p = str(tmp_path / "idx")
    TfidfScreenIndex.build(ref).save(p)
    want = _expected_after_add(spark, ref, new, probes)

    fn = st.tfidf_index_ingest_fn(
        TfidfScreenIndex.load(spark, p), p, run_id="r"
    )

    def boom_marker(marker):
        raise Boom("injected crash before the epoch marker")

    monkeypatch.setattr(st, "_commit_marker", boom_marker)
    with pytest.raises(Boom):
        fn(new, 0)
    monkeypatch.undo()

    fn(new, 0)  # redelivery
    assert _screen_rows(spark, p, probes) == want
    dup = (
        TfidfScreenIndex.load(spark, p)
        .weights.groupBy("doc_id", "term")
        .count()
        .where("count > 1")
        .count()
    )
    assert dup == 0


def test_recover_index_ingest_rolls_back_without_redelivery(
    spark, tmp_path, monkeypatch
):
    """A stream that will NOT resume (fresh checkpoint next time):
    recover_index_ingest() rolls the torn attempt back to the exact
    pre-attempt file listing, so the index serves its last consistent
    state and a later add()/rebuild starts clean."""
    from aerovaldb_spark.operators.text import TfidfScreenIndex
    from aerovaldb_spark.streaming import (
        recover_index_ingest,
        tfidf_index_ingest_fn,
    )

    ref, new, probes = _split_docs(spark)
    p = str(tmp_path / "idx")
    TfidfScreenIndex.build(ref).save(p)
    base_screen = _screen_rows(spark, p, probes)
    pre = {
        d: _listing(os.path.join(p, d))
        for d in ("weights", "signatures")
    }

    fn = tfidf_index_ingest_fn(
        TfidfScreenIndex.load(spark, p), p, run_id="old-run"
    )
    _fail_parquet_on(monkeypatch, "/signatures")
    with pytest.raises(Boom):
        fn(new, 0)
    monkeypatch.undo()

    repaired = recover_index_ingest(p, spark)
    assert len(repaired) == 1  # one torn intent rolled back
    for d in ("weights", "signatures"):
        assert _listing(os.path.join(p, d)) == pre[d], d
    assert _screen_rows(spark, p, probes) == base_screen
    # idempotent: nothing left to repair
    assert recover_index_ingest(p, spark) == {}


def test_post_commit_intent_leftover_is_removed_not_rolled_back(
    spark, tmp_path
):
    """Crash between the marker write and the intent cleanup: the
    appends COMMITTED — recovery must remove the stale intent without
    deleting the committed files."""
    from aerovaldb_spark.operators._staging import write_append_intent
    from aerovaldb_spark.operators.text import TfidfScreenIndex
    from aerovaldb_spark.streaming import tfidf_index_ingest_fn

    ref, new, probes = _split_docs(spark)
    p = str(tmp_path / "idx")
    TfidfScreenIndex.build(ref).save(p)
    pre = {
        d: _listing(os.path.join(p, d))
        for d in ("weights", "signatures")
    }
    fn = tfidf_index_ingest_fn(
        TfidfScreenIndex.load(spark, p), p, run_id="r"
    )
    # simulate: intent snapshotted pre-append, append + marker done,
    # intent cleanup lost — write the PRE-append listing as the intent
    mdir = os.path.join(p, "_ingest_epochs", "r")
    os.makedirs(mdir)
    fn(new, 0)
    write_append_intent(
        os.path.join(mdir, "0.intent"),
        [os.path.join(p, d) for d in ("weights", "signatures")],
    )
    # overwrite the snapshot with the pre-append state to make the
    # leftover dangerous if mishandled
    import json

    with open(os.path.join(mdir, "0.intent"), "w") as f:
        json.dump(
            {os.path.join(p, d): pre[d] for d in pre}, f
        )
    after = {
        d: _listing(os.path.join(p, d))
        for d in ("weights", "signatures")
    }
    fn(new, 1)  # next epoch triggers recovery of the leftover
    assert not os.path.exists(os.path.join(mdir, "0.intent"))
    for d in ("weights", "signatures"):
        listing = _listing(os.path.join(p, d))
        # the committed epoch-0 files survived (epoch 1 may add more)
        assert set(after[d]) <= set(listing), d


def test_generic_ingest_srp_family_crash_and_redelivery(
    spark, tmp_path, monkeypatch
):
    """The generic factory over a single-dataset family (SRPIndex):
    crash in the add→marker window, redeliver, and the served topk is
    bit-equal to a clean one-shot add — no doubled assignment rows."""
    import aerovaldb_spark.streaming as st
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb = load_table(spark, SF_DIR, "embeddings")
    old = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1").withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    dim = len(emb.first()["embedding"])
    p = str(tmp_path / "srp")
    SRPIndex.build(old, dim).save(p)
    n_want = old.count() + new.count()

    fn = st.index_ingest_fn(SRPIndex.load(spark, p), p, run_id="r")

    def boom_marker(marker):
        raise RuntimeError("injected")

    monkeypatch.setattr(st, "_commit_marker", boom_marker)
    with pytest.raises(RuntimeError, match="injected"):
        fn(new, 0)
    monkeypatch.undo()
    fn(new, 0)  # redelivery

    served = SRPIndex.load(spark, p)
    assert served.assignments.count() == n_want
    assert (
        served.assignments.groupBy("vec_id").count().where("count > 1")
        .count()
        == 0
    )
    queries = emb.where("vec_id % 50 = 1").limit(3)
    want = sorted(
        map(
            tuple,
            SRPIndex.build(old.unionByName(new), dim)
            .topk(queries, k=5)
            .collect(),
        )
    )
    got = sorted(map(tuple, served.topk(queries, k=5).collect()))
    assert got == want


def test_intent_rollback_prunes_new_partition_dirs(spark, tmp_path):
    """A torn append that created brand-new band partition
    directories must leave no empty husks behind (file-level rollback
    + directory pruning)."""
    from aerovaldb_spark.operators._staging import (
        recover_append_intent,
        write_append_intent,
    )

    d = str(tmp_path / "ds")
    os.makedirs(os.path.join(d, "band=0"))
    with open(os.path.join(d, "band=0", "part-0.parquet"), "w") as f:
        f.write("x")
    intent = str(tmp_path / "i.intent")
    write_append_intent(intent, [d])
    # torn attempt adds a file to an existing dir and a new dir
    with open(os.path.join(d, "band=0", "part-1.parquet"), "w") as f:
        f.write("y")
    os.makedirs(os.path.join(d, "band=7"))
    with open(os.path.join(d, "band=7", "part-0.parquet"), "w") as f:
        f.write("z")
    removed = recover_append_intent(intent)
    assert sorted(removed[d]) == [
        os.path.join("band=0", "part-1.parquet"),
        os.path.join("band=7", "part-0.parquet"),
    ]
    assert not os.path.exists(os.path.join(d, "band=7"))
    assert os.path.exists(os.path.join(d, "band=0", "part-0.parquet"))
    assert not os.path.exists(intent)


def test_ingest_fn_refuses_interrupted_rebuild_state(spark, tmp_path):
    """A stream resuming while a rebuild sits mid-swap (<path>.old
    only) must refuse BEFORE creating any directory: makedirs would
    materialize a stub live root that resolve_live prefers over the
    intact .old, stranding the real data (second-pass review
    finding)."""
    from aerovaldb_spark.operators.text import TfidfScreenIndex
    from aerovaldb_spark.streaming import tfidf_index_ingest_fn

    ref, new, _ = _split_docs(spark)
    p = str(tmp_path / "idx")
    TfidfScreenIndex.build(ref).save(p)
    idx = TfidfScreenIndex.load(spark, p)
    os.replace(p, p + ".old")  # the mid-swap crash state
    fn = tfidf_index_ingest_fn(idx, p, run_id="r")
    with pytest.raises(ValueError, match="interrupted rebuild"):
        fn(new, 0)
    assert not os.path.isdir(p)  # no stub root materialized


def test_generic_ingest_near_dup_bucket_index(spark, tmp_path, monkeypatch):
    """The generic factory over the minhash bucket index: replayed
    appends are SEMANTICALLY harmless here (multiplicity-blind
    screen), but the protocol still keeps disk rows exactly-once —
    after a torn epoch + redelivery the bucket table equals a clean
    one-shot add, not a doubled one."""
    import aerovaldb_spark.streaming as st
    from aerovaldb_spark.streaming import NearDupBucketIndex

    ref, new, probes = _split_docs(spark)
    p = str(tmp_path / "ndb")
    NearDupBucketIndex.build(ref).save(p)
    want_rows = (
        NearDupBucketIndex.build(ref).add(new).buckets.count()
    )
    want_screen = sorted(
        map(
            tuple,
            NearDupBucketIndex.build(ref).add(new).screen(probes).collect(),
        )
    )

    fn = st.index_ingest_fn(
        NearDupBucketIndex.load(spark, p), p, run_id="r"
    )

    def boom(marker):
        raise RuntimeError("injected")

    monkeypatch.setattr(st, "_commit_marker", boom)
    with pytest.raises(RuntimeError, match="injected"):
        fn(new, 0)
    monkeypatch.undo()
    fn(new, 0)  # redelivery

    served = NearDupBucketIndex.load(spark, p)
    assert served.buckets.count() == want_rows  # exactly-once on disk
    assert sorted(map(tuple, served.screen(probes).collect())) == want_screen
