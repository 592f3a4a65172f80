"""add(path=...) frozen-parameter guard: a handle created BEFORE a
maybe_rebuild/maintain swap must refuse to append rows computed under
the OLD parameters into the re-parameterized layout (r12 advice —
mixed parameter spaces corrupt screen dots / bucket probes with no
error). One test per family shape, plus the maintenance-triangle
guards that share the mid-swap detection (fragmentation_report,
maintain() on a family without maybe_rebuild)."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release_persists():
    yield
    from aerovaldb_spark.operators._scope import release_scoped_persists

    release_scoped_persists()


def _embeddings(spark):
    return spark.read.parquet(
        os.path.join(SF_DIR, "embeddings.parquet")
    ).select("vec_id", "embedding")


def _docs(spark):
    return spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")


def test_ivf_stale_handle_add_raises_after_rebuild_swap(
    spark, tmp_path
):
    from aerovaldb_spark.operators._staging import (
        rebuild_root,
        refresh_root,
    )
    from aerovaldb_spark.operators.similarity import IVFIndex

    emb = _embeddings(spark)
    old = emb.where("vec_id % 2 = 0")
    more = emb.where("vec_id % 2 = 1").limit(50)
    p = str(tmp_path / "ivf")
    IVFIndex.build(old, n_lists=4).save(p)
    held = IVFIndex.load(spark, p)

    # a maintenance pass swaps in a re-fit index (different n_lists ->
    # different centroid table, the re-parameterized case)
    def _fresh(staging):
        IVFIndex.build(old, n_lists=8).save(staging)

    rebuild_root(p, _fresh)
    refresh_root(spark, p)

    with pytest.raises(ValueError, match="frozen centroids changed"):
        held.add(more, path=p)
    # a fresh load carries the new fingerprint and appends fine
    idx = IVFIndex.load(spark, p).add(more, path=p)
    assert idx.assignments.count() == old.count() + 50


def test_ivf_self_save_then_add_still_works(spark, tmp_path):
    from aerovaldb_spark.operators.similarity import IVFIndex

    emb = _embeddings(spark)
    old = emb.where("vec_id % 2 = 0")
    more = emb.where("vec_id % 2 = 1").limit(20)
    p = str(tmp_path / "ivf2")
    built = IVFIndex.build(old, n_lists=4)
    built.save(p)
    # the very handle that saved the layout matches its own meta
    idx = built.add(more, path=p)
    assert idx.assignments.count() == old.count() + 20


def test_foreign_inmemory_ivf_handle_refused(spark, tmp_path):
    from aerovaldb_spark.operators.similarity import IVFIndex

    emb = _embeddings(spark)
    old = emb.where("vec_id % 2 = 0")
    p = str(tmp_path / "ivf3")
    IVFIndex.build(old, n_lists=4).save(p)
    # an in-memory handle built with DIFFERENT parameters (never saved
    # anywhere) must not append into this layout either
    foreign = IVFIndex.build(old, n_lists=8)
    with pytest.raises(ValueError, match="frozen centroids changed"):
        foreign.add(emb.where("vec_id % 2 = 1").limit(5), path=p)


def test_srp_stale_handle_add_raises_on_planes_mismatch(
    spark, tmp_path
):
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb = _embeddings(spark)
    dim = len(emb.select("embedding").first()[0])
    old = emb.where("vec_id % 2 = 0")
    more = emb.where("vec_id % 2 = 1").limit(10)
    p = str(tmp_path / "srp")
    SRPIndex.build(old, dim, planes=9).save(p)
    held = SRPIndex.build(old, dim, planes=8)  # pre-rebuild quantizer
    with pytest.raises(ValueError, match="quantizer changed"):
        held.add(more, path=p)
    SRPIndex.load(spark, p).add(more, path=p)  # fresh handle is fine


def test_quantized_srp_stale_handle_add_raises(spark, tmp_path):
    from aerovaldb_spark.operators.similarity import QuantizedSRPIndex

    emb = _embeddings(spark)
    dim = len(emb.select("embedding").first()[0])
    old = emb.where("vec_id % 2 = 0")
    p = str(tmp_path / "qsrp")
    QuantizedSRPIndex.build(old, dim, planes=9).save(p)
    held = QuantizedSRPIndex.build(old, dim, planes=8)
    with pytest.raises(ValueError, match="quantizer changed"):
        held.add(emb.limit(5), path=p)


def test_screen_stale_handle_add_raises_after_rebuild(
    spark, tmp_path
):
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    docs = _docs(spark)
    new = spark.createDataFrame(
        [
            (700_000 + i, " ".join(f"zz{i}_{j}" for j in range(30)))
            for i in range(300)
        ],
        "doc_id long, text string",
    )
    grown = docs.unionByName(new)
    p = str(tmp_path / "screen")
    TfidfScreenIndex.build(docs).save(p)
    held = TfidfScreenIndex.load(spark, p)

    # drift past the threshold, then the maintenance pass re-freezes
    # the idf stats over the grown corpus
    held.add(new, path=p)
    held = TfidfScreenIndex.load(spark, p)  # pre-rebuild stats handle
    idx, verdict, _ = TfidfScreenIndex.maybe_rebuild(
        spark, p, docs=grown
    )
    assert verdict.rebuild

    more = spark.createDataFrame(
        [(900_000, "hello world")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="idf statistics changed"):
        held.add(more, path=p)
    # the maybe_rebuild-returned handle is the fresh one — it appends
    got = idx.add(more, path=p)
    assert got.weights.where("doc_id = 900000").count() > 0


def test_fragmentation_report_refuses_mid_swap_state(tmp_path):
    from aerovaldb_spark.operators._staging import fragmentation_report

    p = str(tmp_path / "idx")
    os.makedirs(p + ".old/assignments")
    with pytest.raises(ValueError, match="interrupted rebuild"):
        fragmentation_report(p, ("assignments",))


def test_maintain_on_family_without_maybe_rebuild(spark, tmp_path):
    """NearDupBucketIndex has no frozen statistic and hence no
    maybe_rebuild — maintain() must run its recover+compact triangle
    (rebuilt=None) instead of dying with AttributeError."""
    from aerovaldb_spark.operators._staging import maintain
    from aerovaldb_spark.streaming import NearDupBucketIndex

    docs = _docs(spark).limit(200)
    p = str(tmp_path / "ndb")
    NearDupBucketIndex.build(docs).save(p)
    idx = NearDupBucketIndex.load(spark, p)
    for i in range(3):  # append litter
        idx = idx.add(
            spark.createDataFrame(
                [(800_000 + i, f"litter doc {i} " * 5)],
                "doc_id long, text string",
            ),
            path=p,
        )
    before = idx.buckets.count()
    out = maintain(spark, p, NearDupBucketIndex, max_files_per_dir=1)
    assert out["rebuilt"] is None
    assert out["compacted"] is True
    assert out["index"].buckets.count() <= before  # distinct compact
    # idempotent second pass: fresh layout, nothing to do
    out2 = maintain(spark, p, NearDupBucketIndex, max_files_per_dir=1)
    assert out2["compacted"] is False and out2["rebuilt"] is None


def test_read_meta_row_refuses_torn_meta(spark, tmp_path):
    """A meta/ directory that exists but holds no readable row (a
    save crashed between mkdir and committing part files) must raise
    the descriptive refusal, not an opaque IndexError — and a MISSING
    meta stays None (pre-fingerprint layout, accepted unchecked)."""
    from aerovaldb_spark.operators._staging import read_meta_row

    root = str(tmp_path / "idx")
    os.makedirs(os.path.join(root, "meta"))  # empty dir: torn save
    with pytest.raises(ValueError, match="crashed save"):
        read_meta_row(spark, root)
    # a directory with a non-parquet stray file is torn too
    root2 = str(tmp_path / "idx2")
    os.makedirs(os.path.join(root2, "meta"))
    open(os.path.join(root2, "meta", "garbage.bin"), "wb").write(b"x")
    with pytest.raises(ValueError, match="crashed save|meta dataset"):
        read_meta_row(spark, root2)
    assert read_meta_row(spark, str(tmp_path / "nothing")) is None


def test_cross_family_add_refused_by_name(spark, tmp_path):
    """Appending one family's rows into another family's layout is
    named as the mistake it is (not an opaque KeyError or silent
    schema mixing): cross-GROUP (SRP onto IVF and back), and —
    crucially — WITHIN-group, where the meta schemas are identical
    and only the explicit family tag can tell the layouts apart
    (SRPIndex vs QuantizedSRPIndex; PQIVFIndex vs QuantizedIVFIndex
    sharing the very same frozen centroids)."""
    from aerovaldb_spark.operators.pq import PQIVFIndex
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        QuantizedIVFIndex,
        QuantizedSRPIndex,
        SRPIndex,
        frozen_ivf_centroids,
    )

    emb = _embeddings(spark)
    dim = len(emb.select("embedding").first()[0])
    base = emb.limit(100)
    more = emb.limit(5)
    p_ivf = str(tmp_path / "ivf")
    IVFIndex.build(base, n_lists=4).save(p_ivf)
    with pytest.raises(ValueError, match="not an SRP-family layout"):
        SRPIndex.build(base, dim).add(more, path=p_ivf)
    p_srp = str(tmp_path / "srp")
    SRPIndex.build(base, dim).save(p_srp)
    with pytest.raises(ValueError, match="not an IVF-family layout"):
        IVFIndex.build(base, n_lists=4).add(more, path=p_srp)
    # within the SRP group: identical meta schema, same (dim, planes)
    with pytest.raises(ValueError, match="saved by SRPIndex"):
        QuantizedSRPIndex.build(base, dim).add(more, path=p_srp)
    # within the IVF group, SHARED frozen centroids: fingerprint
    # matches, only the tag separates packed from int8 from float
    cents = frozen_ivf_centroids(spark)
    p_pq = str(tmp_path / "pq")
    PQIVFIndex.build(base, cents).save(p_pq)
    with pytest.raises(ValueError, match="saved by PQIVFIndex"):
        QuantizedIVFIndex.build(base, cents).add(more, path=p_pq)
    with pytest.raises(ValueError, match="saved by PQIVFIndex"):
        IVFIndex(cents, base, "embedding", "vec_id").add(
            more, path=p_pq
        )


def test_screen_and_neardup_cross_family_refused(spark, tmp_path):
    """The other two append families refuse foreign layouts by name
    too — the screen index onto an SRP root, and the near-dup bucket
    index onto a screen root (whose meta also carries bands/rows,
    so only the family tag separates them)."""
    from aerovaldb_spark.operators.similarity import SRPIndex
    from aerovaldb_spark.operators.text import TfidfScreenIndex
    from aerovaldb_spark.streaming import NearDupBucketIndex

    emb = _embeddings(spark)
    docs = _docs(spark).limit(100)
    dim = len(emb.select("embedding").first()[0])
    p_srp = str(tmp_path / "srp")
    SRPIndex.build(emb.limit(100), dim).save(p_srp)
    idx = TfidfScreenIndex.build(docs)
    with pytest.raises(ValueError, match="not a screen-index layout"):
        idx.add(docs.limit(2), path=p_srp)
    p_screen = str(tmp_path / "screen")
    idx.save(p_screen)
    nd = NearDupBucketIndex.build(docs)
    with pytest.raises(ValueError, match="saved by TfidfScreenIndex"):
        nd.add(docs.limit(2), path=p_screen)


def test_cross_family_load_refused_by_name(spark, tmp_path):
    """load() enforces the family tag too — a wrong-family load would
    otherwise silently serve garbage through the other family's
    scoring arithmetic (e.g. int8 dots over nibble-packed arrays)."""
    from aerovaldb_spark.operators.pq import PQIVFIndex
    from aerovaldb_spark.operators.similarity import (
        QuantizedIVFIndex,
        QuantizedSRPIndex,
        SRPIndex,
        frozen_ivf_centroids,
    )

    emb = _embeddings(spark)
    dim = len(emb.select("embedding").first()[0])
    base = emb.limit(100)
    p_pq = str(tmp_path / "pq")
    PQIVFIndex.build(base, frozen_ivf_centroids(spark)).save(p_pq)
    with pytest.raises(ValueError, match="saved by PQIVFIndex"):
        QuantizedIVFIndex.load(spark, p_pq)
    p_srp = str(tmp_path / "srp")
    SRPIndex.build(base, dim).save(p_srp)
    with pytest.raises(ValueError, match="saved by SRPIndex"):
        QuantizedSRPIndex.load(spark, p_srp)
    # the right family still loads
    assert PQIVFIndex.load(spark, p_pq).assignments.count() == 100
    assert SRPIndex.load(spark, p_srp).assignments.count() == 100
