"""Product-quantization ANN family: encode determinism,
loaded ≡ ephemeral serving, incremental add ≡ one-shot build, the
q114-q116 lifecycle (staleness / maybe_rebuild / maintain), and the
frozen-handle guard inherited from the shared IVF layout."""

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


def _emb(spark):
    from aerovaldb_spark.catalog import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _families():
    from aerovaldb_spark.operators.pq import (
        PQIVFIndex,
        ResidualPQIVFIndex,
    )

    return [PQIVFIndex, ResidualPQIVFIndex]


# the lifecycle contracts hold for BOTH code families (raw and
# residual encode share layout, add, staleness, rebuild machinery)
pq_families = pytest.mark.parametrize(
    "family", ["PQIVFIndex", "ResidualPQIVFIndex"]
)


def _family_cls(family):
    import aerovaldb_spark.operators.pq as pq

    return getattr(pq, family)


def _shifted(emb, offset=3.0, id_shift=10_000):
    elem = emb.schema["embedding"].dataType.elementType.simpleString()
    return emb.withColumn(
        "embedding",
        F.transform(
            "embedding", lambda x: (x + F.lit(offset)).cast(elem)
        ),
    ).withColumn("vec_id", F.col("vec_id") + id_shift)


def test_pq_codes_deterministic_and_in_range(spark):
    from aerovaldb_spark.operators.pq import (
        PQ_K,
        PQ_M,
        pq_codes_col,
    )

    emb = _emb(spark)
    a = emb.select("vec_id", pq_codes_col("embedding").alias("c"))
    rows = {r["vec_id"]: list(r["c"]) for r in a.collect()}
    rows2 = {r["vec_id"]: list(r["c"]) for r in a.collect()}
    assert rows == rows2
    assert all(len(c) == PQ_M for c in rows.values())
    assert all(0 <= x < PQ_K for c in rows.values() for x in c)
    # zero vector encodes fine (no per-vector scale, unlike int8)
    z = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    zc = z.select(pq_codes_col("embedding").alias("c")).collect()[0]
    assert len(zc["c"]) == PQ_M


@pq_families
def test_pq_ivf_loaded_equals_ephemeral(spark, tmp_path, family):
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    cls = _family_cls(family)
    emb = _emb(spark)
    q = emb.filter("vec_id < 5")
    built = cls.build(emb, frozen_ivf_centroids(spark))
    want = sorted(map(tuple, built.topk(q, k=10).collect()))
    p = str(tmp_path / "pq")
    built.save(p)
    loaded = cls.load(spark, p)
    got = sorted(map(tuple, loaded.topk(q, k=10).collect()))
    assert got == want


@pq_families
def test_pq_ivf_add_equals_union_build(spark, tmp_path, family):
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    cls = _family_cls(family)
    emb = _emb(spark)
    old = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1")
    cents = frozen_ivf_centroids(spark)
    q = emb.filter("vec_id < 5")
    want = sorted(
        map(tuple, cls.build(emb, cents).topk(q, 10).collect())
    )
    # in-memory add
    got_mem = sorted(
        map(
            tuple,
            cls.build(old, cents).add(new).topk(q, 10).collect(),
        )
    )
    assert got_mem == want
    # disk add
    p = str(tmp_path / "pq")
    cls.build(old, cents).save(p)
    idx = cls.load(spark, p).add(new, path=p)
    got_disk = sorted(map(tuple, idx.topk(q, 10).collect()))
    assert got_disk == want


@pq_families
def test_pq_stale_handle_add_raises_after_rebuild_swap(
    spark, tmp_path, family
):
    from aerovaldb_spark.operators._staging import (
        rebuild_root,
        refresh_root,
    )
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        frozen_ivf_centroids,
    )

    cls = _family_cls(family)
    emb = _emb(spark)
    p = str(tmp_path / "pq")
    cls.build(emb, frozen_ivf_centroids(spark)).save(p)
    held = cls.load(spark, p)

    def _fresh(staging):
        refit = IVFIndex.build(emb, n_lists=8)
        cls.build(emb, refit.centroids).save(staging)

    rebuild_root(p, _fresh)
    refresh_root(spark, p)
    with pytest.raises(ValueError, match="frozen centroids changed"):
        held.add(emb.limit(3), path=p)


@pq_families
def test_pq_maybe_rebuild_trips_on_shift_and_requires_raw(
    spark, tmp_path, family
):
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    cls = _family_cls(family)
    emb = _emb(spark)
    old = emb.where("vec_id % 2 = 0")
    shifted = _shifted(emb.where("vec_id % 2 = 1"))
    p = str(tmp_path / "pq")
    built = cls.build(old, frozen_ivf_centroids(spark))
    built.save(p)
    built.save_build_report(p)

    idx0, v0, _ = cls.maybe_rebuild(spark, p)
    assert not v0.rebuild  # fresh-enough path, no raw data needed

    cls.load(spark, p).add(shifted, path=p)
    # verdict trips but codes are lossy: raw corpus required
    with pytest.raises(ValueError, match="raw corpus"):
        cls.maybe_rebuild(spark, p)
    grown = old.unionByName(shifted)
    idx, verdict, report = cls.maybe_rebuild(
        spark, p, vectors=grown
    )
    assert verdict.rebuild, report
    assert idx.assignments.count() == grown.count()
    assert not os.path.exists(p + ".old")  # swap completed clean
    # re-baselined: same call is now fresh
    idx2, v2, _ = cls.maybe_rebuild(spark, p)
    assert not v2.rebuild


@pq_families
def test_pq_maintain_triangle(spark, tmp_path, family):
    from aerovaldb_spark.operators._staging import maintain

    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    cls = _family_cls(family)
    emb = _emb(spark)
    p = str(tmp_path / "pq")
    built = cls.build(emb.where("vec_id < 400"),
                      frozen_ivf_centroids(spark))
    built.save(p)
    built.save_build_report(p)
    idx = cls.load(spark, p)
    for i in range(3):  # same-distribution append litter
        lo, hi = 400 + i * 30, 430 + i * 30
        idx = idx.add(
            emb.where(f"vec_id >= {lo} AND vec_id < {hi}"), path=p
        )
    out = maintain(spark, p, cls, max_files_per_dir=1)
    assert out["rebuilt"] is False  # same distribution: no refit
    assert out["compacted"] is True
    assert out["index"].assignments.count() == 490


@pq_families
def test_pq_ivf_probe_plan_prunes_partitions(spark, tmp_path, family):
    """The IVF promise carried over: a probed serve's scan contains a
    list_id partition filter (directory pruning), never a full-index
    scan."""
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    cls = _family_cls(family)
    emb = _emb(spark)
    p = str(tmp_path / "pq")
    cls.build(emb, frozen_ivf_centroids(spark)).save(p)
    idx = cls.load(spark, p)
    plan = (
        idx.topk(emb.filter("vec_id < 2"), k=5, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "list_id" in plan and "PartitionFilters: [list_id" in plan


def test_pq_cross_family_load_and_add_refused(spark, tmp_path):
    """Raw and residual codes are bit-compatible layouts with
    incompatible MEANINGS — the family tag must refuse a cross-family
    load (and with it any add through the wrong class), in both
    directions."""
    from aerovaldb_spark.operators.pq import (
        PQIVFIndex,
        ResidualPQIVFIndex,
    )
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    emb = _emb(spark).where("vec_id < 50")
    cents = frozen_ivf_centroids(spark)
    p_raw = str(tmp_path / "raw")
    p_res = str(tmp_path / "res")
    PQIVFIndex.build(emb, cents).save(p_raw)
    ResidualPQIVFIndex.build(emb, cents).save(p_res)
    with pytest.raises(ValueError, match="family"):
        ResidualPQIVFIndex.load(spark, p_raw)
    with pytest.raises(ValueError, match="family"):
        PQIVFIndex.load(spark, p_res)


def test_pq_meta_pq_m_guard_and_legacy_fallback(
    spark, tmp_path, monkeypatch
):
    """The persisted meta carries pq_m, so load() refuses a
    different-M build from the one-row meta read (no assignments
    scan); a legacy layout whose meta predates pq_m still loads
    through the one-row size probe fallback."""
    import os as _os

    import aerovaldb_spark.operators.pq as pq
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    emb = _emb(spark).where("vec_id < 50")
    p = str(tmp_path / "pq")
    pq.PQIVFIndex.build(emb, frozen_ivf_centroids(spark)).save(p)
    meta = spark.read.parquet(_os.path.join(p, "meta"))
    assert meta.collect()[0]["pq_m"] == pq.PQ_M
    monkeypatch.setattr(pq, "PQ_M", 8)
    with pytest.raises(ValueError, match="PQ_M=16"):
        pq.PQIVFIndex.load(spark, p)
    monkeypatch.undo()
    # legacy meta (no pq_m column): falls back to the size probe
    legacy = meta.drop("pq_m")
    legacy.write.mode("overwrite").parquet(
        _os.path.join(str(tmp_path), "legacy_meta")
    )
    spark.read.parquet(
        _os.path.join(str(tmp_path), "legacy_meta")
    ).write.mode("overwrite").parquet(_os.path.join(p, "meta"))
    spark.catalog.refreshByPath(p)
    idx = pq.PQIVFIndex.load(spark, p)
    assert idx.assignments.count() == 50


def test_pq_topk_rerank_requires_vectors(spark):
    from aerovaldb_spark.operators.pq import PQIVFIndex
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    emb = _emb(spark)
    idx = PQIVFIndex.build(emb, frozen_ivf_centroids(spark))
    with pytest.raises(ValueError, match="vectors="):
        idx.topk(emb.filter("vec_id < 2"), k=5, rerank_expand=10)
    with pytest.raises(ValueError, match="expand >= 1"):
        idx.topk(
            emb.filter("vec_id < 2"), k=5, rerank_expand=0,
            vectors=emb,
        )


@pq_families
def test_pq_composed_rerank_plan_and_equivalence(
    spark, tmp_path, family
):
    """The one-call production serve (q134/q135): the plan keeps the
    directory-pruned probed scan (PartitionFilters on list_id) AND
    broadcasts the ADC shortlist into the raw-vector join; the result
    equals composing topk(k*expand) + exact re-rank by hand."""
    from aerovaldb_spark.operators.pq import _exact_rerank
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    cls = _family_cls(family)
    emb = _emb(spark)
    p = str(tmp_path / "pq")
    cls.build(emb, frozen_ivf_centroids(spark)).save(p)
    idx = cls.load(spark, p)
    q = emb.filter("vec_id < 3")
    served = idx.topk(q, k=5, n_probe=2, rerank_expand=4, vectors=emb)
    plan = (
        served._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [list_id" in plan
    assert "BroadcastHashJoin" in plan
    manual = _exact_rerank(
        idx.topk(q, k=5 * 4, n_probe=2), emb, q, 5, "embedding",
        "vec_id",
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, manual.collect())
    )


def test_residual_codes_lift_where_coarse_structure_exists(spark):
    """The residual family's honest value claim (SCALING.md r14):
    residual encoding lifts recall in proportion to the variance the
    COARSE quantizer explains. On the iid test corpus the coarse step
    explains ~3%, so residual ≈ raw there (asserted as a no-big-
    regression bound, frozen books). On the anchored twin (vectors
    shrunk toward their assigned centroid — the clusterable shape
    real corpora have) with per-corpus books, residual codes must
    beat raw codes OUTRIGHT at identical bytes and probes (measured
    0.51 vs 0.36 at sf0.1 — tools/pq_residual_demo.py)."""
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from ann_operating_points import exact_l2_topk
    from pq_residual_demo import (
        anchored_corpus,
        custom_family,
        fit_books_numpy,
        measure,
        variance_explained,
    )

    from aerovaldb_spark.operators.pq import (
        PQIVFIndex,
        ResidualPQIVFIndex,
    )
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    emb = _emb(spark)
    cents = frozen_ivf_centroids(spark)

    # iid corpus, frozen books: residual must not regress materially
    q = emb.filter("vec_id < 15")
    exact = (
        exact_l2_topk(emb, q, k=10)
        .select("query_id", "neighbor_id")
        .cache()
    )
    n_exact = exact.count()

    def recall(idx):
        got = idx.topk(q, k=10, n_probe=4).join(
            exact, ["query_id", "neighbor_id"], "left_semi"
        )
        return got.count() / n_exact

    r_raw = recall(PQIVFIndex.build(emb, cents))
    r_res = recall(ResidualPQIVFIndex.build(emb, cents))
    assert r_res >= r_raw - 0.08, (r_res, r_raw)
    exact.unpersist()

    # anchored corpus, per-corpus books: residual wins outright
    anchored = anchored_corpus(emb, cents)
    assert variance_explained(anchored, cents) > 0.2
    a_raw, a_res = measure(spark, anchored, n_queries=15)
    assert a_res > a_raw, (a_res, a_raw)
    # the helper hooks only _books — sanity that custom families
    # really served the throwaway fit, not the frozen module data
    import numpy as np

    dummy = fit_books_numpy(np.zeros((40, 64)) + np.arange(64), 16,
                            16, 4, seed=1)
    assert custom_family(PQIVFIndex, dummy)._books() is dummy


def test_pq_recall_against_exact_l2(spark):
    """Operating-point sanity at sf0.001: recall vs exact-L2 top-10.
    The synthetic embeddings are iid-like — the hardest PQ regime
    (distances concentrate, quantization noise dominates the gaps) —
    so the 64-bit codes alone sit near the documented ~0.35 floor;
    the re-rank rung (q131's shape) is the production answer and must
    clear 0.85 at expand=10 (measured 0.91; the full sweep lives in
    SCALING.md via tools/ann_operating_points.py)."""
    from aerovaldb_spark.operators.pq import (
        pq_adc_rerank_topk,
        pq_adc_topk,
    )

    emb = _emb(spark)
    q = emb.filter("vec_id < 20")
    approx = pq_adc_topk(emb, q, k=10)
    v = F.col("embedding").cast("array<double>")
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), v.alias("cv")
    )
    probes = q.select(F.col("vec_id").alias("query_id"), v.alias("qv"))
    d2 = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc()
    )
    exact = (
        c.join(F.broadcast(probes), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_d", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 10")
        .select("query_id", "neighbor_id")
    )
    n_exact = exact.count()
    hits = approx.join(
        exact, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    assert hits / n_exact >= 0.3, hits / n_exact
    rer = pq_adc_rerank_topk(emb, q, k=10, expand=10)
    rer_hits = rer.join(
        exact, ["query_id", "neighbor_id"], "left_semi"
    ).count()
    assert rer_hits / n_exact >= 0.85, rer_hits / n_exact


def test_pq_rebuild_verdict_zero_baseline_floor():
    """The churn trigger must stay armed when build-time churn is
    exactly 0.0 (a degenerate corpus whose reconstructions assign
    perfectly): growth alone would either never fire (`if bc:`
    truthiness) or fire on 0 >= 0 — the min_churn floor resolves
    both (review finding, r13)."""
    from aerovaldb_spark.operators.pq import pq_rebuild_verdict

    base = {"load_factor_max": 1.0, "top_mass": 0.1,
            "assignment_churn": 0.0}
    fresh = dict(base)
    assert not pq_rebuild_verdict(fresh, base).rebuild
    drifted = dict(base, assignment_churn=0.5)
    v = pq_rebuild_verdict(drifted, base)
    assert v.rebuild and "assignment_churn" in v.reasons[0]
    # just under the floor: not tripped
    tiny = dict(base, assignment_churn=0.04)
    assert not pq_rebuild_verdict(tiny, base).rebuild
    # normal growth rule unchanged above the floor
    b2 = dict(base, assignment_churn=0.36)
    assert not pq_rebuild_verdict(
        dict(base, assignment_churn=0.5), b2
    ).rebuild
    assert pq_rebuild_verdict(
        dict(base, assignment_churn=0.73), b2
    ).rebuild


def test_nibble_pack_roundtrip_and_layout_bytes(spark):
    """pack(unpack) is the identity on real code arrays (and on every
    code value 0..15 in both nibble positions), and the persisted
    layout actually stores M/2-entry packed arrays."""
    from aerovaldb_spark.operators.pq import (
        PQ_M,
        pack_codes_col,
        pq_codes_col,
        unpack_codes_col,
    )

    emb = _emb(spark)
    # materialize the codes as plain data first: chaining
    # unpack(pack(encode)) as one expression tree collapses into a
    # single projection that re-evaluates the MxK encode per
    # element_at reference (~256x — the review-pass finding; the
    # production path avoids it via PQIVFIndex._encode_packed's
    # separate projections, but a test over the raw expressions must
    # break the chain with real rows)
    code_rows = emb.select(
        pq_codes_col("embedding").alias("c")
    ).collect()
    cdf = spark.createDataFrame(
        [(list(r["c"]),) for r in code_rows], "c array<tinyint>"
    )
    rt = cdf.withColumn("p", pack_codes_col(F.col("c"))).select(
        "c",
        unpack_codes_col(F.col("p")).alias("rt"),
        F.size("p").alias("pn"),
    )
    bad = rt.filter("c <> rt").count()
    assert bad == 0
    assert rt.select("pn").distinct().collect()[0][0] == PQ_M // 2
    # exhaustive nibble sweep: every (hi, lo) pair roundtrips
    pairs = spark.createDataFrame(
        [([hi, lo] + [0] * (PQ_M - 2),) for hi in range(16)
         for lo in range(16)],
        "c array<tinyint>",
    )
    assert (
        pairs.select(
            F.col("c").alias("c"),
            unpack_codes_col(pack_codes_col(F.col("c"))).alias("rt"),
        )
        .filter("c <> rt")
        .count()
        == 0
    )


@pq_families
def test_pq_ivf_streaming_ingest_crash_and_redelivery(
    spark, tmp_path, monkeypatch, family
):
    """Both PQ families are valid index_ingest_fn targets: the
    generic epoch protocol (intent → packed add → marker) survives a
    crash in the add→marker window — the redelivered batch rolls back
    and re-appends, and the served top-k is bit-equal to a clean
    one-shot build over the union (no doubled packed rows)."""
    import aerovaldb_spark.streaming as st
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    PQIVFIndex = _family_cls(family)
    emb = _emb(spark)
    old = emb.where("vec_id % 2 = 0")
    new = emb.where("vec_id % 2 = 1").withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    cents = frozen_ivf_centroids(spark)
    p = str(tmp_path / "pq")
    PQIVFIndex.build(old, cents).save(p)

    fn = st.index_ingest_fn(PQIVFIndex.load(spark, p), p, run_id="r")

    def boom_marker(marker):
        raise RuntimeError("injected")

    monkeypatch.setattr(st, "_commit_marker", boom_marker)
    with pytest.raises(RuntimeError, match="injected"):
        fn(new, 0)
    monkeypatch.undo()
    fn(new, 0)  # redelivery rolls back the torn append first

    served = PQIVFIndex.load(spark, p)
    assert served.assignments.count() == old.count() + new.count()
    assert (
        served.assignments.groupBy("vec_id").count()
        .where("count > 1")
        .count()
        == 0
    )
    q = emb.filter("vec_id < 5")
    want = sorted(
        map(
            tuple,
            PQIVFIndex.build(old.unionByName(new), cents)
            .topk(q, k=5)
            .collect(),
        )
    )
    got = sorted(map(tuple, served.topk(q, k=5).collect()))
    assert got == want


def test_custom_subclass_add_uses_family_identity(spark, tmp_path):
    """A subclass inheriting FAMILY (the pq_residual_demo
    custom-codebook shape) saves under FAMILY — so the frozen-handle
    guard must verify under FAMILY too, not the class NAME, or the
    subclass is refused on its own layout (r14 review finding)."""
    from aerovaldb_spark.operators.pq import PQIVFIndex
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    class CustomPQIVFIndex(PQIVFIndex):
        pass  # inherits FAMILY = "PQIVFIndex"

    emb = _emb(spark).where("vec_id < 60")
    cents = frozen_ivf_centroids(spark)
    p = str(tmp_path / "custom")
    CustomPQIVFIndex.build(emb.where("vec_id < 40"), cents).save(p)
    idx = CustomPQIVFIndex.load(spark, p)
    grown = idx.add(emb.where("vec_id >= 40"), path=p)  # must not raise
    assert grown.assignments.count() == 60


def test_cross_family_compact_refused_before_mutation(
    spark, tmp_path
):
    """Raw and residual layouts are bit-compatible, so a cross-family
    compact must be refused BEFORE any rewrite touches the foreign
    layout (r14 review finding) — afterwards the rightful family
    still loads the intact index."""
    from aerovaldb_spark.operators.pq import (
        PQIVFIndex,
        ResidualPQIVFIndex,
    )
    from aerovaldb_spark.operators.similarity import (
        frozen_ivf_centroids,
    )

    emb = _emb(spark).where("vec_id < 50")
    p = str(tmp_path / "raw")
    PQIVFIndex.build(emb, frozen_ivf_centroids(spark)).save(p)
    before = sorted(
        map(tuple, PQIVFIndex.load(spark, p).assignments.collect())
    )
    with pytest.raises(ValueError, match="family"):
        ResidualPQIVFIndex.compact(spark, p)
    spark.catalog.refreshByPath(p)
    after = sorted(
        map(tuple, PQIVFIndex.load(spark, p).assignments.collect())
    )
    assert after == before
