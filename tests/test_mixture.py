"""Temperature-based mixture planning (temperature_mix_plan /
mixture_assignment, q118/q119)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aerovaldb_spark.catalog import load_table
from aerovaldb_spark.operators.text import (
    MIX_TARGET_FRACTION,
    mixture_assignment,
    temperature_mix_plan,
)

SF = "/root/testdata/sf0.001"


def _skewed_docs(spark):
    # big source: 60 docs x 40 tokens; small source: 4 docs x 10
    rows = [
        (i, " ".join(f"b{i}_{j}" for j in range(40)), "big")
        for i in range(60)
    ]
    rows += [
        (100 + i, " ".join(f"s{i}_{j}" for j in range(10)), "small")
        for i in range(4)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_plan_budget_and_flattening(spark):
    docs = load_table(spark, SF, "documents")
    plan = temperature_mix_plan(docs).collect()
    total = sum(r["n_tokens"] for r in plan)
    expected = sum(r["expected_tokens"] for r in plan)
    # the plan's expected token volume hits the target budget (round6
    # slack per source)
    assert expected == pytest.approx(
        int(total * MIX_TARGET_FRACTION), rel=1e-4
    )
    # alpha < 1 flattens: the largest source's sample_rate is the
    # SMALLEST (it gives up share to smaller sources)
    by_tokens = sorted(plan, key=lambda r: r["n_tokens"])
    assert (
        by_tokens[-1]["sample_rate"] <= by_tokens[0]["sample_rate"]
    )


def test_plan_upsamples_small_sources_past_one(spark):
    plan = {
        r["source"]: r
        for r in temperature_mix_plan(
            _skewed_docs(spark), alpha=0.3, target_fraction=0.8
        ).collect()
    }
    # the small source's flattened share exceeds its natural share so
    # much that it must repeat (rate > 1); the big source downsamples
    assert plan["small"]["sample_rate"] > 1.0
    assert plan["big"]["sample_rate"] < 1.0


def test_assignment_matches_plan_expectation(spark):
    docs = _skewed_docs(spark)
    plan = {
        r["source"]: r["sample_rate"]
        for r in temperature_mix_plan(
            docs, alpha=0.3, target_fraction=0.8
        ).collect()
    }
    rows = mixture_assignment(
        docs, alpha=0.3, target_fraction=0.8
    ).collect()
    # every small-source doc repeats at least floor(rate) times
    import math

    for r in rows:
        lo = math.floor(plan[r["source"]])
        assert r["n_copies"] in (lo, lo + 1)
    # zero-copy rows are KEPT (downsampling verdicts are explicit)
    assert len(rows) == docs.count()


def test_assignment_is_deterministic(spark):
    docs = _skewed_docs(spark)
    a = {
        r["doc_id"]: r["n_copies"]
        for r in mixture_assignment(docs).collect()
    }
    b = {
        r["doc_id"]: r["n_copies"]
        for r in mixture_assignment(docs).collect()
    }
    assert a == b


def test_alpha_one_rates_collapse_to_target_fraction(spark):
    """alpha=1 is proportional sampling: weight == share, so every
    source's rate is exactly target_fraction (up to the plan's round6
    points) — the identity that pins the normalizer arithmetic."""
    docs = _skewed_docs(spark)
    plan = temperature_mix_plan(docs, alpha=1.0, target_fraction=0.5)
    rates = [r["sample_rate"] for r in plan.collect()]
    for rate in rates:
        assert rate == pytest.approx(0.5, abs=2e-3)


def test_alpha_zero_is_uniform_over_sources(spark):
    """alpha=0 flattens completely: every source gets the SAME token
    budget (weights all 1), so expected_tokens is uniform across
    sources regardless of their size."""
    docs = _skewed_docs(spark)
    plan = temperature_mix_plan(
        docs, alpha=0.0, target_fraction=0.5
    ).collect()
    budgets = [r["expected_tokens"] for r in plan]
    assert max(budgets) == pytest.approx(min(budgets), rel=2e-3)


def test_dedup_adjusted_plan_discounts_duplicate_heavy_sources(spark):
    """A source whose volume is mostly copies of one page must earn
    LESS mixture share under the dedup-adjusted plan than under the
    raw plan — the adjustment's whole point."""
    from aerovaldb_spark.operators.text import dedup_adjusted_mix_plan

    text_dup = " ".join(f"d{j}" for j in range(40))
    rows = [(i, text_dup, "dupy") for i in range(30)]  # 30 copies
    rows += [
        (100 + i, " ".join(f"u{i}_{j}" for j in range(40)), "clean")
        for i in range(10)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    raw = {
        r["source"]: r["token_share"]
        for r in temperature_mix_plan(docs).collect()
    }
    adj = {
        r["source"]: r["token_share"]
        for r in dedup_adjusted_mix_plan(docs).collect()
    }
    assert adj["dupy"] < raw["dupy"]
    # 30 copies collapse to 1 canonical doc vs 10 distinct: the
    # adjusted share measures distinct content (1/11 of the tokens)
    assert adj["dupy"] == pytest.approx(1 / 11, abs=1e-3)


def test_dedup_adjusted_plan_keeps_fully_duplicated_source_at_zero(spark):
    """A source whose EVERY doc duplicates lower-doc_id content of
    another source has no canonical docs — it must still get a row
    with zero counts and rate 0 (the explicit-zero-verdict
    convention), not vanish from the plan and become 'unplanned'
    downstream."""
    from aerovaldb_spark.operators.text import dedup_adjusted_mix_plan

    text = " ".join(f"w{j}" for j in range(40))
    other = " ".join(f"x{j}" for j in range(40))
    rows = [(1, text, "orig"), (2, other, "orig")]
    rows += [(10 + i, text, "copycat") for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    plan = {r["source"]: r for r in dedup_adjusted_mix_plan(docs).collect()}
    assert set(plan) == {"orig", "copycat"}
    cc = plan["copycat"]
    assert cc["n_docs"] == 0 and cc["n_tokens"] == 0
    assert cc["sample_rate"] == 0.0 and cc["expected_tokens"] == 0.0


def test_source_content_overlap_directional_containment(spark):
    """Planted cross-source duplication: 'mirror' holds copies of
    HALF of 'origin's pages plus nothing else -> containment of
    mirror in origin ~1.0 (all its content is origin's), origin in
    mirror ~0.5; the disjoint third source overlaps nobody. Distinct
    counts stay below k, so every estimate is exact and the matrix
    is deterministic."""
    from aerovaldb_spark.operators.text import source_content_overlap

    origin = [
        (i, " ".join(f"o{i}_{j}" for j in range(20)), "origin")
        for i in range(20)
    ]
    # mirror: copies of origin docs 0..9 (duplicated text, own ids)
    mirror = [
        (100 + i, origin[i][1], "mirror") for i in range(10)
    ]
    other = [
        (200 + i, " ".join(f"x{i}_{j}" for j in range(20)), "other")
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        origin + mirror + other, "doc_id long, text string, source string"
    )
    m = {
        (r["source_a"], r["source_b"]): r
        for r in source_content_overlap(docs).collect()
    }
    assert set(m) == {
        ("mirror", "origin"), ("mirror", "other"), ("origin", "other")
    }
    om = m[("mirror", "origin")]
    assert om["uniq_a"] == 10.0 and om["uniq_b"] == 20.0
    assert om["union_uniq"] == 20.0 and om["intersect_uniq"] == 10.0
    assert om["containment_a_in_b"] == 1.0  # all of mirror is origin's
    assert om["containment_b_in_a"] == 0.5
    assert om["jaccard"] == 0.5
    assert m[("origin", "other")]["intersect_uniq"] == 0.0
    assert m[("mirror", "other")]["jaccard"] == 0.0
    # everything here is exact (distinct counts below k): an exact
    # zero is a TRUE zero, not noise — no row is flagged
    assert not any(
        r["below_noise_a_in_b"] or r["below_noise_b_in_a"]
        for r in m.values()
    )


def test_below_noise_flag_on_planted_zero_overlap(spark):
    """The r12 verdict #6 rule, enforced in the schema: two sources
    with ZERO true overlap but distinct counts far past k sit in the
    estimating regime, where inclusion-exclusion noise lands on a
    near-zero signal — whatever containment the sketches report, its
    error envelope exceeds it and the row must carry below_noise. A
    planted heavy mirror in the same corpus (containment ~1) must NOT
    be flagged — the flag separates noise from signal, not small from
    large."""
    from aerovaldb_spark.operators.text import source_content_overlap

    a = [(i, f"alpha doc {i} unique body", "a") for i in range(200)]
    b = [
        (1000 + i, f"beta doc {i} different body", "b")
        for i in range(200)
    ]
    # mirror: all of a's pages plus 10 of its own -> containment of a
    # in mirror ~1.0 even under sketch noise
    mirror = [(2000 + i, a[i][1], "m") for i in range(200)] + [
        (3000 + i, f"mirror extra {i}", "m") for i in range(10)
    ]
    docs = spark.createDataFrame(
        a + b + mirror, "doc_id long, text string, source string"
    )
    m = {
        (r["source_a"], r["source_b"]): r
        for r in source_content_overlap(docs).collect()
    }
    ab = m[("a", "b")]
    # zero true overlap, estimating regime: flagged in BOTH directions
    assert ab["below_noise_a_in_b"] and ab["below_noise_b_in_a"]
    am = m[("a", "m")]
    # the real mirror signal survives: a's content is ~all in m
    assert am["containment_a_in_b"] > 0.6
    assert not am["below_noise_a_in_b"]


def test_source_content_overlap_skips_null_text_and_plans_sketch_only(spark):
    """NULL-text docs carry no content hash (they duplicate nothing),
    and the plan touches raw text exactly once: the only inequality
    join is the |sources|x|sources| PAIR frame over the persisted
    k-row estimate table (bounded by the key count, by design), and
    the text column never crosses an exchange — the matrix moves
    sketches, not documents."""
    from aerovaldb_spark.operators.text import source_content_overlap

    rows = [(0, "shared words here", "a"), (1, None, "a"),
            (2, "shared words here", "b"), (3, None, "b")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    df = source_content_overlap(docs)
    physical = df._jdf.queryExecution().executedPlan().toString()
    # every cartesian in the tree is the key-pair inequality join
    # (type_a < type_b) over the |sources|-row estimate frame — never
    # a conditionless product over the docs relation
    cart_lines = [
        ln for ln in physical.splitlines() if "CartesianProduct" in ln
    ]
    assert cart_lines, "expected the pair-frame inequality join"
    for ln in cart_lines:
        assert "type_a" in ln and "< type_b" in ln, ln
    for line in physical.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    r = df.collect()[0]
    assert (r["uniq_a"], r["uniq_b"], r["intersect_uniq"]) == (
        1.0, 1.0, 1.0
    )


def _with_ids_shifted(docs, offset):
    return docs.select(
        (F.col("doc_id") + offset).alias("doc_id"), "text", "source"
    )


def test_mixture_plan_save_load_roundtrip_and_gate_serving(spark, tmp_path):
    """The persisted plan round-trips bit-equal (round6 doubles and
    longs survive parquet exactly), rates() hands the streaming gate
    the frozen dict, and the gate's verdicts on the loaded plan are
    bit-equal to the batch assignment under the same frozen frame —
    the stream/batch contract now holds across a save/load cycle."""
    from aerovaldb_spark.operators.text import MixturePlan
    from aerovaldb_spark.streaming import mixture_gate

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source"
    )
    built = MixturePlan.build(docs)
    p = str(tmp_path / "mixplan")
    built.save(p)
    loaded = MixturePlan.load(spark, p)
    assert (loaded.alpha, loaded.target_fraction, loaded.planner) == (
        built.alpha, built.target_fraction, built.planner
    )
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(loaded.plan.collect()) == key(built.plan.collect())
    want = key(loaded.assign(docs).collect())
    got = key(mixture_gate(docs, loaded.rates()).collect())
    assert got == want and len(want) > 0


def test_mixture_plan_fresh_drift_is_zero_and_never_trips(spark):
    from aerovaldb_spark.operators.text import (
        MixturePlan,
        mixture_rebuild_verdict,
    )

    docs = load_table(spark, SF, "documents")
    plan = MixturePlan.build(docs)
    r = plan.drift(docs).collect()[0]
    assert r["growth_ratio"] == 1.0
    assert r["share_drift_mad"] == 0.0
    assert r["share_drift_max"] == 0.0
    assert r["rate_drift_mad"] == 0.0
    assert r["rate_drift_max"] == 0.0
    assert r["new_source_mass"] == 0.0
    assert r["n_sources_frozen"] == r["n_sources_now"]
    assert not mixture_rebuild_verdict(r).rebuild


def test_mixture_plan_same_distribution_growth_trips_nothing(spark):
    """2x same-distribution growth: shares are identical, rates move
    only by the budget-floor rounding (~1/n_tokens) — far below every
    threshold. growth_ratio alone is NOT a trigger, measured."""
    from aerovaldb_spark.operators.text import (
        MixturePlan,
        mixture_rebuild_verdict,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source"
    )
    plan = MixturePlan.build(docs)
    grown = docs.unionByName(_with_ids_shifted(docs, 1_000_000))
    r = plan.drift(grown).collect()[0]
    assert r["growth_ratio"] == 2.0
    assert r["share_drift_mad"] == 0.0  # shares exactly preserved
    assert r["rate_drift_max"] < 0.01
    assert r["new_source_mass"] == 0.0
    v = mixture_rebuild_verdict(r)
    assert not v.rebuild, v.reasons


def test_mixture_plan_skewed_growth_trips_and_maybe_rebuild_swaps(
    spark, tmp_path
):
    """Tripling one source's volume moves the weighted share drift
    past the threshold; maybe_rebuild then re-plans, saves, and the
    returned plan is drift-zero against the new corpus (and bit-equal
    to a fresh build over it)."""
    from aerovaldb_spark.operators.text import (
        MixturePlan,
        mixture_rebuild_verdict,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source"
    )
    src0 = docs.select("source").orderBy("source").first()["source"]
    extra = docs.where(F.col("source") == src0)
    skewed = (
        docs.unionByName(_with_ids_shifted(extra, 1_000_000))
        .unionByName(_with_ids_shifted(extra, 2_000_000))
    )
    p = str(tmp_path / "mixplan")
    plan = MixturePlan.build(docs)
    plan.save(p)
    r = plan.drift(skewed).collect()[0]
    v = mixture_rebuild_verdict(r)
    # tripling 1 of 20 sources: the corpus-wide MAD dilutes it
    # (0.018 < 0.02) but the single-source max trigger catches it
    assert v.rebuild and any("share_drift_max" in s for s in v.reasons)
    new_plan, v2, _ = plan.maybe_rebuild(skewed, path=p)
    assert v2.rebuild
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(new_plan.plan.collect()) == key(
        MixturePlan.build(skewed).plan.collect()
    )
    r2 = new_plan.drift(skewed).collect()[0]
    assert r2["share_drift_mad"] == 0.0
    # fresh-enough path: maybe_rebuild returns self untouched
    same, v3, _ = new_plan.maybe_rebuild(skewed, path=p)
    assert same is new_plan and not v3.rebuild


def test_mixture_plan_new_and_vanished_sources(spark):
    """A brand-new source is new_source_mass (the gate would serve it
    default_rate); a vanished source keeps its frozen row but carries
    zero current weight — excluded from the drift means (it is
    sampled never)."""
    from aerovaldb_spark.operators.text import (
        MixturePlan,
        mixture_rebuild_verdict,
    )

    rows_a = [(i, " ".join(f"a{i}_{j}" for j in range(20)), "a")
              for i in range(10)]
    rows_b = [(100 + i, " ".join(f"b{i}_{j}" for j in range(20)), "b")
              for i in range(10)]
    rows_c = [(200 + i, " ".join(f"c{i}_{j}" for j in range(20)), "c")
              for i in range(10)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string, source string"
    )
    plan = MixturePlan.build(mk(rows_a + rows_b))
    # b vanished, c appeared with half the mass
    r = plan.drift(mk(rows_a + rows_c)).collect()[0]
    assert r["n_sources_frozen"] == 2 and r["n_sources_now"] == 2
    assert r["new_source_mass"] == 0.5
    v = mixture_rebuild_verdict(r)
    assert v.rebuild and any("new_source_mass" in s for s in v.reasons)


def test_mixture_plan_validates_planner_and_dedup_adjusted_replan(spark):
    from aerovaldb_spark.operators.text import (
        MixturePlan,
        dedup_adjusted_mix_plan,
    )

    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="planner"):
        MixturePlan.build(docs, planner="bogus")
    plan = MixturePlan.build(docs, planner="dedup_adjusted")
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(plan.plan.collect()) == key(
        dedup_adjusted_mix_plan(docs).collect()
    )
    # drift re-plans with the SAME planner: zero against itself
    assert plan.drift(docs).collect()[0]["share_drift_mad"] == 0.0


def test_mixture_plan_resave_is_atomic_and_load_survives_swap_window(
    spark, tmp_path
):
    """A re-save over an existing plan must never leave a silently
    MIXED state (new rates under old meta) — save writes the whole
    layout to staging and rename-swaps; load resolves the root across
    the crash window (review finding: the in-place overwrite had a
    plan-new/meta-old window)."""
    from aerovaldb_spark.operators.text import MixturePlan

    docs = load_table(spark, SF, "documents")
    p = str(tmp_path / "mixplan")
    MixturePlan.build(docs, alpha=0.3).save(p)
    # re-save with different knobs over the same path
    MixturePlan.build(docs, alpha=0.7).save(p)
    loaded = MixturePlan.load(spark, p)
    assert loaded.alpha == 0.7  # never old meta + new plan
    want_rows = sorted(map(tuple, loaded.plan.collect()))
    # crash window: live renamed away, .old holds the last full state
    import os

    os.replace(p, p + ".old")
    spark.catalog.refreshByPath(os.path.join(p, "plan"))
    again = MixturePlan.load(spark, p)
    assert again.alpha == 0.7
    assert sorted(map(tuple, again.plan.collect())) == want_rows


def test_mixture_plan_drift_mad_survives_terascale_token_counts(spark):
    """The drift means weight by token SHARE, so the per-term
    DECIMAL(18,6) values are bounded by 1 — a 1e13-token source must
    yield a real drift number, not a silently NULLed term (review
    finding: raw-token weighting overflowed the cast, Spark nulling
    where the DuckDB oracle errors)."""
    from aerovaldb_spark.operators.text import MixturePlan

    def plan_df(shares):
        rows = [
            (s, 10, int(sh * 2e13), sh, sh, sh * 0.5, sh * 1e13)
            for s, sh in shares
        ]
        return spark.createDataFrame(
            rows,
            "source string, n_docs long, n_tokens long, "
            "token_share double, mix_weight double, "
            "sample_rate double, expected_tokens double",
        )

    frozen = MixturePlan(plan_df([("a", 0.5), ("b", 0.5)]), 0.3, 0.5)
    now = plan_df([("a", 0.9), ("b", 0.1)])
    frozen._replan = lambda docs: now  # drift against a fixed re-plan
    r = frozen.drift(spark.range(1)).collect()[0]
    assert r["share_drift_mad"] is not None
    # share-weighted mean |0.4| with weights 0.9/0.1 = 0.4
    assert r["share_drift_mad"] == pytest.approx(0.4, abs=1e-5)
    assert r["share_drift_max"] == pytest.approx(0.4, abs=1e-6)


def test_source_external_dup_picks_worst_partner(spark):
    """q125 reduces the q123 matrix to the row an operator acts on:
    mirror's worst partner is origin at containment 1.0; origin's is
    mirror at 0.5; the disjoint source reports 0 against its
    alphabetically-first partner."""
    from aerovaldb_spark.operators.text import source_external_dup

    origin = [
        (i, " ".join(f"o{i}_{j}" for j in range(20)), "origin")
        for i in range(20)
    ]
    mirror = [(100 + i, origin[i][1], "mirror") for i in range(10)]
    other = [
        (200 + i, " ".join(f"x{i}_{j}" for j in range(20)), "other")
        for i in range(5)
    ]
    docs = spark.createDataFrame(
        origin + mirror + other, "doc_id long, text string, source string"
    )
    rows = {r["source"]: r for r in source_external_dup(docs).collect()}
    assert set(rows) == {"origin", "mirror", "other"}
    assert rows["mirror"]["partner"] == "origin"
    assert rows["mirror"]["containment"] == 1.0
    assert rows["origin"]["partner"] == "mirror"
    assert rows["origin"]["containment"] == 0.5
    assert rows["other"]["containment"] == 0.0
    assert rows["other"]["partner"] == "mirror"  # tie -> name asc


def test_source_shingle_overlap_sees_templates_exact_overlap_misses(spark):
    """Two sources share a TEMPLATE (same body, different per-doc
    wrapper words) — zero exact-content overlap, but most shingles
    shared: q123 reads intersect 0 while q126 reads high shingle
    containment. Distinct shingle counts stay below k, so the matrix
    is exact."""
    from aerovaldb_spark.operators.text import (
        source_content_overlap,
        source_shingle_overlap,
    )

    body = " ".join(f"tpl{j}" for j in range(20))
    rows = [(i, f"hdrA{i} " + body, "siteA") for i in range(8)]
    rows += [(100 + i, f"hdrB{i} " + body, "siteB") for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    exact = source_content_overlap(docs).collect()[0]
    assert exact["intersect_uniq"] == 0.0  # no exact page shared
    sh = source_shingle_overlap(docs).collect()[0]
    # the 18 body shingles are shared; each side adds 8 wrapper-edge
    # shingles (hdrX + first two body words) + the shared head
    assert sh["intersect_uniq"] >= 18.0
    assert sh["containment_a_in_b"] > 0.6
    assert sh["jaccard"] > 0.4
