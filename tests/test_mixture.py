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


def test_source_overlap_matrix_directional_containment(spark):
    """Planted cross-source duplication: 'mirror' holds copies of
    HALF of 'origin's pages plus nothing else -> containment of
    mirror in origin ~1.0 (all its content is origin's), origin in
    mirror ~0.5; the disjoint third source overlaps nobody. Distinct
    counts stay below k, so every estimate is exact and the matrix
    is deterministic."""
    from aerovaldb_spark.operators.text import source_overlap_matrix

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
        for r in source_overlap_matrix(docs).collect()
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


def test_source_overlap_matrix_skips_null_text_and_plans_sketch_only(spark):
    """NULL-text docs carry no content hash (they duplicate nothing),
    and the plan touches raw text exactly once: the only inequality
    join is the |sources|x|sources| PAIR frame over the persisted
    k-row estimate table (bounded by the key count, by design), and
    the text column never crosses an exchange — the matrix moves
    sketches, not documents."""
    from aerovaldb_spark.operators.text import source_overlap_matrix

    rows = [(0, "shared words here", "a"), (1, None, "a"),
            (2, "shared words here", "b"), (3, None, "b")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    df = source_overlap_matrix(docs)
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
