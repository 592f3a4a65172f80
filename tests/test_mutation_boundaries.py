"""Boundary-semantics pins for the pure rules — written to kill the
surviving mutants of the r14 seeded mutation pass (tools/mutate.py,
MUTATION.md). Each test targets a specific survivor: the >=/> edges
of the rebuild-verdict triggers (their docstrings say "≥" / ">" — an
operator swap must fail a test, not just a reading), the default
threshold constants exercised THROUGH the defaults, the None-metric
guard's and-vs-or distinction, and the glob-stats shredder the fast
kill suite previously never executed. Spark-session-free."""

from __future__ import annotations

from aerovaldb_spark.filters import shred_glob_stats_doc
from aerovaldb_spark.operators.pq import pq_rebuild_verdict
from aerovaldb_spark.operators.similarity import (
    ivf_rebuild_verdict,
    srp_rebuild_verdict,
)
from aerovaldb_spark.operators.text import screen_rebuild_verdict


def test_ivf_occupancy_growth_boundary_is_inclusive_via_default():
    """cur == exactly 2.0x build trips (>=, and 2.0 is the DEFAULT
    — called without the kwarg so a default-constant mutation dies
    too); epsilon under does not."""
    base = {"load_factor_max": 1.2, "top_mass": 0.1,
            "assignment_churn": 0.0}
    at = dict(base, load_factor_max=2.4)
    assert ivf_rebuild_verdict(at, base).rebuild
    under = dict(base, load_factor_max=2.4 - 1e-9)
    assert not ivf_rebuild_verdict(under, base).rebuild


def test_ivf_churn_threshold_boundary_is_exclusive():
    """churn == threshold does NOT trip (strict >); epsilon over
    does."""
    at = {"load_factor_max": 1.0, "top_mass": 0.1,
          "assignment_churn": 0.25}
    assert not ivf_rebuild_verdict(at).rebuild
    over = dict(at, assignment_churn=0.25 + 1e-9)
    assert ivf_rebuild_verdict(over).rebuild


def test_srp_occupancy_growth_boundary_is_inclusive_via_default():
    base = {"load_factor_max": 1.5, "new_bucket_mass": 0.0}
    at = dict(base, load_factor_max=3.0)
    assert srp_rebuild_verdict(at, base).rebuild
    under = dict(base, load_factor_max=3.0 - 1e-9)
    assert not srp_rebuild_verdict(under, base).rebuild


def test_srp_new_bucket_mass_boundary_is_exclusive():
    at = {"load_factor_max": 1.0, "new_bucket_mass": 0.2}
    assert not srp_rebuild_verdict(at).rebuild
    over = {"load_factor_max": 1.0, "new_bucket_mass": 0.2 + 1e-9}
    assert srp_rebuild_verdict(over).rebuild


def test_screen_drift_boundary_is_exclusive_and_default_scaled():
    """idf_drift_mad == 0.10 (the default) does NOT trip; 0.2 — over
    the default but under a +1-mutated constant — does."""
    at = {"idf_drift_mad": 0.10, "new_term_mass": 0.0,
          "top_term_churn": 0.0}
    assert not screen_rebuild_verdict(at).rebuild
    over = dict(at, idf_drift_mad=0.2)
    assert screen_rebuild_verdict(over).rebuild


def test_pq_churn_bar_boundary_is_inclusive():
    """cc == max(growth x build, floor) trips (>= — the documented
    'trip when current churn ≥ bar')."""
    base = {"load_factor_max": 1.0, "top_mass": 0.1,
            "assignment_churn": 0.3}
    at = dict(base, assignment_churn=0.6)
    assert pq_rebuild_verdict(at, base).rebuild
    under = dict(base, assignment_churn=0.6 - 1e-9)
    assert not pq_rebuild_verdict(under, base).rebuild


def test_pq_missing_churn_metric_is_absent_evidence():
    """A baseline (or current report) without assignment_churn must
    SKIP the churn trigger — not crash, not trip (the None guard is a
    conjunction: both sides must be present)."""
    cur = {"load_factor_max": 1.0, "top_mass": 0.1,
           "assignment_churn": 0.9}
    base_no_churn = {"load_factor_max": 1.0, "top_mass": 0.1}
    assert not pq_rebuild_verdict(cur, base_no_churn).rebuild
    cur_no_churn = {"load_factor_max": 1.0, "top_mass": 0.1}
    base = {"load_factor_max": 1.0, "top_mass": 0.1,
            "assignment_churn": 0.0}
    assert not pq_rebuild_verdict(cur_no_churn, base).rebuild


def test_pq_occupancy_growth_boundary_via_default():
    base = {"load_factor_max": 1.1, "top_mass": 0.1,
            "assignment_churn": 0.0}
    at = dict(base, load_factor_max=2.2)
    assert pq_rebuild_verdict(at, base).rebuild
    under = dict(base, load_factor_max=2.2 - 1e-9)
    assert not pq_rebuild_verdict(under, base).rebuild


def test_shred_glob_stats_doc_shape_and_coercion():
    """The shredder emits (7 level keys, stat, float value) rows;
    non-numeric leaf values coerce to None; traversal stops at the
    leaf depth exactly (previously unexecuted by any Spark-free
    test — four surviving mutants lived here)."""
    leaf = {"mean": "1.5", "count": 3, "bad": "not-a-number"}
    doc = leaf
    for _ in range(7):
        doc = {"k": doc}
    rows = shred_glob_stats_doc(doc)
    assert sorted(r[7] for r in rows) == ["bad", "count", "mean"]
    by_stat = {r[7]: r[8] for r in rows}
    assert by_stat["mean"] == 1.5
    assert by_stat["count"] == 3.0
    assert by_stat["bad"] is None
    for r in rows:
        assert len(r) == 9 and r[:7] == ("k",) * 7
    # a node shallower than the level depth emits nothing
    assert shred_glob_stats_doc({"k": {"mean": 1.0}}) == []
