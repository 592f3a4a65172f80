"""Executable rebuild rules over staleness-report rows (pure — the
rules consume ALREADY-COLLECTED report rows, so these tests need no
Spark session). The thresholds encode the r11 SCALING.md
measurements; the scenario dicts below are those measured rows."""

from __future__ import annotations

from aerovaldb_spark.operators.similarity import (
    ivf_rebuild_verdict,
    srp_rebuild_verdict,
)
from aerovaldb_spark.operators.text import screen_rebuild_verdict

# measured r11 rows (tools/staleness_recall.py at sf0.1 inputs)
IVF_BUILD = {
    "load_factor_max": 2.2,
    "top_mass": 0.1375,
    "assignment_churn": 0.065,
}
IVF_SAME_5X = {
    "load_factor_max": 2.376,
    "top_mass": 0.1485,
    "assignment_churn": 0.128,
}
IVF_SHIFT_5X = {
    "load_factor_max": 12.808,
    "top_mass": 0.8005,
    "assignment_churn": 0.0005,
}


def test_ivf_shift_trips_occupancy_not_churn():
    v = ivf_rebuild_verdict(IVF_SHIFT_5X, build_report=IVF_BUILD)
    assert v.rebuild
    assert any("load_factor_max" in r for r in v.reasons)
    assert not any("assignment_churn" in r for r in v.reasons)


def test_ivf_same_distribution_growth_stays_fresh():
    v = ivf_rebuild_verdict(IVF_SAME_5X, build_report=IVF_BUILD)
    assert not v.rebuild and v.reasons == ()


def test_ivf_churn_trips_without_baseline():
    v = ivf_rebuild_verdict({**IVF_SAME_5X, "assignment_churn": 0.3})
    assert v.rebuild
    assert any("assignment_churn" in r for r in v.reasons)


def test_ivf_occupancy_trigger_needs_baseline():
    # without a build-time report the occupancy trigger is skipped
    v = ivf_rebuild_verdict(IVF_SHIFT_5X)
    assert not v.rebuild


def test_srp_new_bucket_mass_trips():
    v = srp_rebuild_verdict(
        {"load_factor_max": 1.5, "new_bucket_mass": 0.45}
    )
    assert v.rebuild and any("new_bucket_mass" in r for r in v.reasons)


def test_srp_occupancy_growth_trips_with_baseline():
    v = srp_rebuild_verdict(
        {"load_factor_max": 4.2, "new_bucket_mass": 0.0},
        build_report={"load_factor_max": 1.8},
    )
    assert v.rebuild
    v2 = srp_rebuild_verdict(
        {"load_factor_max": 2.1, "new_bucket_mass": 0.0},
        build_report={"load_factor_max": 1.8},
    )
    assert not v2.rebuild


def test_srp_plain_skew_report_without_drift_columns():
    # a baseline-less staleness() row has no new_bucket_mass — the
    # rule degrades to "nothing to say" rather than KeyError
    v = srp_rebuild_verdict({"load_factor_max": 9.9})
    assert not v.rebuild


# measured r11 screen rows
SCREEN_SAME_5X = {
    "idf_drift_mad": 0.011503,
    "new_term_mass": 0.0,
    "top_term_churn": 0.0,
}
SCREEN_SHIFT_5X = {
    "idf_drift_mad": 1.608638,
    "new_term_mass": 0.799916,
    "top_term_churn": 0.5,
}


def test_screen_shift_trips_all_three():
    v = screen_rebuild_verdict(SCREEN_SHIFT_5X)
    assert v.rebuild and len(v.reasons) == 3


def test_screen_same_distribution_growth_stays_fresh():
    assert not screen_rebuild_verdict(SCREEN_SAME_5X).rebuild


def test_verdicts_accept_spark_rows(spark):
    # the functions take collected Rows as-is
    row = spark.createDataFrame(
        [(0.02, 0.0, 0.0)],
        "idf_drift_mad double, new_term_mass double, top_term_churn double",
    ).collect()[0]
    assert not screen_rebuild_verdict(row).rebuild


# mixture-plan rows as measured in tests/test_mixture.py at sf0.001
# (tripling ONE of twenty equal sources / 2x same-distribution growth)
MIX_SAME_2X = {
    "growth_ratio": 2.0,
    "share_drift_mad": 0.0,
    "share_drift_max": 0.0,
    "rate_drift_mad": 0.001,
    "rate_drift_max": 0.002,
    "new_source_mass": 0.0,
}
MIX_ONE_SOURCE_3X = {
    "growth_ratio": 1.109739,
    "share_drift_mad": 0.018086,
    "share_drift_max": 0.093461,
    "rate_drift_mad": 0.072044,
    "rate_drift_max": 0.232476,
    "new_source_mass": 0.0,
}


def test_mixture_same_distribution_growth_stays_fresh():
    from aerovaldb_spark.operators.text import mixture_rebuild_verdict

    assert not mixture_rebuild_verdict(MIX_SAME_2X).rebuild


def test_mixture_single_source_shift_trips_max_not_mad():
    """The corpus-wide MAD dilutes a one-source shift (0.018 < 0.02);
    the max trigger is the one that catches it — the measured reason
    the rule carries both."""
    from aerovaldb_spark.operators.text import mixture_rebuild_verdict

    v = mixture_rebuild_verdict(MIX_ONE_SOURCE_3X)
    assert v.rebuild
    assert any("share_drift_max" in s for s in v.reasons)
    assert not any("share_drift_mad" in s for s in v.reasons)


def test_mixture_null_metrics_are_absent_evidence():
    from aerovaldb_spark.operators.text import mixture_rebuild_verdict

    assert not mixture_rebuild_verdict(
        {"share_drift_mad": None, "share_drift_max": None,
         "rate_drift_max": None, "new_source_mass": None}
    ).rebuild
