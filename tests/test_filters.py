"""Sub-document filter semantics (reference: utils/filter.py, asserted
by tests/test_aerovaldb.py:670-689 and the HEATMAP golden tests)."""

from __future__ import annotations

import pytest

from aerovaldb_spark.filters import (
    filter_contour,
    filter_heatmap,
    filter_map,
    filter_regional_stats,
)


def _glob_stats():
    return {
        "var1": {
            "net1": {
                "layer1": {
                    "model1": {
                        "mv1": {
                            "reg1": {"2020": {"bias": 0.5}, "2021": {"bias": 0.7}},
                            "reg2": {"2020": {"bias": 0.1}},
                        },
                        "mv2": {"reg3": {"2022": {"rmse": 1.0}}},
                    }
                }
            }
        },
        "var2": {"net2": {"layer2": {}}},
    }


def test_filter_regional_stats_projects_path():
    data = _glob_stats()
    out = filter_regional_stats(data, "var1", "net1", "layer1")
    assert "model1" in out


def test_filter_regional_stats_missing_raises():
    with pytest.raises(KeyError):
        filter_regional_stats(_glob_stats(), "nope", "net1", "layer1")


def test_filter_heatmap_keeps_leaf_and_skeleton():
    out = filter_heatmap(_glob_stats(), "reg1", "2020")
    assert out["var1"]["net1"]["layer1"]["model1"]["mv1"]["reg1"] == {
        "2020": {"bias": 0.5}
    }
    # non-matching modvar keeps an EMPTY dict (skeleton preserved)
    assert out["var1"]["net1"]["layer1"]["model1"]["mv2"] == {}
    # empty subtree also preserved
    assert out["var2"]["net2"]["layer2"] == {}


def test_filter_contour():
    data = {"t1": {"a": 1}, "t2": {"b": 2}}
    assert filter_contour(data) is data
    assert filter_contour(data, "t2") == {"b": 2}
    with pytest.raises(KeyError):
        filter_contour(data, "t3")


def test_filter_map_keeps_and_drops():
    data = [
        {
            "station_name": "s1",
            "latitude": 1.0,
            "longitude": 2.0,
            "altitude": 3.0,
            "region": "r",
            "station_display_name": "S1",
            "daily": {"spring": {"bias": 1}, "winter": {"bias": 2}},
            "monthly": {"spring": {"bias": 3}},
            "junk_key": 42,
        }
    ]
    out = filter_map(data, frequency="daily", season="spring")
    st = out[0]
    assert "junk_key" not in st
    assert "monthly" not in st
    assert st["daily"] == {"spring": {"bias": 1}}
    assert st["station_name"] == "s1"


def test_filter_map_identity_when_none():
    data = [{"anything": 1}]
    assert filter_map(data) is data


def test_filter_map_both_or_neither():
    with pytest.raises(ValueError):
        filter_map([], frequency="daily")
    with pytest.raises(ValueError):
        filter_map([], season="spring")
