"""Sub-document filters with reference-identical semantics.

These mirror /root/reference/src/aerovaldb/utils/filter.py:6-84 —
including the quirks its golden tests depend on:

- ``filter_heatmap`` preserves the full outer skeleton (empty dicts
  remain for non-matching models/modvars).
- ``filter_map`` mutates station records in place, keeps only the
  whitelisted keys plus the requested frequency, and inside the
  frequency keeps only the requested season; both-or-neither argument
  validation.

Doc-level filtering runs driver-side on a single asset (point reads
return one document). The scale path for analytics over *many* assets
is the shredded long table (`shred_glob_stats` /
`glob_stats_shredded_filter`) where the same filters become plain
WHERE clauses that Catalyst pushes down (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAP_STATION_KEYS = {
    "station_name",
    "latitude",
    "longitude",
    "altitude",
    "region",
    "station_display_name",
}


def filter_regional_stats(data: dict, variable: str, network: str, layer: str):
    """Project the 3-level path out of a glob_stats document
    (reference: utils/filter.py:6-15)."""
    return data[variable][network][layer]


def filter_heatmap(data: dict, region: str, time: str) -> dict:
    """Keep only the ``[region][time]`` leaf under every
    variable/network/layer/model/modvar path, preserving the outer
    skeleton including empty dicts (reference: utils/filter.py:18-46)."""
    out: dict = {}
    for variable, networks in data.items():
        out.setdefault(variable, {})
        for network, layers in networks.items():
            out[variable].setdefault(network, {})
            for layer, models in layers.items():
                out[variable][network].setdefault(layer, {})
                for model, modvars in models.items():
                    out[variable][network][layer].setdefault(model, {})
                    for modvar, regions in modvars.items():
                        out[variable][network][layer][model].setdefault(modvar, {})
                        if region in regions and time in regions[region]:
                            out[variable][network][layer][model][modvar][region] = {
                                time: regions[region][time]
                            }
    return out


def filter_contour(data: dict, timestep: str | None = None):
    """Key lookup; identity when timestep is None
    (reference: utils/filter.py:49-53)."""
    if timestep is None:
        return data
    return data[timestep]


def filter_map(
    data: list, frequency: str | None = None, season: str | None = None
) -> list:
    """Slim station records to the whitelist + one frequency/season
    (reference: utils/filter.py:56-84, in-place mutation included)."""
    if frequency is None and season is None:
        return data
    if not (isinstance(frequency, str) and isinstance(season, str)):
        raise ValueError(
            "frequency and season must either both be None, or both be "
            f"provided. Got {[frequency, season]}"
        )
    keep = MAP_STATION_KEYS | {frequency}
    for station in data:
        for key in list(station.keys()):
            if key not in keep:
                del station[key]
                continue
            if key == frequency:
                for season_key in list(station[key].keys()):
                    if season_key != season:
                        del station[key][season_key]
    return data


# ---------------------------------------------------------------------------
# Shredded (long-format) glob_stats: the 100 TB analytics path. One row
# per stat leaf; the deep filters become WHERE clauses.
SHRED_LEVELS = ("variable", "network", "layer", "model", "modvar", "region", "time")


def shred_glob_stats_doc(doc: dict) -> list[tuple]:
    """Flatten one glob_stats document into (7 level keys, stat, value)."""
    rows: list[tuple] = []

    def walk(node: Any, path: tuple):
        depth = len(path)
        if depth == len(SHRED_LEVELS):
            if isinstance(node, dict):
                for stat, value in node.items():
                    try:
                        rows.append(path + (stat, float(value)))
                    except (TypeError, ValueError):
                        rows.append(path + (stat, None))
            return
        if isinstance(node, dict):
            for key, child in node.items():
                walk(child, path + (str(key),))

    walk(doc, ())
    return rows


def glob_stats_shredded_filter(
    shredded: DataFrame, *, region: str | None = None, time: str | None = None,
    variable: str | None = None, network: str | None = None, layer: str | None = None,
) -> DataFrame:
    """The heatmap/regional-stats filters as pushdown-able predicates."""
    df = shredded
    for col, val in (
        ("region", region), ("time", time), ("variable", variable),
        ("network", network), ("layer", layer),
    ):
        if val is not None:
            df = df.filter(F.col(col) == val)
    return df
