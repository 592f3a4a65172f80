"""Route registry: the 24 asset types and their key schemas.

The route → URI-template mapping is the reference's public API surface
(/root/reference/src/aerovaldb/routes.py:3-87) and must be identical
for URI interchange. Everything else here (key schema derivation,
storage metadata) is engine-specific: in Spark each route is a table
whose key columns are the template placeholders (the analog of the
reference's per-route SQLite DDL, sqlitedb.py:50-133), partitioned by
``project`` so key-prefix scans prune partitions (the Spark analog of
the reference's directory-glob pruning, jsonfiledb.py:725-749).
"""

from __future__ import annotations

import re
from enum import Enum


class Route(Enum):
    GLOB_STATS = "/v0/glob_stats/{project}/{experiment}/{frequency}"
    REGIONAL_STATS = "/v0/regional_stats/{project}/{experiment}/{frequency}"
    HEATMAP = "/v0/heatmap/{project}/{experiment}/{frequency}"
    CONTOUR = "/v0/contour/{project}/{experiment}/{obsvar}/{model}"
    CONTOUR_TIMESPLIT = "/v0/contour2/{project}/{experiment}/{obsvar}/{model}/{timestep}"
    TIMESERIES = "/v0/ts/{project}/{experiment}/{location}/{network}/{obsvar}/{layer}"
    TIMESERIES_WEEKLY = "/v0/ts_weekly/{project}/{experiment}/{location}/{network}/{obsvar}/{layer}"
    EXPERIMENTS = "/v0/experiments/{project}"
    CONFIG = "/v0/config/{project}/{experiment}"
    MENU = "/v0/menu/{project}/{experiment}"
    STATISTICS = "/v0/statistics/{project}/{experiment}"
    RANGES = "/v0/ranges/{project}/{experiment}"
    REGIONS = "/v0/regions/{project}/{experiment}"
    MODELS_STYLE = "/v0/model_style/{project}"
    MAP = "/v0/map/{project}/{experiment}/{network}/{obsvar}/{layer}/{model}/{modvar}"
    SCATTER = "/v0/scat/{project}/{experiment}/{network}/{obsvar}/{layer}/{model}/{modvar}"
    PROFILES = "/v0/profiles/{project}/{experiment}/{location}/{network}/{obsvar}"
    HEATMAP_TIMESERIES = "/v0/hm_ts/{project}/{experiment}"
    FORECAST = "/v0/forecast/{project}/{experiment}/{region}/{network}/{obsvar}/{layer}"
    FAIRMODE = "/v0/fairmode/{project}/{experiment}/{region}/{network}/{obsvar}/{layer}/{model}/{time}"
    GRIDDED_MAP = "/v0/gridded_map/{project}/{experiment}/{obsvar}/{model}"
    REPORT = "/v0/report/{project}/{experiment}/{title}"
    REPORT_IMAGE = "/v0/report-image/{project}/{experiment}/{path}"
    MAP_OVERLAY = "/v0/map-overlay/{project}/{experiment}/{source}/{variable}/{date}"


def template_args(template: str) -> list[str]:
    """Placeholder names of a URI template, in order."""
    return re.findall(r"\{([a-zA-Z-]*?)\}", template)


# Extra *storage* key columns beyond the template placeholders —
# kwargs the reference persists as additional key dimensions (its
# sqlite backend adds them as nullable columns and selects the row
# whose surplus columns are NULL, sqlitedb.py:61-133,441-449).
EXTRA_KEYS: dict[Route, tuple[str, ...]] = {
    Route.MAP: ("time",),
    Route.SCATTER: ("time",),
    Route.MODELS_STYLE: ("experiment",),
    # The reference's hm_ts access takes these positionally
    # (aerovaldb.py:944-1001) and its sqlite backend stores them as key
    # columns (sqlitedb.py:115-121 heatmap_timeseries0) even though the
    # route template carries only project/experiment. Tuple order =
    # the reference's positional-argument order.
    Route.HEATMAP_TIMESERIES: ("region", "network", "obsvar", "layer"),
}

# Routes whose payload is a binary image blob rather than JSON
# (reference: aerovaldb.py:1322-1398, const.py IMG_FILE_EXTS).
BINARY_ROUTES = frozenset({Route.REPORT_IMAGE, Route.MAP_OVERLAY})

IMG_FILE_EXTS = {".apng", ".avif", ".gif", ".jpeg", ".jpg", ".png", ".svg", ".webp"}

# Sub-document filter kwargs per route (reference FILTERS binding,
# jsonfiledb.py:193-197; the filters themselves are utils/filter.py).
# Tuple order = the reference's positional-argument order where the
# filter args are positional in its typed accessors (regional_stats /
# heatmap, aerovaldb.py:156-196) — generated getters accept them
# positionally in this order.
FILTER_KEYS: dict[Route, tuple[str, ...]] = {
    Route.GLOB_STATS: (),
    Route.REGIONAL_STATS: ("network", "variable", "layer"),
    Route.HEATMAP: ("region", "time"),
    Route.CONTOUR: ("timestep",),
    Route.MAP: ("frequency", "season"),
}


def storage_keys(route: Route) -> list[str]:
    """All key columns of a route's table: template args + extras."""
    return template_args(route.value) + list(EXTRA_KEYS.get(route, ()))


def table_name(route: Route) -> str:
    """Table (directory) name for a route."""
    return route.name.lower()


ROUTES_BY_TABLE = {table_name(r): r for r in Route}
