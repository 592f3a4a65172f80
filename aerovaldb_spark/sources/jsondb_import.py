"""Legacy import: read a metno/aerovaldb JSON-file tree into
AerovalSparkDB.

This shim is where ALL backwards-compatibility machinery lives (the
engine proper has one canonical schema — SURVEY.md §7.1). It
re-implements, import-side only:

- the file-layout templates incl. version-dependent variants
  (reference jsonfiledb.py:85-189),
- per-experiment version detection from the config asset
  (jsonfiledb.py:224-258),
- filename decoding ('/'→'%1', '_'→'%2', '%'→'%0';
  utils/encode.py:9-39, jsonfiledb.py:51-65).

Unparseable files are reported, not fatal. Legacy-name disambiguation
(reference backwards_compatibility.py:11-130) is applied after
template matching: pre-0.29 layouts join fields with ``-``/``_`` that
may also appear INSIDE field values ('AERONET-Sun' networks,
'Amsterdam_Island' locations), so the first-match parse over-splits
and the post-processing below re-assembles the compound values
exactly as the reference does.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from ..db import AerovalSparkDB
from ..routes import IMG_FILE_EXTS, Route

FNAME_DECODE = [("%1", "/"), ("%2", "_"), ("%0", "%")]


def decode_fname(value: str) -> str:
    for enc, raw in FNAME_DECODE:
        value = value.replace(enc, raw)
    return value


def _v(version: str) -> tuple:
    """Order-comparable version key ('0.29.0.dev1' < '0.29.0')."""
    parts = []
    for tok in re.split(r"[.\-+]", version):
        if tok.isdigit():
            parts.append((1, int(tok)))
        elif tok.startswith("dev"):
            parts.append((0, int(tok[3:] or 0)))
        else:
            parts.append((0, 0))
    return tuple(parts)


@dataclass
class _Layout:
    route: Route
    template: str
    min_version: str | None = None
    max_version: str | None = None

    def accepts(self, version: str | None) -> bool:
        if version is None:
            return True
        if self.min_version and _v(version) < _v(self.min_version):
            return False
        if self.max_version and _v(version) >= _v(self.max_version):
            return False
        return True


# File-layout registry (reference jsonfiledb.py:85-189). Order matters:
# more specific templates first.
LAYOUTS: list[_Layout] = [
    _Layout(Route.EXPERIMENTS, "{project}/experiments.json"),
    _Layout(Route.CONFIG, "{project}/{experiment}/cfg_{project}_{experiment}.json"),
    _Layout(Route.GLOB_STATS, "{project}/{experiment}/hm/glob_stats_{frequency}.json"),
    _Layout(Route.MENU, "{project}/{experiment}/menu.json"),
    _Layout(Route.STATISTICS, "{project}/{experiment}/statistics.json"),
    _Layout(Route.RANGES, "{project}/{experiment}/ranges.json"),
    _Layout(Route.REGIONS, "{project}/{experiment}/regions.json"),
    _Layout(Route.MODELS_STYLE, "{project}/{experiment}/models-style.json"),
    _Layout(Route.MODELS_STYLE, "{project}/models-style.json"),
    _Layout(
        Route.CONTOUR_TIMESPLIT,
        "{project}/{experiment}/contour/{obsvar}_{model}/{obsvar}_{model}_{timestep}.geojson",
    ),
    _Layout(Route.CONTOUR, "{project}/{experiment}/contour/{obsvar}_{model}.geojson"),
    _Layout(Route.GRIDDED_MAP, "{project}/{experiment}/contour/{obsvar}_{model}.json"),
    _Layout(
        Route.TIMESERIES_WEEKLY,
        "{project}/{experiment}/ts/diurnal/{location}_{network}_{obsvar}_{layer}.json",
        min_version="0.29.0.dev1",
    ),
    _Layout(
        Route.TIMESERIES_WEEKLY,
        "{project}/{experiment}/ts/diurnal/{location}_{network}-{obsvar}_{layer}.json",
        max_version="0.29.0.dev1",
    ),
    _Layout(
        Route.TIMESERIES,
        "{project}/{experiment}/ts/{location}_{network}_{obsvar}_{layer}.json",
        min_version="0.29.0.dev1",
    ),
    _Layout(
        Route.TIMESERIES,
        "{project}/{experiment}/ts/{location}_{network}-{obsvar}_{layer}.json",
        max_version="0.29.0.dev1",
    ),
    _Layout(
        Route.MAP,
        "{project}/{experiment}/map/{network}_{obsvar}_{layer}_{model}_{modvar}_{time}.json",
        min_version="0.29.0.dev1",
    ),
    _Layout(
        Route.MAP,
        "{project}/{experiment}/map/{network}-{obsvar}_{layer}_{model}-{modvar}_{time}.json",
        min_version="0.13.2",
        max_version="0.29.0.dev1",
    ),
    _Layout(
        Route.MAP,
        "{project}/{experiment}/map/{network}-{obsvar}_{layer}_{model}-{modvar}.json",
        max_version="0.13.2",
    ),
    _Layout(
        Route.SCATTER,
        "{project}/{experiment}/scat/{network}_{obsvar}_{layer}_{model}_{modvar}_{time}.json",
        min_version="0.29.0.dev1",
    ),
    _Layout(
        Route.SCATTER,
        "{project}/{experiment}/scat/{network}-{obsvar}_{layer}_{model}-{modvar}_{time}.json",
        min_version="0.13.2",
        max_version="0.29.0.dev1",
    ),
    _Layout(
        Route.SCATTER,
        "{project}/{experiment}/scat/{network}-{obsvar}_{layer}_{model}-{modvar}.json",
        max_version="0.13.2",
    ),
    _Layout(
        Route.PROFILES,
        "{project}/{experiment}/profiles/{location}_{network}_{obsvar}.json",
        min_version="0.29.0.dev1",
    ),
    _Layout(
        Route.PROFILES,
        "{project}/{experiment}/profiles/{location}_{network}-{obsvar}.json",
        max_version="0.29.0.dev1",
    ),
    _Layout(
        Route.HEATMAP_TIMESERIES,
        "{project}/{experiment}/hm/ts/{region}_{network}_{obsvar}_{layer}.json",
        min_version="0.29.0.dev1",
    ),
    _Layout(
        Route.HEATMAP_TIMESERIES,
        "{project}/{experiment}/hm/ts/{region}-{network}-{obsvar}-{layer}.json",
        min_version="0.13.2",
        max_version="0.29.0.dev1",
    ),
    _Layout(
        Route.HEATMAP_TIMESERIES,
        "{project}/{experiment}/hm/ts/{network}-{obsvar}-{layer}.json",
        min_version="0.12.2",
        max_version="0.13.2",
    ),
    _Layout(
        Route.HEATMAP_TIMESERIES,
        "{project}/{experiment}/hm/ts/stats_ts.json",
        max_version="0.12.2",
    ),
    _Layout(
        Route.FORECAST,
        "{project}/{experiment}/forecast/{region}_{network}_{obsvar}_{layer}.json",
        min_version="0.29.0.dev1",
    ),
    _Layout(
        Route.FORECAST,
        "{project}/{experiment}/forecast/{region}_{network}-{obsvar}_{layer}.json",
        max_version="0.29.0.dev1",
    ),
    _Layout(
        Route.FAIRMODE,
        "{project}/{experiment}/fairmode/{region}_{network}_{obsvar}_{layer}_{model}_{time}.json",
    ),
    _Layout(
        Route.MAP_OVERLAY,
        "{project}/{experiment}/overlay/{variable}_{source}/{variable}_{source}_{date}",
    ),
    _Layout(Route.REPORT, "reports/{project}/{experiment}/{title}.json"),
    _Layout(Route.REPORT_IMAGE, "reports/{project}/{experiment}/{path}"),
]


def _layout_rx(template: str) -> re.Pattern:
    pattern = ""
    pos = 0
    for m in re.finditer(r"\{([a-zA-Z-]*?)\}", template):
        pattern += re.escape(template[pos : m.start()])
        # Allow repeated placeholders (cfg_{project}_{experiment} repeats
        # both) as backreferences.
        name = m.group(1)
        if f"(?P<{name}>" in pattern:
            pattern += f"(?P={name})"
        else:
            pattern += f"(?P<{name}>[^/]*?)"
        pos = m.end()
    pattern += re.escape(template[pos:])
    return re.compile(f"^{pattern}$")


_RX_CACHE: dict[str, re.Pattern] = {}


def _match(template: str, rel_path: str) -> dict[str, str] | None:
    rx = _RX_CACHE.get(template)
    if rx is None:
        rx = _RX_CACHE[template] = _layout_rx(template)
    m = rx.match(rel_path)
    return m.groupdict() if m else None


# REPORT_IMAGE {path} may span directories — match with slashes allowed.
_REPORT_IMAGE_RX = re.compile(r"^reports/(?P<project>[^/]+)/(?P<experiment>[^/]+)/(?P<path>.+)$")


# -- legacy-name disambiguation (reference backwards_compatibility.py) ------

def _move_dash_prefix(args: dict[str, str], src: str, dst: str) -> None:
    """'-'-separated prefix of args[src] belongs to args[dst]:
    (network='AERONET', obsvar='Sun-od550aer') →
    (network='AERONET-Sun', obsvar='od550aer')."""
    if "-" in args.get(src, ""):
        splt = args[src].split("-")
        args[src] = splt[-1]
        args[dst] = args[dst] + f"-{'-'.join(splt[:-1])}"


def _move_underscore_prefix(args: dict[str, str], src: str, dst: str) -> None:
    if "_" in args.get(src, ""):
        splt = args[src].split("_")
        args[src] = splt[-1]
        args[dst] = args[dst] + f"_{'_'.join(splt[:-1])}"


def post_process_args(layout: _Layout, args: dict[str, str]) -> dict[str, str]:
    """Re-assemble compound field values the legacy separators split
    (reference backwards_compatibility.py:11-130; golden behavior in
    reference tests/jsondb/test_jsonfiledb.py:53-96).

    Runs on the RAW parsed strings before filename decoding, like the
    reference (jsonfiledb.py:575-587). The reference gates on the
    experiment version; the matched layout template encodes the same
    era boundaries, which also covers trees with no version config.
    """
    a = dict(args)
    t = layout.template
    route = layout.route
    if route is Route.MAP and "{network}-{obsvar}" in t:
        _move_dash_prefix(a, "obsvar", "network")
        _move_dash_prefix(a, "modvar", "model")
    elif route is Route.SCATTER and "{network}-{obsvar}" in t:
        _move_dash_prefix(a, "obsvar", "network")
    elif (
        route in (Route.TIMESERIES, Route.TIMESERIES_WEEKLY)
        and "-{obsvar}" in t
    ):
        _move_dash_prefix(a, "obsvar", "network")
        _move_underscore_prefix(a, "network", "location")
    elif route is Route.FORECAST and "-{obsvar}" in t:
        _move_dash_prefix(a, "obsvar", "network")
    elif route is Route.HEATMAP_TIMESERIES and "{region}-{network}" in t:
        # 0.13.2 ≤ v < 0.29: all four fields '-'-joined. Layer and
        # obsvar cannot contain '-'; the first token is the region and
        # the middle remainder is the network (reference
        # backwards_compatibility.py:97-113).
        splt = "-".join([a["region"], a["network"], a["obsvar"], a["layer"]]).split("-")
        a["layer"] = splt.pop()
        a["obsvar"] = splt.pop()
        a["region"] = splt.pop(0)
        a["network"] = "-".join(splt)
    elif (
        route is Route.HEATMAP_TIMESERIES
        and "{network}-{obsvar}" in t
        and "{region}" not in t
    ):
        _move_dash_prefix(a, "obsvar", "network")
    return a


@dataclass
class ImportReport:
    imported: int = 0
    skipped: list[str] = field(default_factory=list)
    by_route: dict[str, int] = field(default_factory=dict)


def _experiment_version(basedir: str, rel_path: str) -> str | None:
    """Version of the experiment owning this file, from its config
    asset (reference _get_version, jsonfiledb.py:224-258)."""
    parts = rel_path.split("/")
    if len(parts) < 2:
        return None
    project, experiment = parts[0], parts[1]
    if project == "reports" and len(parts) >= 3:
        project, experiment = parts[1], parts[2]
    cfg = os.path.join(
        basedir, project, experiment, f"cfg_{project}_{experiment}.json"
    )
    try:
        with open(cfg, encoding="utf-8") as fh:
            doc = json.load(fh)
        return doc["exp_info"]["pyaerocom_version"]
    except (OSError, KeyError, ValueError):
        return None


def resolve_path(
    rel_path: str, version: str | None
) -> tuple[Route, dict[str, str]] | None:
    """Map a relative file path to (route, decoded args)."""
    stem, ext = os.path.splitext(rel_path)
    # Map overlays carry a sniffed image extension appended to the
    # template (reference jsonfiledb.py:891-936).
    overlay_path = stem if ext in IMG_FILE_EXTS else rel_path
    candidates = [l for l in LAYOUTS if l.accepts(version)] + [
        l for l in LAYOUTS if not l.accepts(version)
    ]
    for layout in candidates:
        target = overlay_path if layout.route is Route.MAP_OVERLAY else rel_path
        if layout.route is Route.REPORT_IMAGE:
            if ext in IMG_FILE_EXTS:
                m = _REPORT_IMAGE_RX.match(rel_path)
                if m:
                    return Route.REPORT_IMAGE, {
                        k: decode_fname(v) for k, v in m.groupdict().items()
                    }
            continue
        args = _match(layout.template, target)
        if args is not None:
            args = post_process_args(layout, args)
            return layout.route, {k: decode_fname(v) for k, v in args.items()}
    return None


def import_jsondb_tree_distributed(
    db: AerovalSparkDB, basedir: str, version_override: str | None = None
) -> ImportReport:
    """Cluster-scale import: read the whole tree with Spark's binaryFile
    source (executors do the IO) and resolve paths EXECUTOR-side with an
    Arrow-batched pandas UDF — neither file contents nor the path list
    ever materialize on the driver, so driver memory stays O(routes),
    not O(files).

    This is the shape that survives a 100 TB tree: the per-file loop of
    :func:`import_jsondb_tree` is O(N) driver round-trips; here the
    driver handles only per-route aggregates (≤24 rows) and the skipped
    sample. Version detection reads each experiment's config asset from
    ``basedir`` on the executor (cached per experiment) — the tree being
    imported must be executor-visible, which any importable tree already
    is (it is the data source).
    """
    from pyspark.sql import functions as F

    from ..routes import storage_keys

    report = ImportReport()
    files = db.spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    ).load(basedir)
    prefix = "file:" + os.path.abspath(basedir).rstrip("/") + "/"

    def _resolve_batches(batches):
        import pandas as pd

        version_cache: dict[str, str | None] = {}
        for pdf in batches:
            paths, rels, routes, argss = [], [], [], []
            for full in pdf["path"]:
                rel = full.removeprefix(prefix)
                if version_override is not None:
                    version = version_override
                else:
                    # one cfg read per experiment prefix, not per
                    # file; reports/ paths resolve their experiment
                    # one level deeper
                    # (reports/<proj>/<exp>/...), so the cache key must
                    # include that segment or every experiment under a
                    # reports project would pin the first one's version
                    parts = rel.split("/")
                    depth = 3 if parts[0] == "reports" else 2
                    exp_key = "/".join(parts[:depth])
                    if exp_key not in version_cache:
                        version_cache[exp_key] = _experiment_version(
                            basedir, rel
                        )
                    version = version_cache[exp_key]
                resolved = resolve_path(rel, version)
                paths.append(full)
                rels.append(rel)
                routes.append(resolved[0].name if resolved else None)
                argss.append(resolved[1] if resolved else None)
            yield pd.DataFrame(
                {"path": paths, "rel": rels, "route": routes, "args": argss}
            )

    # Resolution needs only the listing columns; binaryFile prunes
    # `content` out of this scan, so the tree is not read twice.
    resolved = files.select("path").mapInPandas(
        _resolve_batches,
        schema="path string, rel string, route string, args map<string,string>",
    ).persist()
    try:
        report.skipped = [
            row["rel"]
            for row in resolved.filter(F.col("route").isNull())
            .select("rel")
            .collect()
        ]
        counts = {
            row["route"]: row["n"]
            for row in resolved.filter(F.col("route").isNotNull())
            .groupBy("route")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        report.by_route = dict(counts)
        report.imported = sum(counts.values())

        for route_name in sorted(counts):
            route = Route[route_name]
            # Different layout versions of one route may bind different
            # key sets (e.g. legacy MAP has no `time`) — normalize to
            # the route's full storage-key schema.
            keys = storage_keys(db._storage_route(route))
            mapping = resolved.filter(F.col("route") == route_name).select(
                "path", *[F.col("args")[k].alias(f"k_{k}") for k in keys]
            )
            # No broadcast hint: mapping is listing-sized and grows with
            # the tree; AQE broadcasts at runtime when it fits.
            joined = files.join(mapping, "path")
            is_binary = route in (Route.REPORT_IMAGE, Route.MAP_OVERLAY)
            payload = (
                F.col("content") if is_binary else F.col("content").cast("string")
            )
            out = joined.select(
                *[F.col(f"k_{k}").alias(k) for k in keys],
                payload.alias("payload"),
                F.col("modificationTime").alias("write_ts"),
            )
            db.bulk_import(route, out)
    finally:
        resolved.unpersist()
    return report


def tree_state(basedir: str) -> dict[str, tuple[int, int]]:
    """Source-tree fingerprint: rel path -> (mtime_ns, size).

    One os.walk, no file contents — the change detector behind the
    live-view `json_files:` backend (reference jsonfiledb reads the
    tree live on every access, jsonfiledb.py:199-222; we get the same
    observable behavior by re-importing only files whose signature
    moved)."""
    state: dict[str, tuple[int, int]] = {}
    for dirpath, _dirnames, filenames in os.walk(basedir, followlinks=True):
        for fname in filenames:
            full = os.path.join(dirpath, fname)
            try:
                st = os.stat(full)
            except OSError:
                continue
            rel = os.path.relpath(full, basedir).replace(os.sep, "/")
            state[rel] = (st.st_mtime_ns, st.st_size)
    return state


def sync_jsondb_tree(
    db: AerovalSparkDB,
    basedir: str,
    prev_state: dict[str, tuple[int, int]] | None,
    version_override: str | None = None,
) -> dict[str, tuple[int, int]]:
    """Incrementally mirror a reference tree into the store.

    Re-imports files whose (mtime, size) changed since ``prev_state``
    (LWW upsert makes re-imports idempotent) and tombstones assets
    whose backing file disappeared. Returns the new state; with
    ``prev_state=None`` this is a full import.

    State entries are ``(mtime_ns, size)`` for skipped/unresolvable
    files and ``(mtime_ns, size, route_name, args)`` for imported ones:
    recording the resolved (route, args) per rel means a later deletion
    tombstones EXACTLY the asset that was imported, even when the
    experiment's config file vanished alongside it (version detection
    would then resolve the rel differently and the tombstone would miss
    the live asset). Old two-element states load fine — their files
    re-import once (idempotent) and are re-recorded with resolutions.

    ``version_override`` pins the layout version for EVERY file instead
    of per-experiment config detection — the escape hatch for trees
    whose configs are missing or lie (reference ``version=`` kwarg on
    StringMapper.lookup, utils/string_mapper/mapper.py:27-102)."""
    cur = tree_state(basedir)
    prev = prev_state or {}

    def _sig(entry: tuple | None) -> tuple | None:
        return tuple(entry[:2]) if entry else None

    if {k: _sig(v) for k, v in prev.items()} == cur:
        return prev  # unchanged: keep the recorded resolutions
    changed = [rel for rel, sig in cur.items() if _sig(prev.get(rel)) != sig]
    removed = [rel for rel in prev if rel not in cur]
    out: dict[str, tuple] = {
        rel: (prev[rel] if _sig(prev.get(rel)) == sig else sig)
        for rel, sig in cur.items()
    }
    dirty = False
    for rel in sorted(changed):
        version = version_override or _experiment_version(basedir, rel)
        resolved = resolve_path(rel, version)
        if resolved is None:
            continue
        route, args = resolved
        full = os.path.join(basedir, rel)
        try:
            if route in (Route.REPORT_IMAGE, Route.MAP_OVERLAY):
                with open(full, "rb") as fh:
                    db.put(fh.read(), route, args)
            else:
                with open(full, encoding="utf-8") as fh:
                    db.put(fh.read(), route, args)
        except Exception:  # noqa: BLE001 — unparseable file: skip, like import
            continue
        out[rel] = (*cur[rel], route.name, dict(args))
        dirty = True
    for rel in sorted(removed):
        entry = prev.get(rel)
        if entry is not None and len(entry) >= 4:
            route, args = Route[entry[2]], dict(entry[3])
        else:
            # legacy two-element state: re-resolve, honoring the same
            # version pin the import used
            resolved = resolve_path(
                rel, version_override or _experiment_version(basedir, rel)
            )
            if resolved is None:
                continue
            route, args = resolved
        db._put_row(route, dict(args), None, tombstone=True)
        dirty = True
    if dirty:
        db.flush()
    return out


def import_jsondb_tree(
    db: AerovalSparkDB, basedir: str, version_override: str | None = None
) -> ImportReport:
    """Walk a reference-layout tree and load every parseable asset.

    ``version_override`` pins the layout version for every file (see
    :func:`sync_jsondb_tree`)."""
    report = ImportReport()
    # followlinks: symlinked project dirs are valid projects (the
    # reference's own tests cover them, tests/jsondb/test_jsonfiledb.py).
    for dirpath, _dirnames, filenames in os.walk(basedir, followlinks=True):
        for fname in sorted(filenames):
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, basedir).replace(os.sep, "/")
            version = version_override or _experiment_version(basedir, rel)
            resolved = resolve_path(rel, version)
            if resolved is None:
                report.skipped.append(rel)
                continue
            route, args = resolved
            try:
                if route in (Route.REPORT_IMAGE, Route.MAP_OVERLAY):
                    with open(full, "rb") as fh:
                        db.put(fh.read(), route, args)
                else:
                    with open(full, encoding="utf-8") as fh:
                        db.put(fh.read(), route, args)  # raw JSON fidelity
            except Exception:  # noqa: BLE001
                report.skipped.append(rel)
                continue
            report.imported += 1
            report.by_route[route.name] = report.by_route.get(route.name, 0) + 1
    db.flush()
    return report


# --------------------------------------------------------------------------
# Export: the inverse migration — write the store back out as a
# reference-layout tree a stock aerovaldb deployment can open.

FNAME_ENCODE = {"%": "%0", "/": "%1", "_": "%2"}


def encode_fname(value: str) -> str:
    """Reference filename encoding (utils/encode.py:9-23 via
    jsonfiledb.py:51-65): single-pass character translation."""
    return value.translate(str.maketrans(FNAME_ENCODE))


def _layout_for_export(
    route: Route, key: dict, version: str | None = None
) -> str | None:
    """Newest template whose placeholders are exactly the non-NULL
    keys of this row AND whose version window accepts the experiment's
    version. Rows imported from legacy layouts keep NULL for the keys
    their layout didn't bind, so they naturally select their legacy
    template again (e.g. a pre-0.13.2 map row without `time`); the
    version gate matters when key SETS coincide across eras (pre-0.29
    timeseries binds the same four keys as current — exporting the
    current '_'-joined layout into a tree whose config still declares
    an old pyaerocom version would be re-parsed with the legacy
    template and corrupt the keys; reference writes pick templates by
    version the same way, jsonfiledb.py:260-278)."""
    bound = {k for k, v in key.items() if v is not None}
    for layout in LAYOUTS:
        if layout.route is not route or not layout.accepts(version):
            continue
        placeholders = set(re.findall(r"\{([a-zA-Z-]*?)\}", layout.template))
        if placeholders == bound:
            return layout.template
    return None


def export_jsondb_tree(db: AerovalSparkDB, basedir: str) -> ImportReport:
    """Write every live asset to a reference-layout JSON-file tree.

    The driver streams rows (``toLocalIterator``) and writes local
    files — a file tree is a single-filesystem target, so this is a
    deliberately driver-side migration path, like the sqlite export.
    Returns an ImportReport (imported = files written; skipped = rows
    with no representable layout).
    """
    from ..functions import sniff_image_extension
    from ..routes import BINARY_ROUTES, storage_keys

    db.flush()
    report = ImportReport()

    # Experiment versions (from each config asset) steer template
    # choice, like the reference's version-keyed PATH_LOOKUP.
    versions: dict[tuple[str, str], str] = {}
    cfg_df = db.table(Route.CONFIG)
    if cfg_df is not None:
        for row in cfg_df.select("project", "experiment", "payload").toLocalIterator():
            try:
                doc = json.loads(row["payload"])
                versions[(row["project"], row["experiment"])] = doc["exp_info"][
                    "pyaerocom_version"
                ]
            except (TypeError, KeyError, ValueError):
                continue

    for route in Route:
        if db._storage_route(route) is not route:
            continue  # alias views (regional_stats/heatmap) live in glob_stats
        df = db.table(route)
        if df is None:
            continue
        keys = storage_keys(route)
        for row in df.select(*keys, "payload").toLocalIterator():
            key = {k: row[k] for k in keys}
            version = versions.get((key.get("project"), key.get("experiment")))
            template = _layout_for_export(route, key, version)
            if template is None:
                report.skipped.append(f"{route.name}:{key}")
                continue
            if route is Route.REPORT_IMAGE:
                # path spans subdirectories verbatim (reference treats
                # it as a relative path, not an encoded field)
                rel = template.format(**{
                    k: (v if k == "path" else encode_fname(v))
                    for k, v in key.items() if v is not None
                })
            else:
                rel = template.format(
                    **{k: encode_fname(v) for k, v in key.items() if v is not None}
                )
            payload = row["payload"]
            if route is Route.MAP_OVERLAY:
                # reference appends a sniffed image extension
                # (jsonfiledb.py:891-936)
                rel += sniff_image_extension(bytes(payload)) or ".png"
            full = os.path.join(basedir, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            if route in BINARY_ROUTES:
                with open(full, "wb") as fh:
                    fh.write(bytes(payload))
            else:
                with open(full, "w", encoding="utf-8") as fh:
                    fh.write(payload)
            report.imported += 1
            report.by_route[route.name] = report.by_route.get(route.name, 0) + 1
    return report
