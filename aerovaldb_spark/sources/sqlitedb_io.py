"""Reference-sqlite interchange: import an aerovaldb ``.sqlite`` file
into the Spark store, and export a store back to one.

The reference's sqlite backend keeps one table per route *variant* —
key columns + ``ctime``/``mtime`` TEXT + a ``json`` TEXT payload
(``blob`` BLOB for the two image routes) — plus a ``metadata``
key/value table (layout mirrored from sqlitedb.py:61-163, DDL
:319-380). Version-constrained variants (``map1``, ``scatter1``,
``heatmap_timeseries1/2`` …) carry fewer key columns for assets
written by old pyaerocom versions; on import they all normalize onto
the route's full storage-key schema with the missing keys NULL, which
is exactly how the engine's LWW window treats absent extras.

A single sqlite file is inherently single-node, so both directions
stage through the driver deliberately: import reads each table once
and appends it as ONE distributed write per route (``bulk_import`` —
no per-asset job), export streams ``toLocalIterator`` so the driver
never materializes a whole table. At 100 TB you would not use sqlite
at all — this exists so reference users can migrate in (and back out)
without a bespoke ETL.
"""

from __future__ import annotations

import datetime as _dt
import os
import sqlite3
from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..routes import BINARY_ROUTES, Route, storage_keys
from .jsondb_import import ImportReport

if TYPE_CHECKING:
    from ..db import AerovalSparkDB

# Reference SQLITE_TIMESTAMP_FORMAT (sqlitedb.py:59).
_TS_FMT = "%Y-%m-%d %H:%M:%S"

# Table → key columns, mirrored from the reference's
# TABLE_COLUMN_NAMES (sqlitedb.py:61-133). Order matters: it is the
# column order of the reference DDL.
TABLE_COLUMNS: dict[str, list[str]] = {
    "glob_stats": ["project", "experiment", "frequency"],
    "contour": ["project", "experiment", "obsvar", "model"],
    "contour1": ["project", "experiment", "obsvar", "model", "timestep"],
    "timeseries": ["project", "experiment", "location", "network", "obsvar", "layer"],
    "timeseries_weekly": ["project", "experiment", "location", "network", "obsvar", "layer"],
    "experiments": ["project"],
    "config": ["project", "experiment"],
    "menu": ["project", "experiment"],
    "statistics": ["project", "experiment"],
    "ranges": ["project", "experiment"],
    "regions": ["project", "experiment"],
    "models_style0": ["project", "experiment"],
    "models_style1": ["project"],
    "map0": ["project", "experiment", "network", "obsvar", "layer", "model", "modvar", "time"],
    "map1": ["project", "experiment", "network", "obsvar", "layer", "model", "modvar"],
    "scatter0": ["project", "experiment", "network", "obsvar", "layer", "model", "modvar", "time"],
    "scatter1": ["project", "experiment", "network", "obsvar", "layer", "model", "modvar"],
    "profiles": ["project", "experiment", "location", "network", "obsvar"],
    "heatmap_timeseries0": ["project", "experiment", "region", "network", "obsvar", "layer"],
    "heatmap_timeseries1": ["project", "experiment", "network", "obsvar", "layer"],
    "heatmap_timeseries2": ["project", "experiment"],
    "forecast": ["project", "experiment", "region", "network", "obsvar", "layer"],
    "fairmode": ["project", "experiment", "region", "network", "obsvar", "layer", "model", "time"],
    "gridded_map": ["project", "experiment", "obsvar", "model"],
    "report": ["project", "experiment", "title"],
    "reportimages": ["project", "experiment", "path"],
    "mapoverlay": ["project", "experiment", "source", "variable", "date"],
}

# Table → route, mirrored from TABLE_NAME_TO_ROUTE (sqlitedb.py:135-163).
TABLE_TO_ROUTE: dict[str, Route] = {
    "glob_stats": Route.GLOB_STATS,
    "contour": Route.CONTOUR,
    "contour1": Route.CONTOUR_TIMESPLIT,
    "timeseries": Route.TIMESERIES,
    "timeseries_weekly": Route.TIMESERIES_WEEKLY,
    "experiments": Route.EXPERIMENTS,
    "config": Route.CONFIG,
    "menu": Route.MENU,
    "statistics": Route.STATISTICS,
    "ranges": Route.RANGES,
    "regions": Route.REGIONS,
    "models_style0": Route.MODELS_STYLE,
    "models_style1": Route.MODELS_STYLE,
    "map0": Route.MAP,
    "map1": Route.MAP,
    "scatter0": Route.SCATTER,
    "scatter1": Route.SCATTER,
    "profiles": Route.PROFILES,
    "heatmap_timeseries0": Route.HEATMAP_TIMESERIES,
    "heatmap_timeseries1": Route.HEATMAP_TIMESERIES,
    "heatmap_timeseries2": Route.HEATMAP_TIMESERIES,
    "forecast": Route.FORECAST,
    "fairmode": Route.FAIRMODE,
    "gridded_map": Route.GRIDDED_MAP,
    "report": Route.REPORT,
    "reportimages": Route.REPORT_IMAGE,
    "mapoverlay": Route.MAP_OVERLAY,
}

_BLOB_TABLES = frozenset({"reportimages", "mapoverlay"})

# Export target per storage route: always the CURRENT-version variant
# (the reference resolves current writes there too; legacy variants
# exist only to read files written by old pyaerocom). MODELS_STYLE is
# special-cased per row (project-only rows belong in models_style1 so
# the reference's PriorityMapper finds them, sqlitedb.py:200-206).
_EXPORT_TABLE: dict[Route, str] = {
    Route.GLOB_STATS: "glob_stats",
    Route.CONTOUR: "contour",
    Route.CONTOUR_TIMESPLIT: "contour1",
    Route.TIMESERIES: "timeseries",
    Route.TIMESERIES_WEEKLY: "timeseries_weekly",
    Route.EXPERIMENTS: "experiments",
    Route.CONFIG: "config",
    Route.MENU: "menu",
    Route.STATISTICS: "statistics",
    Route.RANGES: "ranges",
    Route.REGIONS: "regions",
    Route.MODELS_STYLE: "models_style0",  # per-row: style1 when project-only
    Route.MAP: "map0",
    Route.SCATTER: "scatter0",
    Route.PROFILES: "profiles",
    Route.HEATMAP_TIMESERIES: "heatmap_timeseries0",
    Route.FORECAST: "forecast",
    Route.FAIRMODE: "fairmode",
    Route.GRIDDED_MAP: "gridded_map",
    Route.REPORT: "report",
    Route.REPORT_IMAGE: "reportimages",
    Route.MAP_OVERLAY: "mapoverlay",
}


def _parse_ts(value) -> _dt.datetime | None:
    if value is None:
        return None
    try:
        return _dt.datetime.strptime(str(value), _TS_FMT)
    except ValueError:
        return None


def is_aerovaldb_sqlite(dbfile: str) -> bool:
    """True if the file carries the reference's metadata marker.

    The reference *intends* this check but never raises on failure
    (sqlitedb.py:178-180: a bare ``ValueError(...)`` expression) and
    compares against the literal ``"aerovaldb"`` even though it writes
    ``"aerovaldb_<version>"`` — so its own files fail its own check.
    We implement the evident intent: prefix match, and actually raise
    (in :func:`import_sqlite_db`).
    """
    try:
        con = sqlite3.connect(f"file:{dbfile}?mode=ro", uri=True)
        try:
            row = con.execute(
                "SELECT value FROM metadata WHERE key = 'created_by'"
            ).fetchone()
        finally:
            con.close()
    except sqlite3.Error:
        return False
    return bool(row) and str(row[0]).startswith("aerovaldb")


def import_sqlite_db(db: "AerovalSparkDB", dbfile: str) -> ImportReport:
    """Load every asset of a reference sqlite file into the store.

    One distributed append per populated table — the driver handles
    row staging only (a single sqlite file is small by construction;
    anything bigger would not be in sqlite).
    """
    if not is_aerovaldb_sqlite(dbfile):
        raise ValueError(f"{dbfile!r} is not an aerovaldb sqlite database")
    con = sqlite3.connect(f"file:{dbfile}?mode=ro", uri=True)
    con.row_factory = sqlite3.Row
    report = ImportReport()
    try:
        existing = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type = 'table'"
            )
        }
        for tname, route in TABLE_TO_ROUTE.items():
            if tname not in existing:
                continue
            rows = con.execute(f"SELECT * FROM {tname}").fetchall()  # noqa: S608
            if not rows:
                continue
            payload_col = "blob" if tname in _BLOB_TABLES else "json"
            keys = storage_keys(db._storage_route(route))
            data = []
            for r in rows:
                rec = dict(r)
                payload = rec.get(payload_col)
                if payload is None:
                    report.skipped.append(f"{tname}:{[rec.get(c) for c in TABLE_COLUMNS[tname]]}")
                    continue
                key_vals = tuple(
                    None if rec.get(k) is None else str(rec.get(k)) for k in keys
                )
                if route in BINARY_ROUTES:
                    payload = bytes(payload)
                data.append(key_vals + (payload, _parse_ts(rec.get("mtime"))))
            if not data:
                continue
            payload_t = (
                T.BinaryType() if route in BINARY_ROUTES else T.StringType()
            )
            schema = T.StructType(
                [T.StructField(k, T.StringType()) for k in keys]
                + [
                    T.StructField("payload", payload_t),
                    T.StructField("write_ts", T.TimestampType()),
                ]
            )
            df = db.spark.createDataFrame(data, schema=schema).withColumn(
                "write_ts", F.coalesce("write_ts", F.current_timestamp())
            )
            db.bulk_import(route, df)
            report.imported += len(data)
            report.by_route[route.name] = report.by_route.get(route.name, 0) + len(data)
    finally:
        con.close()
    return report


def _init_sqlite(con: sqlite3.Connection) -> None:
    """Create the reference DDL (sqlitedb.py:319-380): metadata table,
    one table per variant with a UNIQUE key constraint, and the
    mtime-refresh trigger."""
    cur = con.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS metadata(key, value, UNIQUE(key))")
    for tname, cols in TABLE_COLUMNS.items():
        column_names = ",".join(cols)
        payload_col = "blob BLOB" if tname in _BLOB_TABLES else "json TEXT"
        cur.execute(
            f"""
            CREATE TABLE IF NOT EXISTS {tname}(
                {column_names},
                ctime TEXT DEFAULT current_timestamp,
                mtime TEXT DEFAULT current_timestamp,
                {payload_col},
                UNIQUE({column_names})
            )
            """
        )
        cur.execute(
            f"""
            CREATE TRIGGER IF NOT EXISTS update_Timestamp_Trigger_{tname}
            AFTER UPDATE ON {tname}
            BEGIN
                UPDATE {tname} SET mtime = current_timestamp
                WHERE rowid = NEW.rowid;
            END;
            """
        )
    con.commit()


def export_sqlite_db(db: "AerovalSparkDB", dbfile: str) -> dict[str, int]:
    """Write the whole store to a reference-layout sqlite file.

    Every row lands in its route's current-version table (NULL for
    absent extra keys — the reference's reads match surplus columns
    against NULL, sqlitedb.py:441-449). Returns per-table row counts.
    """
    db.flush()
    os.makedirs(os.path.dirname(os.path.abspath(dbfile)), exist_ok=True)
    con = sqlite3.connect(dbfile)
    counts: dict[str, int] = {}
    try:
        _init_sqlite(con)
        con.execute(
            "INSERT OR REPLACE INTO metadata(key, value) VALUES('created_by', 'aerovaldb_spark')"
        )
        con.execute(
            "INSERT OR REPLACE INTO metadata(key, value) VALUES('last_modified_by', 'aerovaldb_spark')"
        )
        for route, tname in _EXPORT_TABLE.items():
            df = db.table(route)
            if df is None:
                continue
            keys = storage_keys(route)
            it = df.select(
                *keys,
                "payload",
                F.date_format("ctime", "yyyy-MM-dd HH:mm:ss").alias("_ctime"),
                F.date_format("mtime", "yyyy-MM-dd HH:mm:ss").alias("_mtime"),
            ).toLocalIterator()
            payload_col = "blob" if tname in _BLOB_TABLES else "json"
            for row in it:
                target = tname
                cols = TABLE_COLUMNS[tname]
                if route is Route.MODELS_STYLE:
                    target = "models_style0" if row["experiment"] is not None else "models_style1"
                    cols = TABLE_COLUMNS[target]
                placeholders = ", ".join("?" for _ in range(len(cols) + 3))
                payload = row["payload"]
                if payload_col == "blob" and payload is not None:
                    payload = bytes(payload)
                con.execute(
                    f"INSERT OR REPLACE INTO {target}"  # noqa: S608
                    f"({','.join(cols)}, ctime, mtime, {payload_col}) "
                    f"VALUES({placeholders})",
                    tuple(row[k] for k in cols)
                    + (row["_ctime"], row["_mtime"], payload),
                )
                counts[target] = counts.get(target, 0) + 1
        con.commit()
    finally:
        con.close()
    return counts
