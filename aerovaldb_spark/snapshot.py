"""Snapshot (time-travel) reads over the append-only asset log.

The store never updates in place: every put/delete appends a row with
a totally-ordered ``seq`` (wall-clock ns for single writers; chained
through the lock-free claim protocol for concurrent ones — db.py).
That makes any historical state a pure FILTER: the live view as of
``S`` is the last-writer-wins resolution of ``seq <= S``. This module
exposes that as an explicit API — the Delta-style capability the
append-log design buys for free.

Beyond-reference functionality: aerovaldb has no history API (its
jsondb backend overwrites files in place, jsonfiledb.py:386-413).
Snapshots here cover the durable log only — unflushed memtable puts
are not part of any snapshot by definition.

Usage::

    s = db.current_seq()
    db.put_config({...}, "p", "e"); db.flush()
    old = db.snapshot(s)                # view as of seq s
    old.get(Route.CONFIG, {...})        # pre-put payload
    old.query(Route.CONFIG)             # pre-put catalog
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pyspark.sql import Window
from pyspark.sql import functions as F

from .jsonutil import json_loads
from .routes import BINARY_ROUTES, Route, storage_keys, template_args
from .uri import build_uri, parse_uri

if TYPE_CHECKING:
    from .db import AerovalSparkDB


class SnapshotReader:
    """Read-only last-writer-wins view of the durable log at
    ``seq <= as_of_seq``. Point reads, catalog queries, and payload
    access (OBJ / JSON_STR / BLOB via ``raw=True``); mutations and
    sub-document filters stay on the live :class:`AerovalSparkDB`."""

    def __init__(self, db: "AerovalSparkDB", as_of_seq: int):
        self._db = db
        self.as_of_seq = int(as_of_seq)

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"SnapshotReader(as_of_seq={self.as_of_seq})"

    def _resolved(self, route: Route, prune: dict[str, str] | None = None):
        """LWW window over the seq-filtered durable log. Key-equality
        prunes apply below the window (they commute per key) so point
        reads stay file-skipping scans, same as the live path."""
        sroute = self._db._storage_route(route)
        log = self._db._disk_df(sroute)
        if log is None:
            return None
        log = log.filter(F.col("seq") <= self.as_of_seq)
        keys = storage_keys(sroute)
        for col, val in (prune or {}).items():
            if col in keys:
                log = log.filter(
                    F.col(col) == val if val is not None else F.col(col).isNull()
                )
        w = Window.partitionBy(*keys).orderBy(F.col("seq").desc())
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (~F.col("tombstone")))
            .drop("_rn", "tombstone")
        )

    def get(
        self,
        route: Route,
        route_args: dict[str, str],
        kwargs: dict[str, str] | None = None,
        raw: bool = False,
    ) -> Any:
        """Historical point read. ``raw=True`` returns the stored
        payload verbatim (JSON string, or bytes for binary routes);
        otherwise JSON payloads are parsed."""
        # complete the key over ALL storage columns: an unspecified
        # extra key (e.g. MAP's `time`) must constrain to IS NULL,
        # exactly like the live point read — otherwise limit(1) could
        # return whichever variant sorts first
        provided = {**route_args, **(kwargs or {})}
        key = {
            k: provided.get(k)
            for k in storage_keys(self._db._storage_route(route))
        }
        df = self._resolved(route, key)
        uri = build_uri(route, dict(route_args), dict(kwargs or {}))
        rows = df.limit(1).collect() if df is not None else []
        if not rows:
            raise FileNotFoundError(
                f"No asset for {uri} as of seq {self.as_of_seq}"
            )
        payload = rows[0]["payload"]
        if raw or route in BINARY_ROUTES:
            return payload
        return json_loads(payload)

    def get_by_uri(self, uri: str, raw: bool = False) -> Any:
        route, route_args, kwargs = parse_uri(uri)
        return self.get(route, route_args, kwargs, raw=raw)

    def query(
        self, asset_type: Route | list[Route] | None = None, **kwargs: str
    ) -> list:
        """Historical catalog scan (same matching semantics as the live
        ``query``, evaluated at the snapshot)."""
        from .db import TABLE_ALIASES
        from .routes import EXTRA_KEYS
        from .types import QueryEntry

        if asset_type is None:
            routes = list(Route)
        elif isinstance(asset_type, Route):
            routes = [asset_type]
        else:
            routes = list(asset_type)
        out = []
        for route in routes:
            if route in TABLE_ALIASES:
                continue
            keys = storage_keys(route)
            if any(k not in keys for k in kwargs):
                continue
            df = self._resolved(route, dict(kwargs))
            if df is None:
                continue
            targs = template_args(route.value)
            for row in df.select(*keys).collect():
                r = row.asDict()
                meta = {k: r[k] for k in keys if r.get(k) is not None}
                route_args = {k: meta.get(k, "") for k in targs}
                kw = {
                    k: meta[k] for k in EXTRA_KEYS.get(route, ()) if k in meta
                }
                out.append(
                    QueryEntry(build_uri(route, route_args, kw), route, meta)
                )
        return out

    def list_all(self) -> list[str]:
        return [e.uri for e in self.query()]


def changes_between(
    db: "AerovalSparkDB", since_seq: int, until_seq: int | None = None
) -> list[dict]:
    """Change-data-capture over the asset log: the NET effect per key
    in ``(since_seq, until_seq]`` — what an incremental consumer
    re-processes after a catch-up poll.

    Returns one dict per changed key: ``{"uri", "route", "op"
    ("upsert" | "delete"), "seq"}``, where op reflects the LAST write
    in the window (intermediate rewrites collapse — consumers want net
    state, not history; the full history remains queryable by
    snapshotting at intermediate seqs). Computed per route as one
    windowed aggregation over the seq-range-filtered log — the same
    shape as the LWW read, so it prunes and scales identically."""
    from .db import TABLE_ALIASES
    from .routes import EXTRA_KEYS

    until = db.current_seq() if until_seq is None else until_seq
    out: list[dict] = []
    for route in Route:
        if route in TABLE_ALIASES:
            continue
        log = db._disk_df(route)
        if log is None:
            continue
        log = log.filter(
            (F.col("seq") > since_seq) & (F.col("seq") <= until)
        )
        keys = storage_keys(route)
        w = Window.partitionBy(*keys).orderBy(F.col("seq").desc())
        last = (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*keys, "seq", "tombstone")
        )
        targs = template_args(route.value)
        for row in last.collect():
            r = row.asDict()
            meta = {k: r[k] for k in keys if r.get(k) is not None}
            route_args = {k: meta.get(k, "") for k in targs}
            kw = {k: meta[k] for k in EXTRA_KEYS.get(route, ()) if k in meta}
            out.append(
                {
                    "uri": build_uri(route, route_args, kw),
                    "route": route,
                    "op": "delete" if r["tombstone"] else "upsert",
                    "seq": int(r["seq"]),
                }
            )
    return sorted(out, key=lambda c: c["seq"])
