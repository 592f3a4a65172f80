"""AerovalSparkDB — the keyed-asset store on Spark.

Reference parity: get/put/query/list/rm/copy + AccessType semantics of
metno/aerovaldb (SURVEY.md §2), re-architected for Spark:

- **One table per route** (parquet directory, partitioned by
  ``project``). Key columns are real STRING columns — the reference's
  filename-encoding / inverse-template machinery (≈300 LoC:
  jsonfiledb.py:492-597, utils/uri.py:41-126, backwards_compatibility
  .py) disappears because keys are stored, not encoded into paths.
- **Writes are an append log** with (seq, tombstone); reads resolve
  last-writer-wins per key with a window function. This is the
  MERGE/upsert story without a Delta dependency: appends are O(new
  data), never read-modify-write of the table. ``compact()`` folds the
  log. Deletes rewrite only affected partitions (the Delta-DELETE
  analog of the reference's rm_experiment_data rmtree,
  jsonfiledb.py:415-428).
- **A driver-side memtable** buffers puts between flushes, so
  single-asset round-trips don't pay a Spark job each; flush() is one
  partitioned append per table. At 100 TB the same design holds:
  appends land as new files in the right partitions, and point reads
  prune to one partition + min-max skip to one file.
- Version routing / filename layouts (reference §2.6) are deliberately
  NOT ported: this store has one canonical schema; a legacy-import
  shim (sources/jsondb_import.py) owns compatibility.

Concurrency: single-writer-per-root (the reference's default mode —
its advisory locking is off by default, docs/locking.rst). Readers are
snapshot-consistent per Spark job.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .exceptions import UnsupportedOperation
from .filters import (
    filter_contour,
    filter_heatmap,
    filter_map,
    filter_regional_stats,
)
from .jsonutil import json_dumps_wrapper, json_loads
from .routes import (
    BINARY_ROUTES,
    EXTRA_KEYS,
    FILTER_KEYS,
    Route,
    storage_keys,
    table_name,
    template_args,
)
from .types import AccessType, QueryEntry, normalize_access_type
from .uri import build_uri, parse_uri

_SENTINEL = object()

# Routes that read from another route's table (the reference stores
# regional_stats/heatmap in the glob_stats file, jsonfiledb.py:88-91).
TABLE_ALIASES = {
    Route.REGIONAL_STATS: Route.GLOB_STATS,
    Route.HEATMAP: Route.GLOB_STATS,
}

FILTER_FUNCS = {
    Route.REGIONAL_STATS: filter_regional_stats,
    Route.HEATMAP: filter_heatmap,
    Route.CONTOUR: filter_contour,
    Route.MAP: filter_map,
}


def _schema_for(route: Route) -> T.StructType:
    fields = [T.StructField(k, T.StringType()) for k in storage_keys(route)]
    payload_t = T.BinaryType() if route in BINARY_ROUTES else T.StringType()
    fields += [
        T.StructField("payload", payload_t),
        T.StructField("write_ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("tombstone", T.BooleanType()),
    ]
    return T.StructType(fields)


class AerovalSparkDB:
    """Keyed JSON/blob asset store with the aerovaldb API surface.

    Constructing a DB sets ``spark.sql.session.timeZone=UTC`` on the
    *caller's* session (both flush paths must agree on one timestamp
    interpretation; see the inline note in ``__init__``). Callers that
    rely on a non-UTC session timezone for unrelated queries should use
    a dedicated session or restore the conf after construction.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        materialize_file_path: bool | None = None,
    ):
        from .lock import make_lock

        self.spark = spark
        # One timestamp interpretation for BOTH flush paths: _put_row
        # stores naive-UTC datetimes, which the Spark writer reads in
        # the session timezone while _flush_small_arrow pins
        # timestamp('us', tz='UTC') — under a non-UTC caller session
        # the two would record instants differing by the offset. The
        # project convention (catalog.load_table, streaming sources) is
        # to self-apply UTC; do the same here for any caller session.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        if materialize_file_path is None:
            materialize_file_path = os.environ.get(
                "AVDB_MATERIALIZE_FILE_PATH", ""
            ).strip().lower() in ("1", "true", "yes")
        self._materialize_file_path = materialize_file_path
        # Accept file: URIs (file:/p, file:///p, file://localhost/p) by
        # normalizing to the plain local path up front: every os-level
        # operation (makedirs, the mtime fingerprints, the lock file)
        # and every Spark read/write then agree on ONE location. Before
        # this, Spark resolved the URI while os.makedirs created a
        # literal './file:/...' tree in the cwd.
        self.root = self._local_root(root)
        os.makedirs(self.root, exist_ok=True)
        # memtable: (storage_route, key_tuple) -> row dict
        self._mem: dict[Route, dict[tuple, dict]] = {}
        # route -> (DataFrame|None, directory fingerprint at read time)
        self._df_cache: dict[Route, tuple[DataFrame | None, tuple | None]] = {}
        # Optional multi-process advisory lock (AVDB_USE_LOCKING env,
        # reference parity — see aerovaldb_spark.lock).
        self._lock = make_lock(root)

    # -- plumbing ---------------------------------------------------------

    @staticmethod
    def _local_root(root: str) -> str:
        """Strip a ``file:`` scheme down to the local filesystem path.

        Non-file schemes (s3a:, hdfs:, …) pass through untouched — on
        those, the os-level fingerprint/lock helpers are skipped by
        their own OSError guards and Spark owns the path resolution.
        """
        if not root.startswith("file:"):
            return root
        from urllib.parse import urlparse

        parsed = urlparse(root)
        # file:relative/path has no netloc and parses path as-is;
        # file://host/p keeps only the path (local-mode semantics).
        return parsed.path or root[len("file:"):]

    def _storage_route(self, route: Route) -> Route:
        return TABLE_ALIASES.get(route, route)

    def _table_path(self, route: Route) -> str:
        return os.path.join(self.root, table_name(self._storage_route(route)))

    def _key_tuple(self, route: Route, key: dict[str, str | None]) -> tuple:
        return tuple(key.get(k) for k in storage_keys(self._storage_route(route)))

    def _next_seq(self) -> int:
        return time.time_ns()

    def _table_fingerprint(self, path: str) -> tuple | None:
        """Cheap change detector for a table directory: mtimes of the
        dir and its immediate children (appends create files inside
        ``project=...`` partition dirs, bumping the child mtime;
        rewrites swap the dir itself, bumping the root mtime).

        This is the Spark analog of the reference's mtime-validated
        read caches (jsondb/cache.py:114-264): another process's
        flushed write is visible on the next read, no manual
        ``refresh()`` needed. On a local filesystem this is one
        scandir; a deployment on an object store would swap this for a
        table-format snapshot id (Delta/Iceberg) or a metastore
        version counter.
        """
        try:
            entries = tuple(
                sorted(
                    (e.name, e.stat().st_mtime_ns)
                    for e in os.scandir(path)
                    if not e.name.startswith((".", "_"))
                )
            )
        except OSError:
            return None
        return (os.stat(path).st_mtime_ns, entries) if entries else None

    def _disk_df(self, route: Route) -> DataFrame | None:
        """Raw on-disk append log for a route table (fingerprint-
        validated cache — see _table_fingerprint)."""
        route = self._storage_route(route)
        path = self._table_path(route)
        fp = self._table_fingerprint(path)
        if route in self._df_cache:
            df, cached_fp = self._df_cache[route]
            if cached_fp == fp:
                return df
        df = None
        if fp is not None:
            df = self.spark.read.schema(_schema_for(route)).parquet(path)
        self._df_cache[route] = (df, fp)
        return df

    def _log_df(self, route: Route) -> DataFrame | None:
        """On-disk log unioned with memtable rows."""
        route = self._storage_route(route)
        disk = self._disk_df(route)
        mem_rows = list(self._mem.get(route, {}).values())
        if not mem_rows:
            return disk
        mem_df = self.spark.createDataFrame(
            [Row(**r) for r in mem_rows], schema=_schema_for(route)
        )
        return disk.unionByName(mem_df) if disk is not None else mem_df

    def _resolved_df(self, route: Route) -> DataFrame | None:
        """Last-writer-wins view: one live row per key, with ctime/mtime."""
        route = self._storage_route(route)
        log = self._log_df(route)
        if log is None:
            return None
        keys = storage_keys(route)
        w = Window.partitionBy(*keys).orderBy(F.col("seq").desc())
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .withColumn("ctime", F.min("write_ts").over(Window.partitionBy(*keys)))
            .filter((F.col("_rn") == 1) & (~F.col("tombstone")))
            .withColumnRenamed("write_ts", "mtime")
            .drop("_rn", "seq", "tombstone")
        )

    def _lookup(
        self, route: Route, key: dict[str, str | None], need_ctime: bool = False
    ) -> dict | None:
        """Point read: memtable first, then pruned Spark read."""
        sroute = self._storage_route(route)
        kt = self._key_tuple(route, key)
        mem = self._mem.get(sroute, {})
        if kt in mem:
            row = mem[kt]
            if row["tombstone"]:
                return None
            out = dict(row)
            out["mtime"] = row["write_ts"]
            out["ctime"] = row["write_ts"]
            if need_ctime and self._disk_df(sroute) is not None:
                disk_row = self._lookup_disk(sroute, key, need_ctime=True)
                if disk_row:
                    out["ctime"] = min(disk_row["ctime"], row["write_ts"])
            return out
        return self._lookup_disk(sroute, key, need_ctime=need_ctime)

    def _lookup_disk(
        self, route: Route, key: dict[str, str | None], need_ctime: bool = False
    ) -> dict | None:
        disk = self._disk_df(route)
        if disk is None:
            return None
        cond = None
        for k in storage_keys(route):
            v = key.get(k)
            c = F.col(k).isNull() if v is None else (F.col(k) == v)
            cond = c if cond is None else (cond & c)
        # Filter BEFORE the LWW window: a key-equality predicate
        # commutes with a per-key window, and this way it reaches the
        # parquet scan (partition pruning on project + min-max file
        # skipping on the sorted key columns) instead of windowing the
        # whole table for one key.
        subset = disk.filter(cond)
        rows = (
            subset.orderBy(F.col("seq").desc())
            .limit(1)
            .withColumn(
                "ctime",
                F.lit(None).cast("timestamp"),  # filled below
            )
            .withColumnRenamed("write_ts", "mtime")
            .drop("seq")
            .collect()
        )
        if not rows or rows[0]["tombstone"]:
            return None
        out = rows[0].asDict()
        del out["tombstone"]
        if need_ctime:
            out["ctime"] = subset.agg(F.min("write_ts").alias("c")).collect()[0]["c"]
        else:
            out["ctime"] = out["mtime"]
        return out

    def _resolved_disk_df(self, route: Route) -> DataFrame | None:
        disk = self._disk_df(route)
        if disk is None:
            return None
        keys = storage_keys(route)
        w = Window.partitionBy(*keys).orderBy(F.col("seq").desc())
        return (
            disk.withColumn("_rn", F.row_number().over(w))
            .withColumn("ctime", F.min("write_ts").over(Window.partitionBy(*keys)))
            .filter((F.col("_rn") == 1) & (~F.col("tombstone")))
            .withColumnRenamed("write_ts", "mtime")
            .drop("_rn", "seq", "tombstone")
        )

    # -- write path -------------------------------------------------------

    def _put_row(
        self,
        route: Route,
        key: dict[str, str | None],
        payload: str | bytes | None,
        tombstone: bool = False,
    ) -> None:
        sroute = self._storage_route(route)
        row = {k: key.get(k) for k in storage_keys(sroute)}
        row.update(
            payload=payload,
            write_ts=datetime.now(timezone.utc).replace(tzinfo=None),
            seq=self._next_seq(),
            tombstone=tombstone,
        )
        self._mem.setdefault(sroute, {})[self._key_tuple(route, key)] = row

    def flush(self) -> None:
        """Append memtable contents to the on-disk log (one partitioned
        append per table — the only Spark write jobs in the write path)."""
        with self._lock:
            self._flush_unlocked()

    def _flush_unlocked(self) -> None:
        for route, rows in self._mem.items():
            if not rows:
                continue
            if not self._flush_small_arrow(route, list(rows.values())):
                self._flush_spark(route, rows)
            self._df_cache.pop(route, None)
        self._mem.clear()

    # A memtable flush above this row count writes at natural
    # parallelism (range-partitioned on the key columns) instead of
    # the single-file coalesce(1) below — the cliff a caller hit by
    # put()ing millions of rows before flush(): one task serializing
    # the whole batch. Small flushes (the store's designed shape) keep
    # the one-file-per-flush layout so point-read file counts stay
    # low. bulk_import remains the documented scale path; this guard
    # just removes the failure mode of not knowing that.
    _PARALLEL_FLUSH_ROWS = 100_000

    def _flush_spark(self, route: Route, rows: dict) -> None:
        df = self.spark.createDataFrame(
            [Row(**r) for r in rows.values()], schema=_schema_for(route)
        )
        keys = storage_keys(route)
        # Sort within files by the non-partition key columns so the
        # parquet min/max stats are tight — point reads then skip
        # whole files, the analog of the reference's exact-path
        # lookup (matters at scale; free here).
        sort_keys = [k for k in keys if k != "project"]
        if len(rows) > self._PARALLEL_FLUSH_ROWS:
            n_parts = -(-len(rows) // self._PARALLEL_FLUSH_ROWS)
            # repartitionByRange keeps files non-overlapping on the
            # sort keys, so per-file min/max stats stay as tight as
            # the single-file layout's — point reads still skip all
            # but one file.
            out = (
                df.repartitionByRange(n_parts, *sort_keys)
                if sort_keys
                else df.repartition(n_parts)
            )
        else:
            out = df.coalesce(1)
        if sort_keys:
            out = out.sortWithinPartitions(*sort_keys)
        writer = out.write.mode("append")
        if "project" in keys:
            writer = writer.partitionBy("project")
        writer.parquet(self._table_path(route))

    # Below this row count a flush is written driver-side with pyarrow
    # into the IDENTICAL partition layout, skipping the ~2-5 s Spark
    # job-scheduling floor a tiny append otherwise pays. The store's
    # common write shape is exactly this (a handful of asset puts per
    # flush); bulk loads past the threshold still go through Spark and
    # scale out. Reads can't tell the difference: the log is read with
    # an explicit schema, partition values come from the directory
    # name either way, and pyarrow's timestamp('us', tz='UTC') decodes
    # to the same TimestampType values under the session's UTC tz.
    _SMALL_FLUSH_ROWS = 10_000

    _SAFE_PARTITION_RE = re.compile(r"^[A-Za-z0-9._-]+$")

    def _flush_small_arrow(self, route: Route, rows: list[dict]) -> bool:
        """Driver-side parquet append for small memtables. Returns
        False (caller falls back to the Spark writer) when the batch is
        large or a partition value needs Spark's escaping rules."""
        if len(rows) > self._SMALL_FLUSH_ROWS:
            return False
        import pyarrow as pa
        import pyarrow.parquet as pq

        keys = storage_keys(route)
        partitioned = "project" in keys
        if partitioned and not all(
            isinstance(r.get("project"), str)
            and self._SAFE_PARTITION_RE.match(r["project"])
            for r in rows
        ):
            return False  # odd partition value: use Spark's escaping
        sort_keys = [k for k in keys if k != "project"]
        file_cols = sort_keys + ["payload", "write_ts", "seq", "tombstone"]
        payload_t = (
            pa.binary() if route in BINARY_ROUTES else pa.string()
        )
        arrow_schema = pa.schema(
            [(k, pa.string()) for k in sort_keys]
            + [
                ("payload", payload_t),
                ("write_ts", pa.timestamp("us", tz="UTC")),
                ("seq", pa.int64()),
                ("tombstone", pa.bool_()),
            ]
        )
        groups: dict[str | None, list[dict]] = {}
        for r in rows:
            groups.setdefault(r["project"] if partitioned else None, []).append(r)
        for part, grp in groups.items():
            grp.sort(key=lambda r: tuple(
                (r.get(k) is None, r.get(k)) for k in sort_keys
            ))
            table = pa.Table.from_pydict(
                {c: [r.get(c) for r in grp] for c in file_cols},
                schema=arrow_schema,
            )
            out_dir = self._table_path(route)
            if partitioned:
                out_dir = os.path.join(out_dir, f"project={part}")
            os.makedirs(out_dir, exist_ok=True)
            pq.write_table(
                table,
                os.path.join(out_dir, f"part-{uuid.uuid4().hex}.snappy.parquet"),
                compression="snappy",
            )
        return True

    def refresh(self) -> None:
        """Force-drop cached table states. Reads are already
        fingerprint-validated against the table directories (other
        processes' flushed writes are visible automatically — see
        _table_fingerprint); this remains as an explicit escape hatch
        for storage that mutates without an mtime change."""
        self._df_cache.clear()

    # -- snapshots (time travel) ------------------------------------------

    def current_seq(self) -> int:
        """Highest ``seq`` in the durable log (0 when empty) — the
        token to pass to :meth:`snapshot` to pin the current state.
        One max() aggregation per existing route table; parquet min/max
        footer stats make these metadata-cheap scans."""
        out = 0
        for route in Route:
            if route in TABLE_ALIASES:
                continue
            df = self._disk_df(route)
            if df is None:
                continue
            row = df.agg(F.max("seq").alias("m")).collect()[0]
            if row["m"] is not None:
                out = max(out, int(row["m"]))
        return out

    def snapshot(self, as_of_seq: int | None = None):
        """Read-only time-travel view of the durable log at
        ``seq <= as_of_seq`` (default: :meth:`current_seq`, i.e. a
        pinned view of now). See :mod:`aerovaldb_spark.snapshot`."""
        from .snapshot import SnapshotReader

        s = self.current_seq() if as_of_seq is None else as_of_seq
        horizon = self.min_snapshot_seq()
        if s < horizon:
            raise ValueError(
                f"snapshot at seq {s} predates the compaction horizon "
                f"{horizon}: superseded rows and tombstones below the "
                "horizon were folded away, so that state can no longer "
                "be reconstructed"
            )
        return SnapshotReader(self, s)

    def changes(
        self, since_seq: int, until_seq: int | None = None
    ) -> list[dict]:
        """Net per-key changes in ``(since_seq, until_seq]`` — the CDC
        feed for incremental consumers. See
        :func:`aerovaldb_spark.snapshot.changes_between`."""
        from .snapshot import changes_between

        horizon = self.min_snapshot_seq()
        if since_seq < horizon:
            raise ValueError(
                f"changes since seq {since_seq} predate the compaction "
                f"horizon {horizon}: rows below the horizon were folded "
                "away, so the net ops in that window cannot be computed"
            )
        return changes_between(self, since_seq, until_seq)

    # -- lock-free multi-writer commit ------------------------------------
    #
    # Optimistic concurrency for read-modify-write across processes,
    # WITHOUT the advisory lock (the Delta-style answer SURVEY §2.7
    # calls for; the reference only offers an off-by-default fcntl lock,
    # lock/lock.py:79-108). Building blocks:
    #
    # - Data files never collide: Spark's parquet append names each
    #   part file with a per-job UUID, so concurrent flushes to one
    #   table are physically safe; ordering is the only problem.
    # - A claim file per commit (``_commits/<n>.json``) created with
    #   O_CREAT|O_EXCL — the filesystem's atomic uniqueness primitive —
    #   gives commits a total order. (On an object store this maps to a
    #   conditional PUT.) A claim starts pending and is resolved by a
    #   sibling ``<n>.resolved.json`` — ALSO created with O_EXCL, so a
    #   claim can be resolved exactly once, ever, by exactly one party:
    #   {"status": "committed"|"aborted", "max_seq": N}.
    # - A writer that wins claim n commits iff no claim in
    #   (snapshot, n) committed; otherwise it marks its claim aborted
    #   (numbers burn, nothing else) and retries the whole
    #   read-modify-write against fresh state. Committed claims chain
    #   ``max_seq`` so every commit's rows get seq strictly above every
    #   earlier commit — two writers can never collide on seq, which
    #   plain wall-clock ``time_ns`` seqs cannot guarantee.
    # - A claim pending past the timeout is presumed crashed by DURABLY
    #   writing its aborted resolution (exclusive-create arbitrates the
    #   race against the slow owner): if the presumer wins, the still-
    #   alive owner's commit attempt returns False and it retries with
    #   fresh state — the two-commits-from-one-snapshot lost update is
    #   structurally impossible.
    #
    # Invariants: the committed resolution is published only AFTER the
    # parquet append completes, so observing "committed" implies the
    # data is on disk; a writer resolves (or finds resolved) every
    # lower claim before committing, so everything below the latest
    # committed claim is resolved. A crash (or presumed-aborted slow
    # commit) between data write and resolution leaves orphaned rows
    # visible (append-only semantics); a retrying owner supersedes them
    # with strictly higher seqs, and compact() folds them away.

    _CLAIM_RESOLVE_TIMEOUT = 120.0  # s: pending claim presumed crashed

    def _commits_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    def _claim_path(self, n: int) -> str:
        return os.path.join(self._commits_dir(), f"{n:020d}.json")

    def _scan_claim_numbers(self) -> list[int]:
        try:
            names = os.listdir(self._commits_dir())
        except OSError:
            return []
        out = []
        for name in names:
            if name.endswith(".json"):
                try:
                    out.append(int(name[:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def _resolution_path(self, n: int) -> str:
        return os.path.join(self._commits_dir(), f"{n:020d}.resolved.json")

    def _read_claim(self, n: int) -> dict | None:
        """Claim resolution, or None while the claim is pending.

        Resolutions live in a sibling ``<n>.resolved.json`` created
        with O_EXCL (exactly one can ever exist — see _resolve_claim);
        the claim file's own content is read as a legacy fallback for
        stores written by the earlier in-place-resolution format."""
        try:
            with open(self._resolution_path(n), encoding="utf-8") as f:
                raw = f.read()
        except OSError:
            try:
                with open(self._claim_path(n), encoding="utf-8") as f:
                    raw = f.read()
            except OSError:
                return None
        if not raw.strip():
            return None
        try:
            return json_loads(raw)
        except ValueError:
            return None

    def _wait_resolved(self, n: int) -> dict:
        """Block until claim ``n`` resolves; after the timeout, DURABLY
        presume it crashed by writing the aborted resolution ourselves.
        The O_EXCL resolution file makes the presumption safe: either
        we win (the slow writer will see "aborted" when it tries to
        resolve, discard its attempt, and retry), or the writer won
        first and we return its real resolution — the two-writers-
        commit-from-one-snapshot lost update cannot happen."""
        deadline = time.monotonic() + self._CLAIM_RESOLVE_TIMEOUT
        while True:
            meta = self._read_claim(n)
            if meta is not None:
                return meta
            if time.monotonic() > deadline:
                self._resolve_claim(
                    n, {"status": "aborted", "presumed_crashed": True}
                )
                return self._read_claim(n) or {"status": "aborted"}
            time.sleep(0.005)

    def _latest_committed(self) -> tuple[int, dict]:
        """(claim number, metadata) of the newest committed claim
        (0, {}) when none. Pending claims above it are NOT waited for —
        if one commits later, the conflict check catches it."""
        for n in reversed(self._scan_claim_numbers()):
            meta = self._read_claim(n)
            if meta and meta.get("status") == "committed":
                return n, meta
        return 0, {}

    def _claim_next(self) -> int:
        os.makedirs(self._commits_dir(), exist_ok=True)
        nums = self._scan_claim_numbers()
        n = nums[-1] if nums else 0
        while True:
            n += 1
            try:
                fd = os.open(
                    self._claim_path(n), os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.close(fd)
                return n
            except FileExistsError:
                continue

    def _resolve_claim(self, n: int, meta: dict) -> bool:
        """Publish the FIRST-AND-ONLY resolution for claim ``n``.

        O_CREAT|O_EXCL on the resolution file is the arbitration: a
        claim can be resolved exactly once, ever. Returns False when a
        resolution already exists (e.g. a peer durably presumed this
        claim crashed) — the caller's attempt did NOT take effect and
        it must re-read the actual resolution and react (transact
        retries). Content is written before the fd closes; readers
        treat an empty file as pending, so a crash mid-write parses as
        still-pending and times out normally."""
        try:
            fd = os.open(
                self._resolution_path(n),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(json_dumps_wrapper(meta))
        return True

    def _restamp_mem_seqs(self, base: int) -> int:
        """Re-stamp memtable seqs as base..base+k (original relative
        order preserved); returns the highest seq assigned."""
        rows = [r for t in self._mem.values() for r in t.values()]
        rows.sort(key=lambda r: r["seq"])
        for rank, row in enumerate(rows):
            row["seq"] = base + rank
        return base + len(rows) - 1 if rows else base

    def transact(self, fn, max_retries: int = 100) -> None:
        """Run ``fn(self)`` — reads + puts, NO flush inside — and commit
        its writes atomically iff no other process committed since the
        reads began; on conflict, discard and re-run ``fn`` against
        fresh state. Lock-free: safety comes from the claim-file
        protocol above, not from ``AVDB_USE_LOCKING``. This is the
        multi-process read-modify-write shape the reference can only do
        under its advisory lock (tests/lock/test_lock.py:38-66):

            def bump(db):
                n = db.get_config("p", "e", default={"counter": 0})
                db.put_config({"counter": n["counter"] + 1}, "p", "e")
            db.transact(bump)
        """
        import random

        if any(self._mem.values()):
            self.flush()  # pre-existing buffered puts are not fn's

        delay = 0.005
        for _ in range(max_retries):
            self.refresh()
            snap, snap_meta = self._latest_committed()
            try:
                fn(self)
            except BaseException:
                # a raising fn ABORTS: its partial puts must not ride
                # along with some later unrelated flush
                self._mem.clear()
                raise
            n = self._claim_next()
            try:
                conflict = any(
                    self._wait_resolved(k).get("status") == "committed"
                    for k in range(snap + 1, n)
                )
                if conflict:
                    self._resolve_claim(n, {"status": "aborted"})
                    self._mem.clear()
                    time.sleep(random.uniform(0.0, delay))
                    delay = min(delay * 2, 0.25)
                    continue
                base = max(
                    time.time_ns(), int(snap_meta.get("max_seq", 0)) + 1
                )
                max_seq = self._restamp_mem_seqs(base)
                self._flush_unlocked()
            except BaseException:
                # flush failure (or interrupt) must not leave the claim
                # pending forever — every later transact would stall a
                # full timeout on it
                self._resolve_claim(n, {"status": "aborted"})
                raise
            won = self._resolve_claim(
                n, {"status": "committed", "max_seq": max_seq}
            )
            if won:
                return
            # A peer durably presumed this claim crashed while our
            # flush ran long: our commit did NOT take effect. The
            # appended rows are an orphaned attempt (superseded once we
            # retry with fresh, higher seqs); re-run fn against fresh
            # state so the read-modify-write lands exactly once.
            self._mem.clear()
            time.sleep(random.uniform(0.0, delay))
            delay = min(delay * 2, 0.25)
        raise RuntimeError(
            f"transact: gave up after {max_retries} optimistic-commit "
            "conflicts"
        )

    def lock(self):
        """The database's advisory lock, for caller-managed critical
        sections (read-modify-write across processes — the reference's
        usage pattern, tests/lock/test_lock.py:38-66):

            with db.lock():
                n = db.get_config(...)["counter"]
                db.put_config({"counter": n + 1}, ...)
                db.flush()

        A no-op FakeLock unless AVDB_USE_LOCKING is enabled."""
        return self._lock

    def fsck(self, repair: bool = False) -> dict:
        """Store integrity check — the operations tool a deployment
        runs after a crash or before relying on a root.

        Verifies: every commit claim is resolved (a pending claim past
        the presumption timeout is a crashed writer); no orphaned
        ``.tmp-*`` / ``.old-*`` table directories from interrupted
        rewrites; the compaction horizon does not exceed the log head;
        every route table parses under its declared schema. With
        ``repair=True`` the findings are fixed where safe: stale
        pending claims resolve aborted (exclusive-create — a racing
        owner loses cleanly), orphan entries are removed.

        Staging entries younger than ``_CLAIM_RESOLVE_TIMEOUT`` are
        presumed live (an in-flight rewrite/compaction in another
        process stages for minutes) and are neither reported nor
        removed — the same presumption window the claim check uses.

        Returns a report dict; ``report["ok"]`` is True when nothing
        (remains) wrong."""
        report: dict = {
            "stale_pending_claims": [],
            "orphan_dirs": [],
            "unreadable_tables": [],
            "horizon_above_head": False,
            "repaired": repair,
        }
        now = time.time()
        for n in self._scan_claim_numbers():
            if self._read_claim(n) is not None:
                continue
            try:
                age = now - os.path.getmtime(self._claim_path(n))
            except OSError:
                continue
            if age > self._CLAIM_RESOLVE_TIMEOUT:
                report["stale_pending_claims"].append(n)
                if repair:
                    self._resolve_claim(
                        n, {"status": "aborted", "fsck_repaired": True}
                    )
        orphans_remaining = []
        for entry in sorted(os.listdir(self.root)):
            if ".tmp-" in entry or ".old-" in entry:
                full = os.path.join(self.root, entry)
                try:
                    if now - os.path.getmtime(full) <= self._CLAIM_RESOLVE_TIMEOUT:
                        continue  # presumed live staging of another writer
                except OSError:
                    continue  # vanished — the owning writer finished
                report["orphan_dirs"].append(entry)
                if repair:
                    if os.path.isdir(full):
                        shutil.rmtree(full, ignore_errors=True)
                    else:
                        try:
                            os.remove(full)
                        except OSError:
                            pass
                    if os.path.exists(full):
                        orphans_remaining.append(entry)
        # Readability probe FIRST: current_seq()/min_snapshot_seq() scan
        # every route table, so on a corrupt store they would raise before
        # the report is built. Probe each table under a guard, then skip
        # the horizon check when anything is unreadable.
        for route in Route:
            if route in TABLE_ALIASES:
                continue
            try:
                df = self._disk_df(route)
                if df is not None:
                    df.select("seq").limit(1).collect()
            except Exception as e:  # noqa: BLE001 — diagnostic surface
                report["unreadable_tables"].append(
                    (table_name(route), f"{type(e).__name__}: {e}"[:200])
                )
        if not report["unreadable_tables"]:
            head = self.current_seq()
            if self.min_snapshot_seq() > head and head > 0:
                report["horizon_above_head"] = True  # not auto-repairable
        report["ok"] = not (
            (report["stale_pending_claims"] and not repair)
            or (report["orphan_dirs"] and not repair)
            or (repair and orphans_remaining)
            or report["unreadable_tables"]
            or report["horizon_above_head"]
        )
        return report

    def fragmentation(self) -> dict:
        """Filesystem-metadata-only fragmentation report over the
        route-table partition directories (files, dirs, max files in
        one dir, bytes, mean bytes/file per table) — the measured
        trigger :meth:`maintain` feeds to the compaction verdict,
        shared with the index families
        (``operators._staging.fragmentation_report``). Zero Spark
        jobs; safe as a scheduled health probe. Micro-flush litter
        (every :meth:`flush` appends a file set per touched table)
        shows up here long before scan planning degrades."""
        from .operators._staging import fragmentation_report

        tables = [
            table_name(r)
            for r in Route
            if r not in TABLE_ALIASES
            and os.path.isdir(os.path.join(self.root, table_name(r)))
        ]
        return fragmentation_report(self.root, tables)

    def maintain(
        self,
        max_files_per_dir: int = 8,
        min_mean_bytes_per_file: int = 0,
        max_retries: int = 5,
    ) -> dict:
        """ONE maintenance pass over the store — the asset-store twin
        of the index families' ``_staging.maintain`` triangle, in the
        same safe order:

        1. recover — :meth:`fsck` with ``repair=True`` (stale pending
           claims resolve aborted, orphaned ``.tmp-``/``.old-``
           staging dirs from interrupted rewrites are removed; both
           verbs below assume a consistent root);
        2. measure — :meth:`fragmentation` → the shared
           ``compact_verdict`` rule (compact when any table's busiest
           directory exceeds ``max_files_per_dir`` data files, or
           mean file size fell below ``min_mean_bytes_per_file``);
        3. :meth:`compact` — only when the verdict trips. Compaction
           raises the snapshot horizon exactly as a manual
           ``compact()`` does; :meth:`snapshot`/:meth:`changes`
           semantics are otherwise untouched (tested).

        Returns a summary dict (``fsck``, ``fragmentation``,
        ``compact_verdict``, ``compacted``) — the scheduled-job shape:
        run off-peak per store root, read the dict into metrics.
        Unreadable tables abort before compaction (compacting a
        corrupt table would bake the corruption into the rewrite)."""
        from .operators._staging import compact_verdict

        fsck_report = self.fsck(repair=True)
        out: dict = {
            "fsck": fsck_report,
            "fragmentation": None,
            "compact_verdict": None,
            "compacted": False,
        }
        if fsck_report["unreadable_tables"]:
            return out
        frag = self.fragmentation()
        verdict = compact_verdict(
            frag, max_files_per_dir, min_mean_bytes_per_file
        )
        out["fragmentation"] = frag
        out["compact_verdict"] = verdict
        if verdict.rebuild:
            self.compact(max_retries=max_retries)
            out["compacted"] = True
        return out

    def close(self) -> None:
        self.flush()

    def __enter__(self) -> AerovalSparkDB:
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()

    def _materialize_path(self, route: Route, uri: str, row: dict) -> str:
        """FILE_PATH shim: write the asset payload into a per-store file
        cache and return the absolute path.

        The cache key is the asset URI; a cached file is reused only
        while its stored mtime matches the row's mtime, so overwrites
        re-materialize. Binary routes get a sniffed image extension
        (aeroval web picks content-type from it); JSON routes get
        .json. Writes are atomic (tmp + rename) so concurrent readers
        never see a torn file."""
        import hashlib

        from .functions.multimodal import sniff_image_extension

        payload = row["payload"]
        if route in BINARY_ROUTES:
            data: bytes = payload
            ext = sniff_image_extension(payload) or ".bin"
        else:
            data = payload.encode("utf-8")
            ext = ".json"
        mtime = row["mtime"]
        # Exact calendar-based epoch nanos: float .timestamp() loses
        # ~hundreds of ns at current epochs, which would silently break
        # any future comparison against an exact microsecond mtime.
        if mtime is not None:
            mtime_ns = (
                (mtime.replace(tzinfo=None) - datetime(1970, 1, 1))
                // timedelta(microseconds=1)
            ) * 1000
        else:
            mtime_ns = 0
        cache_dir = os.path.join(self.root, "_filecache")
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(
            cache_dir, hashlib.md5(uri.encode()).hexdigest() + ext
        )
        try:
            if os.stat(path).st_mtime_ns == mtime_ns:
                return path
        except OSError:
            pass
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.utime(tmp, ns=(mtime_ns, mtime_ns))
        os.replace(tmp, path)
        return path

    # -- public generic API ----------------------------------------------

    def put(
        self,
        obj: Any,
        route: Route,
        route_args: dict[str, str],
        kwargs: dict[str, str] | None = None,
    ) -> None:
        """Whole-document upsert (last-writer-wins), reference _put
        semantics (jsonfiledb.py:386-413, sqlitedb.py:500-531)."""
        kwargs = kwargs or {}
        key = {**route_args, **kwargs}
        if route in BINARY_ROUTES:
            if not isinstance(obj, bytes):
                raise TypeError(f"Route {route.name} requires bytes payload")
            payload: str | bytes = obj
        elif isinstance(obj, str):
            payload = obj  # JSON_STR pass-through: stored verbatim
        else:
            payload = json_dumps_wrapper(obj)
        self._put_row(route, key, payload)

    def get(
        self,
        route: Route,
        route_args: dict[str, str],
        kwargs: dict[str, str] | None = None,
        access_type: AccessType | str = AccessType.OBJ,
        default: Any = _SENTINEL,
    ) -> Any:
        """Point read with sub-document filtering + representation
        negotiation (reference _get, jsonfiledb.py:326-384)."""
        access = normalize_access_type(access_type)
        kwargs = dict(kwargs or {})

        filter_args = {
            k: kwargs.pop(k)
            for k in FILTER_KEYS.get(route, ())
            if k in kwargs and kwargs[k] is not None
        }
        storage_kwargs = {
            k: kwargs[k] for k in EXTRA_KEYS.get(self._storage_route(route), ())
            if k in kwargs
        }
        key = {**route_args, **storage_kwargs}
        uri = build_uri(route, dict(route_args), dict(storage_kwargs))

        if access is AccessType.URI:
            return uri
        if access is AccessType.FILE_PATH:
            # Reference types.py:6-34 — jsondb-only by design there
            # too (its sqlite backend raises as well). Assets here are
            # table rows, not files, so FILE_PATH is an opt-in shim:
            # with AVDB_MATERIALIZE_FILE_PATH=1 (or the constructor
            # flag) the payload is materialized once into a per-store
            # file cache and that path returned — enough for aeroval
            # web's serve-image-by-path flow. Off by default to keep
            # the no-hidden-file-IO contract explicit.
            if not self._materialize_file_path:
                raise UnsupportedOperation(
                    "FILE_PATH access is disabled for the Spark backend "
                    "(assets are table rows, not files). Use access_type="
                    "BLOB/JSON_STR for the content, enable the "
                    "materialization shim (AVDB_MATERIALIZE_FILE_PATH=1 "
                    "or AerovalSparkDB(..., materialize_file_path=True)), "
                    "or export a file tree with aerovaldb_spark.sources."
                    "jsondb_import.export_jsondb_tree()."
                )
            row = self._lookup(route, key)
            if row is None:
                if default is not _SENTINEL and default is not None:
                    return default
                raise FileNotFoundError(f"No asset for {uri}")
            return self._materialize_path(route, uri, row)

        row = self._lookup(
            route, key, need_ctime=(access is AccessType.CTIME)
        )
        if route is Route.CONTOUR and "timestep" in filter_args:
            # Dual layout (reference jsonfiledb.py:938-1023): try the
            # merged timestep-keyed doc, else the per-timestep asset.
            if row is not None:
                obj = json_loads(row["payload"])
                ts = filter_args["timestep"]
                if ts in obj:
                    result = obj[ts]
                    if access is AccessType.JSON_STR:
                        return json_dumps_wrapper(result)
                    if access in (AccessType.MTIME, AccessType.CTIME):
                        return row["mtime" if access is AccessType.MTIME else "ctime"]
                    return result
            return self.get(
                Route.CONTOUR_TIMESPLIT,
                {**route_args, "timestep": filter_args["timestep"]},
                {},
                access_type=access,
                default=default,
            )
        if row is None:
            # Reference parity (jsonfiledb.py:337): an explicit
            # ``default=None`` means NO default — it raises. Only a
            # non-None default is returned on a missing asset.
            if default is not _SENTINEL and default is not None:
                return default
            raise FileNotFoundError(f"No asset for {uri}")

        if access is AccessType.MTIME:
            return row["mtime"]
        if access is AccessType.CTIME:
            return row["ctime"]
        if access is AccessType.BLOB:
            if route not in BINARY_ROUTES:
                raise UnsupportedOperation(
                    f"BLOB access not supported for {route.name}"
                )
            return row["payload"]
        if route in BINARY_ROUTES:
            return row["payload"]

        payload: str = row["payload"]
        filter_fn = FILTER_FUNCS.get(route)
        if filter_fn is not None and filter_args:
            # Corrupt JSON must raise even when default= is given
            # (reference test tests/test_aerovaldb.py:488-495).
            obj = json_loads(payload)
            try:
                obj = filter_fn(obj, **filter_args)
            except KeyError:
                if default is not _SENTINEL:
                    return default
                raise
            if access is AccessType.JSON_STR:
                return json_dumps_wrapper(obj)
            return obj

        if access is AccessType.JSON_STR:
            return payload
        return json_loads(payload)

    # -- URI-addressed access --------------------------------------------

    def get_by_uri(
        self,
        uri: str,
        access_type: AccessType | str = AccessType.OBJ,
        default: Any = _SENTINEL,
    ) -> Any:
        route, route_args, kwargs = parse_uri(uri)
        if route in BINARY_ROUTES:
            access = normalize_access_type(access_type)
            if access is AccessType.OBJ:
                access = AccessType.BLOB
            return self.get(route, route_args, kwargs, access, default=default)
        return self.get(route, route_args, kwargs, access_type, default=default)

    def put_by_uri(self, obj: Any, uri: str) -> None:
        route, route_args, kwargs = parse_uri(uri)
        self.put(obj, route, route_args, kwargs)

    def rm_by_uri(self, uri: str) -> None:
        route, route_args, kwargs = parse_uri(uri)
        if route in TABLE_ALIASES:
            # Filtered views of another asset can't be deleted
            # (reference refuses these too, jsonfiledb.py:1068-1075).
            raise ValueError(f"Cannot delete via filtered endpoint {route.name}")
        self._put_row(route, {**route_args, **kwargs}, None, tombstone=True)
        # Deletes are durable immediately (the reference unlinks the
        # file synchronously); only puts are batched in the memtable.
        self.flush()

    # -- catalog ----------------------------------------------------------

    def _entries_for_route(
        self, route: Route, prune: dict[str, str] | None = None
    ) -> list[QueryEntry]:
        if route in TABLE_ALIASES:
            return []  # aliased views are not distinct assets
        resolved = self._mem_and_disk_resolved(route, prune)
        if resolved is None:
            return []
        return [self._row_to_entry(route, row) for row in resolved]

    @staticmethod
    def _row_to_entry(route: Route, row: dict) -> QueryEntry:
        keys = storage_keys(route)
        targs = template_args(route.value)
        meta = {k: row[k] for k in keys if row.get(k) is not None}
        route_args = {k: meta.get(k, "") for k in targs}
        kw = {k: meta[k] for k in EXTRA_KEYS.get(route, ()) if k in meta}
        return QueryEntry(build_uri(route, route_args, kw), route, meta)

    def _resolved_catalog_df(
        self, route: Route, prune: dict[str, str] | None = None
    ):
        """Resolved live catalog rows as a DataFrame (key cols + times)
        — the distributed core under both the list-returning reference
        API and the bounded ``query_iter``.

        ``prune``: equality predicates on key columns, applied BELOW
        the LWW window (they commute per-key: the window partitions by
        ALL key columns, so filtering any key column keeps each
        partition intact) so they reach the scan — the Spark analog of
        the reference's directory-glob pruning on project/experiment
        (jsonfiledb.py:725-749), generalized to every key column."""
        log = self._log_df(route)
        if log is None:
            return None
        keys = storage_keys(route)
        for col, val in (prune or {}).items():
            if col in keys:
                log = log.filter(F.col(col) == val)
        w = Window.partitionBy(*keys).orderBy(F.col("seq").desc())
        df = (
            log.withColumn("_rn", F.row_number().over(w))
            .withColumn("ctime", F.min("write_ts").over(Window.partitionBy(*keys)))
            .filter((F.col("_rn") == 1) & (~F.col("tombstone")))
            .withColumnRenamed("write_ts", "mtime")
        )
        return df.select(*keys, "ctime", "mtime")

    def _mem_and_disk_resolved(
        self, route: Route, prune: dict[str, str] | None = None
    ) -> list[dict] | None:
        """Resolved live rows as dicts (key cols only + times) — the
        reference's list-returning contract. For catalogs too large to
        materialize on the driver, use :meth:`query_iter`."""
        df = self._resolved_catalog_df(route, prune)
        if df is None:
            return None
        return [r.asDict() for r in df.collect()]

    def query(
        self,
        asset_type: Route | list[Route] | None = None,
        limit: int | None = None,
        **kwargs: str,
    ) -> list[QueryEntry]:
        """Catalog scan with equality predicates on meta
        (reference: aerovaldb.py:1412-1442, jsonfiledb.py:711-763).
        project/experiment predicates prune partitions before the scan.

        Returns a LIST (the reference's contract) — the whole match set
        materializes on the driver. ``limit`` caps that materialization
        (the scan stops as soon as ``limit`` entries matched). For a
        catalog too large to list at all, use :meth:`query_iter`: same
        matching semantics, but predicates and the limit are pushed
        into the Spark plan and rows STREAM to the driver one Arrow
        batch at a time.

        The reference routes EVERY kwarg to a meta equality predicate,
        so a predicate literally named ``limit`` would be shadowed by
        the row cap. Meta values are strings and the cap is an int, so
        a string ``limit`` is unambiguously a predicate and is
        re-routed to kwargs (``query(limit="5")`` filters on
        ``meta["limit"]``; ``query(limit=5)`` caps the scan)."""
        if isinstance(limit, str):
            kwargs["limit"] = limit
            limit = None
        if asset_type is None:
            routes = list(Route)
        elif isinstance(asset_type, Route):
            routes = [asset_type]
        else:
            routes = list(asset_type)
        prune = {k: v for k, v in kwargs.items() if k in ("project", "experiment")}
        out: list[QueryEntry] = []
        for route in routes:
            if limit is not None and len(out) >= limit:
                break
            for entry in self._entries_for_route(route, prune):
                if all(entry.meta.get(k) == v for k, v in kwargs.items()):
                    out.append(entry)
                    if limit is not None and len(out) >= limit:
                        break
        return out

    def query_iter(
        self,
        asset_type: Route | list[Route] | None = None,
        limit: int | None = None,
        **kwargs: str,
    ):
        """Bounded catalog scan: a generator of :class:`QueryEntry`
        with driver memory O(one Arrow batch), not O(catalog).

        Same matching semantics as :meth:`query`, different execution:
        every equality predicate on a key column is pushed below the
        LWW window into the Spark plan (a route is skipped outright
        when a predicate names a column it doesn't have — such a route
        can never match), ``limit`` becomes a plan-level ``LIMIT`` per
        route, and rows stream to the driver via ``toLocalIterator()``.
        This is the variant to point at a 10⁹-asset catalog; the
        list-returning reference verbs (:meth:`query`, ``list_*``)
        keep their contract and materialize."""
        if isinstance(limit, str):  # meta predicate named "limit"
            kwargs["limit"] = limit
            limit = None
        if asset_type is None:
            routes = list(Route)
        elif isinstance(asset_type, Route):
            routes = [asset_type]
        else:
            routes = list(asset_type)
        remaining = limit
        for route in routes:
            if route in TABLE_ALIASES:
                continue
            if remaining is not None and remaining <= 0:
                return
            keys = storage_keys(route)
            if any(k not in keys for k in kwargs):
                continue  # a predicate on a column this route lacks
            df = self._resolved_catalog_df(route, dict(kwargs))
            if df is None:
                continue
            if remaining is not None:
                df = df.limit(remaining)
            for row in df.toLocalIterator(prefetchPartitions=True):
                yield self._row_to_entry(route, row.asDict())
                if remaining is not None:
                    remaining -= 1
                    if remaining <= 0:
                        return

    def list_all(self) -> list[str]:
        """Every asset URI, materialized (reference contract). The
        typed ``list_*`` helpers share this shape; at catalog scale
        prefer :meth:`query_iter`, which streams entries with pushed
        predicates and a plan-level limit instead of listing."""
        return [e.uri for e in self.query()]

    def list_timeseries(self, project: str, experiment: str) -> list[str]:
        return [
            e.uri
            for e in self.query(
                Route.TIMESERIES, project=project, experiment=experiment
            )
        ]

    def list_glob_stats(self, project: str, experiment: str) -> list[str]:
        # Name is legacy: returns HEATMAP-addressed URIs of the
        # glob_stats assets (reference aerovaldb.py:348-363).
        return [
            build_uri(Route.HEATMAP, {k: e.meta.get(k, "") for k in
                      template_args(Route.HEATMAP.value)})
            for e in self.query(
                Route.GLOB_STATS, project=project, experiment=experiment
            )
        ]

    def list_map(self, project: str, experiment: str) -> list[str]:
        return [
            e.uri
            for e in self.query(Route.MAP, project=project, experiment=experiment)
        ]

    def list_experiments(
        self, project: str, has_results: bool = False
    ) -> list[str]:
        """Experiments under a project (reference _list_experiments,
        aerovaldb.py:483-486 — unimplemented in its backends; here it
        is a distinct over the catalog). With ``has_results`` only
        experiments that own at least one non-config asset count."""
        seen: set[str] = set()
        for entry in self.query(project=project):
            exp = entry.meta.get("experiment")
            if exp is None:
                continue
            if has_results and entry.type in (Route.CONFIG, Route.EXPERIMENTS):
                continue
            seen.add(exp)
        return sorted(seen)

    def get_experiment_mtime(self, project: str, experiment: str) -> datetime:
        return self.get(
            Route.CONFIG,
            {"project": project, "experiment": experiment},
            access_type=AccessType.MTIME,
        )

    # -- deletion ---------------------------------------------------------

    def rm_experiment_data(self, project: str, experiment: str) -> None:
        """Delete every asset of (project, experiment) — the Spark analog
        of the reference's rmtree (jsonfiledb.py:415-428): rewrite only
        the affected project partition per table."""
        self.flush()
        for route in Route:
            if route in TABLE_ALIASES:
                continue
            keys = storage_keys(route)
            if "experiment" not in keys and route is not Route.EXPERIMENTS:
                continue
            disk = self._disk_df(route)
            if disk is None:
                continue
            if route is Route.EXPERIMENTS:
                continue  # project-level registry is not per-experiment data
            remaining = disk.filter(
                ~(
                    F.col("project").eqNullSafe(project)
                    & F.col("experiment").eqNullSafe(experiment)
                )
            )
            self._rewrite_table(route, remaining)

    def _rewrite_table(self, route: Route, df: DataFrame) -> None:
        with self._lock:
            self._rewrite_table_unlocked(route, df)

    def _rewrite_table_unlocked(self, route: Route, df: DataFrame) -> None:
        # Written at the plan's natural parallelism — a rewrite of a
        # 100 TB route table must not funnel through one task. Small
        # tables produce a handful of small files; AQE's partition
        # coalescing keeps the count proportional to data size.
        path = self._table_path(route)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if "project" in storage_keys(route):
            writer = writer.partitionBy("project")
        writer.parquet(tmp)
        old = f"{path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        self._df_cache.pop(self._storage_route(route), None)

    def compact(self, max_retries: int = 5) -> None:
        """Fold the append log: keep only the live latest row per key
        (plus ctime), dropping superseded versions and tombstones.

        Compaction RAISES THE SNAPSHOT HORIZON: states below the
        pre-compaction head can no longer be reconstructed (their
        superseded rows and tombstones are gone), so the horizon is
        persisted (``_compaction.json``, atomic replace) and
        :meth:`snapshot` / :meth:`changes` refuse seqs beneath it —
        a loud error instead of a silently wrong historical read.

        Concurrency: the table swap (rename + rmtree) would destroy
        parquet files a concurrent lock-free :meth:`transact` appended
        after compaction read the table, so compaction takes a claim
        of its own and swaps only when every lower claim is resolved
        and none committed since its read — an in-flight transact
        either lands before the swap (compaction retries on its
        commit) or starts after and sees compaction's commit in its
        own conflict check. Plain un-claimed ``flush()`` remains
        single-writer-per-root by contract."""
        self.flush()
        import random

        delay = 0.01
        for _ in range(max_retries):
            self.refresh()
            snap, snap_meta = self._latest_committed()
            horizon = self.current_seq()
            # PHASE 1 — stage: fold every table into a tmp dir. All
            # the heavy Spark work, nothing destroyed yet.
            staged = self._compact_stage()
            # PHASE 2 — arbitrate: claim a slot; every lower claim must
            # resolve (in-flight transacts land or durably abort), and
            # none may have committed since our read — their appends
            # would be missing from the staged fold.
            n = self._claim_next()
            conflict = any(
                self._wait_resolved(k).get("status") == "committed"
                for k in range(snap + 1, n)
            )
            if conflict:
                self._resolve_claim(n, {"status": "aborted"})
                for _route, tmp in staged:
                    shutil.rmtree(tmp, ignore_errors=True)
                time.sleep(random.uniform(0.0, delay))
                delay = min(delay * 2, 0.5)
                continue
            # PHASE 3 — swap (renames, fast) and publish. Losing our
            # resolution AFTER the swap (a peer presumed us crashed
            # mid-swap) is harmless: compaction is a logical no-op, so
            # the peer's retried commit lands on equivalent state.
            self._compact_swap(staged)
            if horizon > self.min_snapshot_seq():
                self._write_compaction_marker(horizon)
            self._resolve_claim(
                n,
                {
                    "status": "committed",
                    "max_seq": int(snap_meta.get("max_seq", 0)),
                    "compaction": True,
                },
            )
            return
        raise RuntimeError(
            f"compact: gave up after {max_retries} attempts (concurrent "
            "writers kept committing)"
        )

    def _compact_stage(self) -> list[tuple[Route, str]]:
        """Fold every route table into a tmp directory (non-destructive
        — the live tables are untouched). Returns (route, tmp_dir)."""
        staged: list[tuple[Route, str]] = []
        for route in Route:
            if route in TABLE_ALIASES:
                continue
            disk = self._disk_df(route)
            if disk is None:
                continue
            keys = storage_keys(route)
            w = Window.partitionBy(*keys).orderBy(F.col("seq").desc())
            folded = (
                disk.withColumn("_rn", F.row_number().over(w))
                .withColumn(
                    "write_ts_first",
                    F.min("write_ts").over(Window.partitionBy(*keys)),
                )
                .filter((F.col("_rn") == 1) & (~F.col("tombstone")))
                .drop("_rn")
            )
            # Preserve ctime through compaction via a sidecar min-
            # write_ts row per key. The sidecar carries a NULL payload
            # — reads take payload only from the rn==1 (highest-seq)
            # row, and storing the live payload twice would make
            # compaction GROW single-version tables instead of
            # shrinking them.
            first = (
                folded.withColumn("write_ts", F.col("write_ts_first"))
                .withColumn("seq", F.col("seq") - 1)
                .withColumn(
                    "payload",
                    F.lit(None).cast(folded.schema["payload"].dataType),
                )
            )
            keep = folded.unionByName(first).drop("write_ts_first")
            path = self._table_path(route)
            tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
            # Written at the plan's natural parallelism — a rewrite of
            # a 100 TB route table must not funnel through one task.
            writer = keep.write.mode("overwrite")
            if "project" in keys:
                writer = writer.partitionBy("project")
            writer.parquet(tmp)
            staged.append((route, tmp))
        return staged

    def _compact_swap(self, staged: list[tuple[Route, str]]) -> None:
        with self._lock:
            for route, tmp in staged:
                path = self._table_path(route)
                old = f"{path}.old-{uuid.uuid4().hex[:8]}"
                os.rename(path, old)
                os.rename(tmp, path)
                shutil.rmtree(old)
                self._df_cache.pop(self._storage_route(route), None)

    def min_snapshot_seq(self) -> int:
        """Lowest seq a snapshot/CDC window may reference (0 until the
        first compaction)."""
        try:
            with open(os.path.join(self.root, "_compaction.json"),
                      encoding="utf-8") as f:
                return int(json.load(f).get("min_snapshot_seq", 0))
        except (OSError, ValueError):
            return 0

    def _write_compaction_marker(self, horizon: int) -> None:
        path = os.path.join(self.root, "_compaction.json")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"min_snapshot_seq": horizon}, f)
        os.replace(tmp, path)

    # -- typed getters / putters (generated) ------------------------------

    def __getattr__(self, name: str) -> Any:
        if name.startswith("get_") or name.startswith("put_"):
            verb, _, tname = name.partition("_")
            # special names that aren't route tables
            route = None
            try:
                route = Route[tname.upper()]
            except KeyError:
                pass
            if route is not None:
                if verb == "get":
                    return self._make_getter(route)
                if verb == "put" and route not in TABLE_ALIASES:
                    return self._make_putter(route)
        raise AttributeError(name)

    def _make_getter(self, route: Route):
        targs = template_args(route.value)
        extra = EXTRA_KEYS.get(self._storage_route(route), ())
        filt = FILTER_KEYS.get(route, ())

        # Reference accessors take storage extras / filter args
        # POSITIONALLY after the template args (e.g. get_map's trailing
        # `time`, aerovaldb.py:666-720; get_heatmap_timeseries's
        # region/network/obsvar/layer, :944-1001) — accept the same
        # call shapes, in the reference's declared order.
        pos_tail = (*extra, *filt)

        def getter(*args: str, access_type: AccessType | str = AccessType.OBJ,
                   default: Any = _SENTINEL, cache: bool = False, **kw: Any) -> Any:
            if not (len(targs) <= len(args) <= len(targs) + len(pos_tail)):
                raise TypeError(
                    f"get_{table_name(route)} takes {len(targs)}-"
                    f"{len(targs) + len(pos_tail)} positional args "
                    f"{[*targs, *pos_tail]}, got {len(args)}"
                )
            route_args = dict(zip(targs, args))
            pos_kw = dict(zip(pos_tail, args[len(targs):]))
            dup = set(pos_kw) & set(kw)
            if dup:
                raise TypeError(
                    f"get_{table_name(route)} got {sorted(dup)} both "
                    "positionally and as keyword"
                )
            unknown = set(kw) - set(extra) - set(filt)
            if unknown:
                from .exceptions import UnusedArguments

                raise UnusedArguments(
                    f"get_{table_name(route)} got unexpected kwargs {sorted(unknown)}"
                )
            kw = {**pos_kw, **kw}
            kwargs = {
                k: kw[k] for k in (*extra, *filt) if k in kw and kw[k] is not None
            }
            return self.get(route, route_args, kwargs, access_type, default=default)

        getter.__name__ = f"get_{table_name(route)}"
        return getter

    def _make_putter(self, route: Route):
        targs = template_args(route.value)
        extra = EXTRA_KEYS.get(route, ())

        def putter(obj: Any, *args: str, **kw: Any) -> None:
            if not (len(targs) <= len(args) <= len(targs) + len(extra)):
                raise TypeError(
                    f"put_{table_name(route)} takes {len(targs)}-"
                    f"{len(targs) + len(extra)} positional args "
                    f"{[*targs, *extra]}, got {len(args)}"
                )
            route_args = dict(zip(targs, args))
            pos_kw = dict(zip(extra, args[len(targs):]))
            dup = set(pos_kw) & set(kw)
            if dup:
                raise TypeError(
                    f"put_{table_name(route)} got {sorted(dup)} both "
                    "positionally and as keyword"
                )
            unknown = set(kw) - set(extra)
            if unknown:
                from .exceptions import UnusedArguments

                raise UnusedArguments(
                    f"put_{table_name(route)} got unexpected kwargs {sorted(unknown)}"
                )
            kw = {**pos_kw, **kw}
            kwargs = {k: kw[k] for k in extra if k in kw and kw[k] is not None}
            self.put(obj, route, route_args, kwargs)

        putter.__name__ = f"put_{table_name(route)}"
        return putter

    # -- models_style fallback (reference PriorityMapper semantics,
    #    utils/string_mapper/mapper.py:174-216) -------------------------

    def get_models_style(
        self,
        project: str,
        experiment: str | None = None,
        access_type: AccessType | str = AccessType.OBJ,
        default: Any = _SENTINEL,
    ) -> Any:
        if experiment is not None:
            try:
                return self.get(
                    Route.MODELS_STYLE,
                    {"project": project},
                    {"experiment": experiment},
                    access_type,
                )
            except FileNotFoundError:
                pass
        return self.get(
            Route.MODELS_STYLE, {"project": project}, {}, access_type, default=default
        )

    def put_models_style(
        self, obj: Any, project: str, experiment: str | None = None
    ) -> None:
        kwargs = {"experiment": experiment} if experiment is not None else {}
        self.put(obj, Route.MODELS_STYLE, {"project": project}, kwargs)

    def materialize_contour_timesplit(self) -> int:
        """Explode every merged CONTOUR document (timestep-keyed dict)
        into per-timestep CONTOUR_TIMESPLIT rows — the canonicalization
        of the reference's dual layout (its jsondb caches per-timestep
        slices on first merged read, jsonfiledb.py:986-993; here it is
        a one-time distributed materialization, SURVEY.md §4).

        Returns the number of timestep rows written. Idempotent:
        re-running overwrites the same (…, timestep) keys via LWW.
        """
        from collections.abc import Iterator

        merged = self._resolved_df(Route.CONTOUR)
        if merged is None:
            return 0

        out_schema = T.StructType(
            [
                T.StructField("project", T.StringType()),
                T.StructField("experiment", T.StringType()),
                T.StructField("obsvar", T.StringType()),
                T.StructField("model", T.StringType()),
                T.StructField("timestep", T.StringType()),
                T.StructField("payload", T.StringType()),
            ]
        )

        def split(batches: Iterator) -> Iterator:
            import json as _json

            import pandas as pd

            for batch in batches:
                rows = []
                for rec in batch.itertuples(index=False):
                    try:
                        doc = _json.loads(rec.payload)
                    except (TypeError, ValueError):
                        continue
                    if not isinstance(doc, dict):
                        continue
                    for timestep, slice_doc in doc.items():
                        rows.append(
                            (
                                rec.project, rec.experiment, rec.obsvar,
                                rec.model, str(timestep),
                                _json.dumps(slice_doc),
                            )
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in out_schema.fields]
                )

        slices = merged.select(
            "project", "experiment", "obsvar", "model", "payload"
        ).mapInPandas(split, schema=out_schema)
        n = slices.count()
        if n:
            self.bulk_import(Route.CONTOUR_TIMESPLIT, slices)
        return n

    def bulk_import(self, route: Route, df: DataFrame) -> None:
        """Append many assets at once from a DataFrame with (some of)
        the route's key columns + ``payload`` [+ ``write_ts``] — the
        distributed write path (no per-asset driver loop)."""
        sroute = self._storage_route(route)
        cols = []
        for k in storage_keys(sroute):
            cols.append(
                F.col(k).cast("string").alias(k)
                if k in df.columns
                else F.lit(None).cast("string").alias(k)
            )
        cols.append(F.col("payload"))
        cols.append(
            (F.col("write_ts") if "write_ts" in df.columns else F.current_timestamp())
            .alias("write_ts")
        )
        # Every row of the batch shares ONE seq, so two batch rows for
        # the same key would tie in the LWW window and the survivor
        # would be nondeterministic — dedupe keys within the batch
        # first (latest write_ts wins; payload is the deterministic
        # final tiebreak).
        key_cols = list(storage_keys(sroute))
        batch_w = Window.partitionBy(*key_cols).orderBy(
            F.col("write_ts").desc(), F.col("payload").desc_nulls_last()
        )
        out = (
            df.select(*cols)
            .withColumn("_rn", F.row_number().over(batch_w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("seq", F.lit(self._next_seq()))
            .withColumn("tombstone", F.lit(False))
        )
        with self._lock:
            writer = out.write.mode("append")
            if "project" in storage_keys(sroute):
                writer = writer.partitionBy("project")
            writer.parquet(self._table_path(sroute))
        self._df_cache.pop(sroute, None)

    # -- analytics surface -------------------------------------------------

    def table(self, route: Route) -> DataFrame | None:
        """Resolved live-rows DataFrame for a route table."""
        return self._resolved_df(route)

    def glob_stats_long(
        self, project: str | None = None, experiment: str | None = None
    ) -> DataFrame | None:
        """Shredded long-format view of every glob_stats document:
        one row per stat leaf. The 100 TB analytics path — the deep
        heatmap/regional filters become plain WHERE clauses here
        (SURVEY.md §2.2), and shredding runs distributed via an
        Arrow-batched mapInPandas over the payload column."""
        from collections.abc import Iterator

        from .filters import SHRED_LEVELS, shred_glob_stats_doc

        df = self._resolved_df(Route.GLOB_STATS)
        if df is None:
            return None
        if project is not None:
            df = df.filter(F.col("project") == project)
        if experiment is not None:
            df = df.filter(F.col("experiment") == experiment)

        out_schema = T.StructType(
            [
                T.StructField("project", T.StringType()),
                T.StructField("experiment", T.StringType()),
                T.StructField("frequency", T.StringType()),
                *[T.StructField(lvl, T.StringType()) for lvl in SHRED_LEVELS],
                T.StructField("stat_name", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )

        def shred(batches: Iterator) -> Iterator:
            import json as _json

            import pandas as pd

            for batch in batches:
                rows = []
                for rec in batch.itertuples(index=False):
                    try:
                        doc = _json.loads(rec.payload)
                    except (TypeError, ValueError):
                        continue
                    for leaf in shred_glob_stats_doc(doc):
                        rows.append(
                            (rec.project, rec.experiment, rec.frequency, *leaf)
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in out_schema.fields]
                )

        return df.select("project", "experiment", "frequency", "payload").mapInPandas(
            shred, schema=out_schema
        )

    def register_views(self, prefix: str = "avdb_") -> list[str]:
        """Expose every non-empty route table to spark.sql."""
        names = []
        for route in Route:
            if route in TABLE_ALIASES:
                continue
            df = self._resolved_df(route)
            if df is not None:
                name = f"{prefix}{table_name(route)}"
                df.createOrReplaceTempView(name)
                names.append(name)
        return names


def copy_db_contents(source: AerovalSparkDB | Any, dest: AerovalSparkDB | Any) -> None:
    """Bulk-copy every asset (reference utils/copy.py:11-50 — but
    table-at-a-time appends instead of its per-asset O(N²) loop).

    Accepts resource strings (dispatched through :func:`plugins.open`)
    and, like the reference, ANY pair of objects speaking the
    duck-typed interchange surface (``list_all`` / ``get_by_uri`` /
    ``put_by_uri``) — the bootstrap path the reference's
    extending-aerovaldb doc prescribes for third-party backends. The
    Spark→Spark case takes the distributed table-at-a-time path; mixed
    pairs fall back to the reference's per-URI copy (also fixing its
    unraised not-empty check, copy.py:33)."""
    from .plugins import open as _open

    if isinstance(source, str):
        source = _open(source)
    if isinstance(dest, str):
        dest = _open(dest)
    if not (isinstance(source, AerovalSparkDB) and isinstance(dest, AerovalSparkDB)):
        if dest.list_all():
            raise ValueError("Destination database is not empty")
        uris = [str(u) for u in source.list_all()]
        for uri in uris:
            access = AccessType.JSON_STR
            if uri.startswith("/v0/report-image/") or uri.startswith("/v0/map-overlay/"):
                access = AccessType.BLOB
            dest.put_by_uri(source.get_by_uri(uri, access_type=access), uri)
        n_src, n_dst = len(uris), len(dest.list_all())
        if n_src != n_dst:
            raise IOError(f"Copy incomplete: source={n_src} dest={n_dst}")
        return
    if dest.list_all():
        raise ValueError("Destination database is not empty")
    source.flush()
    for route in Route:
        if route in TABLE_ALIASES:
            continue
        df = source._resolved_disk_df(route)
        if df is None:
            continue
        out = (
            df.withColumnRenamed("mtime", "write_ts")
            .withColumn("seq", F.lit(time.time_ns()))
            .withColumn("tombstone", F.lit(False))
            .drop("ctime")
        )
        # Natural parallelism: the copy of each table runs as many
        # tasks as the source scan produces (a coalesce(1) here would
        # funnel the whole bulk copy through one task per table).
        writer = out.write.mode("append")
        if "project" in storage_keys(route):
            writer = writer.partitionBy("project")
        writer.parquet(dest._table_path(route))
        dest._df_cache.pop(route, None)
    n_src, n_dst = len(source.list_all()), len(dest.list_all())
    if n_src != n_dst:
        raise IOError(f"Copy incomplete: source={n_src} dest={n_dst}")
