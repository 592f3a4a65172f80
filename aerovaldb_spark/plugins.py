"""Connector factory (reference: src/aerovaldb/plugins.py:30-101).

``open(resource)`` dispatches on a scheme prefix:

- ``spark:<path>``      → AerovalSparkDB rooted at <path>
- ``:memory:``          → AerovalSparkDB in a fresh temp directory
- ``json_files:<path>`` → the reference's jsondb scheme: a LIVE view —
  the tree is mirrored into a Spark store and incrementally re-synced
  on access (mtime/size fingerprint), so files written by another
  process after open() are visible, like the reference's jsonfiledb
- ``sqlitedb:<path>``   → migration shim: the reference's sqlite
  scheme; imports the .sqlite file the same way
- bare path             → a reference jsondb tree or an aerovaldb
  ``.db``/``.sqlite`` file is imported (sniffed the way the
  reference sniffs bare paths, plugins.py:76-101); otherwise an
  AerovalSparkDB root

Engines register via importlib entry points in group
``aerovaldb_spark`` (the reference's mechanism, plugins.py:30-45,
group ``aerovaldb``), merged over the built-in ``ENGINES`` dict —
third-party backends install an entry point; in-process code may also
add to ``ENGINES`` directly.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable

from pyspark.sql import SparkSession

from .db import AerovalSparkDB
from .session import get_spark


def _open_spark(path: str, spark: SparkSession | None = None) -> AerovalSparkDB:
    spark = spark or SparkSession.getActiveSession() or get_spark()
    if path == ":memory:":
        path = tempfile.mkdtemp(prefix="aerovaldb-spark-")
    return AerovalSparkDB(spark, path)


class _LiveJsonFilesDB(AerovalSparkDB):
    """`json_files:` backend with LIVE-VIEW semantics.

    The reference jsonfiledb reads the file tree on every access
    (jsonfiledb.py:199-222), so writes made by another process
    (pyaerocom still producing files) are visible immediately. Here
    every Spark-side read first re-checks the source tree's
    (mtime, size) fingerprint and incrementally re-imports what moved
    — same observable behavior, one os.walk per access when nothing
    changed. The fingerprint persists next to the store so a reopened
    connection also skips the import when the tree is unchanged.
    """

    _STATE_FILE = "_source_state.json"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source_dir: str,
        version_override: str | None = None,
    ):
        super().__init__(spark, root)
        self._source_dir = source_dir
        self._version_override = version_override
        self._syncing = False

    # NB: io.open, not open() — this module's ``open`` is the connector
    # factory, which shadows the builtin here.
    def _load_state(self) -> dict | None:
        import io
        import json

        try:
            with io.open(os.path.join(self.root, self._STATE_FILE)) as fh:
                return {k: tuple(v) for k, v in json.load(fh).items()}
        except (OSError, ValueError):
            return None

    def _save_state(self, state: dict) -> None:
        import io
        import json

        tmp = os.path.join(self.root, self._STATE_FILE + ".tmp")
        with io.open(tmp, "w") as fh:
            json.dump({k: list(v) for k, v in state.items()}, fh)
        os.replace(tmp, os.path.join(self.root, self._STATE_FILE))

    def _disk_df(self, route):
        # Single choke point: every read path (point lookups, lists,
        # query(), table()) funnels through here. Guard against
        # re-entry — the sync itself writes through the same db.
        if not self._syncing:
            self._syncing = True
            try:
                from .sources.jsondb_import import sync_jsondb_tree

                new_state = sync_jsondb_tree(
                    self, self._source_dir, self._load_state(),
                    version_override=self._version_override,
                )
                self._save_state(new_state)
            finally:
                self._syncing = False
        return super()._disk_df(route)


def _open_json_files(path: str, spark: SparkSession | None = None) -> AerovalSparkDB:
    """Reference-jsondb compatibility: live view of the tree, mirrored
    into a Spark store rooted alongside it (incrementally synced on
    access; reopening reuses the mirror).

    ``json_files:/tree?version=0.13.0`` pins the layout version for
    every file instead of per-experiment detection — the mixed-version
    escape hatch (reference StringMapper.lookup ``version=``)."""
    version = None
    if "?version=" in path:
        path, _, version = path.rpartition("?version=")
    spark = spark or SparkSession.getActiveSession() or get_spark()
    root = os.path.join(
        tempfile.gettempdir(), "aerovaldb-spark-imports",
        os.path.abspath(path).strip(os.sep).replace(os.sep, "_")
        + (f"@{version}" if version else ""),
    )
    return _LiveJsonFilesDB(spark, root, path, version_override=version)


def _open_sqlitedb(path: str, spark: SparkSession | None = None) -> AerovalSparkDB:
    """Reference-sqlitedb compatibility: import the .sqlite file into a
    Spark store rooted alongside it (cached — reopening reuses the
    import). A read-snapshot, not a live view of the file."""
    from .sources.sqlitedb_io import import_sqlite_db

    db = _open_spark(
        os.path.join(tempfile.gettempdir(), "aerovaldb-spark-imports",
                     os.path.abspath(path).strip(os.sep).replace(os.sep, "_")),
        spark=spark,
    )
    if not db.list_all():
        import_sqlite_db(db, path)
    return db


def _looks_like_jsondb_tree(path: str) -> bool:
    """A reference jsondb root: project dirs with experiments.json or
    cfg_* files (jsonfiledb layout)."""
    if not os.path.isdir(path):
        return False
    for entry in os.listdir(path)[:50]:
        sub = os.path.join(path, entry)
        if os.path.isdir(sub) and (
            os.path.exists(os.path.join(sub, "experiments.json"))
            or any(
                f.startswith("cfg_")
                for d, _, files in list(os.walk(sub))[:3]
                for f in files
            )
        ):
            return True
    return False


ENGINES: dict[str, Callable[..., AerovalSparkDB]] = {
    "spark": _open_spark,
    "json_files": _open_json_files,
    "sqlitedb": _open_sqlitedb,
}

ENTRY_POINT_GROUP = "aerovaldb_spark"


def _entry_point_engines() -> dict[str, Callable[..., AerovalSparkDB]]:
    """Backends registered by installed packages (reference
    plugins.py:14-45: load each entry point, warn-and-skip on
    duplicates and load failures)."""
    import warnings
    from importlib.metadata import entry_points

    out: dict[str, Callable[..., AerovalSparkDB]] = {}
    for ep in entry_points(group=ENTRY_POINT_GROUP):
        if ep.name in out:
            warnings.warn(
                f"found multiple versions of {ENTRY_POINT_GROUP} "
                f"entrypoint {ep.name} for {ep.value}"
            )
            continue
        try:
            out[ep.name] = ep.load()
        except Exception as ex:  # noqa: BLE001 (reference behavior)
            warnings.warn(f"Engine {ep.name!r} loading failed:\n{ex}", RuntimeWarning)
    return out


def list_engines() -> dict[str, Callable[..., AerovalSparkDB]]:
    """Built-in engines merged with installed entry points (entry
    points win on name collision so a package can override a
    built-in, like the reference's single-namespace registry)."""
    return {**ENGINES, **_entry_point_engines()}


# Hadoop-compatible filesystem schemes that a Spark cluster resolves
# natively; resources with these prefixes are PATHS for the spark
# backend, not engine selectors.
_FS_SCHEMES = frozenset(
    {
        "file", "hdfs", "viewfs", "s3", "s3a", "s3n", "gs", "abfs",
        "abfss", "wasb", "wasbs", "oss", "o3fs", "cosn", "alluxio",
        "dbfs",
    }
)


def open(resource: str, spark: SparkSession | None = None) -> AerovalSparkDB:  # noqa: A001
    """Open a database connection for a resource identifier."""
    engines = list_engines()
    scheme, sep, rest = resource.partition(":")
    if sep and scheme in engines and rest and rest != "memory:":
        return engines[scheme](rest, spark=spark)
    if resource == ":memory:":
        return _open_spark(":memory:", spark=spark)
    if (
        sep
        and rest
        and scheme not in _FS_SCHEMES
        and not rest.startswith("//")
        and "/" not in scheme
        and os.path.sep not in scheme
    ):
        # 'name:path' with an unregistered name: fail at open() like
        # the reference (plugins.py:79-99 resolves list_engines()[name]
        # -> KeyError) instead of deferring a filesystem error to the
        # first flush. URI-style paths (scheme://...) still pass
        # through to Spark's Hadoop filesystem layer.
        raise KeyError(
            f"unknown engine {scheme!r} in resource {resource!r}; "
            f"available engines: {sorted(engines)} (Hadoop filesystem "
            "URIs like hdfs://... or s3a://... are also accepted)"
        )
    if os.path.splitext(resource)[1] in (".db", ".sqlite") and os.path.isfile(resource):
        from .sources.sqlitedb_io import is_aerovaldb_sqlite

        if is_aerovaldb_sqlite(resource):
            return _open_sqlitedb(resource, spark=spark)
    if _looks_like_jsondb_tree(resource):
        # bare path to a reference-layout tree (the reference sniffs
        # bare paths the same way, plugins.py:76-101)
        return _open_json_files(resource, spark=spark)
    return _open_spark(resource, spark=spark)
