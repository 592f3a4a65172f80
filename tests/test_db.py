"""Asset-store engine tests, modeled on the reference's strategy
(SURVEY.md §5): round-trips per route, semantics edges (NaN→null,
set→list, default=, missing key, timestamps), catalog counts, deletes,
blob round-trips, copy."""

from __future__ import annotations

import datetime

import pytest

from aerovaldb_spark.db import AerovalSparkDB, copy_db_contents
from aerovaldb_spark.routes import Route, template_args
from aerovaldb_spark.types import AccessType

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 16


def _args_for(route: Route) -> dict[str, str]:
    return {k: f"{k}val" for k in template_args(route.value)}


# --- round trips for every JSON route -----------------------------------

JSON_ROUTES = [
    r
    for r in Route
    if r
    not in (
        Route.REPORT_IMAGE,
        Route.MAP_OVERLAY,
        Route.REGIONAL_STATS,
        Route.HEATMAP,
    )
]


@pytest.mark.parametrize("route", JSON_ROUTES, ids=lambda r: r.name)
def test_put_get_roundtrip(tmpdb: AerovalSparkDB, route):
    args = _args_for(route)
    payload = {"path": f"sentinel-{route.name}"}
    tmpdb.put(payload, route, args)
    assert tmpdb.get(route, args) == payload
    # JSON_STR returns the stored serialization verbatim
    s = tmpdb.get(route, args, access_type=AccessType.JSON_STR)
    assert isinstance(s, str) and "sentinel" in s


def test_roundtrip_survives_flush(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put({"path": "cfg"}, Route.CONFIG, args)
    tmpdb.flush()
    assert tmpdb.get(Route.CONFIG, args) == {"path": "cfg"}


def test_last_writer_wins_after_flush(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put({"v": 1}, Route.CONFIG, args)
    tmpdb.flush()
    tmpdb.put({"v": 2}, Route.CONFIG, args)
    tmpdb.flush()
    assert tmpdb.get(Route.CONFIG, args) == {"v": 2}


def test_oversized_flush_writes_multiple_files(tmpdb):
    """A memtable flush above _PARALLEL_FLUSH_ROWS must write at
    natural parallelism (>=2 part files, range-partitioned on the key
    columns), not through the single-task coalesce(1) — the cliff a
    caller hit by put()ing a bulk batch and calling flush() instead of
    bulk_import. Read-back semantics are unchanged. The threshold is
    lowered to the arrow-path bound so the test exercises the
    mechanism without a 100k-row driver loop."""
    import glob
    import os

    tmpdb._PARALLEL_FLUSH_ROWS = tmpdb._SMALL_FLUSH_ROWS  # 10k
    n = tmpdb._SMALL_FLUSH_ROWS + 2_001
    for i in range(n):
        tmpdb.put({"v": i}, Route.CONFIG, {"project": "p", "experiment": f"e{i:06d}"})
    tmpdb.flush()
    part_files = glob.glob(
        os.path.join(tmpdb._table_path(Route.CONFIG), "**", "part-*.parquet"),
        recursive=True,
    )
    assert len(part_files) >= 2, part_files
    # unchanged read-back: point read, catalog count, LWW over the batch
    assert tmpdb.get(Route.CONFIG, {"project": "p", "experiment": "e000007"}) == {
        "v": 7
    }
    assert tmpdb.table(Route.CONFIG).count() == n
    tmpdb.put({"v": -1}, Route.CONFIG, {"project": "p", "experiment": "e000007"})
    tmpdb.flush()
    assert tmpdb.get(Route.CONFIG, {"project": "p", "experiment": "e000007"}) == {
        "v": -1
    }


# --- typed getter/putter generation -------------------------------------

def test_typed_getters_putters(tmpdb):
    tmpdb.put_config({"path": "cfg"}, "proj", "exp")
    assert tmpdb.get_config("proj", "exp") == {"path": "cfg"}
    tmpdb.put_timeseries({"path": "ts"}, "proj", "exp", "loc", "net", "ov", "lay")
    assert tmpdb.get_timeseries("proj", "exp", "loc", "net", "ov", "lay") == {
        "path": "ts"
    }
    with pytest.raises(TypeError):
        tmpdb.get_config("only-one-arg")


def test_reference_positional_signatures(tmpdb):
    """Storage extras are positional in the reference API
    (aerovaldb.py:666-720, 944-1001) — accept the same call shapes."""
    # hm_ts: region/network/obsvar/layer are key columns, not overwrites
    tmpdb.put_heatmap_timeseries({"r": "EU"}, "p", "e", "EU", "net", "od", "Sfc")
    tmpdb.put_heatmap_timeseries({"r": "NA"}, "p", "e", "NA", "net", "od", "Sfc")
    assert tmpdb.get_heatmap_timeseries("p", "e", "EU", "net", "od", "Sfc") == {"r": "EU"}
    assert tmpdb.get_heatmap_timeseries("p", "e", "NA", "net", "od", "Sfc") == {"r": "NA"}
    tmpdb.flush()
    assert tmpdb.get_heatmap_timeseries("p", "e", "EU", "net", "od", "Sfc") == {"r": "EU"}
    # map: trailing `time` positional (reference get_map/put_map shape)
    tmpdb.put_map({"m": 1}, "p", "e", "net", "od", "Sfc", "mod", "mv", "2010")
    assert tmpdb.get_map("p", "e", "net", "od", "Sfc", "mod", "mv", "2010") == {"m": 1}
    assert tmpdb.get_map("p", "e", "net", "od", "Sfc", "mod", "mv", time="2010") == {"m": 1}
    # same key both positionally and as keyword is an error
    with pytest.raises(TypeError):
        tmpdb.get_map("p", "e", "net", "od", "Sfc", "mod", "mv", "2010", time="2010")


# --- semantics edges -----------------------------------------------------

def test_nan_serialized_as_null(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put({"x": float("nan"), "y": float("inf")}, Route.CONFIG, args)
    assert tmpdb.get(Route.CONFIG, args) == {"x": None, "y": None}


def test_set_serialized_as_list(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put({"s": {"only"}}, Route.CONFIG, args)
    assert tmpdb.get(Route.CONFIG, args) == {"s": ["only"]}


def test_missing_raises_filenotfound(tmpdb):
    with pytest.raises(FileNotFoundError):
        tmpdb.get(Route.CONFIG, _args_for(Route.CONFIG))


def test_default_fallback(tmpdb):
    assert tmpdb.get(Route.CONFIG, _args_for(Route.CONFIG), default={"d": 1}) == {
        "d": 1
    }


def test_corrupt_json_raises_even_with_default(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put("{not valid json", Route.CONFIG, args)  # str stored verbatim
    import json

    with pytest.raises(json.JSONDecodeError):
        tmpdb.get(Route.CONFIG, args, default={"d": 1})


def test_json_str_fidelity(tmpdb):
    args = _args_for(Route.CONFIG)
    raw = '{"a":    1,\n "weird_spacing": true}'
    tmpdb.put(raw, Route.CONFIG, args)
    assert tmpdb.get(Route.CONFIG, args, access_type=AccessType.JSON_STR) == raw
    tmpdb.flush()
    assert tmpdb.get(Route.CONFIG, args, access_type=AccessType.JSON_STR) == raw


def test_mtime_ctime(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put({"v": 1}, Route.CONFIG, args)
    tmpdb.flush()
    m1 = tmpdb.get(Route.CONFIG, args, access_type=AccessType.MTIME)
    c1 = tmpdb.get(Route.CONFIG, args, access_type=AccessType.CTIME)
    assert isinstance(m1, datetime.datetime) and isinstance(c1, datetime.datetime)
    tmpdb.put({"v": 2}, Route.CONFIG, args)
    m2 = tmpdb.get(Route.CONFIG, args, access_type=AccessType.MTIME)
    c2 = tmpdb.get(Route.CONFIG, args, access_type=AccessType.CTIME)
    assert m2 > m1
    assert c2 == c1  # creation time survives overwrites


def test_file_path_access_rejected(tmpdb):
    from aerovaldb_spark.exceptions import UnsupportedOperation

    with pytest.raises(UnsupportedOperation):
        tmpdb.get(
            Route.CONFIG, _args_for(Route.CONFIG), access_type=AccessType.FILE_PATH
        )


def test_file_path_materialization_shim(spark, tmp_path):
    """Opt-in FILE_PATH (reference jsonfiledb returns the backing file
    path, jsonfiledb.py:344-357): the Spark backend materializes the
    payload to a per-store cache file and returns that path."""
    import json
    import os

    db = AerovalSparkDB(spark, str(tmp_path / "db"), materialize_file_path=True)
    db.put_config({"k": 1}, "p", "e")
    path = db.get(
        Route.CONFIG, {"project": "p", "experiment": "e"},
        access_type=AccessType.FILE_PATH,
    )
    assert path.endswith(".json")
    with open(path) as fh:
        assert json.load(fh) == {"k": 1}
    # unchanged asset → same file reused (mtime-validated, no rewrite)
    st1 = os.stat(path)
    assert db.get(
        Route.CONFIG, {"project": "p", "experiment": "e"},
        access_type=AccessType.FILE_PATH,
    ) == path
    assert os.stat(path).st_mtime_ns == st1.st_mtime_ns
    # overwrite → re-materialized content
    db.put_config({"k": 2}, "p", "e")
    path2 = db.get(
        Route.CONFIG, {"project": "p", "experiment": "e"},
        access_type=AccessType.FILE_PATH,
    )
    with open(path2) as fh:
        assert json.load(fh) == {"k": 2}
    # binary route: sniffed image extension for content-type-by-path
    db.put_report_image(PNG, "p", "e", "img/pixel")
    ipath = db.get(
        Route.REPORT_IMAGE,
        {"project": "p", "experiment": "e", "path": "img/pixel"},
        access_type=AccessType.FILE_PATH,
    )
    assert ipath.endswith(".png")
    with open(ipath, "rb") as fh:
        assert fh.read() == PNG


# --- filtered endpoints ---------------------------------------------------

GLOB = {
    "var1": {
        "net1": {
            "lay1": {
                "mod1": {
                    "mv1": {"regA": {"2020": {"bias": 0.5}}},
                    "mv2": {"regB": {"2021": {"rmse": 2.0}}},
                }
            }
        }
    }
}


def test_heatmap_filtered_read(tmpdb):
    tmpdb.put_glob_stats(GLOB, "p", "e", "monthly")
    out = tmpdb.get_heatmap("p", "e", "monthly", region="regA", time="2020")
    assert out["var1"]["net1"]["lay1"]["mod1"]["mv1"]["regA"] == {
        "2020": {"bias": 0.5}
    }
    assert out["var1"]["net1"]["lay1"]["mod1"]["mv2"] == {}


def test_regional_stats_filtered_read(tmpdb):
    tmpdb.put_glob_stats(GLOB, "p", "e", "monthly")
    out = tmpdb.get_regional_stats(
        "p", "e", "monthly", variable="var1", network="net1", layer="lay1"
    )
    assert "mod1" in out


def test_map_filtered_read(tmpdb):
    stations = [
        {
            "station_name": "s1",
            "latitude": 1.0,
            "longitude": 2.0,
            "altitude": 0.0,
            "region": "r",
            "station_display_name": "S1",
            "daily": {"spring": {"x": 1}, "winter": {"x": 2}},
            "junk": 1,
        }
    ]
    tmpdb.put_map(stations, "p", "e", "net", "ov", "lay", "mod", "mv")
    out = tmpdb.get_map(
        "p", "e", "net", "ov", "lay", "mod", "mv", frequency="daily", season="spring"
    )
    assert out[0]["daily"] == {"spring": {"x": 1}}
    assert "junk" not in out[0]


def test_map_time_dimension(tmpdb):
    tmpdb.put_map([{"t": "with"}], "p", "e", "n", "o", "l", "m", "v", time="2024")
    tmpdb.put_map([{"t": "without"}], "p", "e", "n", "o", "l", "m", "v")
    assert tmpdb.get_map("p", "e", "n", "o", "l", "m", "v", time="2024") == [
        {"t": "with"}
    ]
    assert tmpdb.get_map("p", "e", "n", "o", "l", "m", "v") == [{"t": "without"}]


def test_contour_dual_layout(tmpdb):
    tmpdb.put_contour({"ts1": {"merged": True}}, "p", "e", "ov", "mod")
    tmpdb.put(
        {"split": True},
        Route.CONTOUR_TIMESPLIT,
        {"project": "p", "experiment": "e", "obsvar": "ov", "model": "mod",
         "timestep": "ts2"},
    )
    assert tmpdb.get_contour("p", "e", "ov", "mod", timestep="ts1") == {"merged": True}
    assert tmpdb.get_contour("p", "e", "ov", "mod", timestep="ts2") == {"split": True}


def test_models_style_fallback(tmpdb):
    tmpdb.put_models_style({"lvl": "project"}, "p")
    tmpdb.put_models_style({"lvl": "experiment"}, "p", "e")
    assert tmpdb.get_models_style("p") == {"lvl": "project"}
    assert tmpdb.get_models_style("p", experiment="e") == {"lvl": "experiment"}
    assert tmpdb.get_models_style("p", experiment="other") == {"lvl": "project"}


# --- URI access -----------------------------------------------------------

def test_uri_roundtrip(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put({"path": "cfg"}, Route.CONFIG, args)
    uri = tmpdb.get(Route.CONFIG, args, access_type=AccessType.URI)
    assert tmpdb.get_by_uri(uri) == {"path": "cfg"}
    tmpdb.put_by_uri({"path": "cfg2"}, uri)
    assert tmpdb.get_by_uri(uri) == {"path": "cfg2"}


# --- catalog --------------------------------------------------------------

def _populate(db: AerovalSparkDB):
    db.put_config({"c": 1}, "proj", "exp1")
    db.put_config({"c": 2}, "proj", "exp2")
    db.put_timeseries({"t": 1}, "proj", "exp1", "loc", "net", "ov", "lay")
    db.put_glob_stats(GLOB, "proj", "exp1", "monthly")
    db.put_experiments({"exp1": {}}, "proj")
    db.put_report_image(PNG, "proj", "exp1", "img/pixel.png")


def test_query_and_lists(tmpdb):
    _populate(tmpdb)
    assert len(tmpdb.list_all()) == 6
    assert len(tmpdb.query(Route.CONFIG)) == 2
    assert len(tmpdb.query(Route.CONFIG, experiment="exp1")) == 1
    assert tmpdb.list_timeseries("proj", "exp1") == [
        "/v0/ts/proj/exp1/loc/net/ov/lay"
    ]
    assert tmpdb.list_glob_stats("proj", "exp1") == [
        "/v0/heatmap/proj/exp1/monthly"
    ]
    entry = tmpdb.query(Route.CONFIG, experiment="exp1")[0]
    assert entry.meta["project"] == "proj"
    assert str(entry) == entry.uri


def test_query_after_flush(tmpdb):
    _populate(tmpdb)
    tmpdb.flush()
    assert len(tmpdb.list_all()) == 6


def test_rm_experiment_data(tmpdb):
    _populate(tmpdb)
    tmpdb.rm_experiment_data("proj", "exp1")
    uris = tmpdb.list_all()
    assert "/v0/config/proj/exp2" in uris
    assert all("exp1" not in u for u in uris if "experiments" not in u)
    # experiments doc (project-level) survives
    assert tmpdb.get_experiments("proj") == {"exp1": {}}


def test_rm_by_uri(tmpdb):
    tmpdb.put_config({"c": 1}, "proj", "exp1")
    tmpdb.rm_by_uri("/v0/config/proj/exp1")
    with pytest.raises(FileNotFoundError):
        tmpdb.get_config("proj", "exp1")
    tmpdb.flush()
    with pytest.raises(FileNotFoundError):
        tmpdb.get_config("proj", "exp1")


def test_rm_filtered_endpoint_refused(tmpdb):
    with pytest.raises(ValueError):
        tmpdb.rm_by_uri("/v0/heatmap/p/e/monthly")


def test_list_experiments(tmpdb):
    _populate(tmpdb)
    assert tmpdb.list_experiments("proj") == ["exp1", "exp2"]
    # has_results: exp2 only has a config asset
    assert tmpdb.list_experiments("proj", has_results=True) == ["exp1"]


def test_get_experiment_mtime(tmpdb):
    tmpdb.put_config({"c": 1}, "proj", "exp1")
    assert isinstance(
        tmpdb.get_experiment_mtime("proj", "exp1"), datetime.datetime
    )


# --- binary assets --------------------------------------------------------

@pytest.mark.parametrize("blob", [PNG, JPEG], ids=["png", "jpeg"])
def test_image_roundtrip(tmpdb, blob):
    tmpdb.put_report_image(blob, "p", "e", "img/pixel")
    assert tmpdb.get_report_image("p", "e", "img/pixel") == blob
    tmpdb.flush()
    assert (
        tmpdb.get_report_image("p", "e", "img/pixel", access_type=AccessType.BLOB)
        == blob
    )


def test_map_overlay_roundtrip(tmpdb):
    tmpdb.put_map_overlay(PNG, "p", "e", "src", "var", "2024")
    assert tmpdb.get_map_overlay("p", "e", "src", "var", "2024") == PNG
    uri = "/v0/map-overlay/p/e/src/var/2024"
    assert tmpdb.get_by_uri(uri) == PNG


def test_blob_access_on_json_route_rejected(tmpdb):
    from aerovaldb_spark.exceptions import UnsupportedOperation

    tmpdb.put_config({"c": 1}, "p", "e")
    with pytest.raises(UnsupportedOperation):
        tmpdb.get_config("p", "e", access_type=AccessType.BLOB)


# --- copy -----------------------------------------------------------------

def test_copy_db_contents(spark, tmp_path):
    src = AerovalSparkDB(spark, str(tmp_path / "src"))
    dst = AerovalSparkDB(spark, str(tmp_path / "dst"))
    _populate(src)
    copy_db_contents(src, dst)
    assert sorted(dst.list_all()) == sorted(src.list_all())
    assert dst.get_config("proj", "exp1") == {"c": 1}
    assert dst.get_report_image("proj", "exp1", "img/pixel.png") == PNG


def test_copy_to_nonempty_raises(spark, tmp_path):
    src = AerovalSparkDB(spark, str(tmp_path / "src2"))
    dst = AerovalSparkDB(spark, str(tmp_path / "dst2"))
    _populate(src)
    dst.put_config({"x": 1}, "other", "exp")
    with pytest.raises(ValueError):
        copy_db_contents(src, dst)


# --- compaction / open ----------------------------------------------------

def test_compact_preserves_state(tmpdb):
    args = _args_for(Route.CONFIG)
    tmpdb.put({"v": 1}, Route.CONFIG, args)
    tmpdb.flush()
    c1 = tmpdb.get(Route.CONFIG, args, access_type=AccessType.CTIME)
    tmpdb.put({"v": 2}, Route.CONFIG, args)
    tmpdb.put_config({"other": 1}, "p2", "e2")
    tmpdb.rm_by_uri("/v0/config/p2/e2")
    tmpdb.compact()
    assert tmpdb.get(Route.CONFIG, args) == {"v": 2}
    assert tmpdb.get(Route.CONFIG, args, access_type=AccessType.CTIME) == c1
    with pytest.raises(FileNotFoundError):
        tmpdb.get_config("p2", "e2")


def test_maintain_compacts_micro_flush_litter(tmpdb):
    """The store's maintenance triangle (r13): litter a store with
    micro-flushes, maintain() runs recover → measured verdict →
    compact; live state and snapshot-horizon semantics are preserved,
    and a second pass finds nothing to do."""
    for i in range(10):
        tmpdb.put_config({"v": i}, "proj", "e1")
        tmpdb.flush()
    frag = tmpdb.fragmentation()
    assert frag["datasets"]["config"]["n_files"] >= 10
    out = tmpdb.maintain(max_files_per_dir=4)
    assert out["fsck"]["ok"]
    assert out["compact_verdict"].rebuild and out["compacted"]
    # live state preserved through the fold
    assert tmpdb.get_config("proj", "e1") == {"v": 9}
    # compaction raised the horizon: pre-fold states are LOUDLY gone,
    # at/above the horizon snapshot/changes still work
    horizon = tmpdb.min_snapshot_seq()
    assert horizon > 0
    with pytest.raises(ValueError, match="compaction horizon"):
        tmpdb.changes(0)
    snap = tmpdb.snapshot(horizon)
    assert snap.get_by_uri("/v0/config/proj/e1") == {"v": 9}
    tmpdb.put_config({"v": 10}, "proj", "e1")
    tmpdb.flush()
    assert snap.get_by_uri("/v0/config/proj/e1") == {"v": 9}
    assert {c["op"] for c in tmpdb.changes(horizon)} == {"upsert"}
    # idempotent: the fold removed the litter, verdict stays quiet
    out2 = tmpdb.maintain(max_files_per_dir=4)
    assert not out2["compacted"] and not out2["compact_verdict"].rebuild


def test_open_dispatch(spark, tmp_path):
    import aerovaldb_spark

    db = aerovaldb_spark.open(f"spark:{tmp_path}/od", spark=spark)
    db.put_config({"c": 1}, "p", "e")
    assert db.get_config("p", "e") == {"c": 1}
    mem = aerovaldb_spark.open(":memory:", spark=spark)
    mem.put_config({"m": 1}, "p", "e")
    assert mem.get_config("p", "e") == {"m": 1}
    bare = aerovaldb_spark.open(str(tmp_path / "bare"), spark=spark)
    assert isinstance(bare, aerovaldb_spark.AerovalSparkDB)


def test_open_unknown_engine_raises(spark, tmp_path):
    """A typo'd 'engine:path' resource fails AT OPEN (reference
    plugins.py:99 KeyError), not at first flush; real Hadoop
    filesystem URIs still route to the spark backend as paths."""
    import aerovaldb_spark

    with pytest.raises(KeyError, match="unknown engine 'spark-parquet'"):
        aerovaldb_spark.open(f"spark-parquet:{tmp_path}/x", spark=spark)
    # URI-style and file: paths pass through to Spark
    db = aerovaldb_spark.open(f"file:{tmp_path}/fs", spark=spark)
    db.put_config({"c": 2}, "p", "e")
    assert db.get_config("p", "e") == {"c": 2}
    # colon inside a directory name is a path, not an engine selector
    sub = tmp_path / "a:b"
    db2 = aerovaldb_spark.open(f"{sub}/store", spark=spark)
    assert isinstance(db2, aerovaldb_spark.AerovalSparkDB)


def test_sql_over_catalog(tmpdb):
    _populate(tmpdb)
    views = tmpdb.register_views()
    assert "avdb_config" in views
    n = tmpdb.spark.sql(
        "SELECT count(*) AS n FROM avdb_config WHERE project = 'proj'"
    ).collect()[0]["n"]
    assert n == 2


def test_materialize_contour_timesplit(tmpdb):
    tmpdb.put_contour({"t1": {"a": 1}, "t2": {"b": 2}}, "p", "e", "ov", "m1")
    tmpdb.put_contour({"t3": {"c": 3}}, "p", "e", "ov", "m2")
    n = tmpdb.materialize_contour_timesplit()
    assert n == 3
    # per-timestep assets now readable directly, even after the merged
    # docs are deleted
    tmpdb.rm_by_uri("/v0/contour/p/e/ov/m1")
    assert tmpdb.get(
        Route.CONTOUR_TIMESPLIT,
        {"project": "p", "experiment": "e", "obsvar": "ov", "model": "m1",
         "timestep": "t2"},
    ) == {"b": 2}
    # dual-layout getter falls back to the split rows
    assert tmpdb.get_contour("p", "e", "ov", "m1", timestep="t1") == {"a": 1}


def test_heatmap_json_str_access(tmpdb):
    tmpdb.put_glob_stats(GLOB, "p", "e", "m")
    s = tmpdb.get_heatmap(
        "p", "e", "m", region="regA", time="2020", access_type=AccessType.JSON_STR
    )
    import json

    assert json.loads(s)["var1"]["net1"]["lay1"]["mod1"]["mv1"]["regA"] == {
        "2020": {"bias": 0.5}
    }


def test_unused_arguments_rejected(tmpdb):
    from aerovaldb_spark.exceptions import UnusedArguments

    tmpdb.put_config({"c": 1}, "p", "e")
    with pytest.raises(UnusedArguments):
        tmpdb.get_config("p", "e", bogus_kwarg="x")
    with pytest.raises(UnusedArguments):
        tmpdb.put_timeseries({"t": 1}, "p", "e", "l", "n", "o", "la", nope=1)


def test_open_json_files_scheme(spark, tmp_path, monkeypatch):
    import os

    if not os.path.isdir("/root/reference/tests/test-db/json"):
        pytest.skip("reference test-db not present")
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    import aerovaldb_spark

    db = aerovaldb_spark.open(
        "json_files:/root/reference/tests/test-db/json", spark=spark
    )
    assert db.get_config("project", "experiment")["path"] == "./project/experiment/"
    # reopening hits the cached import (no re-walk)
    db2 = aerovaldb_spark.open(
        "json_files:/root/reference/tests/test-db/json", spark=spark
    )
    assert len(db2.list_all()) == len(db.list_all()) > 0
    tempfile.tempdir = None


def test_json_files_live_view(spark, tmp_path, monkeypatch):
    """Reference jsonfiledb reads the tree live on every access
    (jsonfiledb.py:199-222): files written/changed/removed AFTER open()
    must be visible. The Spark backend mirrors incrementally on access."""
    import json
    import os
    import shutil

    src = "/root/reference/tests/test-db/json"
    if not os.path.isdir(src):
        pytest.skip("reference test-db not present")
    tree = tmp_path / "tree"
    shutil.copytree(src, tree)
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    import aerovaldb_spark

    db = aerovaldb_spark.open(f"json_files:{tree}", spark=spark)
    cfg_file = tree / "project" / "experiment" / "cfg_project_experiment.json"
    assert db.get_config("project", "experiment")["path"] == "./project/experiment/"

    # mutate after open: changed file content is visible on next read
    cfg = json.loads(cfg_file.read_text())
    cfg["path"] = "./mutated/"
    cfg_file.write_text(json.dumps(cfg))
    os.utime(cfg_file, ns=(os.stat(cfg_file).st_mtime_ns + 2_000_000_000,) * 2)
    assert db.get_config("project", "experiment")["path"] == "./mutated/"

    # a SECOND connection to the same tree sees the same mirror
    db2 = aerovaldb_spark.open(f"json_files:{tree}", spark=spark)
    assert db2.get_config("project", "experiment")["path"] == "./mutated/"

    # deletion after open: the asset disappears from reads (explicit
    # default=None means NO default by reference parity — it raises)
    cfg_file.unlink()
    with pytest.raises(FileNotFoundError):
        db.get_config("project", "experiment")
    tempfile.tempdir = None


def test_json_files_version_override(spark, tmp_path, monkeypatch):
    """`json_files:/tree?version=X` pins the layout version for every
    file — the mixed-version escape hatch (reference StringMapper
    ``version=`` lookup). The same ambiguous filename binds different
    args under different versions."""
    import json
    import os

    tree = tmp_path / "vtree"
    ts_dir = tree / "p" / "e" / "ts"
    os.makedirs(ts_dir)
    # ambiguous under pre/post-0.29 layouts:
    #   new: {location}_{network}_{obsvar}_{layer} -> NET-A / B / LAYER
    #   old: {location}_{network}-{obsvar}_{layer} -> NET / A / B_LAYER
    (ts_dir / "LOC_NET-A_B_LAYER.json").write_text(json.dumps({"v": 1}))
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    import aerovaldb_spark

    db_new = aerovaldb_spark.open(f"json_files:{tree}", spark=spark)
    assert db_new.get_timeseries("p", "e", "LOC", "NET-A", "B", "LAYER") == {"v": 1}

    db_old = aerovaldb_spark.open(f"json_files:{tree}?version=0.13.0", spark=spark)
    assert db_old.get_timeseries("p", "e", "LOC", "NET", "A", "B_LAYER") == {"v": 1}
    tempfile.tempdir = None


def test_open_bare_jsondb_tree_sniffed(spark, tmp_path, monkeypatch):
    import os

    if not os.path.isdir("/root/reference/tests/test-db/json"):
        pytest.skip("reference test-db not present")
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    import aerovaldb_spark

    db = aerovaldb_spark.open("/root/reference/tests/test-db/json", spark=spark)
    assert db.get_config("project", "experiment")["exp_info"]["pyaerocom_version"]
    tempfile.tempdir = None


def test_copy_db_contents_duck_typed_backend(tmpdb, spark, tmp_path):
    """The generic interchange path: copy to/from any object with
    list_all/get_by_uri/put_by_uri (reference extending-aerovaldb
    bootstrap recipe)."""
    from aerovaldb_spark.db import AerovalSparkDB, copy_db_contents

    class InMemoryDB:
        def __init__(self):
            self.store: dict[str, object] = {}

        def list_all(self):
            return list(self.store)

        def get_by_uri(self, uri, access_type=None, **kw):
            return self.store[uri]

        def put_by_uri(self, obj, uri):
            self.store[uri] = obj

    tmpdb.put_config({"c": 1}, "p", "e")
    tmpdb.put_report_image(b"\x89PNG\r\n\x1a\nx", "p", "e", "img.png")
    tmpdb.flush()

    mem = InMemoryDB()
    copy_db_contents(tmpdb, mem)
    assert len(mem.store) == 2
    # JSON assets arrive as raw JSON strings, blobs as bytes
    assert '"c": 1' in mem.store["/v0/config/p/e"]
    assert bytes(mem.store["/v0/report-image/p/e/img.png"]).startswith(b"\x89PNG")

    back = AerovalSparkDB(spark, str(tmp_path / "back"))
    copy_db_contents(mem, back)
    assert back.get_config("p", "e") == {"c": 1}


def test_cross_process_read_freshness(spark, tmp_path):
    """A second db instance on the same root sees another writer's
    flushed data on the next read, with no manual refresh() — the
    Spark analog of the reference's mtime-validated caches
    (jsondb/cache.py:114-264, tests/jsondb/test_cache.py:100-149)."""
    from aerovaldb_spark.db import AerovalSparkDB

    writer = AerovalSparkDB(spark, str(tmp_path / "db"))
    reader = AerovalSparkDB(spark, str(tmp_path / "db"))

    writer.put_config({"v": 1}, "p", "e")
    writer.flush()
    assert reader.get_config("p", "e") == {"v": 1}

    # update becomes visible after the reader has a warm cache
    writer.put_config({"v": 2}, "p", "e")
    writer.flush()
    assert reader.get_config("p", "e") == {"v": 2}

    # deletes propagate too (tombstone append)
    writer.rm_by_uri("/v0/config/p/e")
    writer.flush()
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        reader.get_config("p", "e")

    # and full-table rewrites (directory swap)
    writer.put_config({"v": 3}, "p", "e")
    writer.flush()
    assert reader.get_config("p", "e") == {"v": 3}
    writer.compact()
    assert reader.get_config("p", "e") == {"v": 3}


def test_entry_point_engine_discovery(spark, tmp_path, monkeypatch):
    """A third-party backend installed with an entry point in group
    'aerovaldb_spark' is discoverable by list_engines() and usable by
    open() — the reference's plugin mechanism (plugins.py:30-45).
    Exercised end-to-end with a real dist-info on sys.path."""
    import sys

    from aerovaldb_spark import plugins

    site = tmp_path / "site"
    dist = site / "dummy_backend-1.0.dist-info"
    dist.mkdir(parents=True)
    (dist / "METADATA").write_text("Metadata-Version: 2.1\nName: dummy-backend\nVersion: 1.0\n")
    (dist / "entry_points.txt").write_text(
        "[aerovaldb_spark]\ndummy = dummy_backend_mod:open_dummy\n"
    )
    (site / "dummy_backend_mod.py").write_text(
        "def open_dummy(path, spark=None):\n"
        "    return ('dummy-engine', path)\n"
    )
    monkeypatch.syspath_prepend(str(site))

    engines = plugins.list_engines()
    assert "dummy" in engines
    assert set(plugins.ENGINES) <= set(engines)  # built-ins still present
    assert plugins.open("dummy:/some/where") == ("dummy-engine", "/some/where")

    sys.modules.pop("dummy_backend_mod", None)


def test_copy_cli_main(spark, tmp_path, monkeypatch):
    """python -m aerovaldb_spark.copy <src> <dst> (reference aerovaldbcp)."""
    import sys

    from aerovaldb_spark.copy import main
    from aerovaldb_spark.db import AerovalSparkDB

    src = AerovalSparkDB(spark, str(tmp_path / "src"))
    src.put_config({"v": 1}, "p", "e")
    src.flush()

    monkeypatch.setattr(
        sys, "argv",
        ["aerovaldbcp-spark", f"spark:{tmp_path / 'src'}", f"spark:{tmp_path / 'dst'}"],
    )
    main()
    dst = AerovalSparkDB(spark, str(tmp_path / "dst"))
    assert dst.get_config("p", "e") == {"v": 1}


def test_transact_sequential_and_conflict_retry(spark, tmp_path):
    """Optimistic commit (lock-free): sequential transacts both land;
    a commit landing between a transact's read and its commit forces
    an abort + re-run of the read-modify-write, so no update is lost."""
    from aerovaldb_spark.db import AerovalSparkDB

    root = str(tmp_path / "db")
    db1 = AerovalSparkDB(spark, root)
    db2 = AerovalSparkDB(spark, root)

    def bump(db):
        cur = db.get_config("p", "e", default={"counter": 0})["counter"]
        db.put_config({"counter": cur + 1}, "p", "e")

    db1.transact(bump)
    db2.transact(bump)
    db1.refresh()
    assert db1.get_config("p", "e")["counter"] == 2

    # interference: db2 commits during db1's first attempt -> db1 must
    # detect the conflict, discard, and re-run bump on fresh state
    attempts = {"n": 0}

    def bump_with_interference(db):
        attempts["n"] += 1
        if attempts["n"] == 1:
            db2.refresh()
            db2.transact(bump)
        bump(db)

    db1.transact(bump_with_interference)
    assert attempts["n"] == 2  # first attempt aborted on conflict
    db1.refresh()
    assert db1.get_config("p", "e")["counter"] == 4

    # claim ledger: every claim resolved, exactly one aborted (the
    # conflicted first attempt), committed seq chain strictly increases
    metas = [db1._read_claim(n) for n in db1._scan_claim_numbers()]
    assert all(m is not None for m in metas)
    assert sum(m["status"] == "aborted" for m in metas) == 1
    seqs = [m["max_seq"] for m in metas if m["status"] == "committed"]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


def test_query_iter_matches_query_and_bounds(tmpdb):
    """query_iter streams the same entries query() materializes — all
    key-column predicates pushed into the plan — and `limit` caps both
    the yielded count and the per-route plan (LIMIT node)."""
    _populate(tmpdb)
    tmpdb.flush()

    full = sorted(e.uri for e in tmpdb.query())
    streamed = sorted(e.uri for e in tmpdb.query_iter())
    assert streamed == full and len(full) == 6

    a = sorted(e.uri for e in tmpdb.query(Route.CONFIG, experiment="exp1"))
    b = sorted(e.uri for e in tmpdb.query_iter(Route.CONFIG, experiment="exp1"))
    assert a == b and len(a) == 1

    # limit: generator stops early and never yields more than asked
    it = tmpdb.query_iter(limit=2)
    got = list(it)
    assert len(got) == 2
    assert {e.uri for e in got} <= set(full)

    # predicate on a column the route lacks -> no match, no error
    assert list(tmpdb.query_iter(Route.CONFIG, network="nope")) == []

    # query(limit=) caps the materialized list the same way
    capped = tmpdb.query(limit=2)
    assert len(capped) == 2 and {e.uri for e in capped} <= set(full)
    assert sorted(e.uri for e in tmpdb.query(limit=100)) == full

    # a STRING limit is a meta equality predicate (reference routes
    # every kwarg to meta), not a row cap — no entry has
    # meta["limit"], so both paths return nothing rather than capping
    assert tmpdb.query(limit="5") == []
    assert list(tmpdb.query_iter(limit="5")) == []


def test_snapshot_time_travel(tmpdb):
    """Every historical state of the append-log is a seq filter:
    snapshots taken between writes keep returning their epoch's
    payloads and catalog after later puts, overwrites, and deletes."""
    tmpdb.put_config({"v": 1}, "proj", "exp1")
    tmpdb.flush()
    s1 = tmpdb.current_seq()
    assert s1 > 0

    tmpdb.put_config({"v": 2}, "proj", "exp1")  # overwrite
    tmpdb.put_config({"v": 9}, "proj", "exp2")  # new asset
    tmpdb.flush()
    s2 = tmpdb.current_seq()
    assert s2 > s1

    tmpdb.rm_by_uri("/v0/config/proj/exp1")  # delete in the present

    # live state: exp1 gone, exp2 at v=9
    assert tmpdb.get_config("proj", "exp2") == {"v": 9}

    snap1 = tmpdb.snapshot(s1)
    assert snap1.get(Route.CONFIG, {"project": "proj", "experiment": "exp1"}) == {"v": 1}
    assert snap1.get_by_uri("/v0/config/proj/exp1") == {"v": 1}
    assert [e.uri for e in snap1.query(Route.CONFIG)] == ["/v0/config/proj/exp1"]

    snap2 = tmpdb.snapshot(s2)
    assert snap2.get_by_uri("/v0/config/proj/exp1") == {"v": 2}
    assert sorted(e.uri for e in snap2.query(Route.CONFIG)) == [
        "/v0/config/proj/exp1",
        "/v0/config/proj/exp2",
    ]
    assert sorted(snap2.list_all()) == sorted(e.uri for e in snap2.query())

    # before everything: empty catalog, reads raise
    snap0 = tmpdb.snapshot(0)
    assert snap0.query(Route.CONFIG) == []
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="as of seq"):
        snap0.get_by_uri("/v0/config/proj/exp1")

    # raw access returns the stored JSON string verbatim
    assert snap1.get_by_uri("/v0/config/proj/exp1", raw=True) == '{"v": 1}'


def test_changes_cdc_feed(tmpdb):
    """changes(s1, s2) reports the NET op per key in the window:
    intermediate rewrites collapse, deletes surface as 'delete', and
    untouched keys stay out."""
    tmpdb.put_config({"v": 1}, "proj", "e1")
    tmpdb.put_config({"v": 1}, "proj", "e2")
    tmpdb.flush()
    s1 = tmpdb.current_seq()

    tmpdb.put_config({"v": 2}, "proj", "e1")  # rewrite...
    tmpdb.put_config({"v": 3}, "proj", "e1")  # ...twice (collapses)
    tmpdb.put_config({"v": 1}, "proj", "e3")  # new
    tmpdb.flush()
    tmpdb.rm_by_uri("/v0/config/proj/e2")  # delete (flushes)
    s2 = tmpdb.current_seq()

    ch = {c["uri"]: c["op"] for c in tmpdb.changes(s1, s2)}
    assert ch == {
        "/v0/config/proj/e1": "upsert",
        "/v0/config/proj/e3": "upsert",
        "/v0/config/proj/e2": "delete",
    }
    # seqs are within the window and ordered
    seqs = [c["seq"] for c in tmpdb.changes(s1, s2)]
    assert seqs == sorted(seqs) and all(s1 < s <= s2 for s in seqs)
    # empty window -> no changes
    assert tmpdb.changes(s2) == []


def test_compaction_raises_snapshot_horizon(tmpdb):
    """Compaction folds away superseded rows and tombstones, so states
    beneath the pre-compaction head must become LOUDLY unreachable —
    not silently wrong — while newer snapshots stay faithful."""
    import pytest as _pytest

    tmpdb.put_config({"v": 1}, "proj", "e1")
    tmpdb.flush()
    s1 = tmpdb.current_seq()
    tmpdb.put_config({"v": 2}, "proj", "e1")
    tmpdb.flush()

    assert tmpdb.min_snapshot_seq() == 0
    assert tmpdb.snapshot(s1).get_by_uri("/v0/config/proj/e1") == {"v": 1}

    tmpdb.compact()
    horizon = tmpdb.min_snapshot_seq()
    assert horizon >= s1

    with _pytest.raises(ValueError, match="compaction horizon"):
        tmpdb.snapshot(s1)
    with _pytest.raises(ValueError, match="compaction horizon"):
        tmpdb.changes(0)

    # at/above the horizon everything still works, including across
    # NEW writes after compaction
    assert tmpdb.snapshot(horizon).get_by_uri("/v0/config/proj/e1") == {"v": 2}
    tmpdb.put_config({"v": 3}, "proj", "e1")
    tmpdb.flush()
    assert tmpdb.snapshot(horizon).get_by_uri("/v0/config/proj/e1") == {"v": 2}
    assert {c["op"] for c in tmpdb.changes(horizon)} == {"upsert"}
    assert tmpdb.get_config("proj", "e1") == {"v": 3}


def test_db_normalizes_session_timezone(spark, tmp_path):
    """AerovalSparkDB self-applies UTC (the catalog/streaming
    convention) so the arrow small-flush path (pins tz-UTC micros) and
    the Spark fallback writer (reads naive datetimes in session tz)
    record the same instants under ANY caller session."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        db = AerovalSparkDB(spark, str(tmp_path / "tzdb"))
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # a write through the small-flush path followed by a read
        # yields an mtime within clock slop of now-UTC
        db.put_config({"a": 1}, "proj", "exp")
        db.flush()
        import datetime as _dt

        mt = db.get_experiment_mtime("proj", "exp")
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        assert abs((now - mt).total_seconds()) < 300, mt
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
