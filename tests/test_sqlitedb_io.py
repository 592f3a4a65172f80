"""Reference-sqlite interchange tests: export → file structure →
re-import round trip, plus legacy version-variant tables."""

from __future__ import annotations

import os
import sqlite3

import pytest

from aerovaldb_spark.routes import Route
from aerovaldb_spark.sources.sqlitedb_io import (
    export_sqlite_db,
    import_sqlite_db,
    is_aerovaldb_sqlite,
)


@pytest.fixture()
def populated(tmpdb):
    tmpdb.put_config({"exp_info": {"pyaerocom_version": "0.30.0"}}, "proj", "exp")
    tmpdb.put_glob_stats({"model": {"od": {"Surface": 1.5}}}, "proj", "exp", "monthly")
    tmpdb.put_timeseries({"v": [1, 2]}, "proj", "exp", "loc", "net", "od", "Sfc")
    tmpdb.put_map({"m": 1}, "proj", "exp", "net", "od", "Sfc", "mod", "mv", "2010")
    tmpdb.put_heatmap_timeseries({"h": 1}, "proj", "exp", "EU", "net", "od", "Sfc")
    tmpdb.put_models_style({"mod": {"color": "red"}}, "proj")
    tmpdb.put_models_style({"mod": {"color": "blue"}}, "proj", experiment="exp")
    tmpdb.put_report_image(b"\x89PNG\r\n\x1a\nimg", "proj", "exp", "pic.png")
    return tmpdb


def test_export_reference_layout(populated, tmp_path):
    dbfile = str(tmp_path / "out.sqlite")
    counts = export_sqlite_db(populated, dbfile)
    assert counts["map0"] == 1 and counts["reportimages"] == 1
    # project-level vs experiment-level styles land in separate variant
    # tables (the reference's PriorityMapper looks them up there)
    assert counts["models_style1"] == 1 and counts["models_style0"] == 1

    con = sqlite3.connect(dbfile)
    row = con.execute(
        "SELECT project, experiment, network, obsvar, layer, model, modvar, time, json "
        "FROM map0"
    ).fetchone()
    assert row == ("proj", "exp", "net", "od", "Sfc", "mod", "mv", "2010", '{"m": 1}')
    blob = con.execute("SELECT blob FROM reportimages").fetchone()[0]
    assert bytes(blob).startswith(b"\x89PNG")
    hm = con.execute(
        "SELECT region, network, obsvar, layer FROM heatmap_timeseries0"
    ).fetchone()
    assert hm == ("EU", "net", "od", "Sfc")
    mtime = con.execute("SELECT mtime FROM config").fetchone()[0]
    assert len(mtime) == 19  # reference SQLITE_TIMESTAMP_FORMAT shape
    con.close()
    assert is_aerovaldb_sqlite(dbfile)


def test_roundtrip_through_sqlite(populated, spark, tmp_path):
    from aerovaldb_spark.db import AerovalSparkDB

    dbfile = str(tmp_path / "mid.sqlite")
    export_sqlite_db(populated, dbfile)
    db2 = AerovalSparkDB(spark, str(tmp_path / "db2"))
    report = import_sqlite_db(db2, dbfile)
    assert report.imported == 8 and not report.skipped

    assert db2.get_config("proj", "exp") == {"exp_info": {"pyaerocom_version": "0.30.0"}}
    assert db2.get_map("proj", "exp", "net", "od", "Sfc", "mod", "mv", "2010") == {"m": 1}
    assert db2.get_heatmap_timeseries("proj", "exp", "EU", "net", "od", "Sfc") == {"h": 1}
    assert db2.get_models_style("proj") == {"mod": {"color": "red"}}
    assert db2.get_models_style("proj", experiment="exp") == {"mod": {"color": "blue"}}
    img = db2.get(Route.REPORT_IMAGE, {"project": "proj", "experiment": "exp", "path": "pic.png"},
                  access_type="BLOB")
    assert bytes(img).startswith(b"\x89PNG")


def test_import_legacy_variant_tables(spark, tmp_path, tmpdb):
    """map1 (pre-0.13.2: no time column) rows import with time NULL."""
    from aerovaldb_spark.sources.sqlitedb_io import _init_sqlite

    dbfile = str(tmp_path / "legacy.sqlite")
    con = sqlite3.connect(dbfile)
    _init_sqlite(con)
    con.execute(
        "INSERT OR REPLACE INTO metadata(key, value) VALUES('created_by', 'aerovaldb_0.1.0')"
    )
    con.execute(
        "INSERT INTO map1(project, experiment, network, obsvar, layer, model, modvar, json) "
        "VALUES('p', 'e', 'n', 'o', 'l', 'm', 'mv', '{\"legacy\": true}')"
    )
    con.execute(
        "INSERT INTO heatmap_timeseries2(project, experiment, json) "
        "VALUES('p', 'e', '{\"old\": 1}')"
    )
    con.commit()
    con.close()

    report = import_sqlite_db(tmpdb, dbfile)
    assert report.by_route == {"MAP": 1, "HEATMAP_TIMESERIES": 1}
    assert tmpdb.get_map("p", "e", "n", "o", "l", "m", "mv") == {"legacy": True}
    assert tmpdb.get_heatmap_timeseries("p", "e") == {"old": 1}


def test_import_rejects_foreign_sqlite(tmp_path, tmpdb):
    dbfile = str(tmp_path / "foreign.sqlite")
    con = sqlite3.connect(dbfile)
    con.execute("CREATE TABLE t(x)")
    con.commit()
    con.close()
    assert not is_aerovaldb_sqlite(dbfile)
    with pytest.raises(ValueError):
        import_sqlite_db(tmpdb, dbfile)


def test_open_dispatches_sqlite(populated, spark, tmp_path):
    """Bare-path .sqlite and the sqlitedb: scheme import via open()."""
    import shutil

    from aerovaldb_spark.plugins import open as avdb_open

    dbfile = str(tmp_path / "store.sqlite")
    export_sqlite_db(populated, dbfile)
    # the shim caches by absolute path — make sure this run is fresh
    import tempfile as _tf
    cache_root = os.path.join(_tf.gettempdir(), "aerovaldb-spark-imports")
    shutil.rmtree(cache_root, ignore_errors=True)

    db = avdb_open(dbfile, spark=spark)
    assert db.get_config("proj", "exp") == {"exp_info": {"pyaerocom_version": "0.30.0"}}
    db2 = avdb_open(f"sqlitedb:{dbfile}", spark=spark)
    assert db2.get_map("proj", "exp", "net", "od", "Sfc", "mod", "mv", "2010") == {"m": 1}
