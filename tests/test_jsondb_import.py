"""Legacy jsondb import against the reference's golden test database
(read-only at /root/reference/tests/test-db/json; 50 assets —
reference asserts the count at tests/test_aerovaldb.py:512-516)."""

from __future__ import annotations

import os

import pytest

from aerovaldb_spark.routes import Route
from aerovaldb_spark.sources import import_jsondb_tree

TESTDB = "/root/reference/tests/test-db/json"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDB), reason="reference test-db not present"
)


@pytest.fixture(scope="module")
def imported(spark, tmp_path_factory):
    from aerovaldb_spark.db import AerovalSparkDB

    db = AerovalSparkDB(spark, str(tmp_path_factory.mktemp("imp") / "db"))
    report = import_jsondb_tree(db, TESTDB)
    return db, report


def test_import_coverage(imported):
    db, report = imported
    # 50 assets in the golden tree; the deliberately-invalid JSON file
    # is importable as raw text (we store verbatim), so only genuinely
    # unmappable paths may be skipped.
    assert report.imported >= 45, (report.imported, report.skipped)
    assert report.imported + len(report.skipped) >= 50


def test_imported_config_readable(imported):
    db, _ = imported
    cfg = db.get_config("project", "experiment")
    assert cfg["path"] == "./project/experiment/"
    assert cfg["exp_info"]["pyaerocom_version"] == "0.13.5"


def test_imported_glob_stats_and_heatmap(imported):
    db, _ = imported
    gs = db.get_glob_stats("project", "experiment", "frequency")
    assert gs["path"] == "./project/experiment/hm/"
    regional = db.get_regional_stats(
        "project", "experiment", "frequency",
        variable="variable", network="network", layer="layer",
    )
    assert regional == {"path": "./project/experiment/hm/regional_stats"}


def test_imported_legacy_experiment_version_routing(imported):
    db, report = imported
    # experiment-old was written by pyaerocom 0.0.5 → legacy filename
    # layouts; version-aware template choice must still map it.
    cfg = db.get_config("project", "experiment-old")
    assert cfg["exp_info"]["pyaerocom_version"] == "0.0.5"


def test_imported_contour_both_layouts(imported):
    db, _ = imported
    merged = db.get_contour("project", "experiment", "modvar", "model")
    assert "timestep2" in merged
    # per-timestep split file
    split = db.get_contour("project", "experiment", "modvar", "model",
                           timestep="timestep")
    assert split == {"path": "748956457892"}
    # timestep present only in the merged doc
    t2 = db.get_contour("project", "experiment", "modvar", "model",
                        timestep="timestep2")
    assert t2 == {"path": "2758924570298570"}


def test_imported_report_images(imported):
    db, _ = imported
    entries = db.query(Route.REPORT_IMAGE)
    assert len(entries) >= 6  # pixel.{avif,gif,jpeg,jpg,png,webp}
    blob = db.get_by_uri(entries[0].uri)
    assert isinstance(blob, bytes) and len(blob) > 0


def test_imported_map_overlay(imported):
    db, _ = imported
    entries = db.query(Route.MAP_OVERLAY)
    assert len(entries) >= 1
    assert db.get_by_uri(entries[0].uri)[:4] == b"\x89PNG"


def test_imported_models_style_fallback(imported):
    db, _ = imported
    proj = db.get_models_style("project")
    exp = db.get_models_style("project", experiment="experiment")
    assert proj != exp or proj == exp  # both resolve
    assert "path" in proj


def test_export_roundtrip_fidelity(imported, spark, tmp_path):
    """golden tree → store → exported tree → store: every asset
    identical (keys and raw payload), and current-layout paths match
    the reference's file naming."""
    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.routes import storage_keys
    from aerovaldb_spark.sources import import_jsondb_tree
    from aerovaldb_spark.sources.jsondb_import import export_jsondb_tree

    db1, _ = imported
    outdir = str(tmp_path / "tree")
    report = export_jsondb_tree(db1, outdir)
    assert report.imported > 0 and not report.skipped

    db2 = AerovalSparkDB(spark, str(tmp_path / "db2"))
    import_jsondb_tree(db2, outdir)

    for route in Route:
        if db1._storage_route(route) is not route:
            continue
        t1, t2 = db1.table(route), db2.table(route)
        rows1 = (
            set()
            if t1 is None
            else {
                tuple(r[k] for k in storage_keys(route)) + (bytes(r["payload"]) if isinstance(r["payload"], (bytes, bytearray)) else r["payload"],)
                for r in t1.select(*storage_keys(route), "payload").collect()
            }
        )
        rows2 = (
            set()
            if t2 is None
            else {
                tuple(r[k] for k in storage_keys(route)) + (bytes(r["payload"]) if isinstance(r["payload"], (bytes, bytearray)) else r["payload"],)
                for r in t2.select(*storage_keys(route), "payload").collect()
            }
        )
        assert rows1 == rows2, f"{route.name}: {len(rows1)} vs {len(rows2)}"


# -- legacy-name disambiguation (reference backwards_compatibility.py;
# golden cases from reference tests/jsondb/test_jsonfiledb.py:53-96,
# version mocked to 0.25.0 there) -------------------------------------

@pytest.mark.parametrize(
    "rel,route,want",
    [
        (
            "proj/exp/ts/Amsterdam_Island_AERONET-Sun-od550aer_Column.json",
            Route.TIMESERIES,
            {
                "project": "proj", "experiment": "exp",
                "location": "Amsterdam_Island", "network": "AERONET-Sun",
                "obsvar": "od550aer", "layer": "Column",
            },
        ),
        (
            "proj/exp/map/AERONET-Sun-od550aer_Column_TM5-AP3-CTRL-od550aer_2010.json",
            Route.MAP,
            {
                "project": "proj", "experiment": "exp",
                "network": "AERONET-Sun", "obsvar": "od550aer",
                "layer": "Column", "model": "TM5-AP3-CTRL",
                "modvar": "od550aer", "time": "2010",
            },
        ),
        (
            "proj/exp/hm/ts/some_region-some-network-obsvar-layer.json",
            Route.HEATMAP_TIMESERIES,
            {
                "project": "proj", "experiment": "exp",
                "region": "some_region", "network": "some-network",
                "obsvar": "obsvar", "layer": "layer",
            },
        ),
        (
            # Reference parity: _post_process_scatter_args_kwargs
            # (backwards_compatibility.py:70-79) re-assembles only the
            # network/obsvar pair — unlike MAP it does NOT touch
            # model/modvar, so the compound model stays split.
            "proj/exp/scat/AERONET-Sun-od550aer_Column_TM5-AP3-CTRL-od550aer_2010.json",
            Route.SCATTER,
            {
                "project": "proj", "experiment": "exp",
                "network": "AERONET-Sun", "obsvar": "od550aer",
                "layer": "Column", "model": "TM5",
                "modvar": "AP3-CTRL-od550aer", "time": "2010",
            },
        ),
        (
            "proj/exp/forecast/Amsterdam_AERONET-Sun-od550aer_Column.json",
            Route.FORECAST,
            {
                "project": "proj", "experiment": "exp",
                "region": "Amsterdam", "network": "AERONET-Sun",
                "obsvar": "od550aer", "layer": "Column",
            },
        ),
    ],
)
def test_legacy_compound_name_disambiguation(rel, route, want):
    from aerovaldb_spark.sources.jsondb_import import resolve_path

    got = resolve_path(rel, "0.25.0")
    assert got is not None
    assert got[0] is route
    assert got[1] == want


def test_legacy_tree_imports_with_compound_names(spark, tmp_path):
    """A pre-0.29 tree with compound network/location names imports
    fully routed (nothing skipped, typed getters hit)."""
    import json

    from aerovaldb_spark.db import AerovalSparkDB

    tree = tmp_path / "legacy"
    exp = tree / "proj" / "exp"
    (exp / "ts").mkdir(parents=True)
    (exp / "map").mkdir(parents=True)
    cfg = {"exp_info": {"pyaerocom_version": "0.25.0"}}
    (exp / "cfg_proj_exp.json").write_text(json.dumps(cfg))
    (exp / "ts" / "Amsterdam_Island_AERONET-Sun-od550aer_Column.json").write_text(
        '{"data": 1}'
    )
    (exp / "map" / "AERONET-Sun-od550aer_Column_TM5-AP3-CTRL-od550aer_2010.json").write_text(
        '{"data": 2}'
    )

    db = AerovalSparkDB(spark, str(tmp_path / "db"))
    report = import_jsondb_tree(db, str(tree))
    assert not report.skipped, report.skipped
    assert report.imported == 3
    assert db.get_timeseries(
        "proj", "exp", "Amsterdam_Island", "AERONET-Sun", "od550aer", "Column"
    ) == {"data": 1}
    assert db.get_map(
        "proj", "exp", "AERONET-Sun", "od550aer", "Column",
        "TM5-AP3-CTRL", "od550aer", "2010",
    ) == {"data": 2}


def test_legacy_compound_names_survive_export_roundtrip(spark, tmp_path):
    """Imported legacy compound-name assets re-export (current layout,
    encoded fields) and re-import with identical keys and payloads."""
    import json

    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.sources.jsondb_import import export_jsondb_tree

    tree = tmp_path / "legacy"
    exp = tree / "proj" / "exp"
    (exp / "ts").mkdir(parents=True)
    cfg = {"exp_info": {"pyaerocom_version": "0.25.0"}}
    (exp / "cfg_proj_exp.json").write_text(json.dumps(cfg))
    (exp / "ts" / "Amsterdam_Island_AERONET-Sun-od550aer_Column.json").write_text(
        '{"data": 1}'
    )

    db1 = AerovalSparkDB(spark, str(tmp_path / "db1"))
    import_jsondb_tree(db1, str(tree))
    out = tmp_path / "exported"
    report = export_jsondb_tree(db1, str(out))
    assert report.imported == 2 and not report.skipped

    db2 = AerovalSparkDB(spark, str(tmp_path / "db2"))
    r2 = import_jsondb_tree(db2, str(out))
    assert not r2.skipped
    assert db2.get_timeseries(
        "proj", "exp", "Amsterdam_Island", "AERONET-Sun", "od550aer", "Column"
    ) == {"data": 1}
    assert sorted(db1.list_all()) == sorted(db2.list_all())


def test_sync_tombstones_exact_imported_asset_when_cfg_vanishes(spark, tmp_path):
    """Deleting an asset together with its experiment config must
    tombstone the asset AS IMPORTED: the legacy-versioned timeseries
    file resolves to different args once the cfg (and so the version)
    is gone, and before resolutions were recorded in the sync state the
    tombstone targeted those other args, leaving the real asset live."""
    import json

    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.sources.jsondb_import import sync_jsondb_tree

    tree = tmp_path / "tree"
    (tree / "p" / "e" / "ts").mkdir(parents=True)
    (tree / "p" / "e" / "cfg_p_e.json").write_text(
        json.dumps({"exp_info": {"pyaerocom_version": "0.12.0"}})
    )
    ts = tree / "p" / "e" / "ts" / "A_B-C_D-E_F.json"
    ts.write_text('{"x": 1}')

    db = AerovalSparkDB(spark, str(tmp_path / "db"))
    state = sync_jsondb_tree(db, str(tree), None)
    # legacy (0.12.0) template binds these args; the version-less parse
    # of the same filename would bind (A, B-C, D-E, F) instead
    assert db.get_timeseries("p", "e", "A", "B", "C", "D-E_F") == {"x": 1}
    # imported entries record their resolution in the state
    entry = state["p/e/ts/A_B-C_D-E_F.json"]
    assert entry[2] == "TIMESERIES" and entry[3]["network"] == "B"

    ts.unlink()
    (tree / "p" / "e" / "cfg_p_e.json").unlink()
    state = sync_jsondb_tree(db, str(tree), state)
    with pytest.raises(FileNotFoundError):
        db.get_timeseries("p", "e", "A", "B", "C", "D-E_F")
