"""Volume smoke: the asset store at thousands of keys — bulk import,
partition-pruned point reads, catalog scans, selective deletes."""

from __future__ import annotations

from pyspark.sql import functions as F

from aerovaldb_spark.db import AerovalSparkDB
from aerovaldb_spark.routes import Route

N_PROJECTS = 4
N_EXPERIMENTS = 5
N_TS = 100  # timeseries per (project, experiment)


def test_bulk_import_and_access(spark, tmp_path):
    db = AerovalSparkDB(spark, str(tmp_path / "big"))
    rows = spark.range(N_PROJECTS * N_EXPERIMENTS * N_TS).select(
        F.concat(F.lit("proj"), (F.col("id") % N_PROJECTS)).alias("project"),
        F.concat(F.lit("exp"), ((F.col("id") / N_PROJECTS).cast("long") % N_EXPERIMENTS)).alias(
            "experiment"
        ),
        F.concat(F.lit("loc"), F.col("id")).alias("location"),
        F.lit("net").alias("network"),
        F.lit("ov").alias("obsvar"),
        F.lit("lay").alias("layer"),
        F.concat(F.lit('{"n": '), F.col("id"), F.lit("}")).alias("payload"),
    )
    db.bulk_import(Route.TIMESERIES, rows)

    total = N_PROJECTS * N_EXPERIMENTS * N_TS
    # catalog scan with equality predicates
    entries = db.query(Route.TIMESERIES, project="proj1")
    assert len(entries) == total // N_PROJECTS

    # point read hits exactly one row (partition-pruned on project)
    e = entries[0]
    doc = db.get_by_uri(e.uri)
    assert set(doc) == {"n"}

    # typed getter against bulk-imported data
    assert db.get_timeseries(
        "proj0", "exp0", "loc0", "net", "ov", "lay"
    ) == {"n": 0}

    # per-experiment delete removes exactly that slice
    db.rm_experiment_data("proj1", "exp2")
    left = db.query(Route.TIMESERIES, project="proj1")
    assert len(left) == total // N_PROJECTS - len(
        [1 for x in entries if x.meta["experiment"] == "exp2"]
    )
    # other projects untouched
    assert len(db.query(Route.TIMESERIES, project="proj2")) == total // N_PROJECTS
