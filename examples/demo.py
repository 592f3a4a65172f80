"""End-to-end tour of the engine — what a reference (metno/aerovaldb)
user writes after switching.

Run: python examples/demo.py   (uses a temp dir; prints each step)
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

import aerovaldb_spark as av


def main() -> None:
    root = tempfile.mkdtemp(prefix="avdb-demo-")
    db = av.open(f"spark:{root}")
    db.spark.sparkContext.setLogLevel("ERROR")

    # -- the reference API surface, 1:1 -------------------------------
    db.put_config({"exp_info": {"pyaerocom_version": "0.30.0"}}, "demo", "exp1")
    db.put_glob_stats(
        {
            "od550aer": {
                "AERONET-Sun": {
                    "Column": {
                        "TM5": {
                            "od550aer": {
                                "EUR": {"2020": {"bias": 0.12, "rmse": 0.3}},
                                "ASIA": {"2020": {"bias": -0.05}},
                            }
                        }
                    }
                }
            }
        },
        "demo", "exp1", "monthly",
    )
    print("heatmap (filtered point read):")
    print(" ", db.get_heatmap("demo", "exp1", "monthly", region="EUR", time="2020"))

    print("catalog query:")
    for e in db.query(project="demo"):
        print("  ", e.uri)

    print("URI round-trip:", db.get_by_uri("/v0/config/demo/exp1"))
    print("JSON_STR access:",
          db.get_config("demo", "exp1", access_type=av.AccessType.JSON_STR))

    # -- the Spark-native surface the reference never had --------------
    db.flush()
    views = db.register_views()
    print("SQL views:", views)
    db.spark.sql(
        "SELECT project, experiment, frequency FROM avdb_glob_stats"
    ).show()

    long = db.glob_stats_long()
    print("shredded analytics (WHERE instead of deep filters):")
    long.filter("region = 'EUR'").show()

    # relational/pipeline operators over the harness tables
    from aerovaldb_spark.operators import ALL_QUERIES

    print("as-of join over events:")
    ALL_QUERIES["q18_asof_purchase_click"](db.spark, "/root/testdata/sf0.001").show(3)

    print("near-duplicate candidates (MinHash LSH):")
    ALL_QUERIES["q40_lsh_candidates"](db.spark, "/root/testdata/sf0.001").show(3)

    # -- migration: both reference backends, both directions -----------
    import os

    from aerovaldb_spark.sources import export_sqlite_db
    from aerovaldb_spark.sources.jsondb_import import export_jsondb_tree

    sqlite_file = os.path.join(root, "export.sqlite")
    print("sqlite export:", export_sqlite_db(db, sqlite_file))
    back = av.open(sqlite_file, spark=db.spark)  # sniffed + imported
    print("reopened from sqlite:", back.get_config("demo", "exp1"))

    tree = os.path.join(root, "tree")
    rep = export_jsondb_tree(db, tree)
    print(f"jsondb export: {rep.imported} files under {tree}")

    # -- live view: json_files: tracks the tree as other processes
    # write it (reference jsonfiledb behavior) ------------------------
    live = av.open(f"json_files:{tree}", spark=db.spark)
    print("live view sees:", live.get_config("demo", "exp1"))

    # -- FILE_PATH shim: serve-by-path consumers (aeroval web) opt in
    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.routes import Route

    fp_db = AerovalSparkDB(db.spark, root, materialize_file_path=True)
    path = fp_db.get(
        Route.CONFIG, {"project": "demo", "experiment": "exp1"},
        access_type="FILE_PATH",
    )
    print("materialized asset path:", path)

    # -- time travel + CDC: the append-log makes history a filter ------
    s = db.current_seq()
    db.put_config({"generation": 2}, "demo", "exp1")
    db.flush()
    print("pinned snapshot still sees:",
          db.snapshot(s).get_by_uri("/v0/config/demo/exp1"))
    print("changes since pin:",
          [(c["uri"], c["op"]) for c in db.changes(s)])


if __name__ == "__main__":
    main()
