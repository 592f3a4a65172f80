"""q75: the asset store itself on the driver-graded surface.

Every §2.1/2.2/2.5 store verb (typed put, flush-to-log, last-writer-
wins resolution, tombstone delete, filter_heatmap slicing) so far had
only pytest coverage; this query routes them through the external
DuckDB-oracle gate. It builds a THROWAWAY store from the ``documents``
table inside the query:

1. aggregate documents per (lang, source, doc_id-parity),
2. put a DECOY glob_stats payload (all zeros) per lang, flush,
3. put the REAL payload per lang (batched in the memtable), then
   ``rm_by_uri`` the lexicographically-smallest lang — the tombstone
   overwrites that lang's PENDING real put in-memory (memtable LWW)
   and rm's internal flush carries everything to disk in ONE write
   cycle. Every key then has two physical rows on disk (decoy + real,
   or decoy + tombstone), so the read side must resolve
   last-writer-wins through the append log AND honor the tombstone.
   (Two flush cycles total, not three — each flush pays full store
   machinery, and the third bought no extra semantics.)
4. read each surviving lang back via the HEATMAP alias with
   (region="even", time="2024") slicing — ``filter_heatmap`` must
   project exactly that leaf out of the nested document.

The returned DataFrame is the extracted per-(lang, source) stats; the
oracle recomputes them straight from ``documents`` with plain SQL. Any
break in LWW, tombstones, flush, or the filter chain shows up as a
value/row mismatch. The store root is a temp directory removed before
returning (the result rows are already driver-local).

Reference parity anchors: typed accessors aerovaldb.py:156-196, LWW =
sqlite REPLACE semantics sqlitedb.py:441-449, filter_heatmap
utils/filter.py:18-46, deletion jsonfiledb.py:415-428.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_docs_even", T.LongType()),
        T.StructField("sum_chars_even", T.LongType()),
    ]
)


def q75_asset_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..db import AerovalSparkDB
    from ..routes import Route
    from ..uri import build_uri

    docs = load_table(spark, sf_dir, "documents")
    agg = (
        docs.withColumn(
            "region", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
        )
        .groupBy("lang", "source", "region")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .collect()
    )
    langs = sorted({r["lang"] for r in agg})
    if not langs:
        # empty corpus: the oracle returns zero rows; match it instead
        # of IndexError-ing before the store exists
        return spark.createDataFrame(
            [],
            "lang string, source string, n_docs_even long,"
            " sum_chars_even long",
        )
    removed = langs[0]

    root = tempfile.mkdtemp(prefix="avdb_q75_")
    try:
        db = AerovalSparkDB(spark, root)

        def payload_for(lang: str, decoy: bool) -> dict:
            out: dict = {"stats": {}}
            for r in agg:
                if r["lang"] != lang:
                    continue
                leaf = (
                    out["stats"]
                    .setdefault(r["source"], {})
                    .setdefault("surface", {})
                    .setdefault("corpus", {})
                    .setdefault("count", {})
                )
                leaf.setdefault(r["region"], {})["2024"] = {
                    "n_docs": 0 if decoy else r["n_docs"],
                    "sum_chars": 0 if decoy else r["sum_chars"],
                }
            return out

        for lang in langs:
            db.put_glob_stats(payload_for(lang, decoy=True), "corpus", lang, "monthly")
        db.flush()
        for lang in langs:
            db.put_glob_stats(payload_for(lang, decoy=False), "corpus", lang, "monthly")
        # no flush here: rm_by_uri tombstones the removed lang's
        # pending real put in the memtable and flushes everything
        db.rm_by_uri(
            build_uri(
                Route.GLOB_STATS,
                {"project": "corpus", "experiment": removed, "frequency": "monthly"},
            )
        )

        rows = []
        for lang in langs:
            try:
                sliced = db.get_heatmap("corpus", lang, "monthly", "even", "2024")
            except FileNotFoundError:
                continue  # the tombstoned lang — must be exactly `removed`
            for source, layers in sliced["stats"].items():
                leaf = layers["surface"]["corpus"]["count"]
                if "even" in leaf and "2024" in leaf["even"]:
                    stats = leaf["even"]["2024"]
                    rows.append(
                        (lang, source, stats["n_docs"], stats["sum_chars"])
                    )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, _SCHEMA)


Q75_SQL = """
SELECT lang, source, COUNT(*) AS n_docs_even,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars_even
FROM documents
WHERE doc_id % 2 = 0 AND lang <> (SELECT MIN(lang) FROM documents)
GROUP BY lang, source
"""

QUERIES = {"q75_asset_store_roundtrip": q75_asset_store_roundtrip}
ORACLE = {"q75_asset_store_roundtrip": Q75_SQL}
