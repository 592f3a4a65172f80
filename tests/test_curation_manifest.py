"""q132 unified curation manifest: per-doc fate accounting, stage
consistency with the graded rungs it composes, the shared-scan plan
property, and export-sink integration."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release_persists():
    yield
    from aerovaldb_spark.operators._scope import release_scoped_persists

    release_scoped_persists()


def _manifest(spark):
    from aerovaldb_spark.operators.advanced import q132_curation_manifest

    return q132_curation_manifest(spark, SF_DIR)


def test_manifest_covers_every_doc_exactly_once(spark):
    from aerovaldb_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    m = _manifest(spark)
    assert m.count() == docs.count()
    assert m.select("doc_id").distinct().count() == docs.count()
    verdicts = {r["verdict"] for r in m.select("verdict").distinct().collect()}
    assert verdicts <= {"keep", "quality", "exact_dup", "near_dup"}
    # provenance invariants: dup drops carry their canonical, keeps
    # carry a split, quality drops carry neither
    bad = m.filter(
        (
            F.col("verdict").isin("exact_dup", "near_dup")
            & F.col("canonical_id").isNull()
        )
        | ((F.col("verdict") == "keep") & F.col("split").isNull())
        | ((F.col("verdict") == "quality") & F.col("canonical_id").isNotNull())
        | ((F.col("verdict") != "keep") & F.col("split").isNotNull())
    )
    assert bad.count() == 0


def test_manifest_agrees_with_the_rungs_it_composes(spark):
    """The manifest's stages ARE q39/q25/q62's rules: kept+dup docs
    reproduce the q39 quality gate; exact_dup canonicals are q25's
    min-id representatives over the quality survivors; near_dup
    components come from q62's pipeline over the exact canonicals."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.dedup import dedup_pipeline

    docs = load_table(spark, SF_DIR, "documents")
    m = _manifest(spark).cache()
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.size(
            F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))
        ).alias("sh"),
        "text",
    )
    q_pass = scored.filter(
        F.col("text").isNotNull()
        & (F.col("n") >= 20)
        & (F.col("sh").cast("double") / F.col("n") < 0.5)
    )
    got_quality_drops = {
        r["doc_id"]
        for r in m.filter("verdict = 'quality'").collect()
    }
    want_drops = {
        r["doc_id"]
        for r in docs.select("doc_id")
        .join(q_pass.select("doc_id"), "doc_id", "left_anti")
        .collect()
    }
    assert got_quality_drops == want_drops
    # exact canonicals: min doc_id per md5 among quality survivors
    want_canon = {
        r["c"]
        for r in q_pass.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("c"))
        .collect()
    }
    got_canon = {
        r["doc_id"]
        for r in m.filter("verdict IN ('keep', 'near_dup')").collect()
    }
    assert got_canon == want_canon
    # near-dup losers match q62's pipeline over the canonicals
    canon_docs = docs.join(
        m.filter("verdict IN ('keep', 'near_dup')").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    comp = dedup_pipeline(canon_docs)
    want_near = {
        (r["doc_id"], r["component"])
        for r in comp.filter("doc_id != component").collect()
    }
    got_near = {
        (r["doc_id"], r["canonical_id"])
        for r in m.filter("verdict = 'near_dup'").collect()
    }
    assert got_near == want_near
    m.unpersist()


def test_manifest_plan_shares_one_scan_no_cartesian(spark):
    """Every stage consumes the persisted base projection: the plan
    has no cartesian product, reuses the cache (InMemoryTableScan),
    and every documents scan in the tree is the ONE base projection
    (a stage bypassing the cache would plan its own scan with a
    different read schema)."""
    import re

    plan = (
        _manifest(spark)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan
    schemas = set(
        re.findall(r"FileScan parquet \[[^\]]*\]", plan)
    )
    assert len(schemas) <= 1, schemas


def test_manifest_feeds_export_sink(spark, tmp_path):
    """The manifest's keep rows drive the export: kept docs join back
    to text, export partitioned by split, and the export manifest's
    per-split doc counts equal the curation manifest's."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.export_sink import (
        corpus_manifest,
        export_corpus,
    )

    docs = load_table(spark, SF_DIR, "documents")
    m = _manifest(spark)
    keeps = m.filter("verdict = 'keep'").select("doc_id", "split")
    out = str(tmp_path / "corpus")
    export_corpus(
        docs.join(keeps, "doc_id").select(
            "doc_id", "text", "lang", "source", "split"
        ),
        out,
        partition_by=("split",),
    )
    exported = {
        r["split"]: r["n_rows"]
        for r in corpus_manifest(spark, out).collect()
    }
    want = {
        r["split"]: r["n"]
        for r in keeps.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert exported == want and exported
