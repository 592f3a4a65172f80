"""Measure the sparse-TF-IDF candidate funnel on a documents corpus.

Prints ONE JSON line with the stages of the q99 (exact AllPairs) and
q110 (banded minhash) candidate pipelines, so the filter-effectiveness
claim is a repo measurement:

- corpus shape: docs, distinct terms, avg distinct terms/doc
- prefix_rows / weight_rows: the prefix filter's kept fraction
- shared_term_pairs: distinct doc pairs sharing >= 1 term — the
  no-filter candidate volume an unfiltered term self-join would emit
- allpairs_candidates: pairs surviving q99's prefix+size+positional
  bounds (lossless: every true pair is in here)
- banded_candidates: q110's (band, signature) collision pairs
- true_edges: pairs with exact cosine >= threshold (the output)
- banded recall: fraction of true edges among banded candidates

Usage: python tools/tfidf_density_probe.py <docs_dir> [label] [threshold]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    docs_dir = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(docs_dir.rstrip("/"))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8

    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators._scope import release_scoped_persists
    from aerovaldb_spark.operators.text import (
        _tfidf_prefix_frame,
        _verified_dots,
        tfidf_allpairs_candidates,
        tfidf_banded_candidates,
        tfidf_weight_frame,
    )
    from aerovaldb_spark.session import get_spark

    spark = get_spark("density_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, docs_dir, "documents")
    out: dict = {"label": label, "threshold": threshold}
    out["docs"] = docs.count()

    w, _stats, _n = tfidf_weight_frame(docs)
    out["weight_rows"] = w.count()
    out["distinct_terms"] = w.select("term").distinct().count()
    out["avg_terms_per_doc"] = round(out["weight_rows"] / out["docs"], 1)

    pre = _tfidf_prefix_frame(w, threshold)
    out["prefix_rows"] = pre.count()
    out["prefix_kept_fraction"] = round(
        out["prefix_rows"] / out["weight_rows"], 4
    )

    # no-filter baseline: distinct pairs sharing ANY term (what a bare
    # term self-join emits before any AllPairs bound)
    t0 = time.time()
    ids = w.select("doc_id", "term")
    out["shared_term_pairs"] = (
        ids.alias("a")
        .join(ids.alias("b"), "term")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    out["shared_term_pairs_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    cand = tfidf_allpairs_candidates(w, threshold, pre=pre)
    out["allpairs_candidates"] = cand.count()
    out["allpairs_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    true_edges = (
        _verified_dots(cand, w, w, "doc_a", "doc_b", "map")
        .where(F.col("dot").cast("double") >= threshold)
    )
    edge_rows = {(r["doc_a"], r["doc_b"]) for r in true_edges.collect()}
    out["true_edges"] = len(edge_rows)
    out["verify_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    banded = tfidf_banded_candidates(w)
    banded_rows = {
        (r["doc_a"], r["doc_b"]) for r in banded.collect()
    }
    out["banded_candidates"] = len(banded_rows)
    out["banded_sec"] = round(time.time() - t0, 1)
    out["banded_recall"] = round(
        len(edge_rows & banded_rows) / max(len(edge_rows), 1), 4
    )

    release_scoped_persists()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
