"""The sparse TF-IDF near-dup ladder, end to end.

One family, four rungs — pick by reference size and density:

1. exact kNN graph (q99): AllPairs/PPJoin-filtered candidates,
   lossless — candidate volume tracks the corpus's TRUE density.
2. banded kNN graph (q110): minhash-banded top-weight terms in front
   of the SAME exact verify — candidate volume becomes a
   (bands, rows, top_terms) dial; recall measured in SCALING.md.
3. exact / banded reference SCREEN (q102/q111): one row per incoming
   doc with its best qualifying match against a frozen reference.
4. persisted index + streaming (TfidfScreenIndex +
   tfidf_screen_batch_fn): reference stats/weights/signatures written
   once; incoming batches — or a live document stream — screen
   without ever re-deriving reference state.

Run: python examples/near_dup_ladder.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        TfidfScreenIndex,
        tfidf_allpairs_candidates,
        tfidf_banded_candidates,
        tfidf_banded_knn,
        tfidf_banded_screen,
        tfidf_cosine_knn,
        tfidf_weight_frame,
    )
    from aerovaldb_spark.session import get_spark

    spark = get_spark("near_dup_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    print(f"== corpus: {n_docs} docs ({sf_dir}) ==")

    print("== rung 1 vs 2: the candidate funnel ==")
    w, _stats, _n = tfidf_weight_frame(docs)
    exact_cand = tfidf_allpairs_candidates(w).count()
    banded_cand = tfidf_banded_candidates(w).count()
    print(f"all possible pairs : {n_docs * (n_docs - 1) // 2}")
    print(f"exact (lossless)   : {exact_cand}")
    print(f"banded (dialable)  : {banded_cand}")

    print("== both verify with the SAME exact DECIMAL dot; banded "
          "edges are a subset with identical cosines ==")
    exact_edges = tfidf_cosine_knn(docs).count()
    banded_edges = tfidf_banded_knn(docs).count()
    print(f"exact kNN edges  : {exact_edges}")
    print(f"banded kNN edges : {banded_edges} "
          f"(recall here = {banded_edges / max(exact_edges, 1):.3f} "
          "of the top-10 graph)")

    print("== rung 3: screen incoming docs against a frozen "
          "reference (odd ids vs even ids) ==")
    reference = docs.where("doc_id % 2 = 0")
    incoming = docs.where("doc_id % 2 = 1")
    screened = tfidf_banded_screen(incoming, reference)
    screened.groupBy("tfidf_dup").count().orderBy("tfidf_dup").show()

    print("== rung 4: persist the reference ONCE, then screen from "
          "the index — bit-equal to rung 3 ==")
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "screen_idx")
        TfidfScreenIndex.build(reference).save(p)
        loaded = TfidfScreenIndex.load(spark, p)
        from_index = loaded.screen(incoming)
        a = sorted(map(tuple, screened.collect()))
        b = sorted(map(tuple, from_index.collect()))
        print(f"index rows == ephemeral rows: {a == b} "
              f"({len(b)} rows, one per incoming doc)")

        print("== rung 5: grow the reference WITHOUT a rebuild — "
              "add() signs new docs under the frozen stats and "
              "appends to the parquet ==")
        fresh = incoming.limit(20).selectExpr(
            "doc_id + 1000000 as doc_id", "text", "lang", "source",
            "n_chars",
        )
        grown = loaded.add(fresh, path=p)
        before = screened.where("tfidf_dup").count()
        after = grown.screen(incoming).where("tfidf_dup").count()
        print(f"flagged before/after append: {before} -> {after} "
              "(growth can only ADD flags; the 20 appended docs are "
              "verbatim copies of incoming docs, so their twins now "
              "match)")

    print("== rung 6: dial the banded rungs by TARGET RECALL — "
          "measure once, invert, choose ==")
    from aerovaldb_spark.operators.text import (
        TFIDF_BAND_BANDS,
        TFIDF_BAND_ROWS,
        band_collision_prob,
        choose_band_dial,
        effective_jaccard,
    )

    # invert at the SAME dial the measurement above used (the module
    # defaults tfidf_banded_knn ran with), not literals
    measured = banded_edges / max(exact_edges, 1)
    j_eff = effective_jaccard(
        TFIDF_BAND_BANDS, TFIDF_BAND_ROWS, min(max(measured, 0.01), 0.99)
    )
    bands, rows = choose_band_dial(jaccard=j_eff, target_recall=0.95)
    print(f"measured recall at the default dial "
          f"({TFIDF_BAND_BANDS},{TFIDF_BAND_ROWS}): {measured:.3f}")
    print(f"-> effective top-term Jaccard of threshold pairs: {j_eff:.3f}")
    print(f"-> choose_band_dial(J_eff, target 0.95) = "
          f"({bands} bands x {rows} rows), model recall "
          f"{band_collision_prob(j_eff, bands, rows):.3f}")
    n_dialed = tfidf_banded_knn(
        docs, bands=bands, rows_per_band=rows
    ).count()
    print(f"re-run at the chosen dial: {n_dialed} edges "
          f"(recall {n_dialed / max(exact_edges, 1):.3f} vs the "
          "0.95 target; the graded q112 freezes this exact loop)")

    print("(a live document stream serves the same index via "
          "streaming.tfidf_screen_batch_fn — stream == batch exact)")


if __name__ == "__main__":
    main()
