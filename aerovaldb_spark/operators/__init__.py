"""Operator library: relational, temporal, text, dedup, similarity.

``ALL_QUERIES`` / ``ALL_ORACLE`` aggregate every module's
(spark, sf_dir) -> DataFrame callables and their DuckDB oracle SQL.
"""

from __future__ import annotations

from . import advanced, dedup, events, markup, pq, relational, similarity, store_query, text  # noqa: E501
from ..functions import bpe, multimodal

_MERGED_QUERIES = {
    **relational.QUERIES,
    **events.QUERIES,
    **text.QUERIES,
    **dedup.QUERIES,
    **similarity.QUERIES,
    **advanced.QUERIES,
    **multimodal.QUERIES,
    **store_query.QUERIES,
    **bpe.QUERIES,
    **markup.QUERIES,
    **pq.QUERIES,
}

# The external correctness gate records rows for the FIRST 50 entries
# of ``queries()`` only (131 declared after r13: +q127 HTML->text
# extraction report, +q128 q39-over-raw-HTML composition, +q129 PQ/ADC
# brute-force ANN, +q130 PQ-IVF probed serve, +q131 PQ + exact
# re-rank, +q132 unified curation manifest), so entry ORDER decides
# which queries get a driver-recorded check each round. Policy:
# entries never yet driver-verified, green-only-once, or just-changed
# come first; the tail past position 50 holds entries with >=2
# driver-recorded greens, rotated every round so each query is
# re-verified periodically. Every entry keeps a pytest-side oracle
# check regardless of position (tests/test_parity_sample.py runs the
# same gate at sf0.001; tools/parity.py re-runnable at any SF).
#
# Round-13 window (50) — executes the r12-committed rotation:
# - ALL 34 twice-deferred r10-window retirees (MUST enter per the
#   r12 commitment, now eight rounds standing — every one present):
#   q08 q09 q11 q12 q14 q15 q16 q17 q64 q67 q68 q69 q70 q19 q20 q31
#   q71 q72 q21 q22 q57 q63 q74 q99 q25 q27 q28 q62 q46 q50 q32 q37
#   q42 q73;
# - new this round (6): q127 (HTML/markup->text extraction +
#   boilerplate line rules + NFC, synthesized-page oracle), q128
#   (q39's cleaning pipeline composed over raw-HTML input), q129
#   (product-quantization ADC brute force, frozen codebooks as
#   VALUES), q130 (PQ codes in the IVF layout, directory-pruned
#   probes), q131 (PQ as candidate generator + exact re-rank), q132
#   (per-doc curation manifest with stage provenance);
# - changed this round (3): q123 q125 q126 gained the below_noise
#   containment flags (schema change — re-graded);
# - green-only-once, staying per policy (1): q124 (one r12 green);
# - fill (6), picked from the 41 r11-window retirees by fewest
#   driver greens: q112 q113 (2 greens), q106 q108 q109 q66 (3).
#
# Round-13 tail (81): every entry holds >=2 driver-recorded greens
# (counts computed from CORRECTNESS_r01..r12):
# - 35 r11-window retirees deferred ONCE — ALL 35 MUST enter the r14
#   window (the standing commitment): q01 q02 q03 q04 q05 q06 q07
#   q10 q13 q86 q87 q88 q53 q54 q58 q77 q78 q80 q81 q84 q85 q95 q97
#   q60 q82 q29 q91 q93 q94 q96 q98 q101 q35 q65 q75;
# - the 46 r12-window entries rotating out at fresh r12 greens (q114
#   q115 q116 q117 q118 q119 q120 q121 q122 now hold >=2; q107 q110
#   q111 >=3; the rest >=4).
# R14 plan: the 35 once-deferred entries re-enter first, then the 46
# r12 retirees rotate; entries holding 3+ greens yield slots to
# whatever r14 adds or changes.
_DEFER_ROUND = [
    # r11-window retirees deferred ONCE (6 of the 41 re-entered this
    # round as fills; these 35 MUST enter the r14 window — the
    # standing commitment)
    "q01_pricing_summary",
    "q02_top_revenue_orders",
    "q03_revenue_by_nation",
    "q04_selective_filter_agg",
    "q05_order_priority_semijoin",
    "q06_customers_without_orders",
    "q07_window_topk_per_customer",
    "q10_rollup_agg",
    "q13_monthly_event_stats",
    "q86_waiting_suppliers",
    "q87_custdist",
    "q88_small_qty_revenue",
    "q53_train_split",
    "q54_pack_sequences",
    "q58_decontaminate",
    "q77_contamination_score",
    "q78_bm25_topk",
    "q80_sliding_chunks",
    "q81_stratified_sample",
    "q84_quality_gate",
    "q85_token_budget",
    "q95_bpe_token_budget",
    "q97_bpe_pack_sequences",
    "q60_canonical_docs",
    "q82_source_overlap",
    "q29_cosine_topk",
    "q91_srp_ann_topk",
    "q93_semantic_dedup",
    "q94_margin_ann_topk",
    "q96_bounded_semantic_dedup",
    "q98_quantized_ann_topk",
    "q101_quantized_srp_ann",
    "q35_sliding_window",
    "q65_media_features",
    "q75_asset_store_roundtrip",
    # r12-window entries rotating out at fresh r12 greens (every one
    # holds >=2 driver greens, verified from CORRECTNESS_r01..r12)
    "q18_asof_purchase_click",
    "q104_purchase_click_pairs",
    "q107_purchase_click_outer",
    "q23_lang_id",
    "q24_fingerprints",
    "q59_repetition_stats",
    "q61_tfidf_top_terms",
    "q76_bigram_lm_nll",
    "q102_tfidf_reference_screen",
    "q110_tfidf_banded_knn",
    "q111_tfidf_banded_screen",
    "q114_screen_staleness",
    "q115_srp_occupancy_drift",
    "q116_ivf_staleness",
    "q117_band_dial_measurement",
    "q118_temperature_mix_plan",
    "q119_mixture_assignment",
    "q120_bpe_fertility",
    "q121_dedup_adjusted_mix",
    "q122_source_health",
    "q105_decontaminate_spans",
    "q26_ngram_jaccard_pairs",
    "q56_dedup_clusters",
    "q30_embedding_norms",
    "q79_knn_join",
    "q83_label_cohesion",
    "q89_quantization_audit",
    "q90_label_outliers",
    "q33_percentiles",
    "q34_above_nation_avg",
    "q36_srp_buckets",
    "q38_activity_union",
    "q39_clean_corpus_report",
    "q40_lsh_candidates",
    "q41_range_join",
    "q43_order_gaps",
    "q44_order_arrays",
    "q45_regexp_extract",
    "q47_set_intersect",
    "q48_date_parts",
    "q49_cube",
    "q51_binary_manifest",
    "q52_media_decode",
    "q92_bpe_token_stats",
    "q100_bpe_large_token_stats",
    "q103_bpe_doc_fingerprints",
]

ALL_QUERIES = {
    **{k: v for k, v in _MERGED_QUERIES.items() if k not in _DEFER_ROUND},
    **{k: _MERGED_QUERIES[k] for k in _DEFER_ROUND},
}

ALL_ORACLE = {
    **relational.ORACLE,
    **events.ORACLE,
    **text.ORACLE,
    **dedup.ORACLE,
    **similarity.ORACLE,
    **advanced.ORACLE,
    **multimodal.ORACLE,
    **store_query.ORACLE,
    **bpe.ORACLE,
    **markup.ORACLE,
    **pq.ORACLE,
}

__all__ = [
    "ALL_ORACLE",
    "ALL_QUERIES",
    "dedup",
    "events",
    "relational",
    "advanced",
    "similarity",
    "text",
]
