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
# of ``queries()`` only (125 declared after r12: +q123 cross-source
# KMV overlap matrix, +q124 frozen-mixture-plan drift, +q125
# per-source external-duplication attribution, +q126 cross-source
# SHINGLE overlap — all > the 50-entry cap), so entry ORDER decides which queries get a
# driver-recorded check each round. Policy: entries never yet
# driver-verified, green-only-once, or just-changed come first; the
# tail past position 50 holds entries with >=2 driver-recorded greens,
# rotated every round so each query is re-verified periodically. Every
# entry keeps a pytest-side oracle check regardless of position
# (tests/test_parity_sample.py runs the same gate at sf0.001;
# tools/parity.py re-runnable at any SF).
#
# Round-12 window (50) — executes the r11-committed rotation:
# - the 27 once-deferred entries (MUST enter per the r11 commitment,
#   all present): q18 q79 q83 q89 q92 q23 q24 q59 q61 q26 q56 q30 q33
#   q34 q36 q38 q39 q40 q41 q43 q44 q45 q47 q48 q49 q51 q52;
# - green-only-once, staying per policy (8): the r11 additions q114
#   q115 q116 q117 q118 q119 q120 q121 (one driver green each —
#   computed from CORRECTNESS_r01..r11);
# - new this round (4): q123 (cross-source duplicated-content matrix
#   via per-source KMV sketches + directional containment), q124
#   (frozen mixture-plan drift report — the q114-q116 staleness
#   family applied to the MixturePlan lifecycle), q125 (per-source
#   worst external-duplication partner, q123 reduced to the row an
#   operator acts on) and q126 (the same matrix at the near-dup
#   SHINGLE level — template sharing without exact pages); q125/q126
#   were added mid-round, taking the q09/q08 fill slots (the
#   highest-evidence fills at 5 greens, which join the r13
#   commitment);
# - changed this round (1): q122 (source_health gained the explicit
#   null_docs column — schema change, re-graded). q109's ORACLE text
#   was re-templated through kmv_overlap_sql this round with
#   byte-different but semantically identical SQL (generic key/value
#   names); its Spark path is untouched and local parity re-verified
#   it green at sf0.01, so it rotates out on its 3 driver greens
#   rather than taking a window slot;
# - fill (10), picked from the 44 r10-window retirees by fewest
#   driver greens then longest-unseen: q107 q110 q111 (2 greens),
#   q104 q105 q100 q103 (3), q76 q102 q90 (4).
#
# Round-12 tail (75): every entry holds >=2 driver-recorded greens
# (q112 q113 at exactly 2; everything else >=3 — counts computed from
# CORRECTNESS_r01..r11 plus the r11 window's fresh greens):
# - 34 r10-window retirees deferred once more — ALL 34 MUST enter the
#   r13 window (the commitment mechanism, now seven rounds standing):
#   q08 q09 q67 q68 q69 q70 q19 q20 q71 q72 q21 q22 q63 q74 q99 q25
#   q27 q28 q62 q32 q73 q31 q57 q46 q50 q37 q42 q11 q12 q14 q15 q16
#   q17 q64;
# - the 41 r11-window entries rotating out at fresh r11 greens.
# R13 plan: the 34 once-deferred entries re-enter first, then the 41
# r11 retirees rotate; entries holding 3+ greens yield slots to
# whatever r13 adds or changes.
_DEFER_ROUND = [
    # r10-window retirees deferred ONCE MORE (10 of the 44 re-entered
    # this round; these 34 MUST enter the r13 window — the standing
    # commitment, now seven rounds unbroken)
    "q08_running_total",
    "q09_distinct_counts",
    "q11_set_except",
    "q12_case_buckets",
    "q14_part_type_stats",
    "q15_json_extract_agg",
    "q16_point_read",
    "q17_top_customers",
    "q64_trailing_revenue",
    "q67_market_share",
    "q68_top_part_values",
    "q69_promo_revenue",
    "q70_inactive_wealthy",
    "q19_sessionize",
    "q20_tumbling_window",
    "q31_session_window",
    "q71_cohort_retention",
    "q72_session_funnel",
    "q21_token_stats",
    "q22_quality_scores",
    "q57_source_mixing",
    "q63_bigram_novelty",
    "q74_passage_dedup",
    "q99_tfidf_cosine_knn",
    "q25_dedup_exact",
    "q27_minhash_signatures",
    "q28_simhash",
    "q62_dedup_pipeline",
    "q46_srp_near_dup",
    "q50_cosine_near_dup",
    "q32_pivot_status",
    "q37_rank_parts",
    "q42_grouping_sets",
    "q73_frame_manifest",
    # r11-window entries rotating out at fresh r11 greens (every one
    # also holds >=2 prior driver greens, verified from
    # CORRECTNESS_r01..r11)
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
    "q106_kmv_distinct",
    "q109_kmv_overlap",
    "q113_kmv_incremental",
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
    "q112_tfidf_banded_knn_dialed",
    "q60_canonical_docs",
    "q82_source_overlap",
    "q29_cosine_topk",
    "q66_ivf_topk",
    "q91_srp_ann_topk",
    "q93_semantic_dedup",
    "q94_margin_ann_topk",
    "q96_bounded_semantic_dedup",
    "q98_quantized_ann_topk",
    "q101_quantized_srp_ann",
    "q108_quantized_ivf_ann",
    "q35_sliding_window",
    "q65_media_features",
    "q75_asset_store_roundtrip",
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
