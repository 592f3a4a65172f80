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
# of ``queries()`` only (134 declared after r14: +q133 residual
# PQ-IVF probed serve, +q134 composed PQ-IVF probes+ADC+exact
# re-rank, +q135 the residual composed serve), so entry ORDER decides
# which queries get a driver-recorded check each round. Policy:
# entries never yet driver-verified, green-only-once, or just-changed
# come first; the tail past position 50 holds entries with >=2
# driver-recorded greens, rotated every round so each query is
# re-verified periodically. Every entry keeps a pytest-side oracle
# check regardless of position (tests/test_parity_sample.py runs the
# same gate at sf0.001; tools/parity.py re-runnable at any SF).
#
# Round-14 window (50) — executes the r13-committed rotation:
# - ALL 35 once-deferred r11-window retirees (MUST enter per the
#   r13 commitment, now nine rounds standing — every one present):
#   q01 q02 q03 q04 q05 q06 q07 q10 q13 q86 q87 q88 q53 q54 q58 q77
#   q78 q80 q81 q84 q85 q95 q97 q60 q82 q29 q91 q93 q94 q96 q98 q101
#   q35 q65 q75;
# - new this round (3): q133 (residual-encoded PQ in the IVF layout —
#   true IVF-PQ, per-(query,list) ADC tables, residual codebooks as
#   VALUES), q134 (the composed production serve: directory-pruned
#   probes + packed ADC shortlist + exact re-rank in ONE topk call),
#   q135 (the same composition over the residual index);
# - changed this round (2): q127 q128 (numeric character references
#   — &#NNN;/&#xNN; — now decode in the extraction spec; fixture page
#   extended, values change — re-graded);
# - green-only-once, staying per policy (4): q129 q130 q131 q132
#   (one r13 green each);
# - fill (6), picked from the 46 r12-window retirees by fewest
#   driver greens then lowest number: q114 q115 q116 q117 q118 q119
#   (2 greens each).
#
# Round-14 tail (84): every entry holds >=2 driver-recorded greens
# (counts computed from CORRECTNESS_r01..r13):
# - r12-window retirees deferred ONCE — ALL of q120 q121 q122 (2
#   greens) and q107 q110 q111 (3 greens) plus the >=4-green rest
#   were slot-starved this round; per the standing commitment the
#   once-deferred set (q120 q121 q122 q107 q110 q111 and the other
#   r12 retirees listed below) MUST be covered by the r15 window,
#   lowest-green-count first;
# - the 44 r13-window entries rotating out at fresh r13 greens.
# R15 plan: the once-deferred r12 retirees re-enter first (q120 q121
# q122 q107 q110 q111 lead — fewest greens), then the 44 r13
# retirees rotate; entries holding 3+ greens yield slots to whatever
# r15 adds or changes.
_DEFER_ROUND = [
    # r12-window retirees deferred ONCE (6 of the 46 re-entered this
    # round as fills; these MUST be covered by the r15 window,
    # fewest-greens first — the standing commitment)
    "q120_bpe_fertility",
    "q121_dedup_adjusted_mix",
    "q122_source_health",
    "q107_purchase_click_outer",
    "q110_tfidf_banded_knn",
    "q111_tfidf_banded_screen",
    "q18_asof_purchase_click",
    "q104_purchase_click_pairs",
    "q23_lang_id",
    "q24_fingerprints",
    "q59_repetition_stats",
    "q61_tfidf_top_terms",
    "q76_bigram_lm_nll",
    "q102_tfidf_reference_screen",
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
    # r13-window entries rotating out at fresh r13 greens (every one
    # holds >=2 driver greens, verified from CORRECTNESS_r01..r13)
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
    "q123_source_overlap",
    "q125_source_external_dup",
    "q126_source_shingle_overlap",
    "q124_mixture_plan_drift",
    "q112_tfidf_banded_knn_dialed",
    "q113_kmv_incremental",
    "q106_kmv_distinct",
    "q108_quantized_ivf_ann",
    "q109_kmv_overlap",
    "q66_ivf_topk",
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
