"""Scale-discipline assertions on physical plans: broadcasts happen,
filters push down, columns prune. These guard the properties that
matter at 100 TB, not just result correctness."""

from __future__ import annotations

import pytest

from aerovaldb_spark.plans import (
    has_broadcast_join,
    plan_report,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

SF = "/root/testdata/sf0.001"


def assert_all_crosses_hinted(df):
    """Every conditionless cross join in the ANALYZED plan must carry
    a broadcast hint as an immediate child — the 1-row scalar pattern.
    An unhinted cross is the all-pairs plan these operators exist to
    avoid. (Semantic tree walk; the former string-count heuristic
    `count('Join Cross') == count('ResolvedHint')` broke as soon as a
    legitimately hinted EQUI-join existed elsewhere in the plan, and
    only compared totals rather than checking pairing.)"""
    jplan = df._jdf.queryExecution().analyzed()

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    crosses = [
        n
        for n in walk(jplan)
        if n.nodeName() == "Join" and "Cross" in n.joinType().toString()
    ]
    for c in crosses:
        ch = c.children()
        kids = [ch.apply(i).nodeName() for i in range(ch.size())]
        assert "ResolvedHint" in kids, (
            f"unhinted cross join (children: {kids})"
        )


@pytest.fixture(autouse=True)
def _no_cache():
    # plans must reflect parquet scans, not the bench table cache
    from aerovaldb_spark.catalog import clear_table_cache

    clear_table_cache()
    yield


def test_q03_broadcasts_dimensions(spark):
    from aerovaldb_spark.operators.relational import q03_revenue_by_nation

    df = q03_revenue_by_nation(spark, SF)
    assert has_broadcast_join(df)


def test_q17_broadcasts_customer(spark):
    from aerovaldb_spark.operators.relational import q17_top_customers

    assert has_broadcast_join(q17_top_customers(spark, SF))


def test_q04_filters_pushed_to_scan(spark):
    from aerovaldb_spark.operators.relational import q04_selective_filter_agg

    pf = pushed_filters(q04_selective_filter_agg(spark, SF))
    joined = " ".join(pf)
    assert "l_shipdate" in joined and "l_discount" in joined and "l_quantity" in joined


def test_q16_point_read_pushed(spark):
    from aerovaldb_spark.operators.relational import q16_point_read

    pf = pushed_filters(q16_point_read(spark, SF))
    assert any("o_orderkey" in f and "997" in f for f in pf)


def test_q01_prunes_columns(spark):
    from aerovaldb_spark.operators.relational import q01_pricing_summary

    schemas = scan_columns(q01_pricing_summary(spark, SF))
    assert schemas, "no scan found"
    # 7 needed columns of 11 — the scan must not read the rest
    assert all("l_orderkey" not in s and "l_partkey" not in s for s in schemas)


def test_q04_scan_reads_minimum(spark):
    from aerovaldb_spark.operators.relational import q04_selective_filter_agg

    schemas = scan_columns(q04_selective_filter_agg(spark, SF))
    assert all("l_returnflag" not in s and "l_orderkey" not in s for s in schemas)


def test_q01_single_shuffle(spark):
    from aerovaldb_spark.operators.relational import q01_pricing_summary

    # one aggregation = one exchange (partial agg map-side first)
    assert shuffle_count(q01_pricing_summary(spark, SF)) <= 1


def test_asset_store_point_read_prunes(spark, tmp_path):
    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.routes import Route

    db = AerovalSparkDB(spark, str(tmp_path / "db"))
    db.put_config({"c": 1}, "projA", "e1")
    db.put_config({"c": 2}, "projB", "e1")
    db.flush()
    resolved = db.table(Route.CONFIG).filter("project = 'projA'")
    # project is a partition column → the filter prunes partitions, so
    # no PushedFilters entry is needed; assert the scan carries a
    # partition filter instead of reading both project dirs.
    from aerovaldb_spark.plans import formatted_plan

    plan = formatted_plan(resolved)
    assert "PartitionFilters" in plan and "projA" in plan


def test_q26_no_corpus_sized_broadcast_hint(spark):
    # The per-doc sizes table grows with the corpus; a baked-in
    # broadcast hint would OOM at scale. AQE may still broadcast at
    # runtime when it fits — we assert only that no hint is hard-coded.
    from aerovaldb_spark.operators.dedup import q26_ngram_jaccard_pairs

    df = q26_ngram_jaccard_pairs(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed and "ResolvedHint" not in analyzed


def test_dedup_pipeline_avoids_full_pair_join(spark, monkeypatch):
    # The scale path must generate candidates via banded LSH only: the
    # all-pairs shingle self-join (q26/shingle_pairs) must never run.
    from aerovaldb_spark.operators import dedup

    def _boom(*a, **k):
        raise AssertionError("full shingle self-join invoked in scale path")

    monkeypatch.setattr(dedup, "shingle_pairs", _boom)
    monkeypatch.setattr(dedup, "q26_ngram_jaccard_pairs", _boom)
    docs = dedup.load_table(spark, SF, "documents")
    out = dedup.dedup_pipeline(docs)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # nothing corpus-sized broadcast
    assert out.count() > 0


def test_q67_star_is_single_shuffle_all_dims_broadcast(spark):
    # Six-table star: the ONLY exchange is the final year aggregation;
    # every dimension (part, supplier, customer, nation x2, region)
    # must arrive via broadcast, and the selective predicates must
    # reach the scans.
    from aerovaldb_spark.operators.relational import q67_market_share

    df = q67_market_share(spark, SF)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 1
    pf = " ".join(pushed_filters(df))
    assert "PROMO" in pf and "ASIA" in pf


def test_near_dup_gate_is_broadcast_only(spark):
    # The ingest gate must stay stateless and shuffle-free on the doc
    # side: banded signatures are map-only columns, the corpus buckets
    # arrive via broadcast. A shuffle on the doc side would mean the
    # gate can't run as a stateless streaming stage.
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.plans import has_broadcast_join
    from aerovaldb_spark.streaming import near_dup_gate, reference_band_buckets

    docs = load_table(spark, SF, "documents")
    gated = near_dup_gate(docs, reference_band_buckets(docs))
    assert has_broadcast_join(gated)
    from aerovaldb_spark.plans import formatted_plan

    plan = formatted_plan(gated)
    # no sort-merge join anywhere: every corpus-bucket join broadcast
    assert "SortMergeJoin" not in plan


def test_plan_report_shape(spark):
    from aerovaldb_spark.operators.relational import q03_revenue_by_nation

    rep = plan_report(q03_revenue_by_nation(spark, SF))
    assert set(rep) == {
        "broadcast_join",
        "shuffles",
        "pushed_filters",
        "read_schemas",
        "codegen_spans",
    }
    assert rep["codegen_spans"] >= 1


def test_q76_no_corpus_sized_broadcast_hint(spark):
    # The bigram-LM scoring joins (doc bigrams x model tables) must be
    # free to shuffle/skew-split at scale: the only broadcast HINT in
    # the plan is the one-row vocab aggregate. (AQE may still choose a
    # runtime broadcast at tiny SF — that's fine and not a hint.)
    from aerovaldb_spark.operators.text import q76_bigram_lm_nll

    df = q76_bigram_lm_nll(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1
    assert df.count() > 0


def test_q77_shuffles_hashes_not_text(spark):
    # The contamination join moves 8-byte shingle hashes only: the
    # text column must be pruned before every exchange.
    from aerovaldb_spark.operators.text import q77_contamination_score

    df = q77_contamination_score(spark, SF)
    physical = df._jdf.queryExecution().executedPlan().toString()
    for line in physical.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    assert df.count() > 0


def test_q78_broadcasts_only_query_terms_and_corpus(spark):
    # BM25: exactly two broadcast hints — the top-k query-term set and
    # the one-row corpus aggregate; tf/dl stay shuffle-joinable.
    from aerovaldb_spark.operators.text import q78_bm25_topk

    df = q78_bm25_topk(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 2
    assert df.count() > 0


def test_q26_guard_is_anti_join(spark):
    # The stop-shingle guard must appear as a LEFT ANTI join (the tiny
    # over-cap set), never as an inner join against the full keep set.
    from aerovaldb_spark.operators.dedup import (
        load_table,
        stop_filtered_shingles,
    )

    docs = load_table(spark, SF, "documents")
    df = stop_filtered_shingles(docs)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "LeftAnti" in analyzed
    assert df.count() > 0


def test_q79_knn_guard_refuses_oversized_input(spark):
    # knn_join is the O(n²) validation baseline; the size guard must
    # refuse production-scale input before launching the cross join.
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import knn_join

    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="O\\(n²\\) validation baseline"):
        knn_join(emb, max_rows=10)


def test_q79_window_shuffles_triples_not_vectors(spark):
    # The top-k window ranks (query_id, neighbor_id, cosine) triples;
    # the embedding arrays must be projected away before the final
    # rank exchange (only the explicit repartition carries vectors).
    from aerovaldb_spark.operators.similarity import q79_knn_join

    df = q79_knn_join(spark, SF)
    physical = df._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        line for line in physical.splitlines() if "Exchange hashpartitioning" in line
    ]
    # exactly one vector-carrying exchange (the parallelizing
    # repartition of the left side); the window exchange is hash-only
    vector_exchanges = [line for line in exchanges if "vec" in line or "_vec" in line]
    assert len(vector_exchanges) <= 1, physical


def test_q80_chunking_is_map_only(spark):
    # Sliding-window chunking is a pure scan→project job: zero
    # exchanges of any kind in the physical plan.
    from aerovaldb_spark.operators.text import q80_sliding_chunks

    df = q80_sliding_chunks(spark, SF)
    assert shuffle_count(df) == 0
    assert df.count() > 0


def test_q81_sample_predicate_is_map_side(spark):
    # The stratified keep-flag must be computable without any join or
    # shuffle — the only exchange is the 5-row audit aggregation.
    from aerovaldb_spark.operators.text import q81_stratified_sample

    df = q81_stratified_sample(spark, SF)
    assert shuffle_count(df) <= 1  # the groupBy(source) agg only
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in physical


def test_q82_overlap_join_moves_hashes_not_text(spark):
    # The source×source intersection joins on the 8-byte shingle hash;
    # text must be pruned before every exchange, and the per-source
    # set sizes must broadcast onto the pair counts.
    from aerovaldb_spark.operators.dedup import q82_source_overlap

    df = q82_source_overlap(spark, SF)
    physical = df._jdf.queryExecution().executedPlan().toString()
    for line in physical.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    assert has_broadcast_join(df)
    assert df.count() > 0


def test_q83_cohesion_guard_and_broadcast_sizes(spark):
    # label_cohesion is quadratic within labels: the size guard must
    # refuse oversized input, and the per-label size frame must
    # broadcast onto the pair stats (never shuffle-join a 10-row dim).
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        label_cohesion,
        q83_label_cohesion,
    )

    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="quadratically within labels"):
        label_cohesion(emb, max_rows=10)
    df = q83_label_cohesion(spark, SF)
    assert has_broadcast_join(df)
    assert df.count() > 0


def test_q84_gate_is_one_window_no_join(spark):
    # The adaptive gate is one window over source: a single exchange,
    # no join anywhere in the plan.
    from aerovaldb_spark.operators.text import q84_quality_gate

    df = q84_quality_gate(spark, SF)
    assert shuffle_count(df) <= 1
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in physical
    assert df.count() > 0


def test_q85_budget_is_one_window_no_join(spark):
    # Greedy budget selection: one window shuffle on source, integer
    # running totals only, no join.
    from aerovaldb_spark.operators.text import q85_token_budget

    df = q85_token_budget(spark, SF)
    assert shuffle_count(df) <= 1
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in physical
    assert df.count() > 0


def test_q86_correlated_exists_are_semi_anti_joins(spark):
    # The Q21 shape must compile to one LeftSemi (EXISTS other
    # supplier) and one LeftAnti (NOT EXISTS other late supplier) —
    # never a row-expanding inner join that would re-aggregate — and
    # the supplier dim must broadcast.
    from aerovaldb_spark.operators.relational import q86_waiting_suppliers

    df = q86_waiting_suppliers(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "LeftSemi" in analyzed
    assert "LeftAnti" in analyzed
    assert has_broadcast_join(df)
    assert df.count() > 0


def test_q87_outer_join_keeps_zero_customers(spark):
    # Q13 shape: the LEFT OUTER join must keep order-less customers.
    # The graded corpus gives every customer orders, so the zero
    # bucket is asserted on an injected synthetic pair (q70/q71
    # non-vacuity precedent): customer 99 has no orders and must
    # surface as c_count=0 — an inner join would drop it.
    from aerovaldb_spark import catalog
    from aerovaldb_spark.operators.relational import q87_custdist

    vdir = "plan-test://custdist"
    cust = spark.createDataFrame(
        [(1,), (2,), (99,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long"
    )
    catalog._TABLE_CACHE[(vdir, "customer")] = cust
    catalog._TABLE_CACHE[(vdir, "orders")] = orders
    try:
        rows = {
            r["c_count"]: r["custdist"]
            for r in q87_custdist(spark, vdir).collect()
        }
    finally:
        catalog._TABLE_CACHE.pop((vdir, "customer"), None)
        catalog._TABLE_CACHE.pop((vdir, "orders"), None)
    assert rows == {2: 1, 1: 1, 0: 1}
    # and the graded-corpus result is non-empty
    assert q87_custdist(spark, SF).count() > 0


def test_q88_brand_prunes_before_threshold_agg(spark):
    # Q17 shape: the brand semi-join must prune the fact table BEFORE
    # the per-part threshold aggregation (never aggregate the whole
    # lineitem), and both the brand part-list and the thresholds frame
    # must broadcast.
    from aerovaldb_spark.operators.relational import q88_small_qty_revenue

    df = q88_small_qty_revenue(spark, SF)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "LeftSemi" in analyzed
    # semantic assertions (not plan-string counts): broadcasts are
    # present, the whole query needs at most the threshold-agg +
    # final-agg exchanges, and the lineitem scan reads only the three
    # touched columns (the persist must not block pruning)
    assert has_broadcast_join(df)
    assert shuffle_count(df) <= 2
    schemas = scan_columns(df)
    li_scans = [sch for sch in schemas if "l_partkey" in sch]
    assert li_scans, schemas
    for sch in li_scans:
        assert "l_quantity" in sch and "l_extendedprice" in sch, sch
        assert "l_orderkey" not in sch and "l_shipdate" not in sch, sch
    assert df.count() == 1


def test_q89_quantization_is_map_only_and_bounded(spark):
    # The quantization audit is a pure scan→project job (zero
    # exchanges), and symmetric int8 guarantees per-element error
    # <= scale/2, hence rmse <= scale/2 for every vector.
    from aerovaldb_spark.operators.similarity import q89_quantization_audit

    df = q89_quantization_audit(spark, SF)
    assert shuffle_count(df) == 0
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["rmse"] <= r["q_scale"] / 2 + 1e-9, r


def test_q90_outlier_gate_broadcasts_centroids(spark):
    # The outlier gate's only join is vectors x per-label centroids —
    # |labels| rows — and must broadcast; the rest is one (label, pos)
    # aggregation, one per-label window, and map-only cosine. A
    # shuffle-join here would re-exchange the corpus for a 10-row dim.
    from aerovaldb_spark.operators.similarity import q90_label_outliers

    df = q90_label_outliers(spark, SF)
    assert has_broadcast_join(df)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in physical
    rows = df.collect()
    assert rows
    for r in rows:
        # integer drop rule: exactly floor(pct * n) per label, and the
        # kept band sits at-or-above the discovered admission threshold
        assert r["n_dropped"] == int(0.10 * r["n_vectors"])
        assert r["kept_min_cos"] <= r["kept_avg_cos"] <= r["kept_max_cos"]


def test_embedding_outlier_gate_is_broadcast_only(spark):
    # The streaming outlier gate must stay stateless: admission table
    # via broadcast, cosine map-only — a shuffle on the vector side
    # would mean the gate can't run as a stateless streaming stage.
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.plans import formatted_plan, has_broadcast_join
    from aerovaldb_spark.streaming import admission_table, embedding_outlier_gate

    emb = load_table(spark, SF, "embeddings")
    gated = embedding_outlier_gate(emb, admission_table(emb))
    assert has_broadcast_join(gated)
    assert "SortMergeJoin" not in formatted_plan(gated)


def test_semantic_dup_gate_is_broadcast_only(spark):
    # The semantic gate must stay stateless and shuffle-free on the
    # vector side: SRP bucket is a map-only column, the reference
    # arrives as ONE broadcast per-bucket candidate table, scoring is
    # array-fold expressions. A vector-side shuffle would mean the
    # gate can't run as a stateless streaming stage.
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.plans import formatted_plan, has_broadcast_join
    from aerovaldb_spark.streaming import semantic_dup_gate

    emb = load_table(spark, SF, "embeddings")
    gated = semantic_dup_gate(emb, emb)
    assert has_broadcast_join(gated)
    assert "SortMergeJoin" not in formatted_plan(gated)


def test_q95_q97_budget_windows_carry_no_text(spark):
    # the BPE-denominated budget/packing queries join per-doc token
    # counts back and window over (source); the document text must be
    # consumed by the word split / quality scans only — scans read the
    # minimal columns and no scan pulls unrelated ones
    from aerovaldb_spark.operators.text import (
        q95_bpe_token_budget,
        q97_bpe_pack_sequences,
    )
    from aerovaldb_spark.plans import scan_columns

    import re

    for fn, allowed in (
        (q95_bpe_token_budget, {"doc_id", "text", "source"}),
        (q97_bpe_pack_sequences, {"doc_id", "text", "source"}),
    ):
        cols = set()
        for schema in scan_columns(fn(spark, SF)):
            cols.update(re.findall(r"(\w+):", schema))
        assert cols <= allowed, cols


def test_q98_broadcasts_probes_only(spark):
    # quantized ANN: the 5-row probe side broadcasts; the corpus scan
    # reads exactly (vec_id, embedding); no shuffle other than the
    # per-query top-k window
    from aerovaldb_spark.operators.similarity import q98_quantized_ann_topk
    from aerovaldb_spark.plans import (
        formatted_plan,
        scan_columns,
        shuffle_count,
    )

    df = q98_quantized_ann_topk(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # tiny probe side, by design
    assert "SortMergeJoin" not in plan
    assert shuffle_count(df) <= 1
    import re

    for schema in scan_columns(df):
        names = set(re.findall(r"(\w+):", schema))
        assert names <= {"vec_id", "embedding"}, schema


def test_q99_candidates_are_equi_join_and_text_never_shuffles(spark):
    # The AllPairs candidate stage must be a prefix-to-prefix EQUI-join
    # on term (never a cartesian/nested-loop all-pairs), and the text
    # column must be pruned before every exchange — only (doc, term,
    # weight) keyed rows move.
    from aerovaldb_spark.operators.text import q99_tfidf_cosine_knn

    df = q99_tfidf_cosine_knn(spark, SF)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    # every nested-loop join in the tree is the broadcast 1-row
    # doc-count scalar (the analyzed tree replays the cached weights
    # subtree once per reference, so counts scale together): each
    # conditionless Join Cross must be paired with a broadcast hint —
    # an unhinted cross join would be the all-pairs plan this operator
    # exists to avoid.
    assert_all_crosses_hinted(df)
    for line in physical.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    assert df.count() > 0


def test_q110_banded_candidates_equi_join_no_all_pairs(spark):
    """The banded rung exists to REPLACE density-driven candidate
    volume with a dial — so no stage may be all-pairs: the candidate
    join must be an equi-join on (band, signature), the only
    nested-loop joins the broadcast 1-row doc-count scalar, and the
    text column pruned before every exchange."""
    from aerovaldb_spark.operators.text import q110_tfidf_banded_knn

    df = q110_tfidf_banded_knn(spark, SF)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    assert_all_crosses_hinted(df)
    for line in physical.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    # the banding signature is a join key somewhere in the plan
    assert "sig" in physical
    assert df.count() > 0


def test_q111_banded_screen_no_all_pairs(spark):
    """The banded screen's candidate join must be a (band, signature)
    equi-join — no cartesian, crosses only the hinted 1-row scalar,
    text pruned before every exchange (q110's guarantees on the screen
    contract's plan)."""
    from aerovaldb_spark.operators.text import q111_tfidf_banded_screen

    df = q111_tfidf_banded_screen(spark, SF)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical
    assert_all_crosses_hinted(df)
    for line in physical.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    assert "sig" in physical
    assert df.count() > 0
