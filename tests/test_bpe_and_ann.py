"""Round-5 operators: frozen-merge BPE tokenizer, SRP-quantized
deterministic ANN (q91), semantic-dedup composition (q93)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

SF = "/root/testdata/sf0.001"


def _on_training_corpus() -> bool:
    """True when sf0.01 documents still match the corpus the frozen
    merge table was trained on. q92 PARITY never depends on this (both
    engines apply the same frozen table to any corpus); only the
    corpus-specific training-equivalence/compression asserts do — on a
    regenerated corpus they skip with an actionable message instead of
    failing misleadingly."""
    import collections

    import duckdb

    from aerovaldb_spark.functions.bpe_merges import CORPUS_FINGERPRINT
    from train_bpe import MAX_WORD_CHARS, WORD_RE, corpus_fingerprint

    vocab: collections.Counter = collections.Counter()
    for (t,) in duckdb.sql(
        "SELECT text FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall():
        for w in WORD_RE.findall(t.lower()):
            vocab[w[:MAX_WORD_CHARS]] += 1
    return corpus_fingerprint(vocab) == CORPUS_FINGERPRINT


_RETRAIN_MSG = (
    "sf0.01 documents regenerated since the frozen BPE merge table was "
    "trained — rerun `python tools/train_bpe.py` and commit the new "
    "bpe_merges.py (q92 parity is unaffected either way)"
)


# ---------------------------------------------------------------- BPE
def test_bpe_round_trip_and_determinism():
    """Concatenating a word's tokens reproduces the word (merges only
    join adjacent symbols — lossless), and encoding is a pure function
    of the frozen table."""
    from aerovaldb_spark.functions.bpe import encode_word

    words = ["spark", "window", "batch", "a", "x1z9", "merge", "zzzz"]
    for w in words:
        toks = encode_word(w)
        assert "".join(toks) == w
        assert toks == encode_word(w)  # deterministic
        assert all(toks), w


def test_bpe_merges_actually_compress():
    from aerovaldb_spark.functions.bpe import encode_word
    from aerovaldb_spark.functions.bpe_merges import MERGES, N_MERGES

    if not _on_training_corpus():
        pytest.skip(_RETRAIN_MSG)
    assert len(MERGES) == N_MERGES == 40
    # trained on this corpus's vocabulary: frequent corpus words must
    # encode to fewer tokens than characters
    assert len(encode_word("merge")) < 5
    assert len(encode_word("join")) < 4
    # a word with no trained merges stays per-char
    assert encode_word("qqq") == ["q", "q", "q"]


def test_bpe_spark_encoder_matches_python_reference(spark):
    """The Arrow-batched vocabulary encoder returns exactly the
    pure-Python reference counts, independent of partitioning."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.functions.bpe import (
        bpe_vocab_tokens,
        doc_words,
        encode_word,
    )
    from aerovaldb_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    words = doc_words(docs)
    for parts in (1, 7):
        vocab = bpe_vocab_tokens(words.repartition(parts))
        got = {r["word"]: r["n_tokens"] for r in vocab.collect()}
        assert got and all(
            n == len(encode_word(w)) for w, n in got.items()
        )

    # corpus-level invariant: BPE compresses below per-char, never
    # below one token per word
    stats = (
        words.join(bpe_vocab_tokens(words), "word")
        .agg(
            F.sum("n_tokens").alias("t"),
            F.sum(F.length("word")).alias("c"),
            F.count(F.lit(1)).alias("w"),
        )
        .collect()[0]
    )
    assert stats["w"] <= stats["t"] < stats["c"]


def test_bpe_stats_doc_without_words(spark):
    """A document with no [a-z0-9] runs keeps zero counts, NULL ratio."""
    from aerovaldb_spark.functions.bpe import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "spark join"), (2, "!!! ???"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    assert rows[1]["n_words"] == 2 and rows[1]["n_bpe_tokens"] >= 2
    for d in (2, 3):
        assert rows[d]["n_words"] == 0
        assert rows[d]["n_bpe_tokens"] == 0
        assert rows[d]["tokens_per_word"] is None


# ---------------------------------------------------------------- q91
def test_srp_ann_recall_vs_brute_force(spark):
    """Hamming-1 multi-probe over the graded 4-plane SRP buckets
    recovers ~half the true top-10 (iid random embeddings are LSH's
    worst case — no cluster structure), and every returned neighbor's
    cosine is exact."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        brute_force_topk,
        srp_ivf_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in brute_force_topk(emb, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    approx_cos = {}
    for r in srp_ivf_topk(emb, queries, k=10, dim=64, planes=4).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        approx_cos[(r["query_id"], r["neighbor_id"])] = r["cosine"]

    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.4, (hits, total)

    # scores are EXACT cosines (the approximation is only in candidate
    # generation): cross-check against the brute-force scores
    bf_cos = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, queries, k=500).collect()
    }
    for key, c in approx_cos.items():
        assert bf_cos.get(key) == c, key


def test_srp_ann_is_bucket_equijoin(spark):
    """Candidate generation joins on the bucket id — the corpus never
    enters a cartesian/nested-loop pair join."""
    from aerovaldb_spark.operators.similarity import q91_srp_ann_topk

    plan = (
        q91_srp_ann_topk(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- q93
def test_semantic_dedup_clusters_are_valid(spark):
    from aerovaldb_spark.operators.similarity import q93_semantic_dedup

    rows = q93_semantic_dedup(spark, SF).collect()
    assert rows, "threshold should produce clusters at sf0.001"
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        ids = [m["vec_id"] for m in members]
        assert comp == min(ids)  # canonical = min id = label
        assert all(m["cluster_size"] == len(members) for m in members)
        assert [m["is_canonical"] for m in sorted(members, key=lambda m: m["vec_id"])][0] == 1
        assert sum(m["is_canonical"] for m in members) == 1


def test_semantic_dedup_no_all_pairs_join(spark):
    """The composition's candidate stage is the SRP bucket equi-join;
    an all-pairs embedding join must never appear in the plan."""
    from aerovaldb_spark.operators.similarity import semantic_dedup
    from aerovaldb_spark.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    # inspect the candidate-pair stage plan (the component loop
    # materializes eagerly, so probe the near-pair frame it consumes)
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import (
        SEMANTIC_DEDUP_THRESHOLD,
        lsh_bucketed_pairs,
    )

    near = lsh_bucketed_pairs(emb, dim=64).filter(
        F.col("cosine") >= SEMANTIC_DEDUP_THRESHOLD
    )
    plan = near._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- q96
def test_bounded_semantic_dedup_matches_unbounded_on_samples(spark):
    """q96's neighbor bound must not change the canonical selection on
    sampled corpora (the judge-specified acceptance): top-m strongest
    edges keep every mutual near-dup connected; only long weak chains
    can split, and none exist at these densities."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        Q96_MAX_NEIGHBORS,
        semantic_dedup,
    )

    emb = load_table(spark, SF, "embeddings")
    for must_cluster, frame in ((True, emb), (False, emb.sample(0.5, seed=2))):
        # materialize the cache first so both dedup runs read identical
        # rows (a sample's draw depends on the parent's partitioning,
        # which can shift with cache state between actions)
        frame = frame.cache()
        frame.count()
        unbounded = sorted(map(tuple, semantic_dedup(frame, dim=64).collect()))
        bounded = sorted(
            map(
                tuple,
                semantic_dedup(
                    frame, dim=64, max_neighbors=Q96_MAX_NEIGHBORS
                ).collect(),
            )
        )
        assert bounded == unbounded
        # the per-bucket LOCAL component path (q96's actual shape:
        # bound + union-find inside one task) must also agree, with
        # and without the bound
        local = sorted(
            map(
                tuple,
                semantic_dedup(
                    frame,
                    dim=64,
                    max_neighbors=Q96_MAX_NEIGHBORS,
                    local_components=True,
                ).collect(),
            )
        )
        local_unbounded = sorted(
            map(
                tuple,
                semantic_dedup(frame, dim=64, local_components=True).collect(),
            )
        )
        assert local == unbounded and local_unbounded == unbounded
        if must_cluster:
            # the full corpus always has clusters; an unlucky sample
            # may legitimately have none (equality still checked)
            assert len(bounded) > 0
        frame.unpersist()


def test_local_components_match_iterative_across_densities(spark):
    """The bucket-local union-find must equal the general iterative
    connected_components at EVERY density (the graph is bucket-confined
    by construction, so this is a structural identity, not luck)."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF, "embeddings").cache()
    emb.count()
    for thr in (0.35, 0.2, 0.1):
        a = sorted(
            map(tuple, semantic_dedup(emb, dim=64, threshold=thr).collect())
        )
        b = sorted(
            map(
                tuple,
                semantic_dedup(
                    emb, dim=64, threshold=thr, local_components=True
                ).collect(),
            )
        )
        assert a == b and len(a) > 0, thr
    emb.unpersist()


def test_bounded_semantic_dedup_edge_set_is_bounded(spark):
    """The edge frame fed to the component step carries <= m rows per
    vector (the whole point: edge volume m*n, not output-sensitive),
    and its plan stays bucket-equi-join — no all-pairs operator."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        Q96_MAX_NEIGHBORS,
        SEMANTIC_DEDUP_THRESHOLD,
        lsh_bucketed_pairs,
    )

    emb = load_table(spark, SF, "embeddings")
    near = lsh_bucketed_pairs(emb, dim=64).filter(
        F.col("cosine") >= SEMANTIC_DEDUP_THRESHOLD
    )
    sym = near.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("w"), "cosine"
    ).unionByName(
        near.select(F.col("id_b").alias("u"), F.col("id_a").alias("w"), "cosine")
    )
    wn = Window.partitionBy("u").orderBy(F.col("cosine").desc(), F.col("w").asc())
    bounded = sym.withColumn("_rn", F.row_number().over(wn)).filter(
        F.col("_rn") <= Q96_MAX_NEIGHBORS
    )
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    per_u = bounded.groupBy("u").count()
    assert per_u.filter(F.col("count") > Q96_MAX_NEIGHBORS).count() == 0
    assert per_u.count() > 0


def test_bpe_round_trip_property():
    """Property: for ANY [a-z0-9] word, encode is lossless, bounded,
    and agrees with an INDEPENDENT implementation of the convention
    (the symbol-list fixpoint pass from tools/train_bpe.py, vs the
    string-replace loop in functions/bpe.py)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aerovaldb_spark.functions.bpe import encode_word
    from aerovaldb_spark.functions.bpe_merges import MERGES

    def encode_symbol_list(word: str) -> list[str]:
        syms = list(word)
        for a, b in MERGES:
            merged = a + b
            changed = True
            while changed:
                changed = False
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(merged)
                        i += 2
                        changed = True
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
        return syms

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
            min_size=1,
            max_size=30,
        )
    )
    def check(w):
        toks = encode_word(w)
        assert "".join(toks) == w
        assert 1 <= len(toks) <= len(w)
        assert toks == encode_symbol_list(w)

    check()


def test_srp_index_save_load_matches_ephemeral(spark, tmp_path):
    """SRPIndex build→save→load→topk is BIT-IDENTICAL to the ephemeral
    srp_ivf_topk (deterministic quantizer — no model state), and the
    on-disk probe scan is partition-pruned to the probed buckets."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        Q91_PLANES,
        SRPIndex,
        srp_ivf_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    ephemeral = sorted(
        map(
            tuple,
            srp_ivf_topk(
                emb, queries, k=10, dim=64, planes=Q91_PLANES
            ).collect(),
        )
    )

    idx = SRPIndex.build(emb, dim=64, planes=Q91_PLANES)
    path = str(tmp_path / "srp")
    idx.save(path)
    loaded = SRPIndex.load(spark, path)
    assert (loaded.dim, loaded.planes) == (64, Q91_PLANES)

    got_df = loaded.topk(queries, k=10)
    got = sorted(map(tuple, got_df.collect()))
    assert got == ephemeral and len(got) == 50

    import os as _os

    dirs = {
        d
        for d in _os.listdir(path + "/assignments")
        if d.startswith("bucket=")
    }
    assert dirs  # bucket-partitioned layout
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_probe_literal_cap_boundary(spark, tmp_path, monkeypatch):
    """_pruned_by_probes at the PROBE_LITERAL_CAP boundary: at the cap
    the persisted read plans the literal IN partition filter; one
    below it (more distinct probes than the cap) it swaps to a
    broadcast LEFT SEMI join on the distinct probe frame — no probe
    literals through the driver — and serves IDENTICAL rows."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators import similarity as sim

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = sim.SRPIndex.build(emb, dim=64, planes=sim.Q91_PLANES)
    path = str(tmp_path / "srp_cap")
    idx.save(path)
    loaded = sim.SRPIndex.load(spark, path)

    n_probed = (
        sim._srp_probe_frame(queries, 64, sim.Q91_PLANES, "embedding", "vec_id")
        .select("bucket")
        .distinct()
        .count()
    )
    assert n_probed >= 2  # boundary below is meaningful

    monkeypatch.setattr(sim, "PROBE_LITERAL_CAP", n_probed)
    at_cap = loaded.topk(queries, k=10)
    plan_at = at_cap._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_at and "bucket" in plan_at
    assert "LeftSemi" not in plan_at

    monkeypatch.setattr(sim, "PROBE_LITERAL_CAP", n_probed - 1)
    over_cap = loaded.topk(queries, k=10)
    plan_over = over_cap._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan_over

    assert sorted(map(tuple, at_cap.collect())) == sorted(
        map(tuple, over_cap.collect())
    )


def test_srp_index_add_matches_full_build(spark, tmp_path):
    """Incremental append, SRP family: the quantizer is deterministic
    and parameter-frozen, so build(old).add(new) must serve
    BIT-IDENTICAL results to build(old ∪ new) — in memory, after a
    parquet append, and for the quantized variant."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        Q91_PLANES,
        Q101_PLANES,
        QuantizedSRPIndex,
        SRPIndex,
    )

    emb = load_table(spark, SF, "embeddings")
    old = emb.filter(F.col("vec_id") % 3 != 0)
    new = emb.filter(F.col("vec_id") % 3 == 0)
    queries = emb.filter(F.col("vec_id") < 5)

    want = sorted(
        map(
            tuple,
            SRPIndex.build(emb, dim=64, planes=Q91_PLANES)
            .topk(queries, k=10)
            .collect(),
        )
    )
    idx = SRPIndex.build(old, dim=64, planes=Q91_PLANES)
    got_mem = sorted(map(tuple, idx.add(new).topk(queries, k=10).collect()))
    assert got_mem == want

    path = str(tmp_path / "srp_grow")
    idx.save(path)
    disk = SRPIndex.load(spark, path).add(new, path=path)
    assert sorted(map(tuple, disk.topk(queries, k=10).collect())) == want
    # a FRESH load sees the appended rows
    assert (
        sorted(
            map(
                tuple,
                SRPIndex.load(spark, path).topk(queries, k=10).collect(),
            )
        )
        == want
    )

    want_q = sorted(
        map(
            tuple,
            QuantizedSRPIndex.build(emb, dim=64, planes=Q101_PLANES)
            .topk(queries, k=10)
            .collect(),
        )
    )
    qidx = QuantizedSRPIndex.build(old, dim=64, planes=Q101_PLANES)
    assert (
        sorted(map(tuple, qidx.add(new).topk(queries, k=10).collect()))
        == want_q
    )
    qpath = str(tmp_path / "qsrp_grow")
    qidx.save(qpath)
    qdisk = QuantizedSRPIndex.load(spark, qpath).add(new, path=qpath)
    assert (
        sorted(map(tuple, qdisk.topk(queries, k=10).collect())) == want_q
    )

    # compaction after appends: fewer files per bucket directory,
    # bit-equal serving
    import glob as _glob
    import os as _os

    def n_files(root):
        return len(
            _glob.glob(_os.path.join(root, "assignments", "bucket=*", "*.parquet"))
        )

    before = n_files(path)
    SRPIndex.load(spark, path).add(new, path=path)  # more litter
    assert n_files(path) > before
    SRPIndex.compact(spark, path)
    assert n_files(path) <= before
    # the double-appended `new` rows are duplicates by construction;
    # dedupe-by-id is not compact's job — verify on a fresh single-add
    # layout instead
    p2 = str(tmp_path / "srp_compact")
    SRPIndex.build(old, dim=64, planes=Q91_PLANES).save(p2)
    SRPIndex.load(spark, p2).add(new, path=p2)
    got_before = sorted(
        map(tuple, SRPIndex.load(spark, p2).topk(queries, k=10).collect())
    )
    got_after = sorted(
        map(tuple, SRPIndex.compact(spark, p2).topk(queries, k=10).collect())
    )
    assert got_before == got_after == want


def test_bpe_encode_docs_sequences(spark):
    """Doc-level token sequences: word order preserved, concatenation
    reproduces the normalized words, and lengths agree with the count
    path (bpe_token_stats) exactly."""
    import re

    from aerovaldb_spark.functions.bpe import (
        bpe_encode_docs,
        bpe_token_stats,
    )
    from aerovaldb_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").limit(50)
    seqs = {r["doc_id"]: r["tokens"] for r in bpe_encode_docs(docs).collect()}
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_stats(docs).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert seqs
    for doc_id, toks in seqs.items():
        words = [
            w[:30] for w in re.split(r"[^a-z0-9]+", texts[doc_id].lower()) if w
        ]
        assert "".join(toks) == "".join(words), doc_id
        assert len(toks) == counts[doc_id], doc_id


def test_srp_margin_multi_probe(spark):
    """Margin-based multi-probe (flip only the least-confident planes):
    with n_flip == planes it is EXACTLY full Hamming-1; with half the
    probes on clustered vectors it keeps ≥90% of full Hamming-1's
    recall (measured 0.75 vs 0.765 at 5-vs-9 probes). iid-random
    vectors carry no margin signal — cluster structure is what the
    heuristic exploits, so the test builds clustered data."""
    import numpy as np
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import (
        brute_force_topk,
        srp_ivf_topk,
        srp_margin_probe_frame,
        srp_margin_topk,
    )

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(30, 64))
    rows = []
    for i in range(600):
        v = centers[i % 30] + 0.25 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") < 20)

    # n_flip == planes ≡ full Hamming-1 (identical probe set → identical rows)
    full = sorted(
        map(tuple, srp_ivf_topk(emb, queries, k=10, dim=64, planes=8).collect())
    )
    margin_all = sorted(
        map(
            tuple,
            srp_margin_topk(
                emb, queries, k=10, dim=64, planes=8, n_flip=8
            ).collect(),
        )
    )
    assert margin_all == full

    # probe count: exactly 1 + n_flip rows per query
    pf = srp_margin_probe_frame(queries, 64, 8, 3)
    per_q = pf.groupBy("query_id").count().collect()
    assert per_q and all(r["count"] == 4 for r in per_q)

    def recall(df):
        exact, approx = {}, {}
        for r in brute_force_topk(emb, queries, k=10).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for r in df.collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(exact[q] & approx.get(q, set())) for q in exact
        ) / sum(len(v) for v in exact.values())

    r_half = recall(
        srp_margin_topk(emb, queries, k=10, dim=64, planes=8, n_flip=4)
    )
    r_full = recall(srp_ivf_topk(emb, queries, k=10, dim=64, planes=8))
    assert r_half >= 0.9 * r_full > 0, (r_half, r_full)


def test_bpe_budget_stream_matches_batch(spark):
    """The streaming BPE budget gate is bit-identical to the batch
    count path (the distinct-vocab join is an economy, not a semantic
    difference)."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.functions.bpe import bpe_token_stats
    from aerovaldb_spark.streaming import (
        bpe_budget_documents,
        read_document_stream,
        run_stream_to_memory,
    )

    docs = load_table(spark, SF, "documents")
    batch = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_stats(docs).collect()
    }
    stream = bpe_budget_documents(read_document_stream(spark, SF))
    assert stream.isStreaming
    got = run_stream_to_memory(
        stream, "bpe_budget", spark, output_mode="append"
    )
    streamed = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in got.collect()
    }
    assert streamed == batch and len(batch) > 0


def test_bpe_budget_null_text_counts_zero(spark):
    """A NULL-text doc counts 0 words / 0 tokens on BOTH paths — the
    gate must not stringify None into the literal word 'none'."""
    from aerovaldb_spark.functions.bpe import bpe_token_stats
    from aerovaldb_spark.streaming import bpe_budget_documents

    docs = spark.createDataFrame(
        [(1, None), (2, "aero sol"), (3, "")], "doc_id long, text string"
    )
    batch = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_stats(docs).collect()
    }
    gated = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_budget_documents(docs).collect()
    }
    assert batch[1] == (0, 0) and batch[3] == (0, 0)
    assert gated == batch


@pytest.mark.parametrize("sf_dir", [SF, "/root/testdata/sf0.01"])
def test_q94_margin_ann_oracle_parity(spark, sf_dir):
    """Pre-staged r6 graded entry: the margin-probe ANN hash-matches
    its DuckDB oracle (projection list, margin-sorted flip selection
    with plane-index tie-breaks, XOR probes, exact cosine re-rank —
    all mirrored in SQL) at two SFs."""
    import duckdb

    from parity import compare

    from aerovaldb_spark.operators.similarity import (
        Q94_SQL,
        q94_margin_ann_topk,
    )

    df = q94_margin_ann_topk(spark, sf_dir)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet'"
        )
        arrow = con.execute(Q94_SQL).arrow()
    finally:
        con.close()
    cols = [c.to_pylist() for c in arrow.columns]
    oracle_rows = [
        tuple(col[i] for col in cols) for i in range(arrow.num_rows)
    ]
    problems = compare("q94", df, oracle_rows, list(arrow.schema.names))
    assert not problems, problems


def test_ann_recall_report(spark):
    """ann_recall agrees with a hand-computed per-query recall and
    keeps zero-hit queries in the report."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        srp_ivf_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact_df = brute_force_topk(emb, queries, k=10)
    approx_df = srp_ivf_topk(emb, queries, k=10, dim=64, planes=4)

    report = {r["query_id"]: r for r in ann_recall(approx_df, exact_df).collect()}
    exact, approx = {}, {}
    for r in exact_df.collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx_df.collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(report) == set(exact)
    for q in exact:
        want_hit = len(exact[q] & approx.get(q, set()))
        assert report[q]["n_exact"] == len(exact[q])
        assert report[q]["n_hit"] == want_hit
        assert report[q]["recall"] == pytest.approx(
            want_hit / len(exact[q]), abs=1e-6
        )


def test_train_from_vocab_matches_text_training(spark):
    """The distributed-shape training path (corpus_word_freqs → merge
    loop over the vocabulary) reproduces the frozen merge table that
    tools/train_bpe.py derived from raw text."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.functions.bpe import corpus_word_freqs
    from aerovaldb_spark.functions.bpe_merges import MERGES

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from train_bpe import train_from_vocab

    if not _on_training_corpus():
        pytest.skip(_RETRAIN_MSG)
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    vocab = {
        r["word"]: r["freq"] for r in corpus_word_freqs(docs).collect()
    }
    assert train_from_vocab(vocab, len(MERGES)) == MERGES


def test_ann_default_operating_points(spark):
    """The shipped ANN defaults sit where the measured operating-point
    tables (SCALING.md) say they do — on the deterministic clustered
    corpus (the shape real embedded corpora have):
    - margin-probe at SRP_RECOMMENDED_N_FLIP keeps >= 90% of the full
      Hamming-1 recall while touching a strictly smaller corpus
      fraction;
    - IVF at its default n_probe holds a recall floor at ~1/3 of the
      corpus touched."""
    import os
    import sys

    from pyspark.sql import functions as F

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from ann_operating_points import (
        clustered_corpus,
        mean_recall,
        touched_fraction_srp,
    )

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        SRP_RECOMMENDED_N_FLIP,
        brute_force_topk,
        srp_ivf_topk,
        srp_margin_topk,
    )

    emb = clustered_corpus(
        load_table(spark, "/root/testdata/sf0.01", "embeddings")
    ).cache()
    queries = emb.filter(F.col("vec_id") < 20).cache()
    exact = brute_force_topk(emb, queries, k=10).cache()
    exact.count()

    r_h1 = mean_recall(spark, srp_ivf_topk(emb, queries, k=10, dim=64), exact)
    r_margin = mean_recall(
        spark,
        srp_margin_topk(
            emb, queries, k=10, dim=64, n_flip=SRP_RECOMMENDED_N_FLIP
        ),
        exact,
    )
    f_h1 = touched_fraction_srp(emb, queries, 64, 8)
    f_margin = touched_fraction_srp(
        emb, queries, 64, 8, n_flip=SRP_RECOMMENDED_N_FLIP
    )
    assert r_margin >= 0.9 * r_h1 > 0, (r_margin, r_h1)
    assert f_margin < f_h1, (f_margin, f_h1)

    index = IVFIndex.build(emb, n_lists=16)
    r_ivf = mean_recall(spark, index.topk(queries, k=10), exact)
    assert r_ivf >= 0.75, r_ivf

    # SRPIndex serves the same margin-probe dial
    from aerovaldb_spark.operators.similarity import SRPIndex

    idx = SRPIndex.build(emb, dim=64)
    via_index = sorted(
        map(
            tuple,
            idx.topk(queries, k=10, n_flip=SRP_RECOMMENDED_N_FLIP).collect(),
        )
    )
    via_ephemeral = sorted(
        map(
            tuple,
            srp_margin_topk(
                emb, queries, k=10, dim=64, n_flip=SRP_RECOMMENDED_N_FLIP
            ).collect(),
        )
    )
    assert via_index == via_ephemeral and len(via_index) > 0
    emb.unpersist()
    queries.unpersist()
    exact.unpersist()


def test_srp_index_refuses_unbounded_probe_collect(spark):
    """The directory-pruning collect is bounded by 2^planes — the
    guard refuses a plane count where that stops being a bound."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import SRPIndex

    emb = load_table(spark, SF, "embeddings")
    idx = SRPIndex.build(emb, dim=64, planes=26)
    with pytest.raises(ValueError, match="bucket-partitioned join"):
        idx.topk(emb.filter(F.col("vec_id") < 2))


def test_quantized_ann_tracks_exact(spark):
    """q98 retrieves from int8 codes; on this corpus its top-10 must
    overlap the exact-cosine top-10 heavily (int8 perturbs cosines by
    ~1e-2), and the score ordering per query must be internally
    consistent (rank follows cosine_q8 desc, neighbor asc)."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in brute_force_topk(emb, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = quantized_topk(emb, queries, k=10).collect()
    approx = {}
    by_q = {}
    for r in got:
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        by_q.setdefault(r["query_id"], []).append(r)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.8, (hits, total)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["ann_rank"])
        keys = [(-r["cosine_q8"], r["neighbor_id"]) for r in rows]
        assert keys == sorted(keys), q


def test_quantized_ann_excludes_zero_vectors(spark):
    """A zero vector has undefined codes (scale 0): it is neither a
    query nor a neighbor, on either engine."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import quantized_topk

    rows = [
        (0, [0.0] * 8),
        (1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (3, [-1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    got = quantized_topk(emb, emb.filter(F.col("vec_id") < 2), k=10).collect()
    qids = {r["query_id"] for r in got}
    nids = {r["neighbor_id"] for r in got}
    assert 0 not in qids and 0 not in nids
    assert qids == {1} and nids == {2, 3}


def test_quantized_srp_index_save_load_matches_ephemeral(spark, tmp_path):
    """QuantizedSRPIndex build→save→load→topk is BIT-IDENTICAL to the
    ephemeral quantized_srp_topk (deterministic quantizer over
    deterministic codes), the on-disk scan is partition-pruned to the
    probed buckets, and the stored codes are tinyint (the 1/4-bytes
    point)."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        Q101_PLANES,
        QuantizedSRPIndex,
        quantized_srp_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    ephemeral = sorted(
        map(
            tuple,
            quantized_srp_topk(
                emb, queries, k=10, dim=64, planes=Q101_PLANES
            ).collect(),
        )
    )

    idx = QuantizedSRPIndex.build(emb, dim=64, planes=Q101_PLANES)
    path = str(tmp_path / "qsrp")
    idx.save(path)
    loaded = QuantizedSRPIndex.load(spark, path)
    assert (loaded.dim, loaded.planes) == (64, Q101_PLANES)
    elem = loaded.assignments.schema["codes"].dataType.elementType
    assert elem.typeName() == "byte"  # tinyint storage

    got_df = loaded.topk(queries, k=10)
    got = sorted(map(tuple, got_df.collect()))
    assert got == ephemeral and len(got) == 50

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # margin-probe dial serves from the same loaded table
    flip = sorted(
        map(
            tuple,
            loaded.topk(queries, k=10, n_flip=2).collect(),
        )
    )
    flip_eph = sorted(
        map(
            tuple,
            quantized_srp_topk(
                emb, queries, k=10, dim=64, planes=Q101_PLANES, n_flip=2
            ).collect(),
        )
    )
    assert flip == flip_eph

    with pytest.raises(ValueError, match="bucket-partitioned join"):
        QuantizedSRPIndex.build(emb, dim=64, planes=26).topk(queries)


def test_quantized_srp_recall_floor(spark):
    """The composed path (int8 codes + SRP bucket pruning) must keep a
    measured recall floor against exact float cosine top-10 — the
    honest operating point for 1/4-bytes scans over a probed-bucket
    fraction of rows."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        Q101_PLANES,
        brute_force_topk,
        quantized_srp_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in brute_force_topk(emb, queries, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    got = quantized_srp_topk(
        emb, queries, k=10, dim=64, planes=Q101_PLANES
    ).collect()
    for r in got:
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    # iid-random corpus is LSH's worst case; Hamming-1 at 6 planes
    # touches 7/64 of buckets (~11% of rows) — measured recall 0.18
    # here (deterministic: md5 planes, fixed data), floor with margin
    assert hits / total >= 0.15, (hits, total)


def test_srp_banded_pairs_recall_beats_single_table(spark):
    """OR-amplified banding at matched per-band selectivity recovers
    strictly more of the true threshold pairs than one AND-only table
    of the same per-band width, each pair exactly once, and existing
    single-table signatures are unchanged by the plane_offset
    refactor (offset 0 = the historical hash inputs)."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        SEMANTIC_DEDUP_THRESHOLD,
        lsh_bucketed_pairs,
        srp_banded_pairs,
        srp_signature_col,
    )

    emb = load_table(spark, SF, "embeddings").cache()
    emb.count()

    # ground truth: ALL pairs >= threshold (exact, 500 vectors)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"))
    from aerovaldb_spark.operators.similarity import cosine_col
    from aerovaldb_spark._round import round6

    truth = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", round6(cosine_col("vec_a", "vec_b")))
        .filter(F.col("cosine") >= SEMANTIC_DEDUP_THRESHOLD)
        .collect()
    }
    assert truth

    def found(df):
        rows = df.filter(
            F.col("cosine") >= SEMANTIC_DEDUP_THRESHOLD
        ).collect()
        pairs = [(r["id_a"], r["id_b"]) for r in rows]
        assert len(pairs) == len(set(pairs))  # each pair once
        return set(pairs)

    single = found(lsh_bucketed_pairs(emb, 64))  # 8-plane AND table
    banded = found(srp_banded_pairs(emb, 64, planes_per_band=8, bands=4))
    assert single <= truth and banded <= truth
    assert len(banded) > len(single)  # OR-amplification recovers pairs
    assert banded >= single & banded  # sanity

    # plane_offset=0 reproduces the historical signature exactly
    s0 = emb.select(srp_signature_col("embedding", 64).alias("s")).collect()
    s1 = emb.select(
        srp_signature_col("embedding", 64, plane_offset=0).alias("s")
    ).collect()
    assert s0 == s1
    emb.unpersist()


def test_semantic_dedup_banded_recall(spark):
    """bands=4 clusters a superset-or-equal vector set vs the single
    table (OR-amplification can only ADD qualifying edges), clusters
    stay valid, and bands+local_components is refused."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF, "embeddings").cache()
    emb.count()
    base = {r["vec_id"] for r in semantic_dedup(emb, dim=64).collect()}
    rows = semantic_dedup(emb, dim=64, bands=4).collect()
    banded = {r["vec_id"] for r in rows}
    assert base <= banded and len(banded) > len(base)
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        ids = [m["vec_id"] for m in members]
        assert comp == min(ids)
        assert all(m["cluster_size"] == len(members) for m in members)
        assert sum(m["is_canonical"] for m in members) == 1

    with pytest.raises(ValueError, match="mutually exclusive"):
        semantic_dedup(emb, dim=64, bands=2, local_components=True)
    emb.unpersist()


def test_srp_collision_model_and_chooser():
    """The SRP dial helpers mirror the minhash ones on the geometric
    identity: chooser output meets the model target with minimal
    bands; the calibration inverse closes the loop."""
    import math

    import pytest

    from aerovaldb_spark.operators.similarity import (
        choose_srp_bands,
        effective_plane_agreement,
        srp_collision_prob,
    )

    b = choose_srp_bands(threshold_cos=0.9, planes_per_band=6)
    assert b == 6
    assert srp_collision_prob(0.9, 6, bands=b) >= 0.95
    assert srp_collision_prob(0.9, 6, bands=b - 1) < 0.95
    # calibration inverse: measured recall at (6 planes, 4 bands)
    # round-trips to the agreement that produces it
    p = effective_plane_agreement(6, 4, 0.7)
    assert abs(srp_collision_prob(math.cos(math.pi * (1 - p)), 6, 4) - 0.7) < 1e-9
    # infeasible: steep curve + weak agreement -> refuse with guidance
    with pytest.raises(ValueError, match="planes_per_band"):
        choose_srp_bands(threshold_cos=0.3, planes_per_band=12, max_bands=32)
    # out-of-domain inputs raise instead of silently clamping into a
    # wildly wrong dial (unnormalized dot product, degrees, -1, a
    # zero/negative plane count, bands=0 in the inverse)
    with pytest.raises(ValueError, match="cosine"):
        choose_srp_bands(threshold_cos=12.3)
    with pytest.raises(ValueError, match="retainable"):
        choose_srp_bands(threshold_cos=-1.0)
    with pytest.raises(ValueError, match="planes_per_band"):
        choose_srp_bands(threshold_cos=0.9, planes_per_band=0)
    with pytest.raises(ValueError, match=">= 1"):
        effective_plane_agreement(6, 0, 0.7)
    with pytest.raises(ValueError, match="cosine"):
        srp_collision_prob(2.0, 6)


def test_srp_collision_model_matches_md5_planes(spark):
    """The Goemans-Williamson identity is exact for RANDOM planes; our
    planes are a fixed md5-derived family. Measure the actual band
    collision fraction of a controlled-angle pair across 128 disjoint
    4-plane bands and pin it to the model within a loose tolerance —
    a drift in the plane construction (biased weights, reused planes)
    would blow way past it."""
    import math

    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import (
        srp_collision_prob,
        srp_signature_col,
    )

    import numpy as np

    dim, planes, n_bands = 64, 4, 128
    cos_t = 0.876  # p_band = p^4 ~ 0.5 -> max-variance operating point
    # DENSE vectors: the ±1-weight planes approximate the Gaussian
    # identity via the CLT over many active dimensions — a 2-sparse
    # pair would degenerate (the large coordinate's weight decides
    # every plane's sign for both vectors)
    rng = np.random.default_rng(11)
    u = rng.standard_normal(dim)
    u /= np.linalg.norm(u)
    w = rng.standard_normal(dim)
    w -= (w @ u) * u
    w /= np.linalg.norm(w)
    v = cos_t * u + math.sqrt(1 - cos_t**2) * w
    df = spark.createDataFrame(
        [(0, [float(x) for x in u]), (1, [float(x) for x in v])],
        "vec_id long, embedding array<double>",
    )
    sigs = df.select(
        "vec_id",
        *[
            srp_signature_col(
                "embedding", dim, planes, plane_offset=k * planes
            ).alias(f"b{k}")
            for k in range(n_bands)
        ],
    ).collect()
    a, b = sorted(sigs, key=lambda r: r["vec_id"])
    frac = sum(
        1 for k in range(n_bands) if a[f"b{k}"] == b[f"b{k}"]
    ) / n_bands
    model = srp_collision_prob(cos_t, planes, bands=1)
    assert abs(frac - model) < 0.15, (frac, model)


def test_staleness_reports_all_families(spark):
    """Staleness reports across the persisted families: a
    DISTRIBUTION-SHIFTED append must read as more drift than a
    same-distribution append of identical size (the signal the
    rebuild rules key on), and every family's report has its
    documented columns with sane ranges."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.similarity import (
        IVFIndex,
        QuantizedIVFIndex,
        QuantizedSRPIndex,
        SRPIndex,
        frozen_ivf_centroids,
        ivf_assign,
    )

    emb = load_table(spark, SF, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    same = emb.filter(F.col("vec_id") % 2 == 1)
    # shifted twin: constant offset moves most vectors' hyperplane
    # signs / nearest centroids — a crude but real distribution shift
    shifted = same.withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(3.0))
    )

    idx = SRPIndex.build(old, dim=64, planes=6)
    base = idx.occupancy()
    r_same = idx.add(same).staleness(baseline=base).collect()[0]
    r_shift = idx.add(shifted).staleness(baseline=base).collect()[0]
    assert r_same["growth_ratio"] == r_shift["growth_ratio"] == 2.0
    assert 0.0 <= r_same["total_variation"] <= 1.0
    assert r_shift["total_variation"] > r_same["total_variation"]
    # without a baseline: plain skew report
    plain = idx.staleness().collect()[0]
    assert plain["n_rows"] == old.count() and plain["load_factor_max"] >= 1.0

    q = QuantizedSRPIndex.build(old, dim=64, planes=6)
    qbase = q.occupancy()
    qr = q.add(same).staleness(baseline=qbase).collect()[0]
    assert qr["growth_ratio"] == 2.0 and 0.0 <= qr["total_variation"] <= 1.0

    cents = frozen_ivf_centroids(spark)
    ivf_same = IVFIndex(
        cents, ivf_assign(old.unionByName(same), cents), "embedding", "vec_id"
    )
    ivf_shift = IVFIndex(
        cents,
        ivf_assign(old.unionByName(shifted), cents),
        "embedding",
        "vec_id",
    )
    s_same = ivf_same.staleness().collect()[0]
    s_shift = ivf_shift.staleness().collect()[0]
    for r in (s_same, s_shift):
        assert 0.0 <= r["assignment_churn"] <= 1.0
        assert r["centroid_shift_max"] >= r["centroid_shift_mean"] >= 0.0
    assert s_shift["centroid_shift_mean"] > s_same["centroid_shift_mean"]

    qivf = QuantizedIVFIndex.build(old, cents)
    qrep = qivf.staleness().collect()[0]
    assert "centroid_shift_mean" not in qrep.asDict()
    assert 0.0 <= qrep["assignment_churn"] <= 1.0
    # sampled variant stays in range and runs the same plan shape
    qs = qivf.staleness(sample_fraction=0.5).collect()[0]
    assert 0.0 <= qs["assignment_churn"] <= 1.0
