"""Unit tests for library-level text ops that are not graded queries
(the synthetic corpus has no PII-shaped content, so these semantics
are pinned on constructed rows)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aerovaldb_spark.operators.text import pii_columns, redact_pii


def _docs(spark):
    rows = [
        (0, "contact me at alice@example.com or bob.smith+x@mail.co today"),
        (1, "server 10.0.0.1 talked to 192.168.1.254 over tls"),
        (2, "call 555-867-5309 or 555.123.4567 now"),
        (3, "no personal data in this row at all"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_columns_counts(spark):
    out = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in pii_columns(_docs(spark)).collect()
    }
    assert out[0] == (2, 0, 0)
    assert out[1] == (0, 2, 0)
    assert out[2] == (0, 0, 2)
    assert out[3] == (0, 0, 0)
    assert out[4] == (0, 0, 0)


def test_redact_pii_replaces_every_match(spark):
    red = redact_pii(_docs(spark))
    texts = {r["doc_id"]: r["text"] for r in red.collect()}
    assert texts[0] == "contact me at <PII> or <PII> today"
    assert texts[1] == "server <PII> talked to <PII> over tls"
    assert texts[2] == "call <PII> or <PII> now"
    assert texts[3] == "no personal data in this row at all"
    # redacted output carries no residual PII
    residual = pii_columns(red).agg(
        F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
    ).collect()[0][0]
    assert residual == 0


def test_redact_pii_custom_replacement_and_column(spark):
    df = spark.createDataFrame([(1, "x@y.io wrote")], ["id", "body"])
    out = redact_pii(df, text_col="body", replacement="[gone]").collect()[0]
    assert out["body"] == "[gone] wrote"


def test_bigram_novelty_edges(spark):
    """q63 semantics on edge inputs: sub-bigram docs emit no row;
    exact duplicate docs share identical stats; a fully corpus-unique
    doc has frac_hapax 1.0."""
    from pyspark.sql import functions as F

    from aerovaldb_spark._round import round6
    from aerovaldb_spark.operators.dedup import hash60, shingles_col

    docs = spark.createDataFrame(
        [
            (1, "one"),                      # < 2 words: no bigrams
            (2, "alpha beta gamma"),          # dup of 3
            (3, "alpha beta gamma"),
            (4, "unique words only here"),    # hapax everywhere
        ],
        "doc_id long, text string",
    )
    bg = docs.select(
        "doc_id", F.explode(shingles_col("text", 2)).alias("b")
    ).select("doc_id", hash60(F.col("b")).alias("h"))
    dfc = bg.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    out = {
        r["doc_id"]: r
        for r in bg.join(dfc, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round6(F.avg(F.col("df").cast("double"))).alias("avg_df"),
            round6(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("frac_hapax"),
        )
        .collect()
    }
    assert 1 not in out  # no bigrams -> no row (matches the oracle)
    assert out[2]["n_bigrams"] == 2 and out[2]["avg_df"] == 2.0
    assert out[2]["frac_hapax"] == 0.0
    assert (
        out[2]["n_bigrams"],
        out[2]["avg_df"],
        out[2]["frac_hapax"],
    ) == (out[3]["n_bigrams"], out[3]["avg_df"], out[3]["frac_hapax"])
    assert out[4]["frac_hapax"] == 1.0 and out[4]["avg_df"] == 1.0


# ------------------------------------------------------------- export sink


def test_export_corpus_partitioned_roundtrip(spark, tmp_path):
    """Partitioned parquet export: directory layout per lang, rolled
    files under maxRecordsPerFile, and a lossless round-trip."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.export_sink import (
        corpus_manifest,
        export_corpus,
        file_sizes,
        read_corpus,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "corpus")
    export_corpus(
        docs,
        out,
        partition_by=("lang",),
        max_records_per_file=20,
        sort_within_partitions_by=("doc_id",),
    )

    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == {f"lang={l}" for l in langs}

    back = read_corpus(spark, out)
    assert back.count() == docs.count()
    a = sorted(map(tuple, docs.select("doc_id", "text", "lang").collect()))
    b = sorted(map(tuple, back.select("doc_id", "text", "lang").collect()))
    assert a == b

    # maxRecordsPerFile: no data file holds more than 20 rows
    per_file = (
        back.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .count()
        .collect()
    )
    assert per_file and max(r["count"] for r in per_file) <= 20

    man = {tuple(r)[:1] + (r["n_rows"],) for r in
           corpus_manifest(spark, out).collect()}
    expect = {(r["lang"], r["count"]) for r in
              docs.groupBy("lang").count().collect()}
    assert man == expect
    assert len(file_sizes(out)) >= len(langs)


def test_export_corpus_jsonl_and_validation(spark, tmp_path):
    import gzip
    import json as jsonlib

    import pytest

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.export_sink import export_corpus, read_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "jsonl")
    export_corpus(docs.limit(25), out, partition_by=(), fmt="jsonl")
    # really gzip JSONL: decode one line by hand
    fname = next(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".gz")
    )
    with gzip.open(fname, "rt") as fh:
        row = jsonlib.loads(fh.readline())
    assert {"doc_id", "text", "lang"} <= set(row)
    assert read_corpus(spark, out, fmt="jsonl").count() == 25

    with pytest.raises(ValueError, match="fmt"):
        export_corpus(docs, out, fmt="csv")
    with pytest.raises(ValueError, match="not in DataFrame"):
        export_corpus(docs, out, partition_by=("nope",))


def test_q95_bpe_budget_diverges_from_whitespace(spark):
    """The BPE-denominated budget (q95) must actually measure something
    different from the whitespace budget (q85): subword counts differ
    from whitespace counts on most docs, and the greedy selection under
    an equivalent-scale budget picks a different doc set."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        bpe_token_budget_selection,
        token_budget_selection,
    )
    from aerovaldb_spark.functions.bpe import bpe_token_stats

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    stats = bpe_token_stats(docs)
    n_docs = stats.count()
    n_diff = stats.filter(F.col("n_bpe_tokens") != F.col("n_words")).count()
    # subword encode splits words: counts differ on most of the corpus
    assert n_diff > 0.5 * n_docs, (n_diff, n_docs)

    ws = {r["doc_id"] for r in token_budget_selection(docs, 800).collect()}
    bpe = {
        r["doc_id"]
        for r in bpe_token_budget_selection(docs, 800).collect()
    }
    # same numeric budget, different denominator -> different doc set
    # (BPE counts >= word counts, so the same budget admits fewer docs)
    assert ws and bpe and bpe != ws


def test_bpe_budget_excludes_zero_word_docs(spark):
    """A doc with no words has no token cost and no content: it is
    excluded from the selection on both engines (inner join vs wtok)."""
    from aerovaldb_spark.operators.text import bpe_token_budget_selection

    docs = spark.createDataFrame(
        [(1, "aero sol data", "s"), (2, None, "s"), (3, "", "s")],
        "doc_id long, text string, source string",
    )
    got = bpe_token_budget_selection(docs, 10_000).collect()
    assert {r["doc_id"] for r in got} == {1}


def test_q97_bpe_packing_shards_and_divergence(spark):
    """BPE-denominated packing: shard ids are contiguous from 0 per
    source, a shard's token total stays under budget + one doc
    (greedy prefix rule), and the assignment actually differs from
    whitespace-denominated q54 packing."""
    from aerovaldb_spark.operators.text import (
        q54_pack_sequences,
        q97_bpe_pack_sequences,
        BPE_PACK_BUDGET,
    )

    sf = "/root/testdata/sf0.001"
    rows = q97_bpe_pack_sequences(spark, sf).collect()
    assert rows
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r["source"], r["shard_id"]), []).append(r)
    for (src, sid), members in by_shard.items():
        assert sid >= 0
        total = sum(m["n_bpe_tokens"] for m in members)
        biggest = max(m["n_bpe_tokens"] for m in members)
        assert total < BPE_PACK_BUDGET + biggest, (src, sid, total)
    shards_per_src = {}
    for src, sid in by_shard:
        shards_per_src.setdefault(src, set()).add(sid)
    for src, sids in shards_per_src.items():
        assert sids == set(range(len(sids))), (src, sids)  # contiguous

    ws = {
        (r["doc_id"]): r["shard_id"]
        for r in q54_pack_sequences(spark, sf).collect()
    }
    bpe = {r["doc_id"]: r["shard_id"] for r in rows}
    assert any(
        ws[d] != bpe[d] for d in bpe
    ), "BPE packing must differ from whitespace packing somewhere"


def test_tfidf_cosine_knn_semantics(spark):
    from aerovaldb_spark.operators.text import tfidf_cosine_knn

    rows = [
        # 0 and 1 are identical -> cosine 1.0
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),
        # 2 shares most of its mass with 0/1
        (2, "alpha beta gamma delta epsilon eta"),
        # 3 is disjoint vocabulary -> no qualifying neighbor
        (3, "omicron pi rho sigma tau upsilon"),
        # 4 repeats one rare word -> only near itself, below threshold
        (4, "phi phi phi phi chi psi"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_cosine_knn(docs, threshold=0.6, max_neighbors=3).collect()
    got = {(r["doc_id"], r["neighbor_id"]): r for r in out}
    # identical docs are mutual rank-1 neighbors at cosine 1.0
    assert got[(0, 1)]["cosine"] == 1.0 and got[(0, 1)]["nn_rank"] == 1
    assert got[(1, 0)]["cosine"] == 1.0 and got[(1, 0)]["nn_rank"] == 1
    # the graph is symmetric: (a,b) present iff (b,a) present
    keys = set(got)
    assert keys == {(b, a) for a, b in keys}
    # disjoint-vocab docs have no edges
    assert not [k for k in keys if 3 in k]
    assert not [k for k in keys if 4 in k]
    # per-doc degree bound and dense rank
    by_doc = {}
    for a, _b in keys:
        by_doc.setdefault(a, []).append(got[(a, _b)]["nn_rank"])
    for d, ranks in by_doc.items():
        assert len(ranks) <= 3
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # cosine in (0, 1] and monotone in rank
    for d, _n in keys:
        assert 0.0 < got[(d, _n)]["cosine"] <= 1.0


def test_tfidf_cosine_knn_prefix_is_lossless(spark):
    # The prefix filter may only drop candidates the bound PROVES are
    # below threshold: against a brute-force pairwise cosine over the
    # same weights, the kNN graph must contain every qualifying pair.
    import itertools
    import math

    from aerovaldb_spark.operators.text import tfidf_cosine_knn

    rows = [
        (i, " ".join(f"w{(i * 7 + j * 3) % 11}" for j in range(8)))
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    t = 0.5
    out = tfidf_cosine_knn(docs, threshold=t, max_neighbors=100).collect()
    got = {(r["doc_id"], r["neighbor_id"]) for r in out}

    # brute force in python, mirroring the engine's weight definition
    texts = dict(rows)
    n = len(rows)
    tf = {
        i: {
            w: texts[i].split(" ").count(w)
            for w in set(texts[i].split(" "))
        }
        for i in texts
    }
    df_ = {}
    for i in tf:
        for w in tf[i]:
            df_[w] = df_.get(w, 0) + 1
    vec = {}
    for i in tf:
        raw = {
            w: c * round(math.log((n + 1) / (df_[w] + 1)), 6)
            for w, c in tf[i].items()
        }
        nrm = math.sqrt(sum(v * v for v in raw.values()))
        vec[i] = {w: v / nrm for w, v in raw.items()}
    for a, b in itertools.combinations(range(n), 2):
        dot = sum(vec[a][w] * vec[b].get(w, 0.0) for w in vec[a])
        if dot >= t + 1e-6:
            assert (a, b) in got and (b, a) in got, (a, b, dot)


def test_tfidf_cosine_knn_size_filter_is_lossless(spark):
    # Heterogeneous doc lengths actively exercise the Bayardo size
    # filter (maxw * l1 bound) and the positional residual bound: one
    # long flat doc against many short docs, plus near-identical short
    # pairs that must survive. Brute force over the engine's weight
    # definition is the ground truth.
    import itertools
    import math

    from aerovaldb_spark.operators.text import tfidf_cosine_knn

    rows = [
        # long, flat-mass doc — tiny maxw, large l1
        (0, " ".join(f"t{j}" for j in range(40))),
        # short spiky docs, pairwise near-identical
        (1, "aa bb cc"),
        (2, "aa bb cc"),
        (3, "aa bb dd"),
        # short doc overlapping the long one's vocabulary
        (4, "t0 t1 t2"),
        (5, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    t = 0.5
    out = tfidf_cosine_knn(docs, threshold=t, max_neighbors=100).collect()
    got = {(r["doc_id"], r["neighbor_id"]) for r in out}
    assert (1, 2) in got and (2, 1) in got  # identical pair survives

    texts = dict(rows)
    n = len(rows)
    tf = {
        i: {
            w: texts[i].split(" ").count(w)
            for w in set(texts[i].split(" "))
        }
        for i in texts
    }
    df_: dict = {}
    for i in tf:
        for w in tf[i]:
            df_[w] = df_.get(w, 0) + 1
    vec = {}
    for i in tf:
        raw = {
            w: c * round(math.log((n + 1) / (df_[w] + 1)), 6)
            for w, c in tf[i].items()
        }
        nrm = math.sqrt(sum(v * v for v in raw.values()))
        vec[i] = {w: v / nrm for w, v in raw.items()}
    for a, b in itertools.combinations(range(n), 2):
        dot = sum(vec[a][w] * vec[b].get(w, 0.0) for w in vec[a])
        if dot >= t + 1e-6:
            assert (a, b) in got and (b, a) in got, (a, b, dot)


def test_banded_knn_edges_subset_of_exact_with_identical_scores(spark):
    """q110's contract: banding bounds RECALL only — every edge it
    emits must exist in exact q99's thresholded edge set with the
    IDENTICAL round6 cosine (verification is the same exact DECIMAL
    dot). Compared with the top-m cut disabled on both sides so rank
    shifts from missed neighbors can't confound the subset claim."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        tfidf_banded_knn,
        tfidf_cosine_knn,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    big = 10**6
    exact = {
        (r["doc_id"], r["neighbor_id"]): r["cosine"]
        for r in tfidf_cosine_knn(docs, max_neighbors=big).collect()
    }
    banded = {
        (r["doc_id"], r["neighbor_id"]): r["cosine"]
        for r in tfidf_banded_knn(docs, max_neighbors=big).collect()
    }
    assert banded, "banded screen found nothing on a near-dup corpus"
    missing = set(banded) - set(exact)
    assert not missing, sorted(missing)[:5]
    diffs = {k for k, v in banded.items() if exact[k] != v}
    assert not diffs, sorted(diffs)[:5]
    # and it's a useful screen, not a degenerate one: recall on this
    # templated corpus should be well above the random floor
    assert len(banded) >= 0.5 * len(exact)


def test_banded_screen_flags_subset_of_exact_with_valid_matches(spark):
    """q111's contract vs the exact screen (q102): banding bounds
    recall only — every doc it flags must be flagged by the exact
    screen, its match_cosine can never exceed the exact screen's true
    best (the banded best is over COLLIDED candidates only), and both
    emit exactly one row per document."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        tfidf_banded_screen,
        tfidf_screen_join,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {
        r["doc_id"]: (r["match_id"], r["match_cosine"], r["tfidf_dup"])
        for r in tfidf_screen_join(docs, docs).collect()
    }
    banded = {
        r["doc_id"]: (r["match_id"], r["match_cosine"], r["tfidf_dup"])
        for r in tfidf_banded_screen(docs, docs).collect()
    }
    assert set(banded) == set(exact)  # one row per doc on both paths
    flagged_b = {d for d, v in banded.items() if v[2]}
    flagged_e = {d for d, v in exact.items() if v[2]}
    assert flagged_b, "banded screen flagged nothing on a near-dup corpus"
    assert flagged_b <= flagged_e, sorted(flagged_b - flagged_e)[:5]
    for d in sorted(flagged_b):
        assert banded[d][1] <= exact[d][1], (d, banded[d], exact[d])
    # unflagged rows carry NULLs, the gate's contract
    for d, (mid, cos, dup) in banded.items():
        if not dup:
            assert mid is None and cos is None


def test_banded_bucket_guard_bounds_degenerate_buckets(spark):
    """The LSH skew guard: 40 boilerplate-identical docs form one
    degenerate bucket per band (contributing 780 candidate pairs
    unguarded); with max_bucket set those buckets are dropped while a
    small distinct near-dup bucket still collides — bounding any
    bucket's contribution without touching the rest of the corpus."""
    from aerovaldb_spark.operators.text import (
        tfidf_banded_candidates,
        tfidf_weight_frame,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(40)]
        + [
            (100, "zeta eta theta iota kappa"),
            (101, "zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    w, _stats, _n = tfidf_weight_frame(docs)
    unguarded = {
        (r["doc_a"], r["doc_b"])
        for r in tfidf_banded_candidates(w).collect()
    }
    assert len(unguarded) >= 780 + 1  # the degenerate block + the pair
    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in tfidf_banded_candidates(w, max_bucket=10).collect()
    }
    assert guarded <= unguarded
    assert (100, 101) in guarded  # small buckets untouched
    # no pair from the oversized boilerplate block survives
    assert not any(a < 40 and b < 40 for a, b in guarded), sorted(
        guarded
    )[:5]


def test_banded_rungs_invariant_to_input_partitioning(spark):
    """Banded signatures flow through collect_list (order-dependent in
    general) — array_sort(struct(seed, mh)) must make the signature,
    and hence both banded rungs' full output, independent of how the
    input happens to be partitioned."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        tfidf_banded_knn,
        tfidf_banded_screen,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    shuffled = docs.repartition(13)
    a = sorted(map(tuple, tfidf_banded_knn(docs).collect()))
    b = sorted(map(tuple, tfidf_banded_knn(shuffled).collect()))
    assert a == b and a
    c = sorted(map(tuple, tfidf_banded_screen(docs, docs).collect()))
    d = sorted(
        map(tuple, tfidf_banded_screen(shuffled, shuffled).collect())
    )
    assert c == d and c


def test_banded_screen_general_path_subset_of_exact(spark):
    """The two-sided (incoming != reference) banded screen: each
    side's top-weight terms are signed independently under the frozen
    reference idf, and the contract must still be a recall-bounded
    subset of the exact screen's — flags subset, banded best <= exact
    best, one row per INCOMING doc, reference docs absent."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        tfidf_banded_screen,
        tfidf_screen_join,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    reference = docs.where("doc_id % 2 = 0")
    incoming = docs.where("doc_id % 2 = 1")
    exact = {
        r["doc_id"]: (r["match_cosine"], r["tfidf_dup"])
        for r in tfidf_screen_join(
            incoming, reference, verify_shape="map"
        ).collect()
    }
    banded = {
        r["doc_id"]: (r["match_cosine"], r["tfidf_dup"])
        for r in tfidf_banded_screen(incoming, reference).collect()
    }
    assert set(banded) == set(exact)
    assert all(d % 2 == 1 for d in banded)  # one row per incoming doc
    flagged_b = {d for d, v in banded.items() if v[1]}
    flagged_e = {d for d, v in exact.items() if v[1]}
    assert flagged_b, "general banded screen flagged nothing"
    assert flagged_b <= flagged_e
    for d in flagged_b:
        assert banded[d][0] <= exact[d][0], (d, banded[d], exact[d])


def test_tfidf_screen_index_roundtrip_matches_ephemeral(spark, tmp_path):
    """The persisted screen index: build -> screen must be bit-equal
    to the ephemeral two-sided banded screen, and a saved-then-loaded
    index must reproduce it exactly (round6 doubles, longs and
    signature strings round-trip parquet bit-exactly). The whole point
    of the index: stats + weights + signatures are ALL the reference
    state an incoming batch needs."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        TfidfScreenIndex,
        tfidf_banded_screen,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    reference = docs.where("doc_id % 2 = 0")
    incoming = docs.where("doc_id % 2 = 1")
    want = sorted(
        map(tuple, tfidf_banded_screen(incoming, reference).collect())
    )
    assert any(t[3] for t in want)  # some dups flagged

    idx = TfidfScreenIndex.build(reference)
    built = sorted(map(tuple, idx.screen(incoming).collect()))
    assert built == want

    p = str(tmp_path / "screen_idx")
    idx.save(p)
    loaded = TfidfScreenIndex.load(spark, p)
    got = sorted(map(tuple, loaded.screen(incoming).collect()))
    assert got == want
    # the skew guard composes with the loaded form and can only
    # reduce flags
    guarded = {
        r["doc_id"]: r["tfidf_dup"]
        for r in loaded.screen(incoming, max_bucket=3).collect()
    }
    flagged = {t[0] for t in want if t[3]}
    assert {d for d, f in guarded.items() if f} <= flagged


def test_tfidf_screen_index_incremental_add(spark, tmp_path):
    """Incremental append: add() signs new reference docs under the
    FROZEN idf stats — the in-memory append, the parquet append, and a
    post-append reload must all screen bit-equally; growing the
    reference can only ADD flags; and a probe identical to an appended
    doc must match it (it couldn't before the append)."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    ref = docs.where("doc_id % 4 = 0")
    probes = docs.where("doc_id % 2 = 1")
    # appended batch: fresh corpus docs PLUS an exact copy of one
    # probe's text under a new id — a guaranteed post-append match
    planted_src = probes.orderBy("doc_id").limit(1).collect()[0]
    new = docs.where("doc_id % 4 = 2").unionByName(
        spark.createDataFrame(
            [(10**6, planted_src["text"])], "doc_id long, text string"
        )
    )

    idx = TfidfScreenIndex.build(ref)
    before = {
        r["doc_id"]: (r["match_id"], r["tfidf_dup"])
        for r in idx.screen(probes).collect()
    }

    mem = idx.add(new)
    assert mem.stats is idx.stats and mem.n is idx.n  # frozen by identity
    got_mem = sorted(map(tuple, mem.screen(probes).collect()))

    p = str(tmp_path / "grow_idx")
    idx.save(p)
    disk = TfidfScreenIndex.load(spark, p).add(new, path=p)
    got_disk = sorted(map(tuple, disk.screen(probes).collect()))
    assert got_disk == got_mem
    # the append hit disk: a FRESH load sees the appended rows
    again = sorted(
        map(
            tuple,
            TfidfScreenIndex.load(spark, p).screen(probes).collect(),
        )
    )
    assert again == got_mem

    after = {t[0]: (t[1], t[3]) for t in got_mem}
    # growth is monotone: a doc flagged before stays flagged (its old
    # match is still in the reference; candidates only grew)
    assert {d for d, v in before.items() if v[1]} <= {
        d for d, v in after.items() if v[1]
    }
    # the planted twin: unflagged (or matched elsewhere) before, now
    # matched at cosine 1.0 against the appended copy — unless an
    # equally-perfect OLD match with a lower id already existed
    pd_id = planted_src["doc_id"]
    assert after[pd_id][1] is True
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert after[pd_id][0] in new_ids or before[pd_id][1]


def test_screen_index_same_id_rule_and_reference_only_guard(spark):
    """Two r9 contract points of the persisted index: (a) the self-id
    rule — an incoming doc sharing a reference doc_id is assumed to BE
    that doc and must not match itself, while exclude_same_id=False
    (independent id spaces) reports the match; (b) the skew guard
    counts REFERENCE buckets only, so guarded results don't depend on
    incoming batch composition."""
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    ref = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (2, "delta epsilon zeta"),
            (4, "eta theta iota"),
        ],
        "doc_id long, text string",
    )
    idx = TfidfScreenIndex.build(ref)
    inc = spark.createDataFrame(
        [(0, "alpha beta gamma"), (100, "alpha beta gamma")],
        "doc_id long, text string",
    )
    strict = {
        r["doc_id"]: (r["match_id"], r["tfidf_dup"])
        for r in idx.screen(inc).collect()
    }
    # doc 0 IS reference doc 0: its only qualifying match is excluded
    assert strict[0] == (None, False)
    assert strict[100] == (0, True)
    loose = {
        r["doc_id"]: (r["match_id"], r["tfidf_dup"])
        for r in idx.screen(inc, exclude_same_id=False).collect()
    }
    assert loose[0] == (0, True) and loose[100] == (0, True)

    # (b) reference-only guard: per-doc output with max_bucket set is
    # identical whether incoming docs arrive together or one at a time
    together = sorted(
        map(tuple, idx.screen(inc, max_bucket=2).collect())
    )
    one_by_one = sorted(
        t
        for d in (0, 100)
        for t in map(
            tuple,
            idx.screen(
                inc.where(F.col("doc_id") == d), max_bucket=2
            ).collect(),
        )
    )
    assert together == one_by_one


def test_scope_mark_partial_release(spark):
    """release_scoped_persists(mark) must release only persists
    registered after the mark — the library-callback shape (a stream's
    foreachBatch) that must not evict concurrent workloads' caches."""
    from aerovaldb_spark.operators._scope import (
        release_scoped_persists,
        scope_mark,
        scoped_persist,
    )

    base = scope_mark()  # earlier tests' persists stay untouched
    a = scoped_persist(spark.range(10))
    a.count()
    m = scope_mark()
    b = scoped_persist(spark.range(20))
    b.count()
    assert release_scoped_persists(m) == 1
    assert a.storageLevel.useMemory  # untouched
    assert not b.storageLevel.useMemory
    assert release_scoped_persists(base) == 1
    assert not a.storageLevel.useMemory


def test_scoped_collector_releases_only_own_thread(spark):
    """scoped_collector must release exactly the persists ITS thread
    registered while active — interleaved registrations from another
    thread (a concurrent stream's micro-batch) stay cached AND stay in
    the registry for their own collector to release (the mark-based
    hazard the collector exists to fix)."""
    import threading

    from aerovaldb_spark.operators._scope import (
        scoped_collector,
        scoped_persist,
    )

    other: list = []
    started = threading.Event()
    finish = threading.Event()

    def rival():
        with scoped_collector() as c:
            df = scoped_persist(spark.range(30))
            df.count()
            other.append(df)
            started.set()
            finish.wait(30)
        other.append(c)  # exited: its own persist released

    t = threading.Thread(target=rival)
    with scoped_collector():
        mine = scoped_persist(spark.range(10))
        mine.count()
        t.start()
        assert started.wait(30)
        # rival's persist registered AFTER mine — a positional
        # truncation would evict it here; identity release must not
    assert not mine.storageLevel.useMemory
    assert other[0].storageLevel.useMemory  # rival untouched
    finish.set()
    t.join(30)
    assert not other[0].storageLevel.useMemory  # rival released its own


def test_scoped_collector_nested(spark):
    """Nested collectors each own what was registered while innermost."""
    from aerovaldb_spark.operators._scope import (
        scoped_collector,
        scoped_persist,
    )

    with scoped_collector():
        outer = scoped_persist(spark.range(5))
        outer.count()
        with scoped_collector():
            inner = scoped_persist(spark.range(6))
            inner.count()
        assert not inner.storageLevel.useMemory
        assert outer.storageLevel.useMemory
    assert not outer.storageLevel.useMemory


def test_diverse_vocab_allpairs_pruning_and_banded_recall(
    spark, tmp_path_factory
):
    """CI pin for the two round-9 headline claims, on a frozen seeded
    diverse-vocabulary corpus (tools/gen_diverse_docs.py at test
    scale — the template corpus's 31-term vocabulary cannot exercise
    either): (a) the AllPairs prefix/size/positional bounds prune the
    shared-term pair space by orders of magnitude (measured 1,416x at
    5k docs, SCALING.md round-9); (b) the banded candidate rung has
    perfect recall of the exact qualifying edge set — every planted
    near-dup's top-weight terms collide in some band. A refactor of
    the filters or the signing that regresses either now fails CI
    instead of only drifting a SCALING.md number."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators._scope import release_scoped_persists
    from aerovaldb_spark.operators.text import (
        _verified_dots,
        tfidf_allpairs_candidates,
        tfidf_banded_candidates,
        tfidf_weight_frame,
    )
    from tools.gen_diverse_docs import generate

    d = str(tmp_path_factory.mktemp("diverse_ci"))
    generate(d, n_docs=500, vocab=8000, seed=7)
    docs = spark.read.parquet(d + "/documents.parquet").select(
        "doc_id", "text"
    )
    try:
        w, _stats, _n = tfidf_weight_frame(docs)

        shared = (
            w.select(F.col("doc_id").alias("a"), "term")
            .join(w.select(F.col("doc_id").alias("b"), "term"), "term")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .count()
        )
        allpairs = tfidf_allpairs_candidates(w, 0.8)
        n_allpairs = allpairs.count()
        # (a) orders-of-magnitude pruning on diverse vocabulary
        assert shared > 10_000  # the corpus is genuinely dense in shared terms
        assert n_allpairs * 50 < shared, (n_allpairs, shared)

        exact = {
            (r["doc_a"], r["doc_b"])
            for r in _verified_dots(allpairs, w, w, "doc_a", "doc_b", "map")
            .where(F.col("dot").cast("double") >= 0.8)
            .collect()
        }
        # the planted near-dups produce a real edge set to recall
        assert len(exact) >= 20, len(exact)
        banded = {
            (r["doc_a"], r["doc_b"])
            for r in tfidf_banded_candidates(w).collect()
        }
        # (b) perfect recall: every exact qualifying pair collides
        assert exact <= banded, sorted(exact - banded)[:5]
    finally:
        release_scoped_persists()


def test_screen_index_staleness_direction(spark):
    """TfidfScreenIndex.staleness: appending NEW-VOCABULARY docs must
    read as more idf drift than appending same-distribution docs of
    the same size, and the no-append report measures ~zero drift."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import TfidfScreenIndex

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    same = docs.filter(F.col("doc_id") % 2 == 1)
    # novel-vocabulary twin: every token unique to the append
    novel = same.withColumn(
        "text",
        F.regexp_replace(F.col("text"), r"(\S+)", r"zz$1zz"),
    )

    idx = TfidfScreenIndex.build(old)
    fresh = idx.staleness().collect()[0]
    assert fresh["growth_ratio"] == 1.0
    assert fresh["idf_drift_mad"] == 0.0 and fresh["new_term_mass"] == 0.0
    assert fresh["top_term_churn"] == 0.0

    r_same = idx.add(same).staleness().collect()[0]
    r_novel = idx.add(novel).staleness().collect()[0]
    assert r_same["growth_ratio"] == r_novel["growth_ratio"]
    assert r_novel["new_term_mass"] > max(r_same["new_term_mass"], 0.3)
    assert r_novel["top_term_churn"] > r_same["top_term_churn"]
    for r in (r_same, r_novel):
        assert 0.0 <= r["new_term_mass"] <= 1.0
        assert 0.0 <= r["top_term_churn"] <= 1.0
        assert r["idf_drift_max"] >= r["idf_drift_mad"] >= 0.0


def test_arrow_verify_equals_fold_and_missing_doc_rule(spark):
    """The r14 Arrow-vectorized map verify (sorted term-id arrays +
    mapInArrow merge-intersect) must be bit-identical to its previous
    pure-JVM fold form ('map_fold'), including the dot=0 rule for
    candidate pairs referencing docs ABSENT from the weight frame —
    the internals this optimization round changed."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators._scope import release_scoped_persists
    from aerovaldb_spark.operators.text import (
        _verified_dots,
        tfidf_allpairs_candidates,
        tfidf_weight_frame,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    try:
        w, _stats, _n = tfidf_weight_frame(docs)
        cand = tfidf_allpairs_candidates(w, 0.5)
        got = {
            shape: sorted(
                map(
                    tuple,
                    _verified_dots(
                        cand, w, w, "doc_a", "doc_b", shape
                    ).collect(),
                )
            )
            for shape in ("map", "map_fold", "keyed")
        }
        assert got["map"] == got["map_fold"] == got["keyed"]
        assert len(got["map"]) > 0
        assert any(float(t[2]) > 0.0 for t in got["map"])
        # absent-doc pairs: dot must be exactly 0.000000 in all shapes
        ghost = spark.createDataFrame(
            [(1, 10**9), (10**9, 2), (10**9, 10**9 + 1)],
            "doc_a bigint, doc_b bigint",
        )
        for shape in ("map", "map_fold", "keyed"):
            rows = sorted(
                map(
                    tuple,
                    _verified_dots(
                        ghost, w, w, "doc_a", "doc_b", shape
                    ).collect(),
                )
            )
            assert len(rows) == 3 and all(
                float(t[2]) == 0.0 for t in rows
            ), (shape, rows)
    finally:
        release_scoped_persists()
