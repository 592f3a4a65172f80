"""Property-based tests (hypothesis) for the pure codec layers —
the reference leans on mutation testing for these (SURVEY.md §5.8);
property testing covers the same ground more directly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aerovaldb_spark.jsonutil import json_dumps_wrapper, json_loads
from aerovaldb_spark.routes import Route, template_args
from aerovaldb_spark.uri import build_uri, decode_arg, encode_arg, parse_uri

# Values that can appear in route args: any printable text (the codec
# must make them path-safe).
arg_values = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=1,
    max_size=40,
)


@given(arg_values)
@settings(max_examples=300)
def test_encode_decode_inverse(value):
    assert decode_arg(encode_arg(value)) == value


@given(arg_values)
@settings(max_examples=200)
def test_encoded_value_has_no_slash(value):
    assert "/" not in encode_arg(value)


@given(st.sampled_from(list(Route)), st.data())
@settings(max_examples=200)
def test_uri_roundtrip_any_route(route, data):
    # '?'/'&'/'=' survive in path args but not in kwargs (querystring
    # parsing splits on them — same as the reference); '%ENC' patterns
    # are covered by the dedicated encode tests.
    args = {
        k: data.draw(arg_values.filter(lambda s: "?" not in s), label=k)
        for k in template_args(route.value)
    }
    uri = build_uri(route, dict(args))
    parsed_route, parsed_args, kwargs = parse_uri(uri)
    assert parsed_args == args
    assert kwargs == {}
    # NOTE: parsed_route may differ only if two routes share a template
    # shape — they don't (asserted by test_uri.test_every_route_roundtrips)
    assert parsed_route is route


json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=True, allow_infinity=True),
    st.text(max_size=30),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=20,
)


# glob_stats-shaped documents: 7 nested dict levels with float leaves
_leaf = st.dictionaries(
    st.sampled_from(["bias", "rmse", "nmb"]),
    st.floats(allow_nan=True, allow_infinity=False),
    max_size=2,
)
_names = st.sampled_from(["a", "b", "c"])


def _nest(inner, max_size=2):
    return st.dictionaries(_names, inner, max_size=max_size)


glob_stats_docs = _nest(_nest(_nest(_nest(_nest(_nest(_nest(_leaf)))))))


@given(glob_stats_docs, _names, _names)
@settings(max_examples=100)
def test_filter_heatmap_invariants(doc, region, time):
    from aerovaldb_spark.filters import filter_heatmap

    out = filter_heatmap(doc, region, time)
    # skeleton: identical keys down to the modvar level
    assert set(out) == set(doc)
    for var, nets in doc.items():
        assert set(out[var]) == set(nets)
        for net, lays in nets.items():
            assert set(out[var][net]) == set(lays)
            for lay, mods in lays.items():
                assert set(out[var][net][lay]) == set(mods)
                for mod, mvs in mods.items():
                    assert set(out[var][net][lay][mod]) == set(mvs)
                    for mv, regions in mvs.items():
                        kept = out[var][net][lay][mod][mv]
                        # at most the requested region survives, with
                        # exactly the requested time under it
                        assert set(kept) <= {region}
                        if region in kept:
                            assert set(kept[region]) == {time}
                            assert kept[region][time] == regions[region][time]


@given(json_values)
@settings(max_examples=300)
def test_json_dumps_always_valid_and_nan_free(obj):
    s = json_dumps_wrapper(obj)
    parsed = json_loads(s)  # must never raise
    # serialized form never contains bare NaN/Infinity tokens
    assert "NaN" not in s and "Infinity" not in s
    # round-trip of the re-serialization is stable
    assert json_loads(json_dumps_wrapper(parsed)) == parsed


# --- model-based store semantics ------------------------------------------
# Random op sequences (put / tombstone / flush / compact) against a
# plain-dict model: whatever the interleaving, reads must equal the
# model. This is the LWW + memtable + append-log + compaction state
# machine under test as one system, the reference's
# test_aerovaldb.py-style golden flows generalized.

op_strategies = st.lists(
    st.tuples(
        st.sampled_from(["put", "rm", "flush", "compact"]),
        st.sampled_from(["e1", "e2", "e3"]),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=12,
)


@given(op_strategies)
@settings(max_examples=8, deadline=None)
def test_store_matches_dict_model(spark, ops):
    import tempfile

    from aerovaldb_spark.db import AerovalSparkDB
    from aerovaldb_spark.routes import Route

    db = AerovalSparkDB(spark, tempfile.mkdtemp(prefix="avdb-prop-"))
    model: dict[str, dict] = {}
    for verb, exp, val in ops:
        if verb == "put":
            db.put_config({"v": val}, "p", exp)
            model[exp] = {"v": val}
        elif verb == "rm":
            db.rm_by_uri(f"/v0/config/p/{exp}")
            model.pop(exp, None)
        elif verb == "flush":
            db.flush()
        elif verb == "compact":
            db.compact()
    missing = object()
    for exp in ("e1", "e2", "e3"):
        # default=None means NO default (reference parity) — use a
        # sentinel to probe missing keys.
        got = db.get(
            Route.CONFIG, {"project": "p", "experiment": exp}, default=missing
        )
        assert got == model.get(exp, missing), f"{exp}: {got!r}"
    assert sorted(e.meta["experiment"] for e in db.query(Route.CONFIG)) == sorted(model)


def test_train_split_fractions_and_determinism(spark):
    from aerovaldb_spark.operators.text import q53_train_split

    rows = q53_train_split(spark, "/root/testdata/sf0.001").collect()
    n = len(rows)
    frac = {s: sum(1 for r in rows if r["split"] == s) / n for s in ("train", "val", "test")}
    assert 0.85 < frac["train"] < 0.95
    assert 0.02 < frac["val"] < 0.08
    assert 0.02 < frac["test"] < 0.08
    again = q53_train_split(spark, "/root/testdata/sf0.001").collect()
    assert {r["doc_id"]: r["split"] for r in rows} == {r["doc_id"]: r["split"] for r in again}


def test_pack_sequences_invariants(spark):
    from aerovaldb_spark.operators.text import PACK_BUDGET, q54_pack_sequences

    rows = q54_pack_sequences(spark, "/root/testdata/sf0.1").collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, items in by_src.items():
        items.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in items:
            # shard is determined by the token offset where the doc starts
            assert r["shard_id"] == cum // PACK_BUDGET, (src, r)
            cum += r["n_tokens"]
        assert items[-1]["shard_id"] >= 1  # budget actually splits the stream


def test_approx_distinct_within_rsd(spark):
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.events import q55_approx_distinct

    approx = {
        r["event_type"]: r["approx_users"]
        for r in q55_approx_distinct(spark, "/root/testdata/sf0.01").collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, "/root/testdata/sf0.01", "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact) and len(exact) > 0
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= max(0.05 * ex, 2), (et, approx[et], ex)


def test_kmv_distinct_accuracy_and_exact_small_path(spark):
    """q106's estimator: exact below k distinct; within the standard
    KMV error envelope above it. Deterministic, so the bounds are
    checked on concrete corpora, not in expectation."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.events import KMV_K, kmv_distinct

    # estimator path: 2000 distinct values >> k=64.
    # KMV sigma ~ 1/sqrt(k-2) = 12.7%; allow 4 sigma.
    big = spark.range(2000).select(
        F.lit("a").alias("g"), F.col("id").alias("v")
    )
    est = kmv_distinct(big, "g", "v").collect()[0]
    assert est["n_kept"] == KMV_K
    assert abs(est["kmv_estimate"] - 2000) <= 0.51 * 2000, est

    # exact path: duplicates collapse; fewer than k distinct -> exact
    small = spark.range(300).select(
        F.lit("b").alias("g"), (F.col("id") % 40).alias("v")
    )
    est2 = kmv_distinct(small, "g", "v").collect()[0]
    assert est2["n_kept"] == 40 and est2["kmv_estimate"] == 40.0

    # mergeability — the REAL merge path: compute the sketch STATE
    # (kept hash sets) per corpus increment, union the kept sets, take
    # the bottom-k of that, and the resulting estimate must equal the
    # sketch computed over the whole corpus at once. This is the
    # one-sketch-per-increment promise at 100 TB (overlapping halves,
    # so the merge also dedups shared hashes).
    from aerovaldb_spark.operators.events import kmv_kept_hashes
    from pyspark.sql import Window

    h1 = spark.range(0, 1200).select(
        F.lit("m").alias("g"), F.col("id").alias("v")
    )
    h2 = spark.range(800, 2000).select(
        F.lit("m").alias("g"), F.col("id").alias("v")
    )
    whole_kept = sorted(
        r["h"] for r in kmv_kept_hashes(h1.unionAll(h2), "g", "v").collect()
    )
    merged_kept = sorted(
        set(
            r["h"]
            for r in kmv_kept_hashes(h1, "g", "v")
            .unionAll(kmv_kept_hashes(h2, "g", "v"))
            .collect()
        )
    )[: len(whole_kept)]
    assert merged_kept == whole_kept

    # NULL values are ignored (COUNT(DISTINCT) semantics): adding NULL
    # rows must not perturb the kept set or the estimate
    with_nulls = h1.unionAll(
        spark.range(3).select(
            F.lit("m").alias("g"), F.lit(None).cast("long").alias("v")
        )
    )
    assert (
        kmv_distinct(with_nulls, "g", "v").collect()
        == kmv_distinct(h1, "g", "v").collect()
    )


def test_legacy_name_disambiguation_roundtrip_property():
    """For any compound network ('-'-joined) and location ('_'-joined)
    with '-'/'_'-free obsvar and layer, a legacy pre-0.29 timeseries
    filename resolves back to the original fields (the reference
    disambiguation invariant: layer/obsvar never contain '-';
    locations may contain '_', networks may contain '-')."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from aerovaldb_spark.routes import Route
    from aerovaldb_spark.sources.jsondb_import import resolve_path

    word = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789", min_size=1, max_size=6
    )

    @given(
        loc_parts=st.lists(word, min_size=1, max_size=3),
        net_parts=st.lists(word, min_size=1, max_size=3),
        obsvar=word,
        layer=word,
    )
    @settings(max_examples=200, deadline=None)
    def check(loc_parts, net_parts, obsvar, layer):
        location = "_".join(loc_parts)
        network = "-".join(net_parts)
        rel = f"p/e/ts/{location}_{network}-{obsvar}_{layer}.json"
        got = resolve_path(rel, "0.25.0")
        assert got is not None and got[0] is Route.TIMESERIES
        args = got[1]
        assert args["location"] == location
        assert args["network"] == network
        assert args["obsvar"] == obsvar
        assert args["layer"] == layer

    check()


def test_q70_result_nonvacuous(spark):
    """Round-3 advice: q70's driver green was 0 rows on both engines
    (vacuous). With the recent-orders cutoff the graded result must be
    non-empty, and the intermediates must carry real cardinality."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.relational import (
        Q70_CUTOFF,
        q70_inactive_wealthy,
    )

    SF = "/root/testdata/sf0.001"
    rows = q70_inactive_wealthy(spark, SF).collect()
    assert sum(r["n_customers"] for r in rows) > 0

    customer = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    thr = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum("c_acctbal") / F.count(F.lit(1))).alias("t")
    ).collect()[0]["t"]
    assert thr > 0
    above = customer.filter(F.col("c_acctbal") > thr)
    assert above.count() > 0  # pre-anti-join side is non-empty
    # the cutoff actually bites: some orders fall on each side of it
    n_recent = orders.filter(F.col("o_orderdate") >= Q70_CUTOFF).count()
    assert 0 < n_recent < orders.count()


def test_q71_first_month_retention_equals_cohort_size(spark):
    """Round-3 advice: q71's driver green matched on a single row. The
    non-vacuous invariant: every user is active in their own first
    month, so the (cohort_month == active_month) diagonal must equal
    the cohort sizes computed independently — and cohorts must contain
    a meaningful number of users."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.events import q71_cohort_retention

    SF = "/root/testdata/sf0.01"
    ev = load_table(spark, SF, "events")
    cohort_sizes = {
        r["m"]: r["n"]
        for r in ev.groupBy("user_id")
        .agg(F.date_format(F.date_trunc("month", F.min("ts")), "yyyy-MM").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(cohort_sizes.values()) > 100  # real user population
    diag = {
        r["cohort_month"]: r["n_users"]
        for r in q71_cohort_retention(spark, SF).collect()
        if r["cohort_month"] == r["active_month"]
    }
    assert diag == cohort_sizes


# ---------------------------------------------------------------- png codec


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    channels=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, channels, seed):
    """encode_png → decode_png is pixel-exact for any size/channel
    combination in the supported profile."""
    import random

    from aerovaldb_spark.functions import decode_png, encode_png

    rng = random.Random(seed)
    pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
    assert decode_png(encode_png(w, h, pixels, channels=channels)) == (
        w,
        h,
        channels,
        pixels,
    )


@given(
    data=st.binary(min_size=0, max_size=400),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_decoder_never_wrong_only_loud(data, seed):
    """Arbitrary bytes — including corrupted valid PNGs — either decode
    to a consistent (w, h, ch, pixels) tuple or raise ValueError; no
    other exception type escapes (the per-row quarantine contract in
    decode_images relies on this)."""
    import random

    from aerovaldb_spark.functions import decode_png, encode_png

    rng = random.Random(seed)
    # half the examples: flip bytes inside a VALID png (targets the
    # chunk walk / inflate / unfilter paths, not just the signature)
    if seed % 2:
        base = bytearray(encode_png(5, 3, bytes(rng.randrange(256) for _ in range(45))))
        for _ in range(rng.randrange(1, 6)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        payload = bytes(base)
    else:
        payload = data
    try:
        w, h, ch, px = decode_png(payload)
        assert len(px) == w * h * ch
    except ValueError:
        pass


def test_sliding_chunks_cover_every_token(spark):
    # Invariants of q80's chunker on the real corpus: (1) chunk count
    # per doc == ceil(n_tokens / stride); (2) token conservation —
    # stride-sized steps mean every token is counted floor/ceil-many
    # times; concretely sum(n_chunk_tokens) is >= n_tokens (full
    # coverage, overlap only adds); (3) no chunk exceeds the window.
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        sliding_chunks,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    per_doc = (
        sliding_chunks(docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("n_chunk_tokens").alias("max_len"),
            F.sum("n_chunk_tokens").alias("covered"),
        )
        .join(docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens")), "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        expected_chunks = -(-r["n_tokens"] // CHUNK_STRIDE)  # ceil
        assert r["n_chunks"] == expected_chunks, r
        assert r["max_len"] <= CHUNK_TOKENS, r
        assert r["covered"] >= r["n_tokens"], r


def test_stratified_sample_is_deterministic_and_rate_shaped(spark):
    # Re-running the sampler yields the identical sample (salted hash,
    # no RNG), and each source's realized fraction is within a loose
    # binomial envelope of its configured rate.
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        SAMPLE_DEFAULT_PCT,
        SAMPLE_RATES,
        stratified_sample_flag,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # rebuild the flag EXPRESSION from scratch for the second pass: a
    # seeded-RNG sampler (F.rand fixes its seed at Column creation)
    # would pass a double-collect of one plan but fail this — two
    # independently built plans agree only if the flag is a pure
    # function of the row
    first = {
        r["doc_id"]
        for r in docs.withColumn("keep", stratified_sample_flag())
        .filter("keep").select("doc_id").collect()
    }
    second = {
        r["doc_id"]
        for r in docs.withColumn("keep", stratified_sample_flag())
        .filter("keep").select("doc_id").collect()
    }
    assert first == second
    stats = (
        docs.withColumn("keep", stratified_sample_flag())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("int")).alias("k"),
        )
        .collect()
    )
    for r in stats:
        pct = SAMPLE_RATES.get(r["source"], SAMPLE_DEFAULT_PCT)
        # 25 docs per source: allow a wide but bounding envelope
        assert abs(r["k"] / r["n"] - pct / 100) <= 0.35, (r, pct)


def test_token_budget_selection_is_greedy_prefix(spark):
    # Every selected set is a quality-ranked prefix whose running
    # total never exceeds the budget, and the next-ranked document
    # would have overflowed it (greedy maximality).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        TOKEN_BUDGET_PER_SOURCE,
        quality_columns,
        token_budget_selection,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sel = token_budget_selection(docs).collect()
    assert sel
    by_source: dict[str, list] = {}
    for r in sel:
        by_source.setdefault(r["source"], []).append(r)
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    ranked = (
        quality_columns(docs)
        .withColumn("rank", F.row_number().over(w))
        .select("source", "rank", "n_tokens")
        .collect()
    )
    tokens_at = {(r["source"], r["rank"]): r["n_tokens"] for r in ranked}
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r["sel_rank"])
        # contiguous prefix of ranks starting at 1
        assert [r["sel_rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert rows[-1]["cum_tokens"] <= TOKEN_BUDGET_PER_SOURCE
        nxt = tokens_at.get((source, len(rows) + 1))
        if nxt is not None:
            assert rows[-1]["cum_tokens"] + nxt > TOKEN_BUDGET_PER_SOURCE


def test_quality_gate_keeps_singleton_and_tiny_sources(spark):
    # The gate's integer rule (rank > floor(pct*n)) must keep a
    # 1-doc source's only document and drop exactly floor(pct*n) of
    # larger sources — the percent_rank>=pct formulation silently
    # erased singleton sources (percent_rank of a 1-row partition
    # is 0).
    from pyspark.sql import functions as F

    from aerovaldb_spark import catalog
    from aerovaldb_spark.operators.text import q84_quality_gate

    vdir = "prop-test://gate"
    rows = [(1, "w " * 30, "solo")]
    rows += [(10 + i, "w " * (30 + i), "quad") for i in range(4)]
    docs = (
        spark.createDataFrame(
            [(d, t.strip(), s) for d, t, s in rows],
            "doc_id long, text string, source string",
        )
        .withColumn("n_chars", F.length("text"))
        .withColumn("lang", F.lit("en"))
    )
    catalog._TABLE_CACHE[(vdir, "documents")] = docs
    try:
        out = q84_quality_gate(spark, vdir).collect()
    finally:
        catalog._TABLE_CACHE.pop((vdir, "documents"), None)
    by_src: dict[str, set] = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert by_src["solo"] == {1}          # singleton survives
    assert len(by_src["quad"]) == 3       # floor(0.25*4)=1 dropped
    assert 10 not in by_src["quad"]       # the lowest-quality one


def test_label_cohesion_reports_singleton_labels(spark):
    # A label with one vector has no pairs but MUST appear in the
    # audit report (n_pairs=0, NULL cosine stats) — an inner join
    # from the pair stats made strays invisible.
    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.similarity import label_cohesion

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (99, [0.0, 1.0], 7),  # stray in its own label
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["label"]: r for r in label_cohesion(vecs).collect()}
    assert set(out) == {0, 7}
    assert out[7]["n_vectors"] == 1 and out[7]["n_pairs"] == 0
    assert out[7]["avg_cosine"] is None
    assert out[0]["n_pairs"] == 1 and out[0]["avg_cosine"] is not None


def test_sliding_chunks_degenerate_documents(spark):
    # Documents the corpus never produces: empty string (splits to
    # [""], one 1-token chunk), single token, exactly window-sized,
    # window+1 (two chunks, second short). Mirrors the oracle's
    # generate_series semantics.
    from aerovaldb_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        sliding_chunks,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "one"),
            (3, " ".join(f"w{i}" for i in range(CHUNK_TOKENS))),
            (4, " ".join(f"w{i}" for i in range(CHUNK_TOKENS + 1))),
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in sliding_chunks(docs).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_chunk_tokens"])
        )
    for v in out.values():
        v.sort()
    assert out[1] == [(0, 1)]  # split("") -> [""] on both engines
    assert out[2] == [(0, 1)]
    assert out[3] == [(0, CHUNK_TOKENS), (1, CHUNK_TOKENS - CHUNK_STRIDE)]
    assert out[4] == [
        (0, CHUNK_TOKENS),
        (1, CHUNK_TOKENS - CHUNK_STRIDE + 1),
        (2, 1),
    ]


def test_label_outlier_gate_singletons_and_exact_drop_rule(spark):
    # Integer drop rule on a constructed corpus: a singleton label
    # keeps its only vector (floor(0.1*1)=0), a 10-vector label drops
    # exactly its single most-dissimilar member (floor(0.1*10)=1) —
    # and that member is the planted outlier, not a borderline tie.
    from aerovaldb_spark.operators.similarity import label_outlier_gate

    rows = [(100, [1.0, 0.0, 0.0, 0.0], 7)]  # singleton label 7
    # label 3: nine near-identical vectors + one planted anti-cluster
    rows += [(i, [1.0, 0.001 * i, 0.0, 0.0], 3) for i in range(9)]
    rows += [(99, [-1.0, 0.5, 0.0, 0.0], 3)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["label"]: r for r in label_outlier_gate(vecs).collect()}
    assert out[7]["n_vectors"] == 1 and out[7]["n_dropped"] == 0
    assert out[3]["n_vectors"] == 10 and out[3]["n_dropped"] == 1
    # the kept band excludes the planted outlier: its cosine to the
    # centroid is negative, so the kept minimum must sit far above it
    assert out[3]["kept_min_cos"] > 0.5
    assert out[7]["kept_avg_cos"] == 1.0  # self-centroid, cos == 1


def test_label_centroids_partitioning_invariant(spark):
    # DECIMAL-summed centroids are bit-identical however the input is
    # partitioned — the property that makes the q90 oracle exact.
    from aerovaldb_spark.operators.similarity import label_centroids

    rows = [
        (i, [0.1 * (i % 7) - 0.3, 1.0 / (i + 1), float(i)], i % 3)
        for i in range(50)
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    one = {
        r["label"]: r["centroid"]
        for r in label_centroids(vecs.coalesce(1)).collect()
    }
    many = {
        r["label"]: r["centroid"]
        for r in label_centroids(vecs.repartition(13)).collect()
    }
    assert one == many


def test_kmv_merge_fuzzed_increments(spark):
    """r8-verdict hardening: randomized per-increment corpora — keys
    with >k distinct values, keys whose values are ALL NULL, and
    duplicate values (hence duplicate hashes) across increments — must
    merge (union of per-increment kept sets, re-bottom-k, in plain
    Python over the sketch state) to EXACTLY the one-shot batch
    sketch's kept sets, for every key that has any non-NULL value."""
    from hypothesis import HealthCheck

    from aerovaldb_spark.operators.events import kmv_kept_hashes

    K = 4

    increments_st = st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.one_of(st.none(), st.integers(0, 30)),
            ),
            min_size=0,
            max_size=20,
        ),
        min_size=2,
        max_size=4,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(increments_st)
    def check(incs):
        # force the named edge cases regardless of the draw: an
        # all-NULL key ('z'), a key with > K distinct values split
        # across increments with overlap (duplicate hashes arrive in
        # BOTH increments), and an empty increment
        incs = list(incs) + [
            [("z", None), ("a", 1), ("a", 2), ("a", 3)],
            [("z", None), ("a", 3), ("a", 4), ("a", 5), ("a", 6)],
            [],
        ]

        def to_df(rows):
            return spark.createDataFrame(
                [(k, v) for k, v in rows] or [("__none__", None)],
                "g string, v long",
            )

        per_inc_kept: dict[str, set[int]] = {}
        for rows in incs:
            for r in kmv_kept_hashes(
                to_df(rows), "g", "v", k=K, n_split=2
            ).collect():
                per_inc_kept.setdefault(r["key"], set()).add(r["h"])
        merged = {
            g: sorted(hs)[:K] for g, hs in per_inc_kept.items()
        }

        whole = to_df([t for rows in incs for t in rows])
        one_shot: dict[str, list[int]] = {}
        for r in kmv_kept_hashes(whole, "g", "v", k=K, n_split=2).collect():
            one_shot.setdefault(r["key"], []).append(r["h"])
        one_shot = {g: sorted(hs) for g, hs in one_shot.items()}

        assert merged == one_shot
        # all-NULL keys emit no sketch at all
        assert "z" not in one_shot and "__none__" not in one_shot

    check()


def test_kmv_overlap_exact_estimator_boundary(spark):
    """q109's algebra with keys STRADDLING the exact/estimator switch
    (n_kept = k-1, k, k+1 distinct values at k=8): every output column
    must equal an independent pure-Python replay of the sketch algebra
    (md5 hash60, bottom-k, exact-below-k / (k-1)/U_(k) estimates,
    round6 convention) — including pairs mixing an exact side with an
    estimated side and union sketches that saturate at k while one
    input did not."""
    import hashlib

    from aerovaldb_spark._round import round6_py
    from aerovaldb_spark.operators.events import kmv_overlap

    K = 8
    # 7, 8 and 9 distinct values; overlapping ranges so intersections
    # are non-trivial; duplicates so dedup matters
    corpora = {
        "p": [0, 1, 2, 3, 4, 5, 6, 0, 1],
        "q": [3, 4, 5, 6, 7, 8, 9, 10, 3],
        "r": [0, 2, 4, 6, 8, 10, 12, 14, 16, 0],
    }
    rows = [(g, v) for g, vals in corpora.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r["type_a"], r["type_b"]): (
            r["users_a"],
            r["users_b"],
            r["union_users"],
            r["intersect_users"],
            r["jaccard"],
        )
        for r in kmv_overlap(df, "g", "v", k=K).collect()
    }

    def kept(vals):
        hs = sorted(
            {
                int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                for v in vals
            }
        )
        return hs[:K]

    def est(ks):
        n = len(ks)
        if n < K:
            return float(n)
        return round6_py((K - 1.0) * float(1 << 60) / float(ks[-1]))

    keys = sorted(corpora)
    want = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            ka, kb = kept(corpora[a]), kept(corpora[b])
            ku = sorted(set(ka) | set(kb))[:K]
            ua, ub, uu = est(ka), est(kb), est(ku)
            inter = max(ua + ub - uu, 0.0)
            want[(a, b)] = (
                ua,
                ub,
                uu,
                round6_py(inter),
                round6_py(inter / uu),
            )

    assert got == want
    # the boundary is actually exercised: one exact side (n_kept < k),
    # one side exactly at k, one beyond k
    assert len(kept(corpora["p"])) == K - 1
    assert len(kept(corpora["q"])) == K
    assert len(set(corpora["r"])) == K + 1 and len(kept(corpora["r"])) == K


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=0.05, max_value=0.99),
    st.floats(min_value=0.5, max_value=0.99),
)
def test_choose_band_dial_meets_model_target(threshold, target):
    """The dial chooser's contract: the returned (bands, rows) meets
    the recall target under the collision model at the assumed
    Jaccard, stays inside the signing budget, and uses the minimal
    band count for its row count (one fewer band misses the target)."""
    from aerovaldb_spark.operators.text import (
        band_collision_prob,
        choose_band_dial,
    )

    import math

    j = threshold / (2.0 - threshold)
    try:
        bands, rows = choose_band_dial(threshold, target)
    except ValueError:
        # refusal is only legitimate when even the cheapest row count
        # can't meet the target inside the 64-seed budget
        assert math.ceil(
            math.log(1.0 - target) / math.log(1.0 - j)
        ) > 64
        return
    assert bands >= 1 and 1 <= rows <= 8
    assert bands * rows <= 64
    assert band_collision_prob(j, bands, rows) >= target - 1e-12
    if bands > 1:
        assert band_collision_prob(j, bands - 1, rows) < target + 1e-9


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=8),
    st.floats(min_value=0.01, max_value=0.99),
)
def test_effective_jaccard_inverts_collision_model(bands, rows, recall):
    """effective_jaccard is the exact inverse of band_collision_prob
    at its operating point — the calibration loop closes."""
    from aerovaldb_spark.operators.text import (
        band_collision_prob,
        effective_jaccard,
    )

    j = effective_jaccard(bands, rows, recall)
    assert 0.0 < j < 1.0
    assert abs(band_collision_prob(j, bands, rows) - recall) < 1e-9


def test_q112_dial_is_the_calibrated_choice():
    """q112's frozen dial: the r9 measured operating point ((8,2) ->
    0.850) inverts to J_eff ~ 0.4595 and the chooser returns (13, 2)
    with model recall ~ 0.954 — pinned so the graded query and its
    templated oracle can't silently drift off the documented
    calibration."""
    from aerovaldb_spark.operators.text import (
        Q112_DIAL,
        band_collision_prob,
        effective_jaccard,
    )

    assert Q112_DIAL == (13, 2)
    j = effective_jaccard(8, 2, 0.850)
    assert abs(j - 0.4595) < 5e-4
    assert band_collision_prob(j, *Q112_DIAL) >= 0.95


def test_kmv_sketch_table_incremental_update_exact(spark, tmp_path):
    """KMVSketchTable: build on increment A then update with increment
    B must equal build over A ∪ B BIT-FOR-BIT (sketches, q106
    estimates, q109 overlap report) — KMV mergeability, exercised with
    overlapping values across increments and keys on both sides of the
    n_kept < k boundary. The disk path (save -> load -> update(path))
    must agree with the in-memory merge, swap state atomically (no
    staging/old leftovers), and refuse an unsaved path."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.events import (
        KMVSketchTable,
        kmv_distinct,
        kmv_overlap,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    a = events.where("event_id % 2 = 0")
    b = events.where("event_id % 2 = 1")  # users overlap across halves
    K = 8

    def rows(df):
        return sorted(map(tuple, df.collect()))

    full = KMVSketchTable.build(events, "event_type", "user_id", k=K)
    merged = KMVSketchTable.build(a, "event_type", "user_id", k=K).update(b)
    assert rows(merged.sketches) == rows(full.sketches)
    # the boundary is real: some keys exact (< k), some estimated
    kept_sizes = {r["n_kept"] for r in full.distinct().collect()}
    assert any(s < K for s in kept_sizes) or any(
        s == K for s in kept_sizes
    )
    assert rows(merged.distinct()) == rows(
        kmv_distinct(events, "event_type", "user_id", k=K)
    )
    assert rows(merged.overlap()) == rows(
        kmv_overlap(events, "event_type", "user_id", k=K)
    )

    p = str(tmp_path / "kmv_store")
    base = KMVSketchTable.build(a, "event_type", "user_id", k=K)
    base.save(p)
    loaded = KMVSketchTable.load(spark, p)
    assert (loaded.k, loaded.key_col, loaded.value_col) == (
        K, "event_type", "user_id",
    )
    grown = loaded.update(b, path=p)
    assert rows(grown.sketches) == rows(full.sketches)
    # a FRESH load sees the merged state; the swap left no leftovers
    assert rows(KMVSketchTable.load(spark, p).sketches) == rows(
        full.sketches
    )
    assert not os.path.exists(os.path.join(p, "sketches.staging"))
    assert not os.path.exists(os.path.join(p, "sketches.old"))

    with pytest.raises(ValueError, match="no saved sketch table"):
        full.update(b, path=str(tmp_path / "nowhere"))


def test_choose_band_dial_tiny_jaccard_no_crash():
    """Review regression: tiny-but-valid jaccard used to hit
    ZeroDivisionError at high row counts (1.0 - j**8 rounds to 1.0 and
    log returns -0.0) even when a perfectly good rows=1 dial fits the
    budget. Underflowed row counts must be skipped, valid dials still
    found, and genuine infeasibility must raise ValueError."""
    import pytest

    from aerovaldb_spark.operators.text import (
        band_collision_prob,
        choose_band_dial,
    )

    bands, rows = choose_band_dial(
        jaccard=0.008, target_recall=0.95, max_seeds=1024
    )
    assert rows == 1 and bands * rows <= 1024
    assert band_collision_prob(0.008, bands, rows) >= 0.95 - 1e-12
    # same jaccard, default budget: every row count misses -> ValueError
    with pytest.raises(ValueError, match="no \\(bands, rows_per_band\\)"):
        choose_band_dial(jaccard=0.008, target_recall=0.95)
    # extreme underflow at EVERY row count incl. rows=1 -> ValueError,
    # never ZeroDivisionError
    with pytest.raises(ValueError):
        choose_band_dial(jaccard=1e-300, target_recall=0.95, max_seeds=10**6)


@settings(max_examples=150, deadline=None)
@given(
    st.floats(min_value=0.3, max_value=0.99),
    st.floats(min_value=0.5, max_value=0.99),
    st.integers(min_value=1, max_value=8),
)
def test_choose_srp_bands_meets_model_target(cos_t, target, planes):
    """SRP band chooser: the returned band count meets the geometric
    collision model at the threshold with minimal bands, or refuses
    when no count within the cap reaches the target."""
    from aerovaldb_spark.operators.similarity import (
        choose_srp_bands,
        srp_collision_prob,
    )

    try:
        b = choose_srp_bands(
            threshold_cos=cos_t,
            target_recall=target,
            planes_per_band=planes,
        )
    except ValueError:
        assert srp_collision_prob(cos_t, planes, bands=32) < target + 1e-9
        return
    assert 1 <= b <= 32
    assert srp_collision_prob(cos_t, planes, bands=b) >= target - 1e-12
    if b > 1:
        assert srp_collision_prob(cos_t, planes, bands=b - 1) < target + 1e-9


@given(
    st.lists(
        st.integers(min_value=1, max_value=(1 << 60) - 1),
        min_size=0,
        max_size=200,
        unique=True,
    ),
    st.integers(min_value=2, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_kmv_estimate_py_contract(hashes, k):
    """The Python estimator twin: exact below k (the kept set IS the
    distinct set), positive and finite at k, and equal to the closed
    form on the k-th smallest hash."""
    from aerovaldb_spark._round import round6_py
    from aerovaldb_spark.operators.events import kmv_estimate_py

    kept = sorted(hashes)[:k]
    est = kmv_estimate_py(kept, k)
    if len(kept) < k:
        assert est == float(len(kept))
    else:
        assert est == round6_py((k - 1.0) * float(1 << 60) / kept[-1])
        assert est > 0.0


@given(
    st.floats(min_value=1.0, max_value=50.0),
    st.floats(min_value=0.001, max_value=0.999),
    st.floats(min_value=0.0, max_value=0.24),
)
@settings(max_examples=200, deadline=None)
def test_rebuild_verdicts_fresh_report_never_trips(lfm, top_mass, churn):
    """A report identical to its own build-time baseline (growth 1x)
    with churn under threshold can never demand a rebuild — the rules
    trigger on GROWTH or threshold crossings, not absolute skew."""
    from aerovaldb_spark.operators.similarity import (
        ivf_rebuild_verdict,
        srp_rebuild_verdict,
    )

    row = {
        "load_factor_max": lfm,
        "top_mass": top_mass,
        "assignment_churn": churn,
    }
    assert not ivf_rebuild_verdict(row, build_report=row).rebuild
    srp_row = {"load_factor_max": lfm, "new_bucket_mass": 0.0}
    assert not srp_rebuild_verdict(srp_row, build_report=srp_row).rebuild


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=2,
        max_size=40,
    ),
    st.sampled_from([4, 8]),
)
@settings(max_examples=12, deadline=None)
def test_source_content_overlap_invariants(spark, rows, k):
    """KMV containment is a genuine ratio for ANY corpus and k: the
    union sketch's k-th smallest is <= either side's (its kept set
    contains both sides' smallest hashes), so union_est >= max(side
    estimates) and the clamped intersection <= min(side) — hence
    containments and jaccard always land in [0, 1], and with every
    distinct count below k the whole matrix is EXACT inclusion-
    exclusion."""
    from aerovaldb_spark.operators.text import (
        source_content_overlap,
        worst_partner_reduce,
    )

    docs = spark.createDataFrame(
        [(i, f"t{v}", s) for i, (s, v) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    m = source_content_overlap(docs, k=k).collect()
    exact = {}
    for s, v in rows:
        exact.setdefault(s, set()).add(v)
    for r in m:
        for col in (
            "jaccard", "containment_a_in_b", "containment_b_in_a"
        ):
            assert 0.0 <= r[col] <= 1.0, (col, r)
        assert r["union_uniq"] >= max(r["uniq_a"], r["uniq_b"]) - 1e-9
        a, b = exact[r["source_a"]], exact[r["source_b"]]
        if max(len(a), len(b), len(a | b)) < k:
            # everything STRICTLY below k: the matrix is exact
            # (n_kept == k already uses the (k-1)/U_k estimator)
            assert r["uniq_a"] == float(len(a))
            assert r["uniq_b"] == float(len(b))
            assert r["union_uniq"] == float(len(a | b))
            assert r["intersect_uniq"] == float(len(a & b))
    # the q125 reduce never invents rows: one row per source that
    # appears in a pair, containment equals that source's max
    best = {}
    for r in m:
        best[r["source_a"]] = max(
            best.get(r["source_a"], -1.0), r["containment_a_in_b"]
        )
        best[r["source_b"]] = max(
            best.get(r["source_b"], -1.0), r["containment_b_in_a"]
        )
    if m:
        mdf = spark.createDataFrame(m)
        for r in worst_partner_reduce(mdf).collect():
            assert r["containment"] == best[r["source"]]


@given(
    st.dictionaries(
        st.sampled_from(
            ["share_drift_mad", "share_drift_max", "rate_drift_max",
             "new_source_mass", "growth_ratio", "rate_drift_mad"]
        ),
        st.one_of(st.none(), st.floats(0, 0.01)),
        max_size=6,
    )
)
@settings(max_examples=50, deadline=None)
def test_mixture_verdict_never_trips_below_thresholds(report):
    """Any report whose metrics are all below every threshold (or
    NULL — absent evidence) stays fresh, whatever the combination;
    growth_ratio alone never trips."""
    from aerovaldb_spark.operators.text import mixture_rebuild_verdict

    report = dict(report)
    report["growth_ratio"] = 1e6  # growth alone is NOT a trigger
    assert not mixture_rebuild_verdict(report).rebuild


@given(
    st.integers(0, 20), st.integers(0, 20), st.integers(0, 6)
)
@settings(max_examples=30, deadline=None)
def test_compact_verdict_monotone_in_threshold(files_a, files_b, thr):
    """Raising max_files_per_dir can only turn a compact verdict OFF,
    never on (monotone rule), and a report that trips at some
    threshold trips at every lower one."""
    from aerovaldb_spark.operators._staging import compact_verdict

    rep = {
        "path": "/x",
        "datasets": {
            "d1": {"n_files": files_a, "n_dirs": 1,
                   "max_files_per_dir": files_a, "n_bytes": 0,
                   "mean_bytes_per_file": 0},
            "d2": {"n_files": files_b, "n_dirs": 1,
                   "max_files_per_dir": files_b, "n_bytes": 0,
                   "mean_bytes_per_file": 0},
        },
    }
    lo = compact_verdict(rep, max_files_per_dir=thr)
    hi = compact_verdict(rep, max_files_per_dir=thr + 5)
    assert lo.rebuild or not hi.rebuild  # hi trips -> lo trips
    assert lo.rebuild == (max(files_a, files_b) > thr)
