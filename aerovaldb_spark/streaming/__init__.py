"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.9); this module
supplies it Spark-first. Every operator is defined on an unbound
DataFrame so the SAME code runs in batch (harness correctness checks)
and as a stream (readStream + watermark). The batch twin of each
streaming query lives in operators/events.py with a DuckDB oracle.

Scale notes: windowed aggregations shuffle on (window, key) — state
store size is bounded by the watermark horizon; session windows use
Spark's built-in session_window operator (state merges adjacent
events, no custom stateful code needed).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .._round import round6


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the harness events parquet.

    The timestamp unit is whatever the harness writer chose — it has
    flipped between TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across
    rounds — so we inspect the footer (same detection as the batch
    reader, catalog._nanos_ts_columns) and normalize to plain
    ``TIMESTAMP`` exactly like ``catalog.load_table`` does: nanos read
    as long + truncate; micros read as NTZ + relabel under the pinned
    UTC session tz. Stream and batch therefore see identical values.
    """
    from ..catalog import _nanos_ts_columns

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nanos = "ts" in _nanos_ts_columns(os.path.join(sf_dir, "events.parquet"))
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _events_schema(T.LongType() if nanos else T.TimestampNTZType())
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + value sums with late-data handling."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions via the built-in session_window operator."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def session_funnel_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-session view→click→purchase funnel depth, streaming-capable:
    conditional MIN timestamps inside the built-in session_window (state
    merges adjacent events and expires past the watermark), then a
    depth classification — the streaming twin of q72's batch funnel
    (which uses the lag-gap sessionizer; boundary ties differ the same
    way q31 differs from q19, hence its own batch twin here)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    per_session = events.groupBy(
        F.session_window("ts", gap).alias("win"), "user_id"
    ).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    depth = (
        F.when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & F.col("t_buy").isNotNull()
            & (F.col("t_view") <= F.col("t_click"))
            & (F.col("t_click") <= F.col("t_buy")),
            3,
        )
        .when(
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_view") <= F.col("t_click")),
            2,
        )
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return per_session.select(
        "user_id",
        F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        depth.alias("funnel_depth"),
    )


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key projection: drop duplicate event_ids within
    the watermark horizon (the streaming twin of exact dedup)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
        return events.dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the harness documents parquet — the
    continuous-ingest twin of the batch corpus."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def read_embedding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the harness embeddings parquet — the
    continuous-ingest twin of the batch vector corpus."""
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def admission_table(
    vectors: DataFrame, pct: float = 0.10, centroids: DataFrame | None = None
) -> DataFrame:
    """(label, centroid, min_cos): the frozen reference a streaming
    outlier gate screens against — per-label centroids plus the
    admission threshold (kept minimum cosine) a batch
    :func:`~aerovaldb_spark.operators.similarity.label_outlier_gate`
    run discovers at ``pct``. Rebuild it whenever the reference corpus
    is re-curated; between rebuilds the gate is a pure function.

    ``centroids`` accepts a precomputed :func:`label_centroids` frame
    so a caller that also runs the batch gate pays the corpus-wide
    (label, pos) aggregation once, not once per consumer."""
    from ..operators.similarity import label_centroids, label_outlier_gate

    cents = centroids if centroids is not None else label_centroids(vectors)
    # pass the centroids through so the corpus-wide (label, pos)
    # aggregation runs once, not once per consumer
    gate = label_outlier_gate(vectors, pct, centroids=cents).select(
        "label", "kept_min_cos"
    )
    return cents.join(gate, "label").select(
        "label", "centroid", F.col("kept_min_cos").alias("min_cos")
    )


def embedding_outlier_gate(
    vectors: DataFrame, admission: DataFrame
) -> DataFrame:
    """Ingest-time embedding outlier screen: cosine of each incoming
    vector to its label's FROZEN centroid, flagged when it falls below
    the label's admission threshold (both from :func:`admission_table`).

    STATELESS by construction: the admission table is |labels| rows —
    one stream-static broadcast join — and the cosine is the same
    map-only in-order fold + 6dp round as batch q90, so the SAME plan
    runs batch or streaming (append mode, no watermark, no state
    store). Unseen labels pass unflagged (NULL cosine — the gate has
    no reference to screen against, mirroring the LM gate's OOV
    backoff). Vectors whose cosine TIES the threshold are admitted:
    the batch rank rule breaks ties by vec_id, which a per-row stream
    cannot see — the gate errs on keeping."""
    from ..operators.similarity import _dbl, pair_dot_col

    # centroid self-norm is a per-label constant: compute it on the
    # |labels|-row side before the broadcast, not per stream row
    adm = admission.select(
        "label",
        F.col("centroid").alias("_cent"),
        F.sqrt(pair_dot_col("centroid", "centroid")).alias("_cnorm"),
        F.col("min_cos"),
    )
    out = vectors.withColumn("_v", _dbl("embedding")).join(
        F.broadcast(adm), "label", "left"
    )
    # nullif keeps a zero-norm vector's cosine NULL (matching batch
    # q90's convention) instead of Spark's NaN from double /0
    cos = round6(
        pair_dot_col("_v", "_cent")
        / F.nullif(
            F.sqrt(pair_dot_col("_v", "_v")) * F.col("_cnorm"), F.lit(0.0)
        ))
    return out.select(
        "vec_id",
        "label",
        cos.alias("centroid_cos"),
        F.coalesce(cos < F.col("min_cos"), F.lit(False)).alias(
            "outlier_flagged"
        ),
    )


def bpe_budget_documents(docs: DataFrame) -> DataFrame:
    """Streaming BPE token budgeting: (doc_id, n_words, n_bpe_tokens)
    as documents arrive — the ingest-time twin of the batch
    :func:`~aerovaldb_spark.functions.bpe.bpe_token_stats`.

    The frozen-reference pattern degenerates nicely here: the
    "reference" is the FROZEN merge table itself (a package constant,
    like the LM gate's model frames but with zero rows to broadcast),
    so the gate is a single stateless Arrow-batched ``mapInPandas`` —
    no state store, no watermark, append mode. Each batch encodes its
    own rows with the same ``encode_word`` the batch path uses; the
    batch path's distinct-vocabulary join is an ECONOMY (encode each
    word once per corpus), not a semantic difference, so stream and
    batch counts are bit-identical (tested)."""
    import re
    from typing import Iterator as _Iter

    from ..functions.bpe import (
        MAX_WORD_CHARS,
        WORD_SPLIT_RE,
        encode_word,
    )

    def score(batches: _Iter["pd.DataFrame"]) -> _Iter["pd.DataFrame"]:
        import math

        import pandas as pd

        split = re.compile(WORD_SPLIT_RE)
        cache: dict[str, int] = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # NULL text must count 0 words, matching the batch
                # path (doc_words splits NULL to no rows) — str(None)
                # would count the literal word "none".
                if text is None or (
                    isinstance(text, float) and math.isnan(text)
                ):
                    text = ""
                words = [
                    w[:MAX_WORD_CHARS]
                    for w in split.split(str(text).lower())
                    if w
                ]
                n_tok = 0
                for w in words:
                    n = cache.get(w)
                    if n is None:
                        n = len(encode_word(w))
                        cache[w] = n
                    n_tok += n
                rows.append((doc_id, len(words), n_tok))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens"]
            )

    return docs.select("doc_id", "text").mapInPandas(
        score, schema="doc_id long, n_words long, n_bpe_tokens long"
    )


def stream_source_health(
    docs: DataFrame,
    k: int | None = None,
    idle_timeout_ms: int | None = None,
    emit_kept: bool = False,
) -> DataFrame:
    """Stateful streaming twin of the batch per-source health report
    (q122), with the one column that needs unbounded state — exact
    distinct content count — replaced by a KMV sketch: per source the
    state is (k smallest distinct content hashes, doc/token/quality
    running totals), so a 100 TB stream holds k longs + three
    counters per source, never a content-hash set. Emits one update
    row per source per micro-batch: (source, n_updates, n_docs,
    n_tokens, n_unique_est, dup_rate_est, mean_quality).

    Exactness discipline: every per-doc quantity (token count,
    round6 quality score, 60-bit content hash) is computed JVM-SIDE
    with the SAME column expressions the batch operators use, before
    the stateful step — the Python update only merges integers, so
    there is nothing to drift. The quality mean rides as an exact
    integer micro-sum (scores are round6, so score*1e6 is integral);
    the KMV estimator is the q106 arithmetic. Batch input falls
    through to the same sketch-based computation distributed
    (``kmv_kept_hashes`` + one keyed agg) — multi-batch stream ≡
    batch bit-equal (tested), by KMV mergeability + exact integer
    sums. dup_rate_est is clamped at 0 (the estimator can overshoot
    n_docs on duplicate-free sources); compare it against the batch
    q122's EXACT dup_rate only within KMV error (~1/sqrt(k)).
    NULL-text docs follow q122's accounting exactly: counted in
    n_docs, absent from every sum and from the sketch (an all-NULL
    source reads n_unique_est 0 and dup_rate_est 1, as q122 does).
    token_share is deliberately absent: it is a cross-key quantity —
    apply :func:`health_with_shares` to the latest row per source.

    ``idle_timeout_ms`` follows the ``stream_kmv_user_distinct``
    semantics (armed per update; expiry evicts silently; AvailableNow
    caveat documented there).

    ``emit_kept=True`` appends the state's kept-hash array as a
    ``kept`` column (the mergeable KMV object) — the rows then also
    answer CROSS-SOURCE questions: hand the latest row per source to
    :func:`source_overlap_from_health` for the live q123 matrix, at
    zero extra state (the gate already holds the sketch)."""
    from ..operators.dedup import hash60
    from ..operators.events import KMV_K, _kmv_estimate, kmv_kept_hashes
    from ..operators.text import quality_columns
    from .._round import round6

    kk = KMV_K if k is None else k
    # NULL-text rows pass through with NULL derived columns (q122's
    # accounting: COUNT(*) includes them, every SUM and the content
    # sketch skip them)
    prepared = quality_columns(docs).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("quality_score") * 1_000_000, 0)
        .cast("long")
        .alias("q_micro"),
        # h rides as a STRING: with NULLs present pandas would deliver
        # a nullable long as float64, and int(float) silently rounds
        # 60-bit hashes above 2^53 (the stream_kmv_user_distinct
        # precision note, applied to our own hash column)
        hash60(F.col("text").cast("string")).cast("string").alias("h"),
    )

    if not docs.isStreaming:
        from ..operators._scope import scoped_persist

        kept = kmv_kept_hashes(docs, "source", "text", kk)
        if emit_kept:
            # kept now feeds the estimate AND the array rollup
            kept = scoped_persist(kept)
        est = _kmv_estimate(kept, ["key"], kk, "n_unique_est").select(
            F.col("key").alias("source"), "n_unique_est"
        )
        totals = prepared.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("q_micro").alias("_q"),
        )
        # LEFT join + zero fill: an all-NULL-text source has no kept
        # hashes at all, but q122 still reports it (dup_rate 1.0)
        out = totals.join(est, "source", "left").select(
            "source",
            F.lit(1).alias("n_updates"),
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_unique_est", F.lit(0.0)).alias("n_unique_est"),
            round6(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0)
                    - F.coalesce("n_unique_est", F.lit(0.0))
                    / F.col("n_docs").cast("double"),
                )
            ).alias("dup_rate_est"),
            round6(
                F.coalesce("_q", F.lit(0)) / 1_000_000.0 / F.col("n_docs")
            ).alias("mean_quality"),
        )
        if not emit_kept:
            return out
        arrays = (
            kept.groupBy("key")
            .agg(F.sort_array(F.collect_list("h")).alias("kept"))
            .withColumnRenamed("key", "source")
        )
        return out.join(arrays, "source", "left").withColumn(
            "kept",
            F.coalesce("kept", F.array().cast("array<long>")),
        )

    def update(key, pdf_iter, state):
        import pandas as pd

        from aerovaldb_spark._round import round6_py

        if state.hasTimedOut:
            state.remove()
            return

        if state.exists:
            kept0, n_docs, n_tokens, q_micro, n_updates = state.get
            seen = set(kept0)
        else:
            seen, n_docs, n_tokens, q_micro, n_updates = set(), 0, 0, 0, 0
        for pdf in pdf_iter:
            n_docs += len(pdf)
            # NULL-text rows carry NULL derived columns: counted in
            # n_docs, skipped by the sums (pandas skipna) and sketch
            n_tokens += int(pdf["n_tokens"].sum(skipna=True) or 0)
            q_micro += int(pdf["q_micro"].sum(skipna=True) or 0)
            seen.update(int(h) for h in pdf["h"].dropna())  # h: string
        if n_docs == 0:
            return
        kept = sorted(seen)[:kk]
        n_updates += 1
        state.update((kept, n_docs, n_tokens, q_micro, n_updates))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        from aerovaldb_spark.operators.events import kmv_estimate_py

        est = kmv_estimate_py(kept, kk)
        row = {
            "source": [key[0]],
            "n_updates": [n_updates],
            "n_docs": [n_docs],
            "n_tokens": [n_tokens],
            "n_unique_est": [est],
            "dup_rate_est": [
                round6_py(max(0.0, 1.0 - est / n_docs))
            ],
            "mean_quality": [
                round6_py(q_micro / 1_000_000.0 / n_docs)
            ],
        }
        if emit_kept:
            row["kept"] = [kept]
        yield pd.DataFrame(row)

    out_schema = (
        "source string, n_updates int, n_docs bigint, "
        "n_tokens bigint, n_unique_est double, "
        "dup_rate_est double, mean_quality double"
    )
    if emit_kept:
        out_schema += ", kept array<bigint>"
    return prepared.groupBy("source").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=(
            "kept array<long>, n_docs bigint, n_tokens bigint, "
            "q_micro bigint, n_updates int"
        ),
        outputMode="update",
        timeoutConf=(
            "ProcessingTimeTimeout"
            if idle_timeout_ms is not None
            else "NoTimeout"
        ),
    )


def health_with_shares(latest: DataFrame) -> DataFrame:
    """Add ``token_share`` to a frame of health rows (one row per
    source — e.g. the latest :func:`stream_source_health` update per
    key, or the batch fallthrough's output): the cross-key column the
    per-key stateful gate cannot emit. One tiny aggregate over
    |sources| rows; zero-token totals yield NULL shares rather than a
    division error."""
    from .._round import round6

    tot = latest.agg(F.sum("n_tokens").alias("_total"))
    return latest.crossJoin(F.broadcast(tot)).select(
        *latest.columns,
        round6(
            F.col("n_tokens")
            / F.nullif(F.col("_total"), F.lit(0)).cast("double")
        ).alias("token_share"),
    )


def source_overlap_from_health(latest: DataFrame, k: int | None = None) -> DataFrame:
    """The q123 cross-source duplicated-content matrix from LIVE
    health-gate state: feed it one row per source from
    :func:`stream_source_health` (``emit_kept=True`` — latest update
    per key, the ``health_with_shares`` convention) and it runs the
    identical sketch algebra over the kept arrays
    (:func:`~aerovaldb_spark.operators.events.kmv_overlap_from_sketches`
    → the shared containment-matrix shape). Bit-equal to the batch
    :func:`~aerovaldb_spark.operators.text.source_content_overlap`
    over the full replayed corpus (tested multi-batch) — "whose share
    is whose content, so far" costs k-row kept sets per source, never
    a replay. ``k`` must be the value the stream was built with;
    all-NULL-text sources carry empty kept arrays and are absent from
    the matrix, exactly as in batch q123. Compose with
    ``operators.text.worst_partner_reduce`` (persist this output
    first) for the live q125 per-source worst-partner rows."""
    from ..operators.events import KMV_K, kmv_overlap_from_sketches
    from ..operators.text import _containment_matrix

    kk = KMV_K if k is None else k
    return _containment_matrix(
        kmv_overlap_from_sketches(
            latest.select(F.col("source").alias("key"), "kept"), kk
        ),
        kk,
    )


# CASE-vs-join switch for mixture_gate plans: a CASE chain is the
# cheapest plan carrier for a handful of sources; past this many the
# expression tree (and codegen) grows linearly while a broadcast
# stream-static join stays flat.
MIXTURE_GATE_MAX_CASE_SOURCES = 64


def mixture_gate(
    docs: DataFrame, plan: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Ingest-time mixture assignment under a FROZEN plan: (doc_id,
    source, n_copies) per incoming document, exactly the batch
    :func:`..operators.text.mixture_assignment` arithmetic with the
    plan's per-source ``sample_rate`` supplied as a dict instead of
    derived from the (unbounded) stream. Freeze a plan from a batch
    :func:`..operators.text.temperature_mix_plan` run — the batch op
    documents WHY the rates must freeze: they are corpus-derived, so
    deriving them per micro-batch would re-plan every source on every
    trigger and verdicts would depend on batch boundaries.

    STATELESS map-only (the plan rides as a CASE expression for small
    plans, or a broadcast stream-static left join past
    ``MIXTURE_GATE_MAX_CASE_SOURCES`` — a CASE chain over thousands
    of sources is a Catalyst expression-tree problem, a 10k-row
    broadcast is not; both paths are output-identical and tested):
    no watermark, no state store, no shuffle — identical output on
    batch and streaming inputs by construction (tested bit-equal),
    and a doc's verdict never depends on which micro-batch carried
    it. Sources absent from the plan take ``default_rate`` (0.0 =
    drop, the conservative default for unplanned sources)."""
    from ..operators.text import mixture_copies_col

    for src, rate in plan.items():
        if not (isinstance(rate, (int, float)) and rate >= 0.0):
            raise ValueError(
                f"plan rate for {src!r} must be a number >= 0, got "
                f"{rate!r}"
            )
    if default_rate < 0.0:
        raise ValueError(f"default_rate must be >= 0, got {default_rate}")
    if len(plan) > MIXTURE_GATE_MAX_CASE_SOURCES:
        # collision-proof internal name, and drop any same-named
        # pre-existing column BEFORE the join: a caller frame already
        # carrying it would make the post-join reference ambiguous
        # (the column never reaches the output select either way)
        rate_name = "__mix_rate"
        plan_df = docs.sparkSession.createDataFrame(
            [(s, float(r)) for s, r in plan.items()],
            f"source string, {rate_name} double",
        )
        docs = docs.drop(rate_name).join(
            F.broadcast(plan_df), "source", "left"
        )
        rate_col = F.coalesce(
            F.col(rate_name), F.lit(float(default_rate))
        )
    else:
        rate_col = F.lit(float(default_rate))
        for src, rate in plan.items():
            rate_col = F.when(
                F.col("source") == src, F.lit(float(rate))
            ).otherwise(rate_col)
    return docs.select(
        "doc_id",
        "source",
        mixture_copies_col(rate_col).alias("n_copies"),
    )


def bpe_pack_gate(docs: DataFrame) -> DataFrame:
    """Streaming BPE sequence packing — q97's ingest-time twin, and
    the one pipeline gate that is GENUINELY stateful: a shard
    assignment depends on everything already packed for the source,
    so the per-source running subword total lives in the state store
    (``applyInPandasWithState``, one long per source — the same
    arbitrary-stateful shape as ``running_user_totals``).

    Ordering semantics, stated honestly: the batch q97 packs in
    doc_id order; a stream packs in ARRIVAL order. Within a
    micro-batch this gate sorts by doc_id (deterministic and equal to
    batch when the data arrives as one batch — tested); across
    micro-batches arrival order wins, which is what an ingest-time
    packer means. The budget/contiguity invariants hold regardless
    (tested), and per-source token totals always equal the batch
    path's. Zero-word docs carry no packable content and emit no row
    (matching q97's inner join).

    Batch input falls through to the exact q97 transform."""
    from ..operators.text import BPE_PACK_BUDGET, bpe_pack

    if not docs.isStreaming:
        return bpe_pack(docs)

    def pack(key, pdf_iter, state):
        import math
        import re

        import pandas as pd

        from ..functions.bpe import (
            MAX_WORD_CHARS,
            WORD_SPLIT_RE,
            encode_word,
        )

        split = re.compile(WORD_SPLIT_RE)
        cache: dict[str, int] = {}
        (cum,) = state.get if state.exists else (0,)
        pairs = []
        for pdf in pdf_iter:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or (
                    isinstance(text, float) and math.isnan(text)
                ):
                    text = ""
                pairs.append((int(doc_id), str(text)))
        pairs.sort()  # doc_id order within the micro-batch
        rows = []
        for doc_id, text in pairs:
            words = [
                w[:MAX_WORD_CHARS]
                for w in split.split(text.lower())
                if w
            ]
            if not words:
                continue
            n = 0
            for w in words:
                k = cache.get(w)
                if k is None:
                    k = len(encode_word(w))
                    cache[w] = k
                n += k
            rows.append((doc_id, key[0], n, cum // BPE_PACK_BUDGET))
            cum += n
        state.update((cum,))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "source", "n_bpe_tokens", "shard_id"],
        )

    return docs.select("doc_id", "source", "text").groupBy(
        "source"
    ).applyInPandasWithState(
        pack,
        outputStructType=(
            "doc_id long, source string, n_bpe_tokens long, shard_id long"
        ),
        stateStructType="cum long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def quality_filtered_documents(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_top_bigram_frac: float = 0.5,
) -> DataFrame:
    """Streaming corpus curation: q22's quality score + q59's
    repetition gate applied to a document stream. Entirely stateless
    map-only column expressions, so the SAME plan runs batch or
    streaming (append mode, no watermark, no state store) — at scale
    this is the filter you put in front of the ingest sink so
    low-quality/boilerplate docs never land."""
    from ..operators.text import quality_columns, repetition_columns

    out = repetition_columns(quality_columns(docs))
    return out.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    ).select(
        "doc_id", "source", "lang", "quality_score", "top_bigram_frac"
    )


def chunked_documents(
    docs: DataFrame, chunk_tokens: int | None = None, stride: int | None = None
) -> DataFrame:
    """Streaming chunker: q80's sliding-window token chunking applied
    to a document stream. Stateless map-only (sequence/explode/slice
    higher-order functions, no shuffle, no state store), so the SAME
    plan runs batch or streaming — at scale this sits between ingest
    and the chunk-level sink, emitting (doc_id, chunk_id, hash) rows
    as documents arrive."""
    from ..operators.text import CHUNK_STRIDE, CHUNK_TOKENS, sliding_chunks

    return sliding_chunks(
        docs,
        chunk_tokens if chunk_tokens is not None else CHUNK_TOKENS,
        stride if stride is not None else CHUNK_STRIDE,
    )


def sampled_documents(
    docs: DataFrame, rates: dict[str, int] | None = None
) -> DataFrame:
    """Streaming stratified sampler: q81's salted-hash keep flag as an
    ingest-time filter. Deterministic — the flag is a pure function of
    (doc_id, source), so replaying the stream after a checkpoint
    restart reproduces the IDENTICAL sample (an RNG-based sampler
    would re-roll on replay and break exactly-once semantics)."""
    from ..operators.text import stratified_sample_flag

    return docs.filter(stratified_sample_flag(rates)).select(
        "doc_id", "source", "lang", "n_chars"
    )


def _band_sig_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig) per-doc band signatures — the ONE
    bucket-signature construction behind both reference builders
    (r14 review: the byte format of band_sig is the collision
    contract between gate and reference; two builders meant a format
    tweak could silently kill every collision)."""
    from ..operators.dedup import ROWS_PER_BAND, minhash_signatures

    sig = minhash_signatures(docs)
    return (
        sig.withColumn("band", (F.col("seed") / ROWS_PER_BAND).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list(F.concat_ws(":", "seed", "minhash")))
            ).alias("band_sig")
        )
    )


def reference_band_buckets(reference_docs: DataFrame) -> DataFrame:
    """(band, band_sig) distinct bucket table of an existing corpus —
    the static side of :func:`near_dup_gate`. Built batch-side with the
    scale-safe agg minhash; refresh it periodically (stream-static
    joins re-read the static side every micro-batch)."""
    return _band_sig_frame(reference_docs).select(
        "band", "band_sig"
    ).distinct()


def near_dup_gate(docs: DataFrame, reference_buckets: DataFrame) -> DataFrame:
    """Flag documents whose banded minhash signature collides with an
    existing corpus — the ingest-time near-dup screen.

    STATELESS by construction: the doc-side band signatures are
    map-only columns (operators.dedup.minhash_band_cols), and the
    corpus side is one (band, band_sig)-distinct broadcast table
    joined once per band with at most one match each — no watermark,
    no state store, append mode. Each incoming doc emits exactly one
    row with ``near_dup`` set; route flagged docs to verification
    (q62's verified_jaccard_pairs) or drop them at the sink.

    At 100 TB the reference bucket table is the big side; swap the
    broadcast for a shuffled semi-join per band, or hash-prefix the
    bucket table — the gate's statelessness is what matters for the
    stream.
    """
    from ..operators.dedup import BANDS, minhash_band_cols

    out = minhash_band_cols(docs)
    flags = []
    for b in range(BANDS):
        ref_b = (
            reference_buckets.filter(F.col("band") == b)
            .select(F.col("band_sig").alias(f"_ref_{b}"))
            .distinct()
        )
        out = out.join(
            F.broadcast(ref_b),
            out[f"bsig_{b}"] == F.col(f"_ref_{b}"),
            "left",
        )
        flags.append(F.col(f"_ref_{b}").isNotNull())
    flag = flags[0]
    for f in flags[1:]:
        flag = flag | f
    return out.withColumn("near_dup", flag).drop(
        *[f"_ref_{b}" for b in range(BANDS)],
        *[f"bsig_{b}" for b in range(BANDS)],
    )


def manifest_reference(
    reference_docs: DataFrame,
) -> "tuple[DataFrame, DataFrame]":
    """The frozen reference the curation-manifest gate broadcasts:
    ``(exact_fps, band_buckets)``. ``exact_fps`` is (fp,
    canonical_id) — min doc_id per exact text; ``band_buckets`` is
    (band, band_sig, canonical_id) — min doc_id per minhash band
    bucket, so a collision can NAME the reference doc it lost to
    (:func:`reference_band_buckets` without the representative stays
    for the boolean-only gate). Build batch-side from the curated
    corpus; refresh out-of-band like every frozen-reference frame."""
    fps = reference_docs.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("canonical_id")
    )
    buckets = (
        _band_sig_frame(reference_docs)
        .groupBy("band", "band_sig")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    return fps, buckets


def curation_manifest_gate(
    docs: DataFrame,
    exact_fps: DataFrame,
    band_buckets: DataFrame,
) -> DataFrame:
    """q132's per-doc verdict at INGEST TIME, against a frozen
    reference corpus: each incoming doc emits exactly one row
    (doc_id, source, lang, n_tokens, verdict, canonical_id, split)
    with q132's stage rules and precedence — 'quality' (q39's gate:
    null text / <20 tokens / stop-ratio >= 0.5) names the first stage
    that dropped it, then 'exact_dup' (md5 hit in the reference fp
    table, canonical_id = the reference doc), then 'near_dup' (banded
    minhash bucket collision, canonical_id = the SMALLEST colliding
    bucket's representative), else 'keep' with the deterministic
    split assignment.

    Twin semantics, stated plainly: the batch manifest (q132)
    adjudicates a corpus AGAINST ITSELF (within-corpus duplicate
    groups, n_copies, near-dup components); the gate adjudicates each
    arriving doc against the FROZEN curated reference — which is why
    n_copies does not exist here (it is a corpus-wide aggregate, not
    a per-doc-vs-reference fact). Stream ≡ batch is exact for this
    operator because every output column is a pure function of (doc,
    reference) — verified across real micro-batch boundaries.

    Bounded state: ZERO. No watermark, no state store, append mode —
    the only non-row inputs are the two broadcast reference frames
    (|reference| rows once for fps, |reference|·BANDS at most for
    buckets, both independent of stream length); at 100 TB-reference
    scale swap the broadcasts for shuffled joins per
    :func:`near_dup_screen_join`'s ladder note."""
    from ..operators.advanced import quality_stage_cols
    from ..operators.dedup import BANDS, minhash_band_cols
    from ..operators.text import split_col

    base, bad_quality = quality_stage_cols(docs)
    out = minhash_band_cols(base)
    for b in range(BANDS):
        ref_b = band_buckets.filter(F.col("band") == b).select(
            F.col("band_sig").alias(f"_ref_{b}"),
            F.col("canonical_id").alias(f"_rep_{b}"),
        )
        out = out.join(
            F.broadcast(ref_b),
            out[f"bsig_{b}"] == F.col(f"_ref_{b}"),
            "left",
        )
    near_flag = F.col("_ref_0").isNotNull()
    for b in range(1, BANDS):
        near_flag = near_flag | F.col(f"_ref_{b}").isNotNull()
    near_canon = F.least(*[F.col(f"_rep_{b}") for b in range(BANDS)])
    out = out.join(
        F.broadcast(
            exact_fps.withColumnRenamed("canonical_id", "_exact_canon")
        ),
        "fp",
        "left",
    )
    verdict = (
        F.when(bad_quality, F.lit("quality"))
        .when(F.col("_exact_canon").isNotNull(), F.lit("exact_dup"))
        .when(near_flag, F.lit("near_dup"))
        .otherwise(F.lit("keep"))
    )
    nul_l = F.lit(None).cast("bigint")
    return out.select(
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        verdict.alias("verdict"),
        F.when(verdict == "exact_dup", F.col("_exact_canon"))
        .when(verdict == "near_dup", near_canon)
        .otherwise(nul_l)
        .alias("canonical_id"),
        F.when(verdict == "keep", split_col())
        .otherwise(F.lit(None).cast("string"))
        .alias("split"),
    )


def near_dup_screen_join(
    docs: DataFrame, reference_buckets: DataFrame
) -> DataFrame:
    """:func:`near_dup_gate` for reference corpora that outgrow a
    broadcast — the minhash rung of the same reference-size ladder as
    the TF-IDF family (broadcast gate -> this join-based screen):
    band signatures unpivot to (doc_id, band, band_sig) rows and ONE
    shuffled left-semi join against the (band, band_sig) reference
    replaces the per-band broadcast joins; no driver-side or
    executor-broadcast copy of the reference ever exists. Output is
    bit-identical to the broadcast gate (equivalence-tested).

    This is the BATCH screen (the flag aggregation makes it a
    shuffle); on a stream keep the broadcast gate, or run this form
    inside foreachBatch per micro-batch."""
    from ..operators.dedup import BANDS, minhash_band_cols

    out = minhash_band_cols(docs)
    long = out.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"bsig_{b}").alias("band_sig"),
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.band").alias("band"), F.col("s.band_sig").alias("band_sig"))
    hits = (
        long.join(reference_buckets, ["band", "band_sig"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    return (
        out.drop(*[f"bsig_{b}" for b in range(BANDS)])
        .join(hits, "doc_id", "left")
        .withColumn("near_dup", F.coalesce("near_dup", F.lit(False)))
    )


class NearDupBucketIndex:
    """Persisted form of the minhash reference buckets — the same
    lifecycle verbs the TF-IDF screen index and the ANN families have
    (build/save/load/add/compact), applied to the minhash rung of the
    reference-screen ladder: the reference corpus's distinct
    (band, band_sig) bucket table is computed ONCE and written
    band-partitioned; ``screen`` routes through
    :func:`near_dup_screen_join` (bit-identical to the broadcast
    gate). Because the screen is a left-SEMI join, duplicate bucket
    rows are semantically invisible — so ``add`` is a plain parquet
    append of the NEW docs' buckets (no dedup pass over the existing
    reference), and ``compact`` re-distincts while collapsing the
    append litter. Unlike the TF-IDF index there is no frozen
    statistic at all (minhash signatures are per-doc), so adds carry
    ZERO staleness: add == rebuild over the union, semantically
    (tested). A one-row ``meta`` pins the module dial
    (BANDS, ROWS_PER_BAND) so a loaded index refuses to serve under a
    retuned quantizer."""

    # the one dataset add(path=...) appends to — makes the index a
    # valid index_ingest_fn target. Replayed appends here are
    # SEMANTICALLY harmless (the semi-join screen is multiplicity-
    # blind), but the protocol still keeps the on-disk state
    # exactly-once so compact() reclaims only genuine duplicates
    APPEND_DATASETS = ("buckets",)

    def __init__(self, buckets: DataFrame) -> None:
        self.buckets = buckets

    @staticmethod
    def build(reference_docs: DataFrame) -> "NearDupBucketIndex":
        return NearDupBucketIndex(reference_band_buckets(reference_docs))

    def save(self, path: str) -> None:
        import os as _os

        from ..operators._staging import clear_stale
        from ..operators.dedup import BANDS, ROWS_PER_BAND

        spark = self.buckets.sparkSession
        # a stale buckets.old must not outlive a re-save (a crashed
        # re-save would leave loaders serving the pre-rebuild state)
        clear_stale(_os.path.join(path, "buckets"))
        (
            self.buckets.write.mode("overwrite")
            .partitionBy("band")
            .parquet(_os.path.join(path, "buckets"))
        )
        spark.createDataFrame(
            [(BANDS, ROWS_PER_BAND, "NearDupBucketIndex")],
            "bands int, rows_per_band int, family string",
        ).write.mode("overwrite").parquet(_os.path.join(path, "meta"))

    @staticmethod
    def _validate_dial(spark: SparkSession, path: str) -> None:
        """Raise unless the saved meta's dial matches the module
        quantizer — checked by ``load`` AND by ``add`` BEFORE any
        rows are written (appending current-dial signatures into a
        foreign-dial index would pollute it permanently)."""
        import os as _os

        from ..operators.dedup import BANDS, ROWS_PER_BAND

        meta_dir = _os.path.join(path, "meta")
        if not _os.path.isdir(meta_dir):
            raise ValueError(
                f"no saved index under {path!r} (missing meta/) — "
                "save() there first"
            )
        from ..operators._staging import (
            read_meta_row,
            require_meta_family,
        )

        meta = read_meta_row(spark, path)
        if meta is None:
            raise ValueError(
                f"no meta dataset under {path!r} — not a saved "
                "near-dup bucket layout"
            )
        md = meta.asDict()
        if "bands" not in md or "rows_per_band" not in md:
            raise ValueError(
                f"the index at {path!r} is not a near-dup bucket "
                f"layout (its meta carries {sorted(md)}) — refusing "
                "to serve or append under a foreign layout"
            )
        require_meta_family(md, "NearDupBucketIndex", path)
        if (int(meta["bands"]), int(meta["rows_per_band"])) != (
            BANDS,
            ROWS_PER_BAND,
        ):
            raise ValueError(
                f"index at {path!r} was built with dial "
                f"({meta['bands']},{meta['rows_per_band']}) but the "
                f"module quantizer is ({BANDS},{ROWS_PER_BAND}) — "
                "signatures would not collide; rebuild the index"
            )

    @staticmethod
    def load(spark: SparkSession, path: str) -> "NearDupBucketIndex":
        import os as _os

        from ..operators._staging import resolve_live

        NearDupBucketIndex._validate_dial(spark, path)
        return NearDupBucketIndex(
            spark.read.schema("band_sig string, band int").parquet(
                resolve_live(_os.path.join(path, "buckets"))
            ).select("band", "band_sig")
        )

    def add(
        self, docs: DataFrame, path: str | None = None
    ) -> "NearDupBucketIndex":
        """Append the NEW docs' buckets. Rows already present in the
        reference become duplicates on disk — harmless to the
        left-semi screen, reclaimed by ``compact``."""
        new = reference_band_buckets(docs)
        if path is None:
            return NearDupBucketIndex(self.buckets.unionByName(new))
        from ..operators._staging import append_partitioned

        # dial check BEFORE the append: foreign-dial rows would
        # pollute the layout permanently (compact's distinct keeps
        # them); the shared append guard then refuses the compact
        # crash window and incomplete layouts
        NearDupBucketIndex._validate_dial(new.sparkSession, path)
        append_partitioned(new, path, "buckets", "band")
        return NearDupBucketIndex.load(new.sparkSession, path)

    @staticmethod
    def compact(spark: SparkSession, path: str) -> "NearDupBucketIndex":
        """Distinct the bucket rows and collapse to one file per band
        directory (append duplicates reclaimed — the one compact in
        the family that REDUCES rows, semantically invisible to the
        semi-join screen). Crash recovery per ``_staging``."""
        from ..operators._staging import compact_dataset

        compact_dataset(
            spark,
            path,
            "buckets",
            partition_col="band",
            distinct=True,
            schema="band_sig string, band int",
        )
        return NearDupBucketIndex.load(spark, path)

    def screen(self, docs: DataFrame) -> DataFrame:
        """One row per doc with the ``near_dup`` collision flag —
        :func:`near_dup_screen_join` against the stored buckets."""
        return near_dup_screen_join(docs, self.buckets)


def semantic_dup_gate(
    vectors: DataFrame,
    reference: DataFrame,
    dim: int = 64,
    threshold: float | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Ingest-time SEMANTIC near-dup screen — the embedding-side twin
    of :func:`near_dup_gate`, completing q93's frozen-reference
    streaming pattern: each incoming vector is SRP-bucketed (map-only
    column arithmetic, the same md5-derived hyperplanes as batch
    q93/q96 and the SRPIndex), probed against the FROZEN reference
    corpus's same-bucket candidates, and flagged when its best rounded
    cosine meets the semantic-dedup threshold.

    STATELESS by construction: the reference collapses to ONE row per
    bucket holding its candidate array (ids + double vectors +
    precomputed norms), so the stream side is a single stream-static
    broadcast equi-join on the bucket id plus array-fold column
    expressions — no watermark, no state store, append mode; the SAME
    plan runs batch or streaming (equivalence tested). Each input row
    emits exactly one output row: (id, bucket, match_cosine, match_id,
    semantic_dup). A vector with no qualifying candidate — empty
    bucket, zero-norm (NULL cosine, both engines' convention), or
    only a self-match — passes unflagged with NULL match columns.

    ``reference`` is any (id, vector) frame: a curated batch corpus,
    or a loaded :class:`~aerovaldb_spark.operators.similarity.SRPIndex`
    ``assignments`` table (its precomputed ``bucket`` is recomputed
    here — same hyperplanes, same value — keeping this entry point
    schema-agnostic). At 100 TB the per-bucket arrays are the n/2^planes
    expected occupancy; size ``planes`` so a bucket's candidates fit a
    broadcast row, or swap the broadcast for a bucket-partitioned
    stream-static join (directory-pruned like SRPIndex.topk) — the
    gate's statelessness is what matters for the stream.

    Ties at the threshold flag as dups (>=, matching batch q93's pair
    filter); among equal-cosine candidates the lowest id wins
    (deterministic, the batch tie convention).
    """
    from ..operators.similarity import (
        SEMANTIC_DEDUP_THRESHOLD,
        _dbl,
        pair_dot_col,
        srp_signature_col,
    )

    thr = SEMANTIC_DEDUP_THRESHOLD if threshold is None else threshold

    cand = (
        reference.select(
            srp_signature_col(vec_col, dim).alias("bucket"),
            F.struct(
                F.col(id_col).alias("id"),
                _dbl(vec_col).alias("emb"),
                F.sqrt(pair_dot_col(vec_col, vec_col)).alias("nrm"),
            ).alias("_c"),
        )
        .groupBy("bucket")
        .agg(F.collect_list("_c").alias("_cands"))
    )

    out = (
        vectors.withColumn("bucket", srp_signature_col(vec_col, dim))
        .withColumn("_v", _dbl(vec_col))
        .withColumn("_vnrm", F.sqrt(pair_dot_col(vec_col, vec_col)))
        .join(F.broadcast(cand), "bucket", "left")
    )
    # per-candidate rounded cosine (the round6 scaled-round convention,
    # spelled in SQL because it runs inside an array lambda), self and
    # NULL-cosine candidates dropped; best = max cosine, ties -> lowest
    # id (negate for ascending struct ordering)
    scored = F.expr(
        "filter(transform(coalesce(_cands, array()), c -> named_struct("
        "  'neg', -(round(aggregate(zip_with(_v, c.emb, (x, y) -> x * y),"
        "       cast(0.0 as double), (a, x) -> a + x)"
        "     / nullif(_vnrm * c.nrm, cast(0.0 as double))"
        "     * 1000000.0, 0) / 1000000.0),"
        f"  'match_id', c.id)),"
        f" s -> s.match_id != {id_col} AND s.neg IS NOT NULL)"
    )
    out = out.withColumn("_best", F.array_min(scored))
    return out.select(
        id_col,
        "bucket",
        (-F.col("_best.neg")).alias("match_cosine"),
        F.col("_best.match_id").alias("match_id"),
        F.coalesce(
            -F.col("_best.neg") >= F.lit(thr), F.lit(False)
        ).alias("semantic_dup"),
    )


TFIDF_INDEX_MAX_WEIGHTS = 5_000_000


def stream_purchase_click_pairs(
    events: DataFrame,
    lookback_hours: int | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join — batch q104's streaming
    twin and the one two-stream stateful operator in the library:
    purchases and clicks arrive on the same event stream, each side is
    event-time watermarked, and the join condition is q104's exact
    bounded-lookback predicate. The time-range bound plus the
    watermark is what lets Structured Streaming EVICT state: a click
    older than (max event time - lookback - watermark) can never join
    a future purchase and is dropped; without the bound the join would
    buffer every click forever (which is why q18's unbounded as-of
    form is NOT streamable and the bounded pair form is the streaming
    attribution shape). Emits the same formatted columns as batch
    q104; batch input falls through to the exact batch operator
    (equivalence-tested)."""
    from ..operators.events import (
        PAIR_LOOKBACK_HOURS,
        purchase_click_pairs,
    )

    hours = PAIR_LOOKBACK_HOURS if lookback_hours is None else lookback_hours
    if not events.isStreaming:
        return purchase_click_pairs(events, hours)
    from ..operators.events import (
        pair_join_condition,
        pair_join_output,
        pair_join_sides,
    )

    p, c = pair_join_sides(events)
    return pair_join_output(
        p.withWatermark("purchase_ts", watermark).join(
            c.withWatermark("click_ts", watermark),
            pair_join_condition(hours),
        )
    )


def stream_purchase_click_pairs_outer(
    events: DataFrame,
    lookback_hours: int | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join — batch q107's
    streaming twin: matched (purchase, click) pairs emit as the inner
    form does, and a purchase with NO click in the lookback window
    emits ONCE with NULL click columns — but only after the watermark
    passes its join window, because until then a matching click could
    still arrive. That deferred emission is the semantic price of
    outer results on a stream (a finite replay must push the watermark
    past the last purchase before the tail's unmatched rows appear);
    the same time-range bound that lets the inner join evict state is
    what makes the NULL verdict safe to declare. Shares the inner
    join's sides/condition/projection so batch equivalence cannot
    drift; batch input falls through to the exact batch operator."""
    from ..operators.events import (
        PAIR_LOOKBACK_HOURS,
        pair_join_condition,
        pair_join_output,
        pair_join_sides,
        purchase_click_pairs_outer,
    )

    hours = PAIR_LOOKBACK_HOURS if lookback_hours is None else lookback_hours
    if not events.isStreaming:
        return purchase_click_pairs_outer(events, hours)
    p, c = pair_join_sides(events)
    return pair_join_output(
        p.withWatermark("purchase_ts", watermark).join(
            c.withWatermark("click_ts", watermark),
            pair_join_condition(hours),
            "leftOuter",
        )
    )


def tfidf_reference_index(
    reference_docs: DataFrame,
    threshold: float = 0.8,
    max_weights: int = TFIDF_INDEX_MAX_WEIGHTS,
) -> dict:
    """Freeze a reference corpus for ingest-time sparse near-dup
    screening — the TF-IDF side of the frozen-reference pattern
    (minhash: :func:`reference_band_buckets`; embeddings:
    :func:`semantic_dup_gate`; sparse vectors: this).

    The index holds (a) the corpus idf table and doc count — SPARK-
    computed with batch q99's exact expressions (collected, never
    recomputed in Python, so reference weights are bit-identical to
    the batch self-join's), (b) each reference doc's normalized
    sparse vector, and (c) an inverted index over PREFIX terms only
    (rarity-first suffix-norm rule at ``threshold`` — the same
    AllPairs bound as batch q99, so no qualifying match can hide
    behind a non-indexed term).

    Driver/broadcast memory is O(reference weights), ENFORCED: a
    reference whose total weight count exceeds ``max_weights`` is
    refused (the SRPIndex planes>24 pattern — fail loudly before an
    unbounded collect) with a pointer to
    :func:`tfidf_reference_index_shards`, which never materializes
    more than one shard's vectors at a time.
    """
    total = _tfidf_index_stats(reference_docs)
    n_weights = total["w"].count()
    if n_weights > max_weights:
        raise ValueError(
            f"reference corpus has {n_weights} tf-idf weights, over the"
            f" {max_weights} single-index broadcast budget — build"
            " tfidf_reference_index_shards(...) and screen with"
            " tfidf_dup_gate_sharded instead"
        )
    return _finish_index(total["w"], total, threshold)


def _tfidf_index_stats(reference_docs: DataFrame) -> dict:
    """Corpus-global pieces every (shard) index shares: the weight
    frame and the collected idf/df/oov/n_docs maps — computed ONCE
    with batch q99's exact Spark expressions."""
    from ..operators.text import tfidf_weight_frame
    from .._round import round6

    w, stats, n = tfidf_weight_frame(reference_docs)
    idf_rows = (
        stats.crossJoin(F.broadcast(n))
        .select(
            "term",
            "df",
            round6(
                F.log(
                    (F.col("n_docs") + 1).cast("double") / (F.col("df") + 1)
                )
            ).alias("idf"),
        )
        .collect()
    )
    n_docs = n.collect()[0]["n_docs"]
    # OOV idf (df = 0) computed Spark-side too: one expression, same
    # engine ln as every other idf value
    oov = (
        n.select(
            round6(F.log((F.col("n_docs") + 1).cast("double"))).alias("v")
        ).collect()[0]["v"]
    )
    return {
        "w": w,
        "df": {r["term"]: r["df"] for r in idf_rows},
        "idf": {r["term"]: r["idf"] for r in idf_rows},
        "oov_idf": oov,
        "n_docs": n_docs,
    }


def _finish_index(w_shard: DataFrame, total: dict, threshold: float) -> dict:
    """Collect one (shard's) weight frame into vec + prefix postings.

    Prefix postings: rarity-first (df ASC, term ASC) suffix-norm rule,
    identical to the batch candidate stage. The slack covers the
    rounding model: verification sums round6'd per-term products (each
    <= 5e-7 over the exact product), so the bound must yield to
    threshold - 5e-7 * (max shared terms <= this doc's terms) to
    provably dominate the verified dot (mirrors batch q99's slack).
    """
    df_map = total["df"]
    vec: dict = {}
    for r in w_shard.select("doc_id", "term", "w").collect():
        vec.setdefault(r["doc_id"], {})[r["term"]] = r["w"]
    eps = 1e-9
    postings: dict = {}
    for doc_id, terms in vec.items():
        ordered = sorted(terms, key=lambda t: (df_map[t], t))
        suffix = sum(terms[t] * terms[t] for t in ordered)
        slack = eps + 5e-7 * len(terms)
        for t in ordered:
            if math.sqrt(suffix) < threshold - slack:
                break
            postings.setdefault(t, []).append(doc_id)
            suffix -= terms[t] * terms[t]
    return {
        "df": df_map,
        "idf": total["idf"],
        "oov_idf": total["oov_idf"],
        "n_docs": total["n_docs"],
        "vec": vec,
        "postings": postings,
        "threshold": float(threshold),
    }


def tfidf_reference_index_shards(
    reference_docs: DataFrame,
    threshold: float = 0.8,
    n_shards: int = 2,
    max_weights: int = TFIDF_INDEX_MAX_WEIGHTS,
) -> list:
    """The shard-and-OR path for references that outgrow one broadcast:
    corpus-global idf/df are computed ONCE over the full reference
    (weights are therefore bit-identical to the unsharded index), then
    each shard collects only the vectors of doc_ids with
    ``doc_id % n_shards == k`` — the driver holds one shard's vectors
    at a time, and each gate pass broadcasts one shard. The prefix
    bound is per-document, so it holds unchanged within a shard: a
    qualifying (incoming, reference) match is found by exactly the
    shard owning that reference doc. Screen with
    :func:`tfidf_dup_gate_sharded` (or run the per-shard gates as
    independent streaming passes and OR the flags downstream — each
    pass is stateless map-only).

    The idf/df maps (O(vocabulary)) are shared by all shards; only the
    O(weights) vector/posting state is sharded. ``max_weights`` guards
    each SHARD's collect."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    total = _tfidf_index_stats(reference_docs)
    shards = []
    for k in range(n_shards):
        w_shard = total["w"].where(
            F.pmod(F.col("doc_id"), F.lit(n_shards)) == k
        )
        n_weights = w_shard.count()
        if n_weights > max_weights:
            raise ValueError(
                f"shard {k} has {n_weights} weights, over the"
                f" {max_weights} per-shard budget — raise n_shards"
            )
        shards.append(_finish_index(w_shard, total, threshold))
    return shards


def tfidf_dup_gate_sharded(docs: DataFrame, shards: list) -> DataFrame:
    """Batch combinator over per-shard :func:`tfidf_dup_gate` passes:
    one row per doc with the best match across all shards (highest
    cosine, ties to the lowest reference id — the unsharded gate's
    exact convention, so sharded output == unsharded output,
    equivalence-tested). The per-doc reduce is a window, so this
    combinator is for BATCH screens; on a stream, run the per-shard
    gates as independent map-only passes and OR the flags downstream.
    """
    from functools import reduce

    from pyspark.sql import Window

    if not shards:
        raise ValueError("shards must be non-empty")
    outs = [tfidf_dup_gate(docs, ix) for ix in shards]
    union = reduce(lambda a, b: a.unionAll(b), outs)
    best = Window.partitionBy("doc_id").orderBy(
        F.col("match_cosine").desc_nulls_last(),
        F.col("match_id").asc_nulls_last(),
    )
    return (
        union.withColumn("_rk", F.row_number().over(best))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


TFIDF_GATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("match_id", T.LongType()),
        T.StructField("match_cosine", T.DoubleType()),
        T.StructField("tfidf_dup", T.BooleanType()),
    ]
)


def tfidf_dup_gate(docs: DataFrame, index: dict) -> DataFrame:
    """Ingest-time sparse near-dup screen — batch q99's streaming
    twin: each incoming document is TF-IDF-weighted under the FROZEN
    reference idf (OOV terms take the df=0 idf), prefix-probed against
    the reference's inverted index, exact-verified against only the
    candidate reference vectors, and flagged when its best cosine
    meets the threshold the index was built with.

    STATELESS map-only: the frozen index rides to executors as a
    SparkContext broadcast, scoring is one Arrow-batched mapInPandas
    — no watermark, state store, or shuffle; the SAME plan runs batch
    or streaming (equivalence tested). Scoring is bit-identical to
    batch q99 on the reference corpus itself: weights replay the
    round6 scaled-rounding convention on the collected Spark idf
    values, dots sum round6'd products as exact Decimals, and the
    flag compares the unrounded decimal-as-double exactly like the
    batch filter. Each input row emits exactly one output row;
    self-matches (same doc_id as a reference doc) are excluded; an
    UNFLAGGED doc always carries NULL match columns — the match is
    reported only when it made the doc a duplicate. (For a flagged
    doc, best-over-candidates equals best-over-ALL-references exactly,
    by the prefix bound's losslessness; a sub-threshold "best" would
    depend on which candidates the bound happens to admit, so it is
    deliberately outside the contract — this is also what keeps the
    all-pairs oracle of the join-based screen exact.) Ties at equal
    cosine resolve to the lowest
    reference id (the batch window's tie convention). Note: an EXACT
    duplicate of a reference doc scores <= 1.0 by up to ~k*5e-7 for a
    k-term doc (unit weights are round6'd before the dot — the batch
    convention); consumers must compare against the threshold, never
    against 1.0.
    """
    from collections.abc import Iterator as _Iterator

    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(index)

    def score(batches: "_Iterator") -> "_Iterator":
        import math as _math
        from decimal import Decimal

        import pandas as pd

        from .._round import round6_py

        ix = bc.value
        df_map, idf_map = ix["df"], ix["idf"]
        oov, thr = ix["oov_idf"], ix["threshold"]
        vec, postings = ix["vec"], ix["postings"]
        eps = 1e-9
        out_cols = [f.name for f in TFIDF_GATE_SCHEMA.fields]
        for batch in batches:
            rows = []
            for r in batch.itertuples(index=False):
                text = "" if r.text is None else str(r.text)
                toks = text.split(" ")
                tf: dict = {}
                for t in toks:
                    tf[t] = tf.get(t, 0) + 1
                raw = {t: c * idf_map.get(t, oov) for t, c in tf.items()}
                nrm_sq = Decimal(0)
                for v in raw.values():
                    nrm_sq += Decimal(repr(round6_py(v * v)))
                nrm = _math.sqrt(float(nrm_sq))
                if nrm <= 0.0:
                    rows.append((r.doc_id, None, None, False))
                    continue
                w = {t: round6_py(v / nrm) for t, v in raw.items()}
                # incoming-side prefix, same rarity-first rule (OOV
                # terms sort first with df 0 and hit no posting)
                ordered = sorted(w, key=lambda t: (df_map.get(t, 0), t))
                suffix = sum(w[t] * w[t] for t in ordered)
                cands: set = set()
                # same rounding-model slack as the index build
                slack = eps + 5e-7 * len(w)
                for t in ordered:
                    if _math.sqrt(suffix) < thr - slack:
                        break
                    cands.update(postings.get(t, ()))
                    suffix -= w[t] * w[t]
                cands.discard(r.doc_id)
                best_id, best_cos = None, None
                for rid in sorted(cands):
                    rv = vec[rid]
                    shared = w.keys() & rv.keys()
                    if not shared:
                        continue
                    dot = Decimal(0)
                    for t in shared:
                        dot += Decimal(repr(round6_py(w[t] * rv[t])))
                    cos = float(dot)
                    if best_cos is None or cos > best_cos:
                        best_id, best_cos = rid, cos
                # match columns are part of the contract ONLY for
                # flagged docs (best-over-candidates == best-over-all-
                # pairs exactly when the best clears the threshold —
                # the prefix bound's losslessness guarantee); a
                # sub-threshold "best" depends on which candidates the
                # bound happens to admit and is NOT reported
                flagged = best_cos is not None and best_cos >= thr
                rows.append(
                    (
                        r.doc_id,
                        best_id if flagged else None,
                        round6_py(best_cos) if flagged else None,
                        bool(flagged),
                    )
                )
            yield pd.DataFrame(rows, columns=out_cols)

    return docs.select("doc_id", "text").mapInPandas(
        score, schema=TFIDF_GATE_SCHEMA
    )


RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Custom stateful operator: running per-user event count + value
    total via ``applyInPandasWithState`` (the arbitrary-stateful-
    processing escape hatch — what you reach for when built-in windowed
    aggs can't express the state machine).

    State is kept in integer cents so accumulation is exact and
    order-independent. Works batch (plain groupBy fallback) and
    streaming (update mode). With ``idle_timeout_ms`` set, a key that
    receives no data for that long (processing time) is EVICTED: the
    timeout is armed via ``state.setTimeoutDuration`` on every update
    (arming is what makes ``hasTimedOut`` reachable — a timeoutConf
    alone never fires), and the expiry invocation removes the state
    without emitting. A later event for the key starts a fresh total.
    """
    if not events.isStreaming:
        return (
            events.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (
                    F.sum(F.col("value").cast("decimal(18,2)")) .cast("double")
                ).alias("total_value"),
            )
        )

    def update(key, pdf_iter, state):
        import pandas as pd

        # a ProcessingTimeTimeout expiry invokes the function with an
        # empty batch; without this guard the key would re-store state
        # and re-emit its previous row as a spurious update — and the
        # timeout could never actually evict anything
        if state.hasTimedOut:
            state.remove()
            return

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            cents += int(round(pdf["value"].sum() * 100))
        state.update((n, cents))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            "ProcessingTimeTimeout"
            if idle_timeout_ms is not None
            else "NoTimeout"
        ),
    )


def stream_kmv_user_distinct(
    events: DataFrame,
    k: int | None = None,
    idle_timeout_ms: int | None = None,
    emit_kept: bool = False,
) -> DataFrame:
    """Stateful streaming KMV distinct-count sketch — batch q106's
    streaming twin and the live demonstration of the sketch's merge
    property: per event_type the state is the k smallest distinct
    60-bit user-id hashes (a bounded ARRAY — never the user set), each
    micro-batch merges its hashes into the kept set (bottom-k of a
    union is the bottom-k of concatenated kept sets), and the emitted
    estimate uses byte-identical arithmetic to the batch operator
    (``round6_py`` twin of the shared rounding convention; the
    Python md5 path reproduces ``hash60`` exactly — tested
    stream ≡ batch to the last bit). Emits one update row per key per
    batch with a monotone ``n_updates`` so consumers (and tests) can
    select the latest. NULL user_ids are ignored, as in batch — a key
    whose values are ALL NULL emits no row at all, matching the batch
    operator's omission of it. Batch input falls through to the exact
    batch operator.

    With ``emit_kept=True`` each row also carries the kept-hash set
    itself (``kept array<long>``) — the mergeable sketch STATE — so a
    downstream consumer (:func:`kmv_live_overlap`) can answer pairwise
    union/intersection/Jaccard questions from the stream's own output
    without replaying the raw events.

    With ``idle_timeout_ms`` set, a key idle for that long (processing
    time) is EVICTED — the timeout is armed via
    ``state.setTimeoutDuration`` on every update, and the expiry
    invocation removes the sketch without emitting; later events for
    the key start a FRESH sketch (n_updates restarts at 1). Tested
    multi-batch (test_idle_timeout_evicts_and_restarts_sketch).
    CAVEAT (observed on pyspark 4.1): with a processing-time timeout
    armed, a ``Trigger.AvailableNow`` replay keeps scheduling
    state-cleanup micro-batches after the data is exhausted, so
    ``awaitTermination`` never returns — finite replays must poll the
    sink and ``stop()`` explicitly (the test shows the pattern);
    long-running triggers are the intended deployment."""
    from ..operators._scope import scoped_persist
    from ..operators.events import (
        KMV_K,
        _kmv_estimate,
        kmv_kept_hashes,
    )

    kk = KMV_K if k is None else k
    if not events.isStreaming:
        kept = scoped_persist(
            kmv_kept_hashes(events, "event_type", "user_id", kk)
        )
        out = _kmv_estimate(kept, ["key"], kk).select(
            F.col("key").alias("event_type"),
            F.lit(1).alias("n_updates"),
            "n_kept",
            F.col("kmv_estimate").alias("kmv_users"),
        )
        if emit_kept:
            arrays = kept.groupBy("key").agg(
                F.sort_array(F.collect_list("h")).alias("kept")
            )
            out = out.join(
                arrays.withColumnRenamed("key", "event_type"),
                "event_type",
            ).select(
                "event_type", "n_updates", "n_kept", "kmv_users", "kept"
            )
        return out

    def update(key, pdf_iter, state):
        import hashlib

        import pandas as pd

        from aerovaldb_spark._round import round6_py

        # timeout expiry arrives with an empty batch iterator: evict
        # the sketch without emitting (re-storing would both leak the
        # state forever and emit a spurious n_updates increment)
        if state.hasTimedOut:
            state.remove()
            return

        kept, n_updates = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else ([], 0)
        )
        seen = set(kept)
        for pdf in pdf_iter:
            # user_id arrives as a STRING column (projected below):
            # pandas would deliver a nullable long as float64, and
            # int(float) silently rounds ids above 2^53 — a different
            # md5 input than batch hash60's CAST(... AS STRING)
            for v in pdf["user_id"].dropna():
                h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
                seen.add(h)
        kept = sorted(seen)[:kk]
        # a key whose values were all NULL so far has an empty sketch;
        # batch kmv_distinct emits no row for it (NULL hashes filtered
        # before the groupBy), so the stream must stay silent too
        if not kept:
            return
        n_updates += 1
        state.update((kept, n_updates))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        n_kept = len(kept)
        from aerovaldb_spark.operators.events import kmv_estimate_py

        est = kmv_estimate_py(kept, kk)
        row = {
            "event_type": [key[0]],
            "n_updates": [n_updates],
            "n_kept": [n_kept],
            "kmv_users": [est],
        }
        if emit_kept:
            row["kept"] = [kept]
        yield pd.DataFrame(row)

    # CAST to string JVM-side so the Python path hashes the exact
    # digits batch hash60 hashes (see precision note in update())
    projected = events.select(
        "event_type", F.col("user_id").cast("string").alias("user_id")
    )
    return projected.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, n_updates int, n_kept bigint, "
            "kmv_users double"
            + (", kept array<long>" if emit_kept else "")
        ),
        stateStructType="kept array<long>, n_updates int",
        outputMode="update",
        timeoutConf=(
            "ProcessingTimeTimeout"
            if idle_timeout_ms is not None
            else "NoTimeout"
        ),
    )


def tfidf_screen_batch_fn(index, write, threshold: float = 0.8,
                          verify_shape: str = "map",
                          max_bucket: int | None = None):
    """``foreachBatch`` factory serving the persisted
    :class:`~aerovaldb_spark.operators.text.TfidfScreenIndex` on a
    document STREAM — the streaming end of the TF-IDF screen ladder
    (broadcast gate -> sharded gate -> join-based batch -> persisted
    index -> this). The screen contract needs per-doc best-match
    windows and multi-joins append-mode streams can't express, but
    each incoming doc's output row depends ONLY on that doc and the
    FROZEN reference, so screening micro-batch by micro-batch IS the
    exact semantics: the union of per-batch results equals one batch
    screen over all incoming docs (tested multi-batch). ``write``
    receives (result_df, epoch_id) per micro-batch — attach with
    ``stream.writeStream.foreachBatch(tfidf_screen_batch_fn(idx, w))``.
    ``max_bucket`` is safe here because the index applies the skew
    guard to the frozen REFERENCE signatures only (see
    ``TfidfScreenIndex.screen``) — per-doc output never depends on
    which micro-batch a doc arrived in."""
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators._scope import scoped_collector

        # release ONLY the persists this batch's screen registers —
        # bounding the stream's cache growth without evicting
        # intermediates belonging to concurrent queries, other
        # streams, or a freshly-BUILT index's cached reference frames.
        # scoped_collector snapshots THIS thread's registrations and
        # releases them by identity, so concurrent streams (each
        # foreachBatch fires on its own thread) can interleave without
        # evicting each other's caches — a positional mark could not
        # (see _scope.scope_mark)
        with scoped_collector():
            write(
                index.screen(
                    batch_df,
                    threshold=threshold,
                    verify_shape=verify_shape,
                    max_bucket=max_bucket,
                ),
                epoch_id,
            )

    return fn


def _recover_torn_ingests(marker_dir: str, spark=None) -> dict:
    """Per-run torn-append repair — delegates to the ONE shared loop
    in ``operators._staging`` (see ``recover_run_intents`` for the
    marker/intent pairing rule and the cache-eviction rationale)."""
    from ..operators._staging import recover_run_intents

    return recover_run_intents(marker_dir, spark)


def recover_index_ingest(path: str, spark=None) -> dict:
    """Repair torn streaming-ingest appends under EVERY run recorded
    at ``path/_ingest_epochs/`` — run this after an unclean stop
    before serving, compacting, or starting a NEW stream (a fresh
    checkpoint gets a fresh run_id, so the new stream's own per-batch
    recovery would never look at the old run's markers). Returns
    {intent_path: removed-files} for what was rolled back (empty =
    nothing was torn). Pass the live ``spark`` session so repaired
    paths are evicted from its shared file-listing cache. Raises on
    an interrupted rebuild swap (``<path>.old`` without ``<path>``) —
    re-run the rebuild first; see
    ``operators._staging.recover_ingest_intents``."""
    from ..operators._staging import recover_ingest_intents

    return recover_ingest_intents(path, spark)


def index_ingest_fn(index, path: str, run_id: str, datasets=None):
    """``foreachBatch`` factory GROWING any persisted index family
    from a stream — each micro-batch goes through the family's
    ``add(batch, path=path)`` under the replay-safe epoch protocol:

    1. roll back any TORN previous attempt in this run
       (``_recover_torn_ingests`` — see the append-intent protocol in
       ``operators._staging``);
    2. skip the batch when its commit marker exists (the Structured
       Streaming batch-id dedup pattern);
    3. write an intent snapshot of the family's append datasets
       (``type(index).APPEND_DATASETS``), run ``add``, write the
       marker, drop the intent.

    A crash ANYWHERE between the intent and the marker — including
    the screen index's weights→signatures window, and the window
    between a completed add and the marker — leaves an intent without
    a marker; the redelivered batch (same epoch id) rolls the
    datasets back to the snapshot bit-for-bit and re-appends, so a
    replay can never double-append rows (crash-injection tested,
    screen results bit-equal to a clean run). After an unclean stop
    that will NOT resume from the same checkpoint, run
    :func:`recover_index_ingest` once before reading/compacting.

    ``run_id`` scopes the dedup to ONE stream lifetime: keep it
    STABLE across checkpointed restarts of the same query (tie it to
    the checkpoint, e.g. its directory name) so a re-delivered batch
    is skipped, and use a FRESH run_id whenever the checkpoint is
    fresh — epoch ids restart at 0 with a new checkpoint, so reusing
    an old run_id would silently skip the new stream's first batches
    (and neither a rebuild nor ``compact`` clears markers). Serving
    and ingest on the same path must not run concurrently with
    ``compact`` (single-writer rule)."""
    import os as _os

    from ..operators._staging import write_append_intent

    if not run_id or "/" in run_id:
        raise ValueError(
            f"run_id must be a non-empty path-safe name, got {run_id!r}"
        )
    if datasets is None:
        datasets = type(index).APPEND_DATASETS

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators._scope import scoped_collector

        # refuse the interrupted-rebuild state BEFORE creating any
        # directory: makedirs here would materialize a stub live root
        # (markers only, no datasets), making resolve_live prefer it
        # over the intact <path>.old and defeating the
        # recover_ingest_intents mid-swap guard
        if not _os.path.isdir(path) and _os.path.isdir(path + ".old"):
            raise ValueError(
                f"interrupted rebuild detected at {path!r} (.old "
                "without the live root) — re-run the rebuild/compact "
                "to complete the swap before resuming ingest"
            )
        marker_dir = _os.path.join(path, "_ingest_epochs", run_id)
        _os.makedirs(marker_dir, exist_ok=True)
        marker = _os.path.join(marker_dir, str(int(epoch_id)))
        intent = marker + ".intent"
        _recover_torn_ingests(marker_dir, batch_df.sparkSession)
        if _os.path.exists(marker):
            return
        if not batch_df.isEmpty():
            write_append_intent(
                intent, [_os.path.join(path, d) for d in datasets]
            )
            with scoped_collector():
                index.add(batch_df, path=path)
        _commit_marker(marker)
        if _os.path.exists(intent):
            _os.remove(intent)

    return fn


def _commit_marker(marker: str) -> None:
    """The epoch commit point — a separate function so crash-injection
    tests can fault it (simulating a die between the append and the
    marker). fsynced (file + directory) so the commit is durable
    against power loss, not just process crashes: the caller removes
    the intent right after this returns, and a marker that evaporated
    with the page cache while the intent's removal persisted would
    let a redelivered batch re-append without rollback."""
    from ..operators._staging import fsync_dir

    with open(marker, "w") as f:
        f.flush()
        os.fsync(f.fileno())
    fsync_dir(os.path.dirname(marker))


def tfidf_index_ingest_fn(index, path: str, run_id: str):
    """:func:`index_ingest_fn` for the persisted
    :class:`~aerovaldb_spark.operators.text.TfidfScreenIndex` — the
    WRITE-side twin of :func:`tfidf_screen_batch_fn` (which serves
    reads). Each micro-batch is signed under the index's FROZEN idf
    stats and appended via ``TfidfScreenIndex.add(path=...)``; because
    signing is per-doc under frozen stats, per-batch appends compose
    to exactly one big ``add`` over all streamed docs (tested). The
    frozen-stats staleness note on ``add`` applies to the stream as a
    whole: rebuild when idf drift matters (q114 measures it).

    Replay safety: the generic epoch protocol — including the
    weights→signatures torn window ``add`` documents — is handled by
    :func:`index_ingest_fn`'s intent/rollback mechanism; a
    redelivered batch can no longer double-append weights (the r11
    verdict's documented-but-unimplemented recovery, now implemented
    and crash-injection tested)."""
    return index_ingest_fn(index, path, run_id)


def kmv_live_overlap(
    sketch_rows: DataFrame,
    k: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Pairwise KMV union/intersection/Jaccard ACROSS LIVE STREAM
    STATE: feed it a snapshot of :func:`stream_kmv_user_distinct`
    (``emit_kept=True``) output — a memory-sink table, a foreachBatch
    frame, or any accumulation of update rows — and it selects each
    key's LATEST sketch and runs batch q109's exact algebra
    (:func:`~aerovaldb_spark.operators.events.kmv_overlap_from_sketches`)
    over the kept arrays. Bit-equal to ``kmv_overlap`` over the full
    replayed data (tested multi-batch) — "overlap so far" between two
    live streams costs k-row sketch rows per key, never a replay.
    ``k`` must be the value the stream was built with.

    "Latest" is highest ``n_updates``, which identifies the newest
    sketch as long as the counter is per-key monotone over the
    accumulated rows — true for any stream WITHOUT ``idle_timeout_ms``.
    WITH idle eviction the counter RESTARTS at 1 after an expiry, so an
    accumulated sink still holding pre-eviction rows would rank a stale
    sketch above the genuinely latest one and ties become possible. For
    that deployment, stamp accumulation order into the rows (e.g. a
    ``foreachBatch`` accumulator adding ``F.lit(epoch_id)`` — see
    :func:`epoch_stamped`) and pass its name as ``order_col``: rows
    then rank by (order_col DESC, n_updates DESC), which is correct
    across restarts because a later epoch always supersedes an earlier
    one. Without ``order_col``, remaining ties break deterministically
    (n_kept DESC, kept DESC) but may pick the stale sketch — the
    documented price of an unordered snapshot after eviction."""
    from pyspark.sql import Window

    from ..operators.events import KMV_K, kmv_overlap_from_sketches

    if "kept" not in sketch_rows.columns:
        raise ValueError(
            "kmv_live_overlap needs the kept-hash arrays: run "
            "stream_kmv_user_distinct with emit_kept=True (got columns "
            f"{sketch_rows.columns})"
        )
    order = (
        [F.col(order_col).desc()] if order_col is not None else []
    ) + [
        F.col("n_updates").desc(),
        F.col("n_kept").desc(),
        F.col("kept").desc(),
    ]
    w = Window.partitionBy("event_type").orderBy(*order)
    latest = (
        sketch_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("event_type").alias("key"), "kept")
    )
    return kmv_overlap_from_sketches(
        latest, KMV_K if k is None else k
    )


def epoch_stamped(write, col: str = "_epoch"):
    """``foreachBatch`` factory stamping each micro-batch's rows with
    the epoch id before handing them to ``write`` — the accumulation
    shape :func:`kmv_live_overlap` needs as ``order_col`` when the
    upstream stateful stream uses ``idle_timeout_ms`` (epoch order
    survives the n_updates restart an eviction causes)."""
    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        write(batch_df.withColumn(col, F.lit(int(epoch_id))), epoch_id)

    return fn


def purchases_with_recent_clicks(
    events: DataFrame,
    horizon: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase paired with the same
    user's clicks in the preceding ``horizon`` (strictly before).

    The streaming classic: watermarks on BOTH sides plus the time-
    bound join condition let Spark expire join state — without the
    interval bound the state store would grow unboundedly. Works batch
    (plain join) and streaming (append mode) from the same code.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    if events.isStreaming:
        purchases = purchases.withWatermark("p_ts", watermark)
        clicks = clicks.withWatermark("c_ts", watermark)
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
    )


def enriched_events(events: DataFrame, dim: DataFrame, dim_key: str = "c_custkey") -> DataFrame:
    """Stream-static join: enrich the event stream with a (small,
    broadcast) dimension table. The static side is re-read per
    micro-batch by Spark, so slowly-changing dims pick up updates; no
    watermark needed — static joins keep no state."""
    return events.join(
        F.broadcast(dim), events.user_id == dim[dim_key], "left"
    ).drop(dim_key)


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    spark: SparkSession,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain an availableNow stream into an in-memory table and return
    the result as a batch DataFrame (used by tests/verification)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_ingest(
    db,
    route,
    stream_df: DataFrame,
    checkpoint_dir: str | None = None,
    available_now: bool = False,
):
    """Continuous asset ingest: a streaming DataFrame of asset rows
    (route key columns + ``payload`` [+ ``write_ts``]) appends into the
    store via ``foreachBatch`` → :meth:`AerovalSparkDB.bulk_import`.

    Semantics at scale: each micro-batch is one distributed append (no
    per-asset driver loop); the append-log + LWW window makes replayed
    batches harmless (same keys re-resolve to the latest write), so a
    checkpointed restart is effectively exactly-once for readers.
    Returns the StreamingQuery — caller owns stop()/awaitTermination.
    """

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        db.bulk_import(route, batch_df)

    writer = stream_df.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_export_corpus(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    partition_by: tuple[str, ...] = ("lang",),
    max_records_per_file: int | None = None,
    available_now: bool = False,
):
    """Streaming twin of :func:`..operators.export_sink.export_corpus`:
    continuously lands a curated document stream as a partitioned
    parquet corpus.

    Spark's native file sink gives exactly-once here — the checkpoint
    plus the sink's transactional _spark_metadata log means a restarted
    query never double-writes a batch — and ``partitionBy`` works the
    same as in batch, so downstream readers get the identical pruned
    layout whether the corpus was landed by a batch job or this stream.
    Returns the StreamingQuery — caller owns stop()/awaitTermination.
    """
    missing = [c for c in partition_by if c not in stream_df.columns]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")
    writer = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def frozen_bigram_lm(
    docs: DataFrame, max_terms: int = 1_000_000
) -> tuple[dict, dict, int]:
    """Freeze a corpus bigram LM for ingest-time scoring: unigram
    counts, bigram counts (each capped at the ``max_terms`` most
    frequent, deterministic ties by term), and the vocabulary size.

    The caps bound driver/broadcast memory at corpus scale — an OOV
    unigram or bigram backs off to count 0 under the same add-one
    smoothing, so capping degrades scores gracefully instead of
    failing. The counts come from the same aggregations as the batch
    q76 (operators.text.q76_bigram_lm_nll): within the caps the gate's
    scores are IDENTICAL to the batch query's.
    """
    t = docs.select(F.split("text", " ").alias("t"))
    uni_df = (
        t.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = uni_df.count()
    uni = {
        r["w"]: r["c"]
        for r in uni_df.orderBy(F.desc("c"), "w").limit(max_terms).collect()
    }
    bi_df = (
        t.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) < 2 THEN array() ELSE"
                    " transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    " element_at(t, i + 1) AS w2)) END"
                )
            ).alias("b")
        )
        .groupBy("b.w1", "b.w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = {
        (r["w1"], r["w2"]): r["c"]
        for r in bi_df.orderBy(F.desc("c"), "w1", "w2")
        .limit(max_terms)
        .collect()
    }
    return uni, bi, vocab


LM_GATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bigrams", T.LongType()),
        T.StructField("avg_nll", T.DoubleType()),
        T.StructField("low_quality", T.BooleanType()),
    ]
)


def lm_quality_gate(
    docs: DataFrame,
    model: tuple[dict, dict, int],
    threshold: float = 6.0,
) -> DataFrame:
    """Ingest-time LM-perplexity screen: score each document's average
    negative log-likelihood under a FROZEN bigram LM and flag docs
    above ``threshold`` (high NLL = unusual/low-quality text — the
    CCNet-style filter, streaming edition).

    STATELESS map-only: the capped model rides to executors as a
    SparkContext broadcast (one copy per executor, not per task), the
    scoring is an Arrow-batched mapInPandas, and there is no
    watermark, state store, or shuffle — works identically on batch
    and streaming inputs. Scoring matches batch q76 exactly within
    the model caps: per-bigram log-probs round to 6 places and sum as
    exact Decimals (the engine's DECIMAL-sum parity convention).
    Documents with fewer than two tokens score NULL and are not
    flagged.
    """
    from collections.abc import Iterator as _Iterator

    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(model)
    thr = float(threshold)

    def score(batches: "_Iterator") -> "_Iterator":
        import math
        from decimal import Decimal

        import pandas as pd

        from .._round import round6_py

        uni, bi, vocab = bc.value

        def round6(v: float) -> Decimal:
            # the engine-wide scaled-rounding convention
            # (aerovaldb_spark/_round.py): bit-identical to batch q76's
            # round6 column AND DuckDB's ROUND; the result is exactly
            # 6 decimal places, so the Decimal conversion is exact
            return Decimal(repr(round6_py(v)))

        out_cols = [f.name for f in LM_GATE_SCHEMA.fields]
        for batch in batches:
            rows = []
            for r in batch.itertuples(index=False):
                toks = str(r.text).split(" ")
                n = len(toks) - 1
                if n < 1:
                    rows.append((r.doc_id, 0, None, False))
                    continue
                total = Decimal(0)
                for i in range(n):
                    c2 = bi.get((toks[i], toks[i + 1]), 0)
                    c1 = uni.get(toks[i], 0)
                    total += round6(math.log((c2 + 1.0) / (c1 + vocab)))
                avg = float(round6(-float(total) / n))
                rows.append((r.doc_id, n, avg, avg > thr))
            yield pd.DataFrame(rows, columns=out_cols)

    return docs.select("doc_id", "text").mapInPandas(
        score, schema=LM_GATE_SCHEMA
    )
