"""Cross-micro-batch behavior of the STATEFUL streaming operators.

Every other streaming test drives a single-file source — one
micro-batch — which never exercises state carried BETWEEN batches.
These tests split the corpus across two parquet files and force one
file per trigger (maxFilesPerTrigger=1 + availableNow), so:
- the stream-stream join must match batch-2 purchases against clicks
  BUFFERED from batch 1,
- the stateful BPE packer's per-source running totals must continue
  across the batch boundary (shard ids keep counting, budgets hold),
- dropDuplicatesWithinWatermark must suppress a duplicate arriving in
  a LATER batch,
- running_user_totals must accumulate across batches to the batch
  answer.

Files are split by event time / doc id so event-time watermarks only
ever advance (no late-data drops) and arrival order equals id order —
making stream == batch an EXACT expectation, not an approximation.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF_DIR = "/root/testdata/sf0.001"


def _write_split_events(spark, tmpdir: str, split_at=None) -> None:
    """The sf0.001 events table, split at a timestamp into two files
    (older half first — lexicographic file order is the processing
    order for the file source). Default split point: the median."""
    rows = sorted(
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .selectExpr(
            "event_id",
            "cast(ts as timestamp) as ts",
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .collect(),
        key=lambda r: (r["ts"], r["event_id"]),
    )
    if split_at is None:
        halves = [rows[: len(rows) // 2], rows[len(rows) // 2:]]
    else:
        halves = [
            [r for r in rows if r["ts"] <= split_at],
            [r for r in rows if r["ts"] > split_at],
        ]
    for i, half in enumerate(halves):
        table = pa.table(
            {
                "event_id": pa.array(
                    [r["event_id"] for r in half], pa.int64()
                ),
                "ts": pa.array(
                    [
                        r["ts"].replace(tzinfo=dt.timezone.utc)
                        for r in half
                    ],
                    pa.timestamp("us", tz="UTC"),
                ),
                "user_id": pa.array(
                    [r["user_id"] for r in half], pa.int64()
                ),
                "event_type": pa.array(
                    [r["event_type"] for r in half], pa.string()
                ),
                "value": pa.array(
                    [r["value"] for r in half], pa.float64()
                ),
                "props": pa.array(
                    [r["props"] for r in half], pa.string()
                ),
            }
        )
        pq.write_table(table, os.path.join(tmpdir, f"part{i}.parquet"))


_EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _event_stream_two_batches(spark, tmpdir: str):
    return (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmpdir)
    )


def test_stream_stream_join_across_batches(spark, tmp_path):
    """Purchases in batch 2 must join clicks buffered from batch 1 —
    the state the single-batch test never exercises. Split is by event
    time, so watermarks only advance and stream == batch exactly."""
    from aerovaldb_spark.operators.events import purchase_click_pairs
    from aerovaldb_spark.streaming import (
        run_stream_to_memory,
        stream_purchase_click_pairs,
    )

    # choose the split point INSIDE a known (click, purchase) pair so
    # at least one join match is guaranteed to span the two batches
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    probe = purchase_click_pairs(ev.selectExpr(
        "event_id", "cast(ts as timestamp) as ts", "user_id",
        "event_type", "value", "props",
    )).collect()
    assert probe
    widest = max(
        probe, key=lambda r: (r["purchase_ts"], r["click_ts"])
    )
    c_ts = dt.datetime.strptime(
        widest["click_ts"], "%Y-%m-%d %H:%M:%S.%f"
    )
    p_ts = dt.datetime.strptime(
        widest["purchase_ts"], "%Y-%m-%d %H:%M:%S.%f"
    )
    split_at = c_ts + (p_ts - c_ts) / 2

    d = str(tmp_path / "ev2")
    os.makedirs(d)
    _write_split_events(spark, d, split_at=split_at)

    batch_df = spark.read.schema(_EV_SCHEMA).parquet(d)
    batch = sorted(map(tuple, purchase_click_pairs(batch_df).collect()))
    assert batch

    got = run_stream_to_memory(
        stream_purchase_click_pairs(_event_stream_two_batches(spark, d)),
        "pc_pairs_2b",
        spark,
        output_mode="append",
    )
    streamed = sorted(map(tuple, got.collect()))
    assert streamed == batch

    # prove the split actually crosses batches: at least one pair's
    # click is in file 0 and purchase in file 1
    f0_ids = {
        r["event_id"]
        for r in spark.read.parquet(os.path.join(d, "part0.parquet")).collect()
    }
    cross = [
        (pid, cid)
        for pid, cid, *_ in streamed
        if cid in f0_ids and pid not in f0_ids
    ]
    assert cross, "time split produced no cross-batch pairs"


def test_stream_stream_left_outer_join_across_batches(spark, tmp_path):
    """q107's streaming twin: unmatched purchases must emit (with NULL
    click columns) once the watermark passes their join window, and
    matched pairs must equal the inner join's — across micro-batches.
    A final sentinel batch (one far-future 'view' event, on neither
    join side) pushes the watermark past every real purchase's window
    so the tail's unmatched rows actually flush; without it a finite
    replay legitimately never emits them."""
    from aerovaldb_spark.operators.events import (
        PAIR_LOOKBACK_HOURS,
        purchase_click_pairs_outer,
    )
    from aerovaldb_spark.streaming import (
        run_stream_to_memory,
        stream_purchase_click_pairs_outer,
    )

    d = str(tmp_path / "ev_outer")
    os.makedirs(d)
    _write_split_events(spark, d)

    real = spark.read.schema(_EV_SCHEMA).parquet(d)
    max_ts = real.agg(F.max("ts")).collect()[0][0]
    sentinel_ts = (
        max_ts.replace(tzinfo=dt.timezone.utc)
        + dt.timedelta(hours=PAIR_LOOKBACK_HOURS + 2)
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10**9], pa.int64()),
                "ts": pa.array([sentinel_ts], pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["view"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        ),
        os.path.join(d, "part2.parquet"),
    )

    # batch expectation over all three files: the sentinel is a 'view',
    # so it sits on neither join side and changes nothing
    batch_df = spark.read.schema(_EV_SCHEMA).parquet(d)
    batch = sorted(
        map(tuple, purchase_click_pairs_outer(batch_df).collect())
    )

    got = run_stream_to_memory(
        stream_purchase_click_pairs_outer(
            _event_stream_two_batches(spark, d)
        ),
        "pc_pairs_outer_mb",
        spark,
        output_mode="append",
    )
    streamed = sorted(map(tuple, got.collect()))
    assert streamed == batch

    # the outer join's reason to exist: at least one purchase with no
    # click in the lookback window, carried with NULL click columns
    unmatched = [t for t in streamed if t[1] is None]
    assert unmatched, "corpus produced no unmatched purchases"
    matched = [t for t in streamed if t[1] is not None]
    assert matched, "corpus produced no matched pairs"


def test_kmv_sketch_state_merges_across_batches(spark, tmp_path):
    """The streaming KMV gate's state (bottom-k kept hashes) must merge
    micro-batch increments to EXACTLY the batch sketch — bit-equal
    estimates, which also proves the Python md5/round6_py path
    reproduces the JVM hash60/round6 arithmetic."""
    from aerovaldb_spark.streaming import (
        run_stream_to_memory,
        stream_kmv_user_distinct,
    )

    d = str(tmp_path / "ev_kmv")
    os.makedirs(d)
    _write_split_events(spark, d)

    batch_df = spark.read.schema(_EV_SCHEMA).parquet(d)
    # small k so the estimator path (not the exact-count path)
    # exercises at sf0.001's ~15 distinct users per type
    want = {
        (r["event_type"], r["n_kept"], r["kmv_users"])
        for r in stream_kmv_user_distinct(batch_df, k=8).collect()
    }
    assert any(t[1] == 8 for t in want)  # estimator path reached

    got_df = run_stream_to_memory(
        stream_kmv_user_distinct(
            _event_stream_two_batches(spark, d), k=8
        ),
        "kmv_mb",
        spark,
        output_mode="update",
    )
    rows = got_df.collect()
    # update mode emits one row per key per batch; keep the latest
    latest = {}
    for r in rows:
        cur = latest.get(r["event_type"])
        if cur is None or r["n_updates"] > cur["n_updates"]:
            latest[r["event_type"]] = r
    assert max(r["n_updates"] for r in rows) >= 2  # state crossed batches
    got = {
        (r["event_type"], r["n_kept"], r["kmv_users"])
        for r in latest.values()
    }
    assert got == want


def test_kmv_live_overlap_matches_batch_algebra(spark, tmp_path):
    """q109 served from LIVE stream state: run the KMV stream with
    emit_kept over two micro-batches, then compute pairwise
    union/intersection/Jaccard from the emitted sketch rows alone —
    bit-equal to batch kmv_overlap over the full replayed corpus (no
    raw-event replay on the serving side)."""
    from aerovaldb_spark.operators.events import kmv_overlap
    from aerovaldb_spark.streaming import (
        kmv_live_overlap,
        run_stream_to_memory,
        stream_kmv_user_distinct,
    )

    d = str(tmp_path / "ev_kmv_live")
    os.makedirs(d)
    _write_split_events(spark, d)

    batch_df = spark.read.schema(_EV_SCHEMA).parquet(d)
    want = sorted(
        map(
            tuple,
            kmv_overlap(batch_df, "event_type", "user_id", k=8).collect(),
        )
    )
    assert len(want) >= 3  # several event-type pairs at sf0.001

    sketch_rows = run_stream_to_memory(
        stream_kmv_user_distinct(
            _event_stream_two_batches(spark, d), k=8, emit_kept=True
        ),
        "kmv_live_mb",
        spark,
        output_mode="update",
    )
    # state crossed the batch boundary: the serving path must pick the
    # LATEST sketch per key, not a stale batch-1 row
    assert sketch_rows.agg(F.max("n_updates")).collect()[0][0] >= 2
    got = sorted(
        map(tuple, kmv_live_overlap(sketch_rows, k=8).collect())
    )
    assert got == want


def test_kmv_live_overlap_order_col_beats_eviction_restart(spark):
    """After an idle_timeout eviction the per-key n_updates counter
    restarts at 1, so an accumulated update-mode sink can hold a STALE
    row with a HIGHER n_updates than the genuinely latest sketch.
    order_col (an epoch stamp per accumulated batch — see
    epoch_stamped) must pick by accumulation order; the default
    n_updates ranking demonstrably picks the stale row (the documented
    hazard)."""
    from aerovaldb_spark.operators.events import kmv_overlap_from_sketches
    from aerovaldb_spark.streaming import kmv_live_overlap

    schema = (
        "event_type string, n_updates int, n_kept bigint, "
        "kmv_users double, kept array<long>, _epoch long"
    )
    stale = [10, 20, 30]
    fresh = [40, 50]
    other = [10, 40, 70]
    rows = [
        # pre-eviction accumulation for "click": 5 updates by epoch 3
        ("click", 5, 3, 3.0, stale, 3),
        # eviction fired; post-restart sketch arrives at epoch 9
        ("click", 1, 2, 2.0, fresh, 9),
        ("view", 1, 3, 3.0, other, 9),
    ]
    sketch_rows = spark.createDataFrame(rows, schema)

    def overlap_for(kept_click):
        latest = spark.createDataFrame(
            [("click", kept_click), ("view", other)],
            "key string, kept array<long>",
        )
        return sorted(
            map(tuple, kmv_overlap_from_sketches(latest, 8).collect())
        )

    got_epoch = sorted(
        map(
            tuple,
            kmv_live_overlap(sketch_rows, k=8, order_col="_epoch").collect(),
        )
    )
    assert got_epoch == overlap_for(fresh)
    # default ranking picks the stale higher-n_updates row — the
    # docstring's stated limitation, pinned so a change is deliberate
    got_default = sorted(
        map(tuple, kmv_live_overlap(sketch_rows, k=8).collect())
    )
    assert got_default == overlap_for(stale)


def test_epoch_stamped_foreachbatch_adds_epoch(spark, tmp_path):
    """epoch_stamped hands write() the batch with the epoch id column
    — accumulated rows then carry the order kmv_live_overlap needs."""
    from aerovaldb_spark.streaming import epoch_stamped

    seen = []
    fn = epoch_stamped(lambda df, eid: seen.append((df, eid)))
    fn(spark.range(3), 7)
    df, eid = seen[0]
    assert eid == 7
    assert [r["_epoch"] for r in df.collect()] == [7, 7, 7]


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    from aerovaldb_spark.streaming import (
        run_stream_to_memory,
        running_user_totals,
    )

    d = str(tmp_path / "ev3")
    os.makedirs(d)
    _write_split_events(spark, d)

    batch_df = spark.read.schema(_EV_SCHEMA).parquet(d)
    want = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 2))
        for r in running_user_totals(batch_df).collect()
    }
    got = run_stream_to_memory(
        running_user_totals(_event_stream_two_batches(spark, d)),
        "totals_2b",
        spark,
        output_mode="update",
    )
    final = {}
    for row in got.collect():
        final[row["user_id"]] = (
            row["n_events"],
            round(row["total_value"], 2),
        )
    assert final == want and len(want) > 0


def test_streaming_dedup_suppresses_cross_batch_duplicate(spark, tmp_path):
    """A duplicate event_id arriving in the SECOND batch (within the
    watermark horizon) must be dropped by
    dropDuplicatesWithinWatermark's cross-batch state."""
    from aerovaldb_spark.streaming import (
        run_stream_to_memory,
        streaming_dedup,
    )

    d = str(tmp_path / "ev4")
    os.makedirs(d)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def _write(path, rows):
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=r[1]) for r in rows],
                    pa.timestamp("us", tz="UTC"),
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["click"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(table, path)

    _write(os.path.join(d, "part0.parquet"), [(1, 0), (2, 5)])
    # id 2 duplicated 10 minutes later, well inside the 2h watermark
    _write(os.path.join(d, "part1.parquet"), [(2, 15), (3, 20)])

    got = run_stream_to_memory(
        streaming_dedup(_event_stream_two_batches(spark, d)),
        "dedup_2b",
        spark,
        output_mode="append",
    )
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [1, 2, 3]


def test_bpe_pack_gate_state_continues_across_batches(spark, tmp_path):
    """The per-source running subword total must survive the batch
    boundary: splitting the corpus by doc_id (arrival order == id
    order) makes the two-batch stream equal the batch packing, which
    can only happen if batch 2 resumes batch 1's totals instead of
    restarting shard 0 at budget 0."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import bpe_pack
    from aerovaldb_spark.streaming import (
        DOCUMENTS_SCHEMA,
        bpe_pack_gate,
        run_stream_to_memory,
    )

    docs = sorted(
        load_table(spark, SF_DIR, "documents").collect(),
        key=lambda r: r["doc_id"],
    )
    d = str(tmp_path / "docs2")
    os.makedirs(d)
    halves = [docs[: len(docs) // 2], docs[len(docs) // 2:]]
    for i, half in enumerate(halves):
        table = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in half], pa.int64()),
                "text": pa.array([r["text"] for r in half], pa.string()),
                "lang": pa.array([r["lang"] for r in half], pa.string()),
                "source": pa.array(
                    [r["source"] for r in half], pa.string()
                ),
                "n_chars": pa.array(
                    [r["n_chars"] for r in half], pa.int64()
                ),
            }
        )
        pq.write_table(table, os.path.join(d, f"part{i}.parquet"))

    batch = sorted(
        map(
            tuple,
            bpe_pack(spark.read.schema(DOCUMENTS_SCHEMA).parquet(d)).collect(),
        )
    )
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got = run_stream_to_memory(
        bpe_pack_gate(stream), "pack_2b", spark, output_mode="append"
    )
    streamed = sorted(map(tuple, got.collect()))
    assert streamed == batch and len(batch) > 0
    # shard ids in batch 2's docs continue (some doc in the second
    # half lands in a shard > 0 for its source, proving carried state)
    second_half_ids = {r["doc_id"] for r in halves[1]}
    assert any(
        shard > 0
        for doc_id, _src, _n, shard in streamed
        if doc_id in second_half_ids
    )


def test_idle_timeout_evicts_and_restarts_sketch(spark, tmp_path):
    """ProcessingTime timeout, end to end: a key with data in batch 1,
    SILENT in batch 2 (timeout expires -> state evicted without any
    emission), and returning in batch 3 must restart a FRESH sketch
    (n_updates back to 1, kept set = batch-3 values only). This pins
    the r9 fix: the timeout is actually ARMED via setTimeoutDuration —
    a timeoutConf alone never fires — and the expiry path removes
    state instead of re-emitting a spurious update.

    Determinism (the r14 driver run caught the old one-query shape
    flaking under load): the three batches run as three availableNow
    restarts of the SAME checkpoint, and the >timeout idle gap elapses
    while the query is STOPPED — no micro-batch runs during the gap,
    so nothing can evict the always-active key early, and when the
    next phase starts its first batch's processing time is provably
    past the silent key's deadline, making the expiry a Spark
    semantics guarantee (timed-out keys without new data are processed
    in any later batch), not a race against the scheduler. The restart
    also exercises that the armed deadline itself survives in the
    state store across recovery."""
    import time

    from aerovaldb_spark.streaming import stream_kmv_user_distinct

    d = str(tmp_path / "ev_kmv_timeout")
    ckpt = str(tmp_path / "ev_kmv_timeout_ckpt")
    os.makedirs(d)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    def write_batch(i, rows):
        table = pa.table(
            {
                "event_id": pa.array(
                    [r[0] for r in rows], pa.int64()
                ),
                "ts": pa.array(
                    [base + dt.timedelta(seconds=r[0]) for r in rows],
                    pa.timestamp("us", tz="UTC"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array(
                    [r[2] for r in rows], pa.string()
                ),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(table, os.path.join(d, f"part{i}.parquet"))

    # the timeout must comfortably exceed one loaded micro-batch's
    # execution + the post-commit stop latency (the only window in
    # which a cleanup batch could evict the active key); 8 s is ~20x
    # the loaded-host batch time for these 8-row batches
    timeout_ms = 8_000

    # rows per committed micro-batch, accumulated across the three
    # phases. foreachBatch (the memory sink refuses checkpoint
    # recovery) is at-least-once — a stop racing the commit log can
    # re-deliver a batch on restart — but keyed by batchId the replay
    # OVERWRITES its own identical rows (state-store versioning makes
    # the recomputation exact), so the accumulated dict is effectively
    # exactly-once without weakening any assertion
    by_batch: dict[int, list] = {}

    def run_phase(pred, what):
        """availableNow pass over whatever is new in the source dir.
        With a processing-time timeout armed, availableNow keeps
        scheduling state-cleanup batches after the data is exhausted
        (pyspark 4.1 behavior — documented in the operator docstring),
        so awaitTermination would hang: poll the collected rows for
        the phase's expected output, then stop explicitly."""
        q = (
            stream_kmv_user_distinct(
                _event_stream_two_batches(spark, d),
                k=8,
                idle_timeout_ms=timeout_ms,
            )
            .writeStream.foreachBatch(
                lambda df, epoch: by_batch.__setitem__(
                    int(epoch), df.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                rows = [r for b in by_batch.values() for r in b]
                if any(pred(r) for r in rows):
                    return
                time.sleep(0.1)
            raise AssertionError(
                f"timed out waiting for {what}; got="
                + repr(sorted(map(tuple, rows)))
            )
        finally:
            q.stop()
            q.awaitTermination()

    write_batch(0, [(i, i, "evict") for i in range(1, 6)]
                + [(10 + i, i, "keep") for i in range(1, 4)])
    run_phase(
        lambda r: r["event_type"] == "evict" and r["n_kept"] == 5,
        "batch-1 evict row",
    )
    # stopped: nothing runs, nothing can expire — now let the silent
    # key's deadline (batch-1 time + timeout) pass on the wall clock
    time.sleep(timeout_ms / 1000 + 1.0)
    write_batch(1, [(20 + i, i, "keep") for i in range(4, 6)])
    # phase 2's first batch evicts the silent key (deadline passed, no
    # data for it) and updates the active key from restored state
    run_phase(
        lambda r: r["event_type"] == "keep" and r["n_updates"] == 2,
        "batch-2 keep row",
    )
    time.sleep(timeout_ms / 1000 + 1.0)
    write_batch(2, [(30 + i, i, "evict") for i in range(6, 9)]
                + [(40, 6, "keep")])
    run_phase(
        lambda r: r["event_type"] == "evict" and r["n_kept"] == 3,
        "batch-3 fresh evict row",
    )
    rows = [r for b in by_batch.values() for r in b]

    evict = sorted(
        (r["n_updates"], r["n_kept"], r["kmv_users"])
        for r in rows
        if r["event_type"] == "evict"
    )
    # two FIRST-update rows — the batch-2 expiry emitted nothing, and
    # batch 3 restarted from empty state (5 then 3 distinct users,
    # both exact below k)
    assert evict == [(1, 3, 3.0), (1, 5, 5.0)], evict
    # the always-active key accumulates normally: 3 -> 5 -> 6
    keep = sorted(
        (r["n_updates"], r["n_kept"])
        for r in rows
        if r["event_type"] == "keep"
    )
    assert keep == [(1, 3), (2, 5), (3, 6)], keep


def test_stream_screen_foreachbatch_equals_batch(spark, tmp_path):
    """The streaming end of the TF-IDF screen ladder: a document
    stream screened micro-batch-by-micro-batch against a persisted
    TfidfScreenIndex (foreachBatch) must produce exactly the rows one
    batch screen over all incoming docs produces — per-doc contract
    rows depend only on the doc and the FROZEN reference, so the
    per-batch union is the exact semantics, across real batch
    boundaries."""
    from aerovaldb_spark.operators.text import TfidfScreenIndex
    from aerovaldb_spark.streaming import tfidf_screen_batch_fn

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    )
    reference = docs.where("doc_id % 2 = 0")
    incoming = docs.where("doc_id % 2 = 1")

    # incoming split into two files = two micro-batches
    d = str(tmp_path / "doc_stream")
    os.makedirs(d)
    rows = sorted(incoming.collect(), key=lambda r: r["doc_id"])
    for i, half in enumerate(
        (rows[: len(rows) // 2], rows[len(rows) // 2:])
    ):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        [r["doc_id"] for r in half], pa.int64()
                    ),
                    "text": pa.array(
                        [r["text"] for r in half], pa.string()
                    ),
                    "lang": pa.array(
                        [r["lang"] for r in half], pa.string()
                    ),
                    "source": pa.array(
                        [r["source"] for r in half], pa.string()
                    ),
                    "n_chars": pa.array(
                        [r["n_chars"] for r in half], pa.int64()
                    ),
                }
            ),
            os.path.join(d, f"part{i}.parquet"),
        )

    p = str(tmp_path / "screen_idx")
    TfidfScreenIndex.build(reference).save(p)
    loaded = TfidfScreenIndex.load(spark, p)
    want = sorted(map(tuple, loaded.screen(incoming).collect()))
    assert any(t[3] for t in want)

    got: list[tuple] = []
    epochs: set[int] = set()

    def sink(result_df, epoch_id):
        epochs.add(epoch_id)
        got.extend(map(tuple, result_df.collect()))

    src = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, "
            "source string, n_chars long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        src.writeStream.foreachBatch(tfidf_screen_batch_fn(loaded, sink))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(epochs) >= 2  # the screen really ran per micro-batch
    assert sorted(got) == want

    # the GROWN index (incremental add to the same parquet path)
    # serves through the same streaming factory: stream == batch over
    # the grown reference, and the appended docs change the result
    # (a stream of their twins now flags)
    fresh = incoming.limit(10).selectExpr(
        "doc_id + 1000000 as doc_id", "text", "lang", "source", "n_chars"
    )
    grown = loaded.add(fresh, path=p)
    want_grown = sorted(map(tuple, grown.screen(incoming).collect()))
    assert want_grown != want  # the appended twins matter
    got_grown: list[tuple] = []
    q2 = (
        src.writeStream.foreachBatch(
            tfidf_screen_batch_fn(
                grown, lambda df, eid: got_grown.extend(map(tuple, df.collect()))
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert sorted(got_grown) == want_grown


def test_tfidf_index_ingest_stream_grows_and_compacts(spark, tmp_path):
    """The WRITE-side streaming twin: a stream of new reference docs
    grows a persisted index micro-batch by micro-batch — per-batch
    appends compose to one big add (frozen stats, per-doc signing),
    a replayed epoch is skipped via its marker file, and compact()
    collapses the per-batch file litter bit-preservingly."""
    import glob as _glob

    from pyspark.sql import functions as F

    from aerovaldb_spark.operators.text import TfidfScreenIndex
    from aerovaldb_spark.streaming import tfidf_index_ingest_fn

    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    ref = docs.where("doc_id % 4 = 0")
    new = docs.where("doc_id % 4 = 2").withColumn(
        "doc_id", F.col("doc_id") + 500_000
    )
    probes = docs.where("doc_id % 2 = 1")

    p = str(tmp_path / "ingest_idx")
    TfidfScreenIndex.build(ref).save(p)
    want = sorted(
        map(
            tuple,
            TfidfScreenIndex.load(spark, p)
            .add(new)
            .screen(probes)
            .collect(),
        )
    )

    # stream the new docs in two files = two micro-batches
    d = str(tmp_path / "ref_stream")
    os.makedirs(d)
    rows = sorted(new.collect(), key=lambda r: r["doc_id"])
    for i, half in enumerate(
        (rows[: len(rows) // 2], rows[len(rows) // 2:])
    ):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r["doc_id"] for r in half], pa.int64()),
                    "text": pa.array([r["text"] for r in half], pa.string()),
                }
            ),
            os.path.join(d, f"part{i}.parquet"),
        )
    loaded = TfidfScreenIndex.load(spark, p)
    fn = tfidf_index_ingest_fn(loaded, p, run_id="run1")
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .writeStream.foreachBatch(fn)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        map(tuple, TfidfScreenIndex.load(spark, p).screen(probes).collect())
    )
    assert got == want
    assert (
        len(os.listdir(os.path.join(p, "_ingest_epochs", "run1"))) >= 2
    )

    # replaying an applied epoch must be a no-op (marker dedup)...
    before = len(_glob.glob(os.path.join(p, "weights", "*.parquet")))
    fn(spark.createDataFrame(rows[:3], new.schema), 0)
    assert len(_glob.glob(os.path.join(p, "weights", "*.parquet"))) == before
    assert sorted(
        map(tuple, TfidfScreenIndex.load(spark, p).screen(probes).collect())
    ) == want
    # ...but the dedup is scoped to THIS stream's run_id: a fresh
    # checkpoint (epoch ids restart at 0) under a fresh run_id is NOT
    # blocked by run1's markers (an empty batch keeps the index
    # unchanged while exercising the marker path)
    fn2 = tfidf_index_ingest_fn(
        TfidfScreenIndex.load(spark, p), p, run_id="run2"
    )
    fn2(spark.createDataFrame([], new.schema), 0)
    assert os.path.exists(os.path.join(p, "_ingest_epochs", "run2", "0"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="run_id"):
        tfidf_index_ingest_fn(loaded, p, run_id="bad/name")

    # compaction: same screen rows, fewer signature files
    sig_files = lambda: len(  # noqa: E731
        _glob.glob(os.path.join(p, "signatures", "band=*", "*.parquet"))
    )
    n_before = sig_files()
    compacted = TfidfScreenIndex.compact(spark, p)
    assert sig_files() < n_before
    assert sorted(map(tuple, compacted.screen(probes).collect())) == want


def test_mixture_gate_stream_equals_batch_plan(spark, tmp_path):
    """The frozen-plan mixture gate is stateless map-only, so a
    two-batch stream must equal (bit-for-bit) both the gate on a
    batch read AND the batch mixture_assignment whose plan was
    frozen from the same corpus — and a doc's verdict must not
    depend on which micro-batch carried it."""
    import pytest

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import (
        mixture_assignment,
        temperature_mix_plan,
    )
    from aerovaldb_spark.streaming import (
        mixture_gate,
        run_stream_to_memory,
    )

    docs = load_table(spark, SF_DIR, "documents")
    plan = {
        r["source"]: r["sample_rate"]
        for r in temperature_mix_plan(docs).collect()
    }
    batch = sorted(map(tuple, mixture_assignment(docs).collect()))

    rows = sorted(
        docs.select("doc_id", "source").collect(),
        key=lambda r: r["doc_id"],
    )
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    d = str(tmp_path / "mix_docs")
    os.makedirs(d)
    halves = [rows[: len(rows) // 2], rows[len(rows) // 2:]]
    for i, half in enumerate(halves):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        [r["doc_id"] for r in half], pa.int64()
                    ),
                    "source": pa.array(
                        [r["source"] for r in half], pa.string()
                    ),
                    "text": pa.array(
                        [texts[r["doc_id"]] for r in half], pa.string()
                    ),
                }
            ),
            os.path.join(d, f"part{i}.parquet"),
        )
    schema = "doc_id long, source string, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got = run_stream_to_memory(
        mixture_gate(stream, plan), "mix_gate", spark,
        output_mode="append",
    )
    streamed = sorted(map(tuple, got.collect()))
    assert streamed == batch and len(batch) > 0

    # unplanned sources take default_rate (0.0 = drop)
    extra = spark.createDataFrame(
        [(999_999, "unplanned_src")], "doc_id long, source string"
    )
    assert mixture_gate(extra, plan).collect()[0]["n_copies"] == 0
    assert (
        mixture_gate(extra, plan, default_rate=2.0)
        .collect()[0]["n_copies"]
        >= 2
    )
    with pytest.raises(ValueError, match="rate"):
        mixture_gate(extra, {"src0": -0.5})


def test_mixture_gate_join_path_equals_case_path(spark):
    """Past MIXTURE_GATE_MAX_CASE_SOURCES the gate switches from a
    CASE chain to a broadcast join — the two carriers must be
    output-identical on the same docs + plan."""
    import aerovaldb_spark.streaming as st

    docs = spark.createDataFrame(
        [(i, f"s{i % 100}") for i in range(400)],
        "doc_id long, source string",
    )
    plan = {f"s{i}": 0.25 + (i % 7) * 0.5 for i in range(100)}
    joined = sorted(map(tuple, st.mixture_gate(docs, plan).collect()))
    old = st.MIXTURE_GATE_MAX_CASE_SOURCES
    st.MIXTURE_GATE_MAX_CASE_SOURCES = 10_000
    try:
        cased = sorted(map(tuple, st.mixture_gate(docs, plan).collect()))
    finally:
        st.MIXTURE_GATE_MAX_CASE_SOURCES = old
    assert joined == cased and len(joined) == 400


def test_mixture_gate_join_path_tolerates_rate_column(spark):
    """A caller frame already carrying a rate-named column must not
    make the broadcast-join path's internal rate reference ambiguous
    (the gate joins on a collision-proof __mix_rate name and drops a
    pre-existing one — it never reaches the output select anyway)."""
    import aerovaldb_spark.streaming as st

    docs = spark.createDataFrame(
        [(i, f"s{i % 100}", 9.9) for i in range(200)],
        "doc_id long, source string, __mix_rate double",
    )
    plan = {f"s{i}": 2.0 for i in range(100)}
    out = st.mixture_gate(docs, plan).collect()
    # the bogus pre-existing column must not have fed the arithmetic:
    # every planned source has integer rate 2.0 -> exactly 2 copies
    assert len(out) == 200
    assert all(r["n_copies"] == 2 for r in out)


def test_stream_source_health_equals_batch(spark, tmp_path):
    """Two-batch streamed health report ≡ the batch fallthrough,
    bit-for-bit (KMV mergeability + exact integer sums + shared
    JVM-side per-doc columns), and a duplicate-heavy source reads a
    positive dup_rate_est."""
    from pyspark.sql import functions as F

    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        run_stream_to_memory,
        stream_source_health,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # plant a duplicate-heavy source (10 copies of one text, 2 of them
    # NULL-text rows) and an ALL-NULL source — q122's accounting:
    # NULL-text docs count in n_docs, skip every sum and the sketch
    dup_text = " ".join(f"dd{j}" for j in range(30))
    extra_rows = [
        (900_000 + i, dup_text if i < 8 else None, "dupsrc")
        for i in range(10)
    ]
    extra_rows += [(910_000 + i, None, "nullsrc") for i in range(3)]
    extra = spark.createDataFrame(
        extra_rows, "doc_id long, text string, source string"
    )
    full = docs.select("doc_id", "text", "source").unionByName(extra)

    batch = {
        r["source"]: tuple(r)
        for r in stream_source_health(full).collect()
    }
    assert batch["dupsrc"][2] == 10  # n_docs counts NULL-text rows
    assert batch["dupsrc"][4] == 1.0  # n_unique_est exact below k
    assert batch["dupsrc"][5] == 0.9  # dup_rate_est = 1 - 1/10
    assert batch["nullsrc"] == ("nullsrc", 1, 3, 0, 0.0, 1.0, 0.0)

    rows = sorted(full.collect(), key=lambda r: r["doc_id"])
    d = str(tmp_path / "health_docs")
    os.makedirs(d)
    halves = [rows[: len(rows) // 2], rows[len(rows) // 2:]]
    for i, half in enumerate(halves):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        [r["doc_id"] for r in half], pa.int64()
                    ),
                    "text": pa.array(
                        [r["text"] for r in half], pa.string()
                    ),
                    "source": pa.array(
                        [r["source"] for r in half], pa.string()
                    ),
                }
            ),
            os.path.join(d, f"part{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got = run_stream_to_memory(
        stream_source_health(stream), "health_gate", spark,
        output_mode="update",
    )
    latest = {}
    for r in got.collect():
        if (
            r["source"] not in latest
            or r["n_updates"] > latest[r["source"]]["n_updates"]
        ):
            latest[r["source"]] = r
    assert set(latest) == set(batch)
    for src, r in latest.items():
        b = batch[src]
        # n_updates differs by design (per-batch counter); everything
        # else must be bit-equal
        assert (
            r["n_docs"], r["n_tokens"], r["n_unique_est"],
            r["dup_rate_est"], r["mean_quality"],
        ) == (b[2], b[3], b[4], b[5], b[6]), src


def test_source_health_null_docs_convention_batch_equals_stream(spark):
    """The batch report's NULL-text convention is now EXPLICIT
    (null_docs column) and must agree with the streaming twin's
    accounting on the same rows: NULL-text docs count into n_docs on
    both paths, are absent from every sum and the distinct-content
    count/sketch, and null_docs says how many there were."""
    from aerovaldb_spark.operators.text import source_health
    from aerovaldb_spark.streaming import stream_source_health

    dup_text = " ".join(f"nn{j}" for j in range(30))
    rows = [
        (i, dup_text if i < 8 else None, "dupsrc") for i in range(10)
    ]
    rows += [(100 + i, None, "nullsrc") for i in range(3)]
    rows += [(200 + i, f"solo text {i} words here", "clean")
             for i in range(4)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    batch = {r["source"]: r for r in source_health(docs).collect()}
    stream = {
        r["source"]: r for r in stream_source_health(docs).collect()
    }
    assert batch["dupsrc"]["n_docs"] == 10
    assert batch["dupsrc"]["null_docs"] == 2
    assert batch["dupsrc"]["n_unique"] == 1
    assert batch["dupsrc"]["dup_rate"] == 0.9
    assert batch["nullsrc"]["null_docs"] == 3
    assert batch["nullsrc"]["n_unique"] == 0
    assert batch["nullsrc"]["dup_rate"] == 1.0
    assert batch["nullsrc"]["mean_quality"] is None  # nothing to score
    assert batch["clean"]["null_docs"] == 0
    for src in batch:
        # both paths count NULL-text rows into n_docs and skip them in
        # the token sum; below-k sources make the KMV estimate exact,
        # so the distinct counts agree exactly too
        assert stream[src]["n_docs"] == batch[src]["n_docs"], src
        assert stream[src]["n_tokens"] == (
            batch[src]["n_tokens"] or 0
        ), src
        assert stream[src]["n_unique_est"] == float(
            batch[src]["n_unique"]
        ), src


def test_source_overlap_from_health_equals_batch_matrix(spark, tmp_path):
    """The live cross-source matrix from the health gate's OWN state:
    stream the corpus in two micro-batches with emit_kept=True, take
    the latest row per source, and the overlap matrix over those kept
    arrays is bit-equal to batch source_content_overlap over the full
    corpus (KMV mergeability + the one shared algebra) — including a
    planted cross-source mirror pair."""
    from aerovaldb_spark.operators.text import source_content_overlap
    from aerovaldb_spark.streaming import (
        run_stream_to_memory,
        source_overlap_from_health,
        stream_source_health,
    )

    origin = [
        (i, " ".join(f"so{i}_{j}" for j in range(20)), "origin")
        for i in range(12)
    ]
    mirror = [(100 + i, origin[i][1], "mirror") for i in range(6)]
    nulls = [(300, None, "origin")]
    rows = sorted(origin + mirror + nulls)
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    want = sorted(map(tuple, source_content_overlap(docs).collect()))

    # batch fallthrough with emit_kept carries the arrays too
    batch_rows = stream_source_health(docs, emit_kept=True).collect()
    assert all(r["kept"] is not None for r in batch_rows)
    got_batch = sorted(
        map(
            tuple,
            source_overlap_from_health(
                spark.createDataFrame(batch_rows)
            ).collect(),
        )
    )
    assert got_batch == want

    d = str(tmp_path / "ov_docs")
    os.makedirs(d)
    halves = [rows[: len(rows) // 2], rows[len(rows) // 2:]]
    for i, half in enumerate(halves):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in half], pa.int64()),
                    "text": pa.array([r[1] for r in half], pa.string()),
                    "source": pa.array([r[2] for r in half], pa.string()),
                }
            ),
            os.path.join(d, f"part{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got = run_stream_to_memory(
        stream_source_health(stream, emit_kept=True), "ov_gate", spark,
        output_mode="update",
    )
    latest = {}
    for r in got.collect():
        if (
            r["source"] not in latest
            or r["n_updates"] > latest[r["source"]]["n_updates"]
        ):
            latest[r["source"]] = r
    latest_df = spark.createDataFrame(list(latest.values()))
    got_stream = sorted(
        map(tuple, source_overlap_from_health(latest_df).collect())
    )
    assert got_stream == want and len(want) == 1  # one pair: both srcs

    # ...and the live q125 reduction over the same state matches the
    # batch operator (one shared worst_partner_reduce definition)
    from aerovaldb_spark.operators.text import (
        source_external_dup,
        worst_partner_reduce,
    )

    want_worst = sorted(map(tuple, source_external_dup(docs).collect()))
    got_worst = sorted(
        map(
            tuple,
            worst_partner_reduce(
                source_overlap_from_health(latest_df)
            ).collect(),
        )
    )
    assert got_worst == want_worst


def test_health_with_shares_matches_batch_q122(spark):
    """token_share derived from the health gate's output equals the
    batch q122 report's share column (bit-equal round6 arithmetic)."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.operators.text import source_health
    from aerovaldb_spark.streaming import (
        health_with_shares,
        stream_source_health,
    )

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r["source"]: r["token_share"]
        for r in health_with_shares(stream_source_health(docs)).collect()
    }
    want = {
        r["source"]: r["token_share"]
        for r in source_health(docs).collect()
    }
    assert got == want and len(want) > 0


def test_curation_manifest_gate_stream_equals_batch(spark, tmp_path):
    """The streaming twin of q132 (r13 verdict item #6): per-doc
    verdicts with stage provenance against a FROZEN curated
    reference, across REAL micro-batch boundaries (two files, one per
    trigger). Every output column is a pure function of (doc,
    reference), so stream == batch is exact — and the verdict rules
    are pinned against q132's stage semantics on the same corpus."""
    from aerovaldb_spark.catalog import load_table
    from aerovaldb_spark.streaming import (
        curation_manifest_gate,
        manifest_reference,
    )

    docs = load_table(spark, SF_DIR, "documents")
    reference = docs.where("doc_id % 2 = 0")
    fps, buckets = manifest_reference(reference)
    fps = fps.cache()
    buckets = buckets.cache()

    want = sorted(
        map(tuple, curation_manifest_gate(docs, fps, buckets).collect())
    )
    verdicts = {t[4] for t in want}
    assert verdicts == {"keep", "quality", "exact_dup", "near_dup"}

    # stage-rule pins against the batch rungs' own semantics:
    # every even (reference) doc that clears quality is an exact dup
    # of itself or an earlier identical twin; quality drops match the
    # q39 rule exactly; keeps carry a split, drops never do
    rows = {t[0]: t for t in want}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, t in rows.items():
        txt = texts[doc_id]
        toks = txt.split(" ") if txt is not None else []
        stop = sum(1 for w in toks if w in ("the", "a", "of", "and"))
        bad = (
            txt is None
            or len(toks) < 20
            or stop / len(toks) >= 0.5
        )
        if bad:
            assert t[4] == "quality" and t[5] is None and t[6] is None
        elif doc_id % 2 == 0:
            assert t[4] == "exact_dup" and t[5] is not None
            assert t[5] <= doc_id and t[5] % 2 == 0
        if t[4] == "keep":
            assert t[6] in ("train", "test") or t[6] is not None
        else:
            assert t[6] is None

    # two files -> two micro-batches
    d = str(tmp_path / "doc_stream")
    os.makedirs(d)
    all_rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    for i, half in enumerate(
        (all_rows[: len(all_rows) // 2], all_rows[len(all_rows) // 2:])
    ):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        [r["doc_id"] for r in half], pa.int64()
                    ),
                    "text": pa.array(
                        [r["text"] for r in half], pa.string()
                    ),
                    "lang": pa.array(
                        [r["lang"] for r in half], pa.string()
                    ),
                    "source": pa.array(
                        [r["source"] for r in half], pa.string()
                    ),
                    "n_chars": pa.array(
                        [r["n_chars"] for r in half], pa.int64()
                    ),
                }
            ),
            os.path.join(d, f"part{i}.parquet"),
        )
    src = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, "
            "source string, n_chars long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    gated = curation_manifest_gate(src, fps, buckets)
    assert gated.isStreaming
    q = (
        gated.writeStream.format("memory")
        .queryName("curation_gate_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    got = sorted(
        map(tuple, spark.table("curation_gate_mb").collect())
    )
    assert n_batches >= 2  # the gate really crossed a batch boundary
    assert got == want and len(got) > 0
    fps.unpersist()
    buckets.unpersist()
