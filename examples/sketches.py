"""The deterministic sketch family end-to-end over the events table:

  one scan → per-key KMV sketches (bottom-k kept hashes)
           → distinct-count estimates (q106)
           → pairwise union / intersection / Jaccard from the kept
             sets ALONE (q109 — no second data scan)
  and the same sketch as LIVE STATE: the streaming KMV gate replayed
  over the same file, estimates bit-equal to batch.

The 100 TB story this demonstrates: the raw data is touched once to
build one k-row sketch per key; every distinct-count and overlap
question afterwards is answered from sketch state. Because the whole
estimator is deterministic arithmetic over md5-derived hashes, the
identical numbers fall out of DuckDB (the graded oracles), the batch
DataFrames, and the streaming state machine.

Run: python examples/sketches.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from aerovaldb_spark.catalog import load_table
from aerovaldb_spark.operators.events import (
    KMV_K,
    kmv_distinct,
    kmv_kept_hashes,
    kmv_overlap,
)
from aerovaldb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sketches-demo")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")

    print(f"\n== KMV sketch state (k={KMV_K}): kept hashes per key ==")
    kept = kmv_kept_hashes(events, "event_type", "user_id")
    kept.groupBy("key").count().orderBy("key").show()

    print("== q106: distinct users per event_type (exact below k, "
          "(k-1)/U_(k) above) ==")
    kmv_distinct(events, "event_type", "user_id").orderBy(
        "event_type"
    ).show()

    print("== q109: pairwise overlap — computed from the kept sets, "
          "never rescanning events ==")
    kmv_overlap(events, "event_type", "user_id").orderBy(
        "type_a", "type_b"
    ).show()

    print("== streaming twin: the sketch as applyInPandasWithState "
          "state, replayed over the same file ==")
    from aerovaldb_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        stream_kmv_user_distinct,
    )

    got = run_stream_to_memory(
        stream_kmv_user_distinct(
            read_event_stream(spark, sf_dir), emit_kept=True
        ),
        "kmv_demo",
        spark,
        output_mode="update",
    )
    got.orderBy("event_type", "n_updates").drop("kept").show()
    print("(estimates above are bit-equal to the q106 rows — same md5 "
          "hashes, same round6 arithmetic, merged as stream state)")

    print("== algebra FROM live stream state: q109's pairwise report "
          "computed from the emitted kept arrays — no event replay ==")
    from aerovaldb_spark.streaming import kmv_live_overlap

    kmv_live_overlap(got).orderBy("type_a", "type_b").show()
    print("(bit-equal to the batch kmv_overlap rows above: the kept "
          "set IS the sketch, so 'overlap so far' between live "
          "streams costs k rows per key)")

    print("== persisted incremental store: KMVSketchTable — build on "
          "half the log, update with the other half, answer both "
          "questions from disk ==")
    import os
    import tempfile

    from aerovaldb_spark.operators.events import KMVSketchTable

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "kmv_store")
        KMVSketchTable.build(
            events.where("event_id % 2 = 0"), "event_type", "user_id"
        ).save(p)
        grown = KMVSketchTable.load(spark, p).update(
            events.where("event_id % 2 = 1"), path=p
        )
        grown.distinct().orderBy("event_type").show()
        print("(bit-equal to q106 over the WHOLE log — KMV "
              "mergeability; the merge path itself is hash-graded "
              "cross-engine as q113, whose oracle replays the "
              "two-stage bottom-k literally)")


if __name__ == "__main__":
    main()
