"""Crash-aware directory swap for persisted-state rewrites.

Three persisted families (KMVSketchTable updates, the ANN indexes'
compaction, the screen index's compaction) rewrite a live parquet
directory from a staged copy. The sequence is crash-safety-critical
and must not be re-implemented per call site: write staging FIRST (the
job that reads the old live files), then swap with renames so the old
state is never read and overwritten in one job.

Crash windows and their recovery, which ``resolve_live`` encodes:
- die during the staging write: live untouched, staging garbage —
  nothing lost, re-run the operation;
- die after ``live -> live.old`` but before ``staging -> live``: the
  consistent pre-rewrite state is ``live.old`` — ``resolve_live``
  falls back to it, so loads keep working and the operation can be
  re-run (``swap_in`` tolerates a missing ``live``);
- die before the final cleanup: both ``live`` (new) and ``live.old``
  exist — ``resolve_live`` prefers ``live`` (correct: the swap
  completed), and the next swap removes the leftover.
"""

from __future__ import annotations

import os
import shutil


def swap_in(live: str, staging: str) -> None:
    """Replace ``live`` with ``staging`` via renames. Tolerates a
    missing ``live`` (re-running after a crash that already moved it
    to ``<live>.old``) and a leftover ``<live>.old`` from a previous
    interrupted swap."""
    old = live + ".old"
    if os.path.exists(live):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(live, old)
    os.replace(staging, live)
    if os.path.exists(old):
        shutil.rmtree(old)


def resolve_live(live: str) -> str:
    """The directory holding the consistent state: ``live`` when
    present, else ``<live>.old`` (what a crash inside ``swap_in``'s
    rename window leaves — the pre-rewrite state). When neither
    exists, returns ``live`` so the caller's read raises its natural
    path-not-found error."""
    if os.path.isdir(live):
        return live
    old = live + ".old"
    if os.path.isdir(old):
        return old
    return live


def clear_stale(live: str) -> None:
    """Remove leftover ``<live>.old`` / ``<live>.staging`` directories.
    Every ``save()`` that overwrites ``live`` must call this: a stale
    ``.old`` from an interrupted earlier rewrite would otherwise
    outlive the re-save, and if the re-save itself then crashed
    mid-overwrite, ``resolve_live`` would silently serve (and a re-run
    compact would resurrect) the PRE-rebuild state."""
    for suffix in (".old", ".staging"):
        p = live + suffix
        if os.path.exists(p):
            shutil.rmtree(p)


def guarded_append_target(live: str) -> str:
    """``live`` if it is safe to append into, else raise. Appending
    must never materialize a FRESH live directory: with ``.old``
    present that's the compact crash window (re-run compact first);
    with neither present the saved layout is incomplete (a crashed
    save/rebuild) — an append would create a live dir holding ONLY the
    new rows and every read afterwards would silently miss the
    original reference."""
    if os.path.isdir(live):
        return live
    if os.path.isdir(live + ".old"):
        raise ValueError(
            f"interrupted compaction detected at {live!r} (.old without "
            "the live directory) — re-run compact() before appending"
        )
    raise ValueError(
        f"missing dataset at {live!r} — the saved layout is incomplete "
        "(crashed save/rebuild?); restore or rebuild before appending"
    )


def append_partitioned(
    new, path: str, dataset: str, partition_col: str | None
) -> None:
    """Append ``new``'s rows to ``<path>/<dataset>`` (optionally
    partitioned) after the :func:`guarded_append_target` checks —
    the ONE append shape every persisted family shares."""
    live = guarded_append_target(os.path.join(path, dataset))
    writer = new.write.mode("append")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(live)


def compact_dataset(
    spark,
    path: str,
    dataset: str,
    partition_col: str | None = None,
    n_partitions: int | None = None,
    distinct: bool = False,
    schema: str | None = None,
) -> None:
    """Rewrite ``<path>/<dataset>`` with coalesced files (one per
    partition directory when ``partition_col`` is given, else
    ``n_partitions`` files), optionally de-duplicated — the ONE
    compaction shape every persisted family shares. Reads via
    :func:`resolve_live` (an interrupted earlier compaction is picked
    up and completed), writes to staging, swaps in. ``schema`` pins
    the read schema for datasets that can be legitimately EMPTY
    (no part files to infer from)."""
    live = os.path.join(path, dataset)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(resolve_live(live))
    if distinct:
        df = df.distinct()
    if partition_col is not None:
        df = df.repartition(partition_col)
    elif n_partitions is not None:
        df = df.repartition(n_partitions)
    staging = live + ".staging"
    writer = df.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(staging)
    swap_in(live, staging)
