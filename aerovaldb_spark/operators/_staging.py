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
