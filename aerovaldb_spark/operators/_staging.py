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

from pyspark.errors import AnalysisException


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


# --------------------------------------------------------------------------
# Append-intent protocol: crash/replay-safe multi-dataset appends.
#
# The append lifecycle (every index family's ``add(path=...)``) is one
# atomic Spark write job PER DATASET — but an operation appending to
# more than one dataset (the screen index: weights then signatures),
# or any append driven by a REPLAYING caller (Structured Streaming
# foreachBatch redelivers a batch whose commit marker never landed),
# has torn windows no single write's atomicity covers: a retry
# re-appends rows the first attempt already wrote, and duplicate
# reference rows silently corrupt every downstream dot product. The
# reference has no such window to guard — its writes are single-file
# atomic (jsonfiledb.py:386-413) — so this protocol is the
# Spark-layout equivalent of that guarantee.
#
# Shape (write-ahead intent at the FILE level): Spark append jobs only
# ever ADD part files with job-unique names (existing files are never
# rewritten; ``_SUCCESS`` is overwritten in place and is in the
# snapshot). So a pre-append snapshot of each dataset's file listing
# identifies the attempt's additions exactly: recovery deletes every
# file NOT in the snapshot (and prunes directories the torn attempt
# created), restoring the pre-append state bit-for-bit, after which
# the append can be re-run cleanly.
#
# Single-writer rule: the protocol assumes appends to one index path
# are serialized (already the documented contract — foreachBatch is
# serial per query, and add/compact/readers must not interleave).
# Recovery while another writer is mid-append would delete its
# in-flight files.


def _list_data_files(root: str) -> list[str]:
    """Sorted relative paths of every file under ``root`` (recursive);
    empty when the directory does not exist (a first append into a
    dataset that a crashed save never materialized is refused by
    ``guarded_append_target`` before this matters)."""
    if not os.path.isdir(root):
        return []
    out = []
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        for f in files:
            out.append(os.path.normpath(os.path.join(rel, f)))
    return sorted(out)


def write_append_intent(intent_path: str, dataset_dirs) -> None:
    """Snapshot each dataset directory's file listing into
    ``intent_path`` (write-then-rename, so the intent itself is never
    torn). Call BEFORE the append's first write job; remove the file
    only after the caller's own commit point (e.g. the ingest epoch
    marker) is durable."""
    import json

    snap = {d: _list_data_files(d) for d in dataset_dirs}
    tmp = intent_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, intent_path)
    fsync_dir(os.path.dirname(intent_path))


def fsync_dir(dirpath: str) -> None:
    """fsync a directory so a rename/create inside it survives power
    loss, not just a process crash — os.replace orders the rename
    against the file's own fsync, but the directory entry itself is
    only durable once the directory inode is synced. No-op on
    platforms whose directory handles refuse fsync (Windows)."""
    try:
        fd = os.open(dirpath, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def recover_append_intent(intent_path: str) -> dict:
    """Undo a torn append: delete every file the snapshot in
    ``intent_path`` does not list (the torn attempt's additions),
    prune directories the attempt created (e.g. new partition dirs),
    then remove the intent file. Returns {dataset_dir: [removed
    relative paths]} — empty lists when the crash happened before any
    write. Safe to call when nothing was written; must NOT run
    concurrently with a live append on the same path (single-writer
    rule above)."""
    import json

    with open(intent_path) as f:
        snap = json.load(f)
    removed: dict = {}
    for root, files in snap.items():
        keep = set(files)
        removed[root] = []
        if os.path.isdir(root):
            for rel in _list_data_files(root):
                if rel not in keep:
                    os.remove(os.path.join(root, rel))
                    removed[root].append(rel)
            # prune dirs the torn attempt created, deepest first
            for dirpath, dirs, files_ in os.walk(root, topdown=False):
                if dirpath != root and not dirs and not files_:
                    os.rmdir(dirpath)
    os.remove(intent_path)
    return removed


def rebuild_root(path: str, save_fn, preserve=("_ingest_epochs",)) -> None:
    """Staged whole-index rebuild+swap: ``save_fn(staging_dir)`` writes
    the FRESH index layout next to the live one (``<path>.rebuild``),
    operational state named in ``preserve`` (the streaming ingest's
    epoch markers — a checkpointed stream resuming after the rebuild
    must still skip batches whose data the rebuild already contains)
    is copied in, then the roots swap via :func:`swap_in`'s rename
    protocol. Crash recovery is the dataset-level story lifted to the
    root: loaders resolve ``<path>`` through :func:`resolve_live`, so
    a crash inside the swap window serves the intact pre-rebuild root
    at ``<path>.old`` and a re-run completes the rebuild — which is
    also why ``preserve`` copies from the RESOLVED root (a re-run
    after that crash must not silently drop the markers with the
    ``.old`` cleanup).

    ``.intent`` files are deliberately NOT carried over: an intent's
    snapshot describes the PRE-rebuild file layout, and running
    recovery against the rebuilt datasets would delete every fresh
    file as "torn". Callers must roll torn appends back BEFORE
    rebuilding (``recover_ingest_intents`` — maybe_rebuild does), so
    a surviving intent here is already-handled state, never a pending
    rollback."""
    staging = path + ".rebuild"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    save_fn(staging)
    live = resolve_live(path)
    for name in preserve:
        src = os.path.join(live, name)
        if os.path.isdir(src):
            shutil.copytree(
                src,
                os.path.join(staging, name),
                ignore=shutil.ignore_patterns("*.intent", "*.intent.tmp"),
            )
    swap_in(path, staging)


def recover_ingest_intents(path: str, spark=None) -> dict:
    """Roll back every torn streaming-ingest append recorded under
    ``<path>/_ingest_epochs/*/`` — the shared pre-flight for ANY
    operation that rewrites or rebuilds the index root (maybe_rebuild
    calls it first; ``streaming.recover_index_ingest`` is the public
    entry). An ``<epoch>.intent`` without its ``<epoch>`` marker is a
    torn append (rolled back to the snapshot); with the marker it is
    a post-commit leftover (removed). With ``spark``, repaired
    dataset paths are evicted from the shared file-listing cache — a
    reader planned after a pure rollback would otherwise still
    reference the deleted files (a re-APPEND refreshes implicitly,
    recovery without one does not).

    Refuses (raises) when ``path`` is missing but ``<path>.old``
    exists: that is an interrupted rebuild/compact swap — re-run the
    rebuild first; intents cannot exist in that state when the
    recover-before-rebuild ordering is followed, and guessing here
    could roll back against the wrong root."""
    import glob as _glob

    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        raise ValueError(
            f"interrupted rebuild detected at {path!r} (.old without "
            "the live root) — re-run the rebuild/compact to complete "
            "the swap before ingest recovery"
        )
    repaired: dict = {}
    for run_dir in sorted(
        _glob.glob(os.path.join(path, "_ingest_epochs", "*"))
    ):
        if os.path.isdir(run_dir):
            repaired.update(recover_run_intents(run_dir, spark))
    return repaired


def recover_run_intents(run_dir: str, spark=None) -> dict:
    """The per-run recovery loop (ONE definition shared by the
    per-batch ingest hot path and the whole-root
    :func:`recover_ingest_intents`): each ``<epoch>.intent`` without
    its marker rolls back; with the marker it is a post-commit
    leftover and is removed. ``spark`` evicts repaired dataset paths
    from the shared file-listing cache."""
    import glob as _glob

    repaired: dict = {}
    for intent in sorted(_glob.glob(os.path.join(run_dir, "*.intent"))):
        marker = intent[: -len(".intent")]
        if os.path.exists(marker):
            os.remove(intent)
        else:
            repaired[intent] = recover_append_intent(intent)
    if spark is not None:
        for removed in repaired.values():
            for root in removed:
                spark.catalog.refreshByPath(root)
    return repaired


def refresh_root(spark, path: str) -> None:
    """Evict every cached plan / file listing over an index root that
    was just swapped by :func:`rebuild_root`: Spark's plan cache and
    shared file-status cache key on the DATASET directories (the
    root's immediate children), and a cached frame from a prior
    staleness()/screen() call would otherwise silently serve the
    PRE-rebuild files (or fail on their deleted part files). Refreshes
    the root and each child directory."""
    spark.catalog.refreshByPath(path)
    if os.path.isdir(path):
        for name in os.listdir(path):
            child = os.path.join(path, name)
            if os.path.isdir(child):
                spark.catalog.refreshByPath(child)


def frame_fingerprint(df) -> tuple[int, int]:
    """(row count, order-free xxhash64 sum) of a frame — a cheap
    equality fingerprint for the tiny frozen-parameter frames the
    index families carry (IVF centroids, the screen index's idf
    stats). Order-free (sum of per-row hashes, wrapping long
    arithmetic) so the physical row order of a parquet round-trip
    can't change it; exact for the frozen params because doubles,
    longs, and strings round-trip parquet bit-for-bit. The sum runs
    in DECIMAL(38,0) — a long sum of longs overflows under ANSI mode
    (headroom to ~1e19 rows, far past any parameter frame)."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("c"),
        F.sum(
            F.xxhash64(*df.columns).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"]) if row["h"] is not None else 0


def read_meta_row(spark, path: str, name: str = "meta"):
    """The one-row ``<path>/<name>`` parquet as a Row, or None when
    the dataset is missing. Resolves the root through
    :func:`resolve_live` and evicts the shared file-listing cache
    first — after a rebuild swap the meta files are NEW, and a stale
    listing from before the swap would either throw FileNotFound or
    silently serve the pre-rebuild row (exactly the state this read
    exists to detect). A meta directory that EXISTS but holds no
    readable row (a save crashed between creating the directory and
    committing its part files) raises the module's descriptive
    refusal instead of an opaque IndexError/inference failure —
    missing-vs-torn must not be conflated (None means
    'pre-fingerprint layout, accepted unchecked')."""
    meta_dir = os.path.join(resolve_live(path), name)
    if not os.path.isdir(meta_dir):
        return None
    spark.catalog.refreshByPath(meta_dir)
    try:
        rows = spark.read.parquet(meta_dir).collect()
    except AnalysisException as e:
        # schema inference failed over an existing directory: the
        # save created meta/ but never committed a readable part
        # file — the crashed-save state this read exists to detect
        raise ValueError(
            f"unreadable meta dataset at {meta_dir!r} (crashed save?)"
            " — restore from backup or re-save() a valid index at"
            f" this path before using it: {type(e).__name__}: {e}"
        ) from e
    except Exception as e:
        # anything else (transient IO, permissions, a torn read mid-
        # maintenance) is NOT evidence of a crashed save — name the
        # failure without the corruption attribution so an operator
        # retries before reaching for a backup (advice item, r13)
        raise ValueError(
            f"failed to read meta dataset at {meta_dir!r} — possibly "
            "a transient IO/permission failure rather than a crashed "
            "save; retry (and check filesystem health) before "
            f"restoring from backup: {type(e).__name__}: {e}"
        ) from e
    if not rows:
        raise ValueError(
            f"empty meta dataset at {meta_dir!r} (crashed save?) — "
            "restore from backup or re-save() a valid index at this "
            "path before using it"
        )
    return rows[0]


def require_meta_family(md, expected: str, path: str) -> None:
    """Raise unless the persisted meta row carries this family's tag —
    the ONE cross-family guard every ``add(path=...)`` runs before
    touching a layout (column-name sniffing cannot separate families
    that share a meta schema, e.g. SRPIndex vs QuantizedSRPIndex;
    the explicit tag can, and covers families added later by
    default). ``md`` is the meta row's dict (or None/{} when the
    layout predates meta); a meta WITHOUT the tag is accepted
    unchecked — the same pre-fingerprint-layout leniency
    verify_frozen_handle applies — re-``save()`` to arm it."""
    found = (md or {}).get("family")
    if found is not None and found != expected:
        raise ValueError(
            f"the index at {path!r} was saved by {found} — refusing "
            f"a {expected} operation on a foreign family's layout "
            "(mixed rows would corrupt it; load it with "
            f"{found}.load instead)"
        )


def verify_frozen_handle(path: str, what: str, self_fp, meta_fp) -> None:
    """Raise unless a handle's frozen-parameter fingerprint matches
    the persisted one — the ``add(path=...)`` pre-flight that stops a
    handle created BEFORE a maybe_rebuild/maintain swap from
    appending rows computed under the OLD parameters (mixed parameter
    spaces corrupt screen dots / bucket probes with no error).
    ``meta_fp`` None (a pre-fingerprint layout) is accepted with no
    check — re-``save()`` to arm the guard."""
    if meta_fp is None:
        return
    if tuple(self_fp) != tuple(meta_fp):
        raise ValueError(
            f"frozen {what} changed on disk under {path!r} since this "
            "handle was created (a maybe_rebuild/maintain pass swapped "
            "in re-fit parameters?) — appending rows computed under "
            "the old parameters would corrupt the index; re-load() "
            "and re-create any ingest closures from the fresh handle"
        )


def recover_before_rebuild(path: str, spark=None) -> dict:
    """The ONE recover-before-rebuild preamble every family's
    ``maybe_rebuild`` runs first: roll back any torn streaming append
    BEFORE measuring or rebuilding — a rebuild over torn rows would
    bake them in, and a stale intent surviving past the swap would
    roll back the FRESH datasets (the intent snapshots the
    pre-rebuild layout). Skipped in the interrupted-swap state (no
    intents can exist there under this ordering; the re-run completes
    the swap)."""
    if os.path.isdir(path):
        return recover_ingest_intents(path, spark)
    return {}


# --------------------------------------------------------------------------
# Fragmentation: the third leg of the maintenance triangle. Staleness
# (maybe_rebuild) answers "are the frozen parameters still right",
# the intent protocol answers "is the on-disk state consistent" —
# fragmentation answers "has append litter made scans expensive":
# streaming ingest lands a file-set per micro-batch, and at some
# point FILE COUNT, not data size, dominates scan planning. compact()
# is the fix; this gives it a measured trigger instead of a
# docstring's "run after many appends".


def fragmentation_report(path: str, datasets) -> dict:
    """Filesystem-metadata-only fragmentation metrics for an index
    root's append datasets: per dataset (data files, partition dirs,
    max files in one dir, bytes, mean bytes/file) plus roots for the
    totals. Zero Spark jobs — os.walk only — so it is safe to run as
    a scheduled health probe against a live index.

    Refuses (raises) the interrupted-rebuild state (``<path>.old``
    without ``<path>``): walking the missing live root would report
    all-zero metrics and a 'fresh, nothing to do' compact verdict for
    an index that actually needs its swap completed — the same guard
    ``recover_ingest_intents`` applies. The ROOT is resolved through
    :func:`resolve_live` first (so is each dataset, for compact()'s
    dataset-level rename window)."""
    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        raise ValueError(
            f"interrupted rebuild detected at {path!r} (.old without "
            "the live root) — re-run the rebuild/compact to complete "
            "the swap before measuring fragmentation"
        )
    path = resolve_live(path)
    report: dict = {"path": path, "datasets": {}}
    for name in datasets:
        root = resolve_live(os.path.join(path, name))
        files = n_bytes = 0
        per_dir: dict = {}
        for dirpath, dirs, names in os.walk(root):
            # prune hidden/underscore DIRECTORIES in place: a live
            # append's <dataset>/_temporary/... part files are not
            # data (counting them would trip the verdict spuriously,
            # and the committer renames them away mid-walk)
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            data = [f for f in names if not f.startswith(("_", "."))]
            if data:
                per_dir[dirpath] = len(data)
            for f in data:
                try:
                    n_bytes += os.path.getsize(
                        os.path.join(dirpath, f)
                    )
                except FileNotFoundError:
                    # a concurrent rename between the listing and the
                    # stat — skip the byte count, keep the probe alive
                    continue
                files += 1
        report["datasets"][name] = {
            "n_files": files,
            "n_dirs": len(per_dir),
            "max_files_per_dir": max(per_dir.values(), default=0),
            "n_bytes": n_bytes,
            "mean_bytes_per_file": (
                n_bytes // files if files else 0
            ),
        }
    return report


def compact_verdict(
    report: dict,
    max_files_per_dir: int = 8,
    min_mean_bytes_per_file: int = 0,
) -> "tuple":
    """Apply the compaction rule to a :func:`fragmentation_report`:
    compact when any dataset's busiest directory holds more than
    ``max_files_per_dir`` data files (each probe of that partition
    opens that many footers), or — when ``min_mean_bytes_per_file``
    is set — when the mean file size has fallen below it (the
    many-tiny-appends signature even with few files per dir). Returns
    the (rebuild, reasons) NamedTuple shape the staleness verdicts
    use, so callers treat all three maintenance triggers uniformly."""
    from .similarity import RebuildVerdict

    reasons = []
    for name, d in report["datasets"].items():
        if d["max_files_per_dir"] > max_files_per_dir:
            reasons.append(
                f"{name}: {d['max_files_per_dir']} files in one "
                f"directory > {max_files_per_dir} (every probe of "
                "that partition opens that many footers)"
            )
        if (
            min_mean_bytes_per_file
            and d["n_files"]
            and d["mean_bytes_per_file"] < min_mean_bytes_per_file
        ):
            reasons.append(
                f"{name}: mean file size "
                f"{d['mean_bytes_per_file']} B < "
                f"{min_mean_bytes_per_file} B (micro-batch append "
                "litter)"
            )
    return RebuildVerdict(bool(reasons), tuple(reasons))


def maybe_compact(
    spark,
    path: str,
    family,
    max_files_per_dir: int = 8,
    min_mean_bytes_per_file: int = 0,
    load_kwargs: dict | None = None,
    **compact_kwargs,
):
    """fragmentation_report -> compact_verdict -> ``family.compact``
    in one call, for any persisted family (``family`` is the index
    class: its ``APPEND_DATASETS`` names the datasets to measure and
    its ``compact(spark, path, **kwargs)`` does the rewrite under the
    shared swap protocol). Torn ingest intents are rolled back FIRST
    (compacting torn rows would bake them into the rewritten files —
    the maybe_rebuild ordering rule). Returns
    ``(index_or_None, verdict, report)`` — a fresh ``family.load``
    (``load_kwargs`` forwarded; the defaults fit every family) when
    the verdict tripped, None otherwise (the caller keeps its current
    handle)."""
    recover_before_rebuild(path, spark)
    report = fragmentation_report(path, family.APPEND_DATASETS)
    verdict = compact_verdict(
        report, max_files_per_dir, min_mean_bytes_per_file
    )
    if not verdict.rebuild:
        return None, verdict, report
    # compact swaps AND loads internally; its own pre-swap read can
    # seed the shared listing cache, so evict and RE-load after — the
    # maybe_rebuild ordering (swap -> refresh -> load), adapted
    family.compact(spark, path, **compact_kwargs)
    refresh_root(spark, path)
    return (
        family.load(spark, path, **(load_kwargs or {})),
        verdict,
        report,
    )


def maintain(
    spark,
    path: str,
    family,
    rebuild_kwargs: dict | None = None,
    compact_kwargs: dict | None = None,
    load_kwargs: dict | None = None,
    max_files_per_dir: int = 8,
    min_mean_bytes_per_file: int = 0,
) -> dict:
    """ONE maintenance pass over a persisted index, running the whole
    triangle in the safe order:

    1. recover — roll back torn streaming-append intents (must come
       first: both later verbs would bake torn rows in);
    2. ``family.maybe_rebuild`` — the staleness verdict and, when it
       trips, the staged rebuild+swap (``rebuild_kwargs`` forwarded —
       e.g. ``docs=`` for the screen family, ``vectors=`` for
       quantized IVF). Skipped (``rebuilt=None`` in the summary) for
       families with no staleness to measure and hence no
       ``maybe_rebuild`` — NearDupBucketIndex's per-doc signatures
       have no frozen statistic, so its triangle is recover+compact
       only;
    3. ``maybe_compact`` — only when NO rebuild happened (a rebuild
       rewrites every file; compacting after it would be a no-op
       rewrite).

    Returns a summary dict: ``index`` (the handle to serve from —
    freshly swapped when anything ran, the current load otherwise),
    ``recovered`` (rolled-back intents), ``rebuilt``/``compacted``
    plus their verdicts and report rows. The scheduled-job shape: run
    this off-peak per index root and read the dict into your metrics.
    Single-writer rule applies (no concurrent ingest/serve on the
    same path during the pass).

    Required family surface: ``APPEND_DATASETS`` + ``compact(spark,
    path, **kwargs)`` + ``load(spark, path, **load_kwargs)`` (the
    append-family contract every add(path=...) index implements);
    ``maybe_rebuild`` is optional (skipped when absent — see step 2).
    KMVSketchTable is NOT an append family (update() rewrites via the
    staged swap, leaving no litter to compact and no frozen parameter
    to go stale) — its whole maintenance story is
    ``recover_before_rebuild`` alone."""
    repaired = recover_before_rebuild(path, spark)
    if hasattr(family, "maybe_rebuild"):
        idx, r_verdict, r_report = family.maybe_rebuild(
            spark, path, **(rebuild_kwargs or {})
        )
        rebuilt: bool | None = bool(r_verdict.rebuild)
    else:
        # no staleness to measure for this family — recover+compact
        # is its whole triangle; load so the summary still carries a
        # servable handle
        idx, r_verdict, r_report = (
            family.load(spark, path, **(load_kwargs or {})),
            None,
            None,
        )
        rebuilt = None
    out = {
        "index": idx,
        "recovered": len(repaired),
        "rebuilt": rebuilt,
        "rebuild_verdict": r_verdict,
        "rebuild_report": r_report,
        "compacted": False,
        "compact_verdict": None,
        "fragmentation": None,
    }
    if rebuilt:
        return out
    cidx, c_verdict, frag = maybe_compact(
        spark,
        path,
        family,
        max_files_per_dir=max_files_per_dir,
        min_mean_bytes_per_file=min_mean_bytes_per_file,
        load_kwargs=load_kwargs,
        **(compact_kwargs or {}),
    )
    out["compacted"] = bool(c_verdict.rebuild)
    out["compact_verdict"] = c_verdict
    out["fragmentation"] = frag
    if cidx is not None:
        out["index"] = cidx
    return out
