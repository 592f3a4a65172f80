"""Scoped persist registry.

Operators persist shared intermediates (shingle-hash sets, bigram
background models, per-part aggregates) so one plan's two consumers
read the same cached partitions. A persist has no owner that could
unpersist it after the action — unpersisting inside the operator would
evict the data before the caller ever runs the plan — so repeated
invocations in one session (bench runs each headline query 7+ times)
accumulate cache entries until Spark's LRU evicts them under pressure.

``scoped_persist`` records every such persist; harnesses that run many
queries in one session (bench.py, tools/parity.py) call
``release_scoped_persists()`` after each query's action, bounding cache
growth to one query's working set. Returned DataFrames stay valid —
they just recompute if re-executed after release. Callers that run one
query per session (the external driver) need nothing.

Concurrency: the registry is shared session state, so all mutation is
lock-guarded. A callback that must release ONLY its own persists while
other threads (concurrent streams, a driver-side batch query) keep
registering uses :class:`scoped_collector` — a context manager that
snapshots, per thread, exactly the DataFrames registered while it was
active, and on exit removes THOSE by identity. Positional marks
(``scope_mark`` + ``release_scoped_persists(mark)``) cannot do this:
two interleaved registrants make the suffix past any mark a mix of
both threads' persists, so truncation evicts the other thread's hot
caches while leaking one's own. Marks remain supported for
single-threaded harness loops only.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.RLock()
_SCOPED: list[DataFrame] = []
# per-thread stack of active scoped_collector item lists: registration
# attributes each persist to the INNERMOST collector of the thread that
# created it, which is what makes identity-based release correct under
# concurrent registrants (another thread's persists never enter this
# thread's collector)
_TL = threading.local()


def scoped_persist(df: DataFrame) -> DataFrame:
    out = df.persist()
    with _LOCK:
        _SCOPED.append(out)
    stack = getattr(_TL, "stack", None)
    if stack:
        stack[-1].append(out)
    return out


class scoped_collector:
    """Context manager capturing exactly the persists the CURRENT
    THREAD registers while it is active; ``__exit__`` unpersists those
    and only those (removed from the registry by identity, never by
    position). The concurrent-safe form of mark/release: a streaming
    ``foreachBatch`` callback wraps each micro-batch in one of these so
    its cache growth stays bounded without evicting intermediates
    belonging to concurrent queries, other streams, or a freshly-built
    index's cached reference frames. Nested collectors each own what
    was registered while they were innermost."""

    def __enter__(self) -> "scoped_collector":
        self._items: list[DataFrame] = []
        stack = getattr(_TL, "stack", None)
        if stack is None:
            stack = []
            _TL.stack = stack
        stack.append(self._items)
        return self

    def __exit__(self, *exc) -> bool:
        _TL.stack.pop()
        release_exact(self._items)
        return False


def release_exact(dfs: list[DataFrame]) -> int:
    """Unpersist exactly ``dfs``, removing them from the registry by
    identity; returns the count released. Safe under concurrent
    registrants — other threads' entries are untouched."""
    ids = {id(d) for d in dfs}
    with _LOCK:
        _SCOPED[:] = [d for d in _SCOPED if id(d) not in ids]
    n = len(dfs)
    for d in dfs:
        d.unpersist()
    dfs.clear()
    return n


def scope_mark() -> int:
    """Current registry position for ``release_scoped_persists(mark)``.
    SINGLE-THREADED harness loops only (bench.py-style sequential
    query-release-query): with concurrent registrants the suffix past a
    mark interleaves threads, so positional release evicts foreign
    persists and leaks one's own — use :class:`scoped_collector` from
    any callback that can run concurrently."""
    with _LOCK:
        return len(_SCOPED)


def release_scoped_persists(mark: int = 0) -> int:
    """Unpersist registered intermediates from position ``mark``
    onward (default 0 = everything); returns the count released. See
    ``scope_mark`` for the single-threaded caveat on nonzero marks."""
    with _LOCK:
        popped = _SCOPED[mark:]
        del _SCOPED[mark:]
    for df in reversed(popped):
        df.unpersist()
    return len(popped)
