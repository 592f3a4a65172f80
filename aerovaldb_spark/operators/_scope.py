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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    out = df.persist()
    _SCOPED.append(out)
    return out


def scope_mark() -> int:
    """Current registry position — pass to ``release_scoped_persists``
    to release only persists registered AFTER this point (the shape a
    library callback needs: bound its own cache growth without
    evicting intermediates belonging to concurrent work)."""
    return len(_SCOPED)


def release_scoped_persists(mark: int = 0) -> int:
    """Unpersist registered intermediates from position ``mark``
    onward (default 0 = everything); returns the count released."""
    n = max(len(_SCOPED) - mark, 0)
    while len(_SCOPED) > mark:
        _SCOPED.pop().unpersist()
    return n
