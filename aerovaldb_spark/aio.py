"""Async facade over AerovalSparkDB.

The reference exposes every method both async and sync via its
``@async_and_sync`` decorator (utils/asyncio.py:23-48). Spark's driver
API is synchronous, so the async surface here delegates to a thread
(``asyncio.to_thread``) — callers in an async serving layer never
block the event loop on a Spark job.
"""

from __future__ import annotations

import asyncio
from typing import Any

from .db import AerovalSparkDB


class AsyncAerovalSparkDB:
    """Awaitable twin of :class:`AerovalSparkDB`.

    Every public method of the sync engine is available here and
    returns a coroutine: ``await adb.get_config("p", "e")``.
    """

    def __init__(self, db: AerovalSparkDB):
        self._db = db

    @property
    def sync(self) -> AerovalSparkDB:
        return self._db

    async def query_iter(self, *args: Any, **kwargs: Any):
        """Async-generator twin of the sync ``query_iter``: each
        ``next()`` (a Spark-batch pull on first touch) runs in a
        thread, so iterating a large catalog never blocks the event
        loop. The generic ``__getattr__`` path would hand back the raw
        sync generator, whose iteration blocks — hence the override."""
        gen = self._db.query_iter(*args, **kwargs)
        sentinel = object()
        while True:
            item = await asyncio.to_thread(next, gen, sentinel)
            if item is sentinel:
                return
            yield item

    def __getattr__(self, name: str) -> Any:
        attr = getattr(self._db, name)
        if not callable(attr):
            return attr

        async def call(*args: Any, **kwargs: Any) -> Any:
            return await asyncio.to_thread(attr, *args, **kwargs)

        call.__name__ = f"a{name}"
        return call
