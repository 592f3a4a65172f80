"""Optional multi-process writer locking.

The reference offers fcntl advisory locking, off by default
(lock/lock.py:79-108; env ``AVDB_USE_LOCKING``, ``AVDB_LOCK_DIR``;
docs/locking.rst). On a cluster the real answer is a transaction log
(Delta-style optimistic concurrency); for multi-process local use the
same advisory-lock escape hatch is provided here.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


class FakeLock:
    """No-op lock (reference lock.py:55-77) — the default."""

    def acquire(self) -> None:
        pass

    def release(self) -> None:
        pass

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()


class FileLock(FakeLock):
    """fcntl advisory lock, one lockfile per db root (md5-named, like
    reference lock.py:94 + jsonfiledb.py:696-709)."""

    def __init__(self, root: str, lock_dir: str | None = None):
        lock_dir = lock_dir or os.environ.get(
            "AVDB_LOCK_DIR", os.path.join(tempfile.gettempdir(), "aerovaldb-locks")
        )
        os.makedirs(lock_dir, exist_ok=True)
        name = hashlib.md5(os.path.abspath(root).encode()).hexdigest()
        self._path = os.path.join(lock_dir, name)
        self._fd: int | None = None
        self._depth = 0  # reentrant within a process: a caller-managed
        # `with db.lock():` section contains flush(), which locks too

    def acquire(self) -> None:
        import fcntl

        if self._depth == 0:
            self._fd = os.open(self._path, os.O_CREAT | os.O_RDWR)
            fcntl.flock(self._fd, fcntl.LOCK_EX)
        self._depth += 1

    def release(self) -> None:
        import fcntl

        self._depth -= 1
        if self._depth == 0 and self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


def make_lock(root: str) -> FakeLock:
    """Lock per AVDB_USE_LOCKING env (reference string_utils.str_to_bool
    semantics: '1'/'true'/'yes' enable)."""
    flag = os.environ.get("AVDB_USE_LOCKING", "").strip().lower()
    if flag in ("1", "true", "yes", "on"):
        return FileLock(root)
    return FakeLock()
