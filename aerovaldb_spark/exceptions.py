"""Exception taxonomy (reference: src/aerovaldb/exceptions.py).

Kept subclass-compatible with the reference's base classes so callers
that catch ValueError / KeyError / NotImplementedError behave
identically after switching engines.
"""

from __future__ import annotations


class UnusedArguments(ValueError):
    """Args or kwargs remained after matching — likely a caller bug."""


class TemplateNotFound(KeyError):
    """No layout template matched (legacy-import path resolution)."""


class UnsupportedOperation(NotImplementedError):
    """The operation cannot be provided by this backend (e.g.
    FILE_PATH access against a table-backed store)."""
