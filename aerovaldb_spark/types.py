"""Access types and catalog records.

AccessType mirrors the reference's representation-negotiation surface
(/root/reference/src/aerovaldb/types.py:6-34): callers ask for the
cheapest form they need. FILE_PATH is meaningful only for a
file-per-asset backend; like the reference's SQLite backend
(sqlitedb.py:396-399) this engine rejects it.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum, auto

from .routes import Route


class AccessType(Enum):
    JSON_STR = auto()
    FILE_PATH = auto()
    OBJ = auto()
    URI = auto()
    BLOB = auto()
    MTIME = auto()
    CTIME = auto()


def normalize_access_type(
    access_type: AccessType | str | None, default: AccessType = AccessType.OBJ
) -> AccessType:
    """Coerce str/None to AccessType (reference: aerovaldb.py:1284-1309)."""
    if access_type is None:
        return default
    if isinstance(access_type, AccessType):
        return access_type
    if isinstance(access_type, str):
        try:
            return AccessType[access_type]
        except KeyError as e:
            raise ValueError(f"Invalid access type '{access_type}'") from e
    raise ValueError(f"Invalid access type '{access_type}'")


@dataclass(frozen=True)
class QueryEntry:
    """Catalog record for one asset (reference: utils/query.py:11-44)."""

    uri: str
    type: Route
    meta: dict[str, str]

    def __str__(self) -> str:
        return self.uri
