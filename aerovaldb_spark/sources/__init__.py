"""Source connectors: migration to/from reference-layout stores."""

from __future__ import annotations

from .jsondb_import import import_jsondb_tree, import_jsondb_tree_distributed
from .sqlitedb_io import export_sqlite_db, import_sqlite_db, is_aerovaldb_sqlite

__all__ = [
    "export_sqlite_db",
    "import_jsondb_tree",
    "import_jsondb_tree_distributed",
    "import_sqlite_db",
    "is_aerovaldb_sqlite",
]
