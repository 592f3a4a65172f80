"""Source connectors: legacy import from reference-layout stores."""

from __future__ import annotations

from .jsondb_import import import_jsondb_tree, import_jsondb_tree_distributed

__all__ = ["import_jsondb_tree", "import_jsondb_tree_distributed"]
