"""aerovaldb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of metno/aerovaldb, plus the
relational / dedup / similarity / text operators a large-scale training
data pipeline needs.

Reference: /root/reference (metno/aerovaldb). This is a ground-up
Spark-first design, not a port — see SURVEY.md §7.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .db import AerovalSparkDB, copy_db_contents
from .exceptions import TemplateNotFound, UnsupportedOperation, UnusedArguments
from .plugins import list_engines, open  # noqa: A004
from .routes import Route
from .session import get_spark
from .snapshot import SnapshotReader
from .types import AccessType, QueryEntry

__all__ = [
    "AccessType",
    "AerovalSparkDB",
    "QueryEntry",
    "Route",
    "SnapshotReader",
    "TemplateNotFound",
    "UnsupportedOperation",
    "UnusedArguments",
    "copy_db_contents",
    "get_spark",
    "list_engines",
    "open",
]
