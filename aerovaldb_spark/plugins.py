"""Connector factory (reference: src/aerovaldb/plugins.py:30-101).

``open(resource)`` dispatches on a scheme prefix:

- ``spark:<path>``  → AerovalSparkDB rooted at <path>
- ``:memory:``      → AerovalSparkDB in a fresh temp directory
- bare path         → AerovalSparkDB rooted there (default engine)

Engines register in ``ENGINES``; third parties can add entries (the
reference uses importlib entry points for the same purpose — a
registry dict keeps this dependency-free).
"""

from __future__ import annotations

import tempfile
from typing import Callable

from pyspark.sql import SparkSession

from .db import AerovalSparkDB
from .session import get_spark


def _open_spark(path: str, spark: SparkSession | None = None) -> AerovalSparkDB:
    spark = spark or SparkSession.getActiveSession() or get_spark()
    if path == ":memory:":
        path = tempfile.mkdtemp(prefix="aerovaldb-spark-")
    return AerovalSparkDB(spark, path)


ENGINES: dict[str, Callable[..., AerovalSparkDB]] = {
    "spark": _open_spark,
}


def list_engines() -> dict[str, Callable[..., AerovalSparkDB]]:
    return dict(ENGINES)


def open(resource: str, spark: SparkSession | None = None) -> AerovalSparkDB:  # noqa: A001
    """Open a database connection for a resource identifier."""
    scheme, sep, rest = resource.partition(":")
    if sep and scheme in ENGINES and rest and rest != "memory:":
        return ENGINES[scheme](rest, spark=spark)
    if resource == ":memory:":
        return _open_spark(":memory:", spark=spark)
    return _open_spark(resource, spark=spark)
