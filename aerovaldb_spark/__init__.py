"""aerovaldb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of metno/aerovaldb, plus the
relational / dedup / similarity / text operators a large-scale training
data pipeline needs.

Reference: /root/reference (metno/aerovaldb). This is a ground-up
Spark-first design, not a port — see SURVEY.md §7.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .session import get_spark

__all__ = ["get_spark"]
