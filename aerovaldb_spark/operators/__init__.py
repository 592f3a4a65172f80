"""Operator library: relational, temporal, text, dedup, similarity.

``ALL_QUERIES`` / ``ALL_ORACLE`` aggregate every module's
(spark, sf_dir) -> DataFrame callables and their DuckDB oracle SQL.
"""

from __future__ import annotations

from . import advanced, dedup, events, relational, similarity, text  # noqa: E501
from ..functions import multimodal

ALL_QUERIES = {
    **relational.QUERIES,
    **events.QUERIES,
    **text.QUERIES,
    **dedup.QUERIES,
    **similarity.QUERIES,
    **advanced.QUERIES,
    **multimodal.QUERIES,
}

ALL_ORACLE = {
    **relational.ORACLE,
    **events.ORACLE,
    **text.ORACLE,
    **dedup.ORACLE,
    **similarity.ORACLE,
    **advanced.ORACLE,
    **multimodal.ORACLE,
}

__all__ = [
    "ALL_ORACLE",
    "ALL_QUERIES",
    "dedup",
    "events",
    "relational",
    "advanced",
    "similarity",
    "text",
]
