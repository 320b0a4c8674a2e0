"""Declared-query registry: every implemented operator as a named query with
a DuckDB-runnable oracle (the driver's correctness gate, SURVEY §5)."""

from kafka_streams_dead_letter_publishing_spark.plans.registry import QUERIES, Query, query

# importing the family modules populates the registry
from kafka_streams_dead_letter_publishing_spark.plans import (  # noqa: E402,F401
    dead_letter,
    multimodal,
    relational,
    similarity,
    text,
)

__all__ = ["QUERIES", "Query", "query"]
