"""Declared-query registry: every implemented operator as a named query with
a DuckDB-runnable oracle (the driver's correctness gate, SURVEY §5)."""

from kafka_streams_dead_letter_publishing_spark.plans.registry import QUERIES, Query, query

# importing the family modules populates the registry — ORDER MATTERS: the
# driver records CORRECTNESS rows in registry-insertion order (r2 showed a
# 50-row window), so the reference-parity core and the LLM-pipeline
# north-star families register first and the [EXT] relational family last
from kafka_streams_dead_letter_publishing_spark.plans import (  # noqa: E402,F401
    dead_letter,
    multimodal,
    text,
    similarity,
    relational,
)

__all__ = ["QUERIES", "Query", "query"]
