"""Declared-query registry: every implemented operator as a named query with
a DuckDB-runnable oracle (the driver's correctness gate, SURVEY §5)."""

from kafka_streams_dead_letter_publishing_spark.plans.registry import QUERIES, RETIRED, Query, query

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

def clear_plan_caches() -> None:
    """Evict every per-sf_dir memo the plan modules keep for the process
    lifetime (r8 watch item: bench sweeps want the reuse, a long-lived
    multi-tenant process wants an eviction hook).  Persisted frames are
    unpersisted against their owning session when it is still alive;
    on-disk index/codebook memos are dropped (the tmp dirs they point at
    are left to the OS reaper, as documented at their build sites)."""
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        _IVFPQ_CACHE,
        _LEARNED_INDEX_CACHE,
        _PQ_CACHE,
    )
    from kafka_streams_dead_letter_publishing_spark.plans.text import (
        _BM25_INDEX_CACHE,
        _pipeline_release_previous,
    )

    _pipeline_release_previous()
    _LEARNED_INDEX_CACHE.clear()
    _PQ_CACHE.clear()
    _IVFPQ_CACHE.clear()
    _BM25_INDEX_CACHE.clear()


__all__ = ["QUERIES", "RETIRED", "Query", "query", "clear_plan_caches"]
