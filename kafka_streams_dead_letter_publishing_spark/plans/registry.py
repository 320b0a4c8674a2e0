"""Query registry machinery.

Each entry pairs a Spark implementation (DataFrame code — the engine surface)
with an equivalent ANSI-SQL oracle string DuckDB can run over the same
parquet tables.  Column names are aligned on both sides because the driver's
comparator sorts columns by name before hashing values.

Determinism policy (so order-insensitive value hashes match across engines):

* no raw ``sum()`` over doubles — every monetary/double aggregate goes
  through an exact DECIMAL cast, is summed exactly, and only then cast back
  to double (both engines produce the *same* exact decimal, so the same
  IEEE double);
* top-k always carries a unique tie-break key in its ordering;
* random content is never hashed — the dead-letter family checks lengths,
  counts and error messages, not generated string bytes (the reference's own
  tests do the same: ``ErrorHandlingTopologyTest.java:42-48``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, Query] = {}

#: rows retired from the driver registry at the 100-row hygiene cap but
#: whose (spark, oracle) pair stays test-pinned — the edge-case batteries
#: keep exercising them without consuming a rotation slot (r15; the r14
#: retirements predate this and live as plain functions)
RETIRED: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str, tags: tuple[str, ...] = ()):
    """Register a Spark query implementation with its DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def retired_query(name: str, oracle: str | None, doc: str, tags: tuple[str, ...] = ()):
    """Register into RETIRED: dropped from the driver rotation, kept
    runnable against its oracle by the test harness."""

    def deco(fn: SparkQuery) -> SparkQuery:
        RETIRED[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


#: per-trigger progress of the LAST streamed drive, keyed (row, sf_dir) —
#: bench.py pops the per-row drive caches to force fresh drives and reads
#: these to report the REAL multi-batch drive throughput (r14 verdict #6:
#: the cached sink re-read understates what the streamed rows cost)
STREAM_DRIVE_STATS: dict[tuple[str, str], list[dict]] = {}


def _capture_drive_stats(row: str, sf_dir: str, q) -> None:
    """Record a finished StreamingQuery's per-trigger progress (input
    rows + trigger wall) for the bench's drive-throughput entries."""
    STREAM_DRIVE_STATS[(row, sf_dir)] = [
        {
            "input_rows": int(p.numInputRows or 0),
            "trigger_ms": int(
                dict(p.durationMs or {}).get("triggerExecution") or 0
            ),
        }
        for p in q.recentProgress
    ]
