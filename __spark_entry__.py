"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything is backed by the declared-query registry
(``kafka_streams_dead_letter_publishing_spark.plans.QUERIES``): one entry per implemented
operator from SURVEY.md §2 plus the [EXT] LLM-pipeline families, each
pairing a Spark DataFrame implementation with an equivalent DuckDB oracle
(column names aligned on both sides — the comparator sorts columns by name
before hashing values).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kafka_streams_dead_letter_publishing_spark.plans import QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "dlt_route_counts"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference-parity core: the four-way dead-letter
    split over a derived Kafka-shaped record stream (SURVEY §2 ops
    #1,#2,#5,#9,#10).
    """
    return QUERIES[FLAGSHIP].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ [EXT])."""
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every query that is SQL-expressible:
    58 of 59 — even the mapInPandas multimodal family has a byte-level SQL
    oracle, and the learned-IVF row's oracle replays its whole quantized
    k-means fit; the single exception is events_approx_distinct_users
    (HLL sketches are engine-specific — rows-only by design)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
