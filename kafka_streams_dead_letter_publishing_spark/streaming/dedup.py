"""Streaming dedup + event-time windowed aggregation operators ([EXT],
SURVEY §2.2 — the stateful-streaming surface the reference explicitly
excludes, reference ``README.md:159,377-380``, mandated by the driver's
north star for LLM-pipeline ingest).

Scale posture (SURVEY §4.3): both operators keep BOUNDED state —
``dropDuplicatesWithinWatermark`` evicts seen-keys once the watermark
passes (unbounded ``dropDuplicates`` on a stream would grow state
forever), and windowed aggregates finalize + evict per watermark.  State
shards by key across executors like any shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Exact streaming dedup on ``keys`` with watermark-bounded state.

    A duplicate arriving within ``delay`` of the first occurrence is
    dropped; later than that it would re-emit (the price of bounded state —
    the standard trade at scale).
    """
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))


def windowed_type_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling — or, with ``slide``, hopping — event-time window counts
    per ``event_type`` with a late-data watermark: the streaming shape of
    the registry's ``events_hourly_stats`` / ``events_sliding_counts``
    batch queries (same grouping; windows finalize and evict as the
    watermark passes; a hopping event feeds window/slide groups)."""
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window, slide or window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )
