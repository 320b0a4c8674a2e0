"""As-of join — an operator Spark's DataFrame API lacks (the brief's
canonical example of a custom operator), built as a composition of
built-ins: union + last-ignore-nulls window, no UDF.

Semantics (matching DuckDB's native ``ASOF JOIN``, which serves as the
oracle): for every left row, attach the single right row with the LARGEST
``right_ts <= left_ts`` for the same key; left rows with no earlier right
row are dropped (inner as-of).

Distributed shape: one shuffle on the key (the window partition); within
each partition a single ordered pass carries the latest right payload
forward — O(n log n) for the sort, no self-join, no range explosion.  At
100 TB this is the standard event-attribution join (each side can be
petabyte-scale; only the per-key timeline must fit a window partition).

Tie rule: a right row at exactly ``left_ts`` matches (``>=``), implemented
by ordering right rows before left rows at equal timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """Inner as-of join: left rows + the latest right payload at-or-before
    each left timestamp, per key.

    Returns all ``left`` columns plus ``right_payload`` columns (right's
    timestamp can be included in the payload if wanted).
    """
    on = list(on)
    payload_struct = F.struct(*[F.col(c) for c in right_payload])

    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # rights sort BEFORE lefts at equal ts (>= semantics)
        payload_struct.alias("__payload"),
    )
    left_cols = [c for c in left.columns]
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_right.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    # align schemas: right side lacks the left columns
    for c in left_cols:
        tagged_right = tagged_right.withColumn(f"__l_{c}", F.lit(None).cast(left.schema[c].dataType))

    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    return (
        carried.filter((F.col("__side") == 1) & F.col("__match").isNotNull())
        .select(
            *[F.col(f"__l_{c}").alias(c) for c in left_cols],
            *[F.col("__match")[c].alias(c) for c in right_payload],
        )
    )
