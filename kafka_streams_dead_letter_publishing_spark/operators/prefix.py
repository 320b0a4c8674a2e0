"""Distributed two-phase prefix-sum ([EXT]): exact running totals over a
corpus-wide order WITHOUT the naive global window's ``Exchange
SinglePartition`` (every row through one task — the classic scale
killer).

The contract: the caller supplies a bucket column that is a PREFIX of
the intended order (order by ``order_col`` == order by ``(bucket,
order_col)``; e.g. a hash prefix for hash order, ``id // bucket_size``
for id order).  Then:

1. one hash-aggregate computes per-(group, bucket) value sums — #groups
   × #buckets metadata rows collected to the driver (bounded by config,
   not by data: the same k×1 collect class as the k-means centroids);
2. the driver prefix-sums each group's bucket totals into per-bucket
   OFFSETS, broadcast back;
3. one window partitioned by (group, bucket) finishes the exact
   within-bucket running sums in parallel; offset + within-bucket sum
   == the global running sum.

Consumers: ``operators/budget.py`` (token-budget sampling / mixtures,
hash order) and ``operators/packing.py`` (corpus-order sequence packing,
id order).  ``SinglePartition``-free plans are pinned by their tests.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_running_sum(
    staged: DataFrame,
    value_col: str,
    order_col: str,
    bucket_col: str,
    group_cols: Sequence[str] = (),
    out_col: str = "_running",
    extra_offset_cols: dict[str, Callable[[object], int]] | None = None,
) -> DataFrame | None:
    """Add ``out_col`` = the INCLUSIVE running sum of ``value_col`` over
    rows ordered by ``(group, order_col)``, computed bucket-parallel.

    ``extra_offset_cols`` maps extra column names to a callable
    ``group_key -> value`` evaluated per group on the driver and carried
    onto every row of that group through the broadcast offset frame
    (how the budget sampler ships per-group budgets without a second
    join).  Groups whose key is NULL are dropped (no offset row can name
    them).  Returns None when the input has no rows (no buckets exist —
    callers produce their typed empty frame)."""
    spark = staged.sparkSession
    gcols = list(group_cols)
    # NULL values count as 0 (SQL SUM would yield a NULL bucket sum when a
    # bucket holds only NULL-valued rows, crashing the driver prefix)
    val = F.coalesce(F.col(value_col).cast("long"), F.lit(0))
    bucket_sums = staged.groupBy(*gcols, bucket_col).agg(
        F.sum(val).cast("long").alias("_bs")
    ).collect()

    by_group: dict[object, list] = {}
    for r in bucket_sums:
        g = tuple(r[c] for c in gcols) if gcols else ()
        if gcols and any(v is None for v in g):
            continue
        by_group.setdefault(g, []).append(r)
    extra = extra_offset_cols or {}
    offsets = []
    for g, rs in by_group.items():
        run = 0
        extras = tuple(fn(g[0] if len(g) == 1 else g) for fn in extra.values())
        for r in sorted(rs, key=lambda r: r[bucket_col]):
            offsets.append(g + (r[bucket_col], run) + extras)
            run += r["_bs"] or 0
    if not offsets:
        return None
    bucket_field = staged.schema[bucket_col]
    group_schema = "".join(
        f"{c} {staged.schema[c].dataType.simpleString()}, " for c in gcols
    )
    extra_schema = "".join(f", {name} long" for name in extra)
    off_df = spark.createDataFrame(
        offsets,
        f"{group_schema}{bucket_col} {bucket_field.dataType.simpleString()},"
        f" _off long{extra_schema}",
    )
    # explicit ROWS frame: the default RANGE frame sums over order-key
    # PEERS, so two rows tied on order_col (an at-least-once redelivery
    # duplicating an id within one batch) would each absorb the other's
    # value — every row must count exactly once, in some deterministic-
    # enough order among ties
    w = (
        Window.partitionBy(*gcols, bucket_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return staged.join(F.broadcast(off_df), gcols + [bucket_col]).withColumn(
        out_col, F.col("_off") + F.sum(val).over(w)
    )
