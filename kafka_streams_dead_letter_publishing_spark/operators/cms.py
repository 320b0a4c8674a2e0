"""Count-min sketch ([EXT]): fixed-size frequency summaries for heavy-
hitter queries over unbounded key domains — "how often has this key
appeared, within epsilon" without a per-key counter table.

The reference app has no counterpart (stateless per-record topology);
this is part of the driver-mandated [EXT] analytics surface, and the
second member of the sketch family next to HLL (events_approx_distinct)
and Bloom (operators/bloom.py).  Public method: Cormode & Muthukrishnan
2005 — d hash rows x w counters; estimate(key) = min over rows of the
counter the key hashes to.  Never underestimates; overestimates by at
most eps*N with probability 1-delta for w = ceil(e/eps), d = ceil(ln
1/delta).

Unlike HLL (whose register layout is engine-specific, leaving
events_approx_distinct_users rows-only), a CMS is a pure integer
function of the input multiset given fixed hash functions — so the
DuckDB oracle replays the whole sketch bit-for-bit and the registry row
is hash-green.

Spark-first layout
------------------
* **build**: explode each row into its d (row_j, col_j) cells →
  ``groupBy(j, col).count()`` — map-side partial aggregation collapses
  hot keys per partition; the shuffle carries at most d*w pre-summed
  cells per partition, NOT per-event traffic.  The sketch table is at
  most d*w rows — metadata-sized by construction (a config knob,
  independent of stream length), mergeable across batches by cell-wise
  SUM (associative, same incremental story as bloom_merge).
* **estimate**: probe keys explode into their d cells → equi-join the
  sketch on (j, col) → ``min(cnt)`` per key.  The sketch side is
  broadcast-sized; probe traffic is d rows per key.

Hashing: col_j(key) = ``conv(substring(md5(key || '#' || j), 1, 15),
16, 10) % w`` — the same 60-bit md5 parse the Bloom filter pins for
cross-engine parity ('#' salt decorrelates the two sketch families).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 512
DEFAULT_DEPTH = 4


def _cell(key: Column, row: int, width: int) -> Column:
    h = F.md5(F.concat(key.cast("string"), F.lit(f"#{row}")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % F.lit(width)
    ).cast("bigint")


def _cells(df: DataFrame, key_col: str, depth: int, width: int) -> DataFrame:
    """One row per (input row, sketch row j): ``(.., j, col)``."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"), _cell(F.col(key_col), j, width).alias("col")
                )
                for j in range(1, depth + 1)
            ]
        )
    ).alias("cell")
    return df.select(key_col, pairs).select(
        key_col, F.col("cell.j").alias("j"), F.col("cell.col").alias("col")
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """The sketch: ``(j, col, cnt)`` — at most depth*width rows."""
    return (
        _cells(df, key_col, depth, width)
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built over different batches."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    probe: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    est_col: str = "est_count",
) -> DataFrame:
    """Per distinct probe key: ``(key, est_count)`` = min over the d
    counters.  A key whose cell was never touched reads 0 via the left
    join's NULL."""
    cells = _cells(probe.select(key_col).distinct(), key_col, depth, width)
    joined = cells.join(sketch, ["j", "col"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col)
    )
