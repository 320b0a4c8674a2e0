"""Hot-key occupancy guard ([EXT]) — THE shared implementation.

LSH-style candidate indexes are only skew-free for uncorrelated data: a
boilerplate phrase (minhash bands) or a dense vector cluster (sign-LSH
buckets) can put far more rows into one bucket than the random model
predicts, and that bucket's pair join is quadratic in its size.  Dropping
over-full keys bounds every bucket's join at the price of a documented
recall sliver (rows reachable ONLY through dropped keys lose those
candidates; near-dups normally stay reachable through their other keys).

One definition, used by ``build_neardup_index`` / ``build_ann_index`` and
the ingest pipelines' per-batch store reads — the guard's semantics
(strictly-greater comparison, row-occurrence counting) must never drift
between call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_hot_keys(
    keyed: DataFrame, max_occupancy: int | None, key_col: str = "bk"
) -> DataFrame:
    """Rows of ``keyed`` whose ``key_col`` bucket holds at most
    ``max_occupancy`` rows (None = no cap).  The hot-key set is tiny by
    construction (≤ n_rows/cap entries), so it broadcasts into an
    anti-join."""
    if max_occupancy is None:
        return keyed
    hot = (
        keyed.groupBy(key_col)
        .count()
        .filter(F.col("count") > max_occupancy)
        .select(key_col)
    )
    return keyed.join(F.broadcast(hot), key_col, "left_anti")
