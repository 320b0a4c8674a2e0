"""Z-order (Morton-curve) data layout for multi-dimensional data skipping
([EXT] scale surface).

At 100 TB you cannot afford a scan that prunes on only ONE dimension: a
corpus laid out by time answers time-range probes well and user/tenant
probes not at all.  Interleaving the bits of two dimension keys into one
sort key (the classic Z-order curve, as shipped publicly by Delta Lake
``OPTIMIZE ZORDER BY`` and Databricks' liquid clustering) makes parquet
min/max zone maps selective on *both* dimensions at once: after
``repartitionByRange(zkey) + sortWithinPartitions(zkey)``, every file
covers a compact rectangle-ish region of (x, y) space, so file- and
row-group-level min/max statistics prune box predicates on either or both
dimensions.

Portability contract: the bit-spread is expressed in operator-only SQL —
shifts as multiplications by powers of two, ``&``/``|`` native in both
Spark SQL and DuckDB — so the IDENTICAL expression text runs on both
engines and the registry oracle pins the key math bit-for-bit
(``tests/test_zorder.py`` additionally fuzzes it against a Python
reference and measures the actual file-pruning win on written parquet).

Scale posture: the zkey is a per-row narrow projection (pure integer
expressions, no UDF, no shuffle of its own); the layout write is ONE
range-shuffle — the same cost any clustered write pays — and
``repartitionByRange`` samples the key distribution so skew in either
dimension degrades gracefully instead of hot-spotting a file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-dimension key width; zkey fits in 32 bits → BIGINT-safe

# 16-bit spread masks (0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)
_SPREAD_STEPS = (
    (256, 16711935),
    (16, 252645135),
    (4, 858993459),
    (2, 1431655765),
)


def spread16_sql(v: str) -> str:
    """SQL that spreads a 16-bit value's bits to even positions — shifts
    written as multiplications so the text is Spark-and-DuckDB portable.
    The BIGINT cast heads the chain: DuckDB would otherwise overflow INT32
    on the final doubling."""
    e = f"((CAST({v} AS BIGINT)) & 65535)"
    for mul, mask in _SPREAD_STEPS:
        e = f"((({e}) | (({e}) * {mul})) & {mask})"
    return e


def zkey_sql(x: str, y: str) -> str:
    """Morton key of two 16-bit dimension expressions: x on even bits, y on
    odd.  The odd-bit shift is ``* 2`` and the combine is ``+`` — safe
    because the two spreads occupy disjoint bit positions."""
    return f"({spread16_sql(x)} + ({spread16_sql(y)} * 2))"


def zkey(x: str, y: str) -> Column:
    """The Morton key as a Spark Column (same SQL text the oracle runs)."""
    return F.expr(zkey_sql(x, y))


def scaled16_sql(v: str, lo: str, hi: str, floordiv: str = "DIV") -> str:
    """Affine-normalize a dimension expression onto the full 16-bit
    keyspace: ``(v - lo) * 65535 floordiv (hi - lo)``.

    WITHOUT this step the wider-ranged dimension owns the curve's high
    bits and Z-order silently degenerates to a single-dimension sort
    (measured on the events table: minutes span 16 bits, user ids 8 — the
    raw-key layout pruned user probes not at all).  Delta's OPTIMIZE
    ZORDER normalizes via sampled range-partition ranks for the same
    reason; the affine form here is exact, oracle-reproducible, and right
    for roughly-uniform dimensions — for heavily skewed ones use
    ``normalization="rank"`` (``rank_scaled16_sql``), measured in
    tests/test_zorder.py.

    ``floordiv`` is the one dialect split: Spark spells integer floor
    division ``DIV``, DuckDB ``//`` (operands here are non-negative, where
    the two agree).  Degenerate spans (lo == hi) collapse to 0.
    """
    span = f"((CAST({hi} AS BIGINT)) - (CAST({lo} AS BIGINT)))"
    num = f"(((CAST({v} AS BIGINT)) - (CAST({lo} AS BIGINT))) * 65535)"
    return f"(CASE WHEN {span} <= 0 THEN 0 ELSE ({num}) {floordiv} ({span}) END)"


#: rank normalization resolution: quantile buckets per dimension.  256
#: buckets = 8 meaningful bits per dimension — ample for file-level
#: pruning (file count per layout is orders of magnitude below 256²),
#: while the boundary list stays a driver-side metadata constant.
RANK_BUCKETS = 256


def rank_scaled16_sql(v: str, boundaries: list) -> str:
    """Quantile-rank-normalize a dimension expression onto the 16-bit
    keyspace: ``bucket(v) * (65536 / B)`` where ``bucket(v)`` counts the
    sampled quantile boundaries strictly below *v* — the Delta-style
    sampled range-rank, for dimensions whose VALUE distribution is too
    skewed for the affine map (which sends a heavy-tailed dimension's
    dense mass to one or two cells, so probes on the dense region stop
    pruning; measured in tests/test_zorder.py).

    Operator-only SQL (a sum of CASE comparisons against literal
    boundaries), portable to DuckDB verbatim like the rest of the key
    math.  NULL *v* compares NULL against every boundary → every CASE
    takes the ELSE 0 branch → bucket 0 (zone-map stats ignore NULLs, so
    any placement is sound)."""
    if not boundaries:
        return "0"
    terms = " + ".join(
        f"(CASE WHEN (CAST({v} AS DOUBLE)) > {float(b)!r} THEN 1 ELSE 0 END)"
        for b in boundaries
    )
    step = 65536 // (len(boundaries) + 1)
    return f"((({terms})) * {step})"


def _rank_boundaries(df: DataFrame, col: str) -> list:
    """Deduplicated internal quantile boundaries for *col* — one
    approxQuantile sketch pass (driver traffic = ≤RANK_BUCKETS floats,
    the same metadata-constant policy as the affine min/max row)."""
    probs = [i / RANK_BUCKETS for i in range(1, RANK_BUCKETS)]
    qs = df.approxQuantile(col, probs, 0.001)
    out: list = []
    for q in qs:
        if not out or q > out[-1]:
            out.append(q)
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int,
    normalization: str = "affine",
) -> None:
    """Write *df* as parquet clustered on the Z-curve of (x, y): one
    range-shuffle on the interleaved key, sorted within each output file so
    row-group zone maps are tight on both dimensions.  The zkey itself is
    not persisted — it is a layout device, not data.

    ``normalization`` picks the per-dimension 16-bit map:

    * ``"affine"`` (default) — exact ``(v-lo)*65535 div (hi-lo)``; right
      for roughly-uniform dimensions, one 4-value metadata aggregate.
    * ``"rank"`` — sampled quantile range-rank (``rank_scaled16_sql``);
      right for heavily skewed dimensions, where affine sends the dense
      mass to a handful of cells and probes on it stop pruning.  One
      approxQuantile sketch pass per dimension, boundary lists are
      driver-side metadata constants.

    Either way the bounds/boundaries are metadata-sized driver traffic —
    the same policy as the prefix-sum family's bucket totals."""
    if normalization not in ("affine", "rank"):
        raise ValueError(f"unknown normalization {normalization!r}")
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(x), F.max(x), F.min(y), F.max(y)
    ).first()
    if lo_x is None or lo_y is None:
        # empty input (or an all-NULL dimension): no bounds exist —
        # interpolating None into the SQL would parse as a column named
        # `None`.  Write the (empty) frame as-is; the layout of nothing
        # is nothing.
        df.write.mode("overwrite").parquet(path)
        return
    if normalization == "rank":
        sx = rank_scaled16_sql(x, _rank_boundaries(df, x))
        sy = rank_scaled16_sql(y, _rank_boundaries(df, y))
    else:
        sx = scaled16_sql(x, str(lo_x), str(hi_x))
        sy = scaled16_sql(y, str(lo_y), str(hi_y))
    keyed = df.withColumn("__zkey", F.expr(zkey_sql(sx, sy)))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def candidate_files(path: str, bounds: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(files that survive min/max pruning, total files) for a box
    predicate ``{col: (lo, hi)}`` — read from parquet footer statistics via
    pyarrow, i.e. exactly the zone maps a distributed scan would consult.
    Test/diagnostic helper; the engine-side scan uses Spark's own parquet
    filter pushdown over the same statistics."""
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    hit = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        survives = True
        for col, (lo, hi) in bounds.items():
            idx = schema_names.index(col)
            fmin, fmax = None, None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is None or st.min is None or st.max is None:
                    # stats disabled / all-NULL chunk: a zone-map consumer
                    # must treat the file as a candidate (sound direction)
                    fmin, fmax = None, None
                    break
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            if fmin is not None and (fmax < lo or fmin > hi):
                survives = False
                break
        hit += survives
    return hit, len(files)
