"""Stream-stream watermarked joins ([EXT]): the streaming twins of the
batch interval join (``events_interval_self_join``) and the bounded-
staleness as-of join (``events_asof_left_tolerance``'s tolerance
semantics, ``operators/asof.py``).

The reference app is stateless per-record (no joins at all —
/root/reference/src/main, 326 LoC); this module is part of the driver-
mandated [EXT] streaming surface: a 100 TB event pipeline almost always
attributes one stream against another (clicks→impressions,
purchases→clicks) while both sides keep flowing.

Why as-of needs a HORIZON to stream: the batch as-of join matches each
left row to the latest right row at-or-before it — over an UNBOUNDED
past.  A streaming join can only keep watermark-bounded state, so the
streamable form is as-of with a max-staleness bound (``tolerance``):
match within ``[left_ts − tolerance, left_ts]``.  That is exactly the
batch operator's ``tolerance`` semantics (operators/asof.py: since the
as-of match is the LATEST eligible right row, a stale match means no
earlier row could qualify either), so the streaming and batch forms are
equal row-for-row wherever the watermark has passed — pinned across
multi-batch placement in tests/test_streaming_ext.py.

Execution shape (Spark's chained-stateful-operator support): a
time-interval stream-stream INNER join (state on both sides bounded by
watermark + the interval condition) followed by a streaming MAX
aggregation per left row, grouped on the left row's full column set
(which includes its event-time column, so append mode finalizes each
group when the watermark passes it).  ``max(struct(right_ts, payload))``
picks the latest right row with the SAME deterministic tie-break as the
batch operator: at equal timestamps the largest payload struct wins
(the window ordering there is total; the lexicographic struct max here
is the same total order).

Scale posture: the join is an equi-join on the key with a range
residual — one shuffle per side, state per key bounded by
``tolerance + watermark delay`` of data, never the full history; the
aggregation state holds one (left row → current best) entry per
in-flight left row and evicts on watermark.  No windows, no cartesian
products, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BEST = "__best"


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str = "INTERVAL 0 SECOND",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pairs with
    ``left_ts − lower <= right_ts <= left_ts + upper`` per key — the
    streaming form of the batch range join.  Both inputs must already
    carry ``withWatermark`` (state on each side is evicted once the
    other side's watermark passes the interval bound).  Right's key
    columns are dropped from the output (they equal left's — NULL on
    an unmatched outer row).  ``how``: ``inner`` or ``leftOuter`` (an
    outer row emits once the watermark proves no match can arrive).
    """
    on = list(on)
    r = right
    for k in on:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = F.lit(True)
    for k in on:
        cond = cond & (left[k] == r[f"__r_{k}"])
    # the range bounds reference the LEFT frame explicitly: a bare
    # F.expr(f"{left_ts} - {lower}") resolves the timestamp by name
    # against the JOINED plan, so a right-side non-key column sharing
    # left_ts's name would be ambiguous or silently mis-bound (only key
    # columns are renamed on the right — r13 ADVICE)
    cond = (
        cond
        & (r[right_ts] >= left[left_ts] - F.expr(lower))
        & (r[right_ts] <= left[left_ts] + F.expr(upper))
    )
    return left.join(r, cond, how).drop(*[f"__r_{k}" for k in on])


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tolerance: str,
    how: str = "inner",
) -> DataFrame:
    """Streaming as-of join with a max-staleness bound: every left row
    matched to the LATEST right row in ``[left_ts − tolerance,
    left_ts]`` for the same key.  ``how="inner"`` drops unmatched left
    rows; ``how="left"`` keeps them with NULL payload — a LEFT-OUTER
    interval join emits the unmatched left row (with NULL right side)
    only once the watermark proves no match can still arrive, and in the
    aggregation that lone null-field struct loses the max to any real
    match, so the batch operator's ``how`` semantics carry over exactly
    (a stale-only match is identical to no match on both paths: stale
    rows never satisfy the interval condition here, and the batch
    operator nulls them by the tolerance CASE).

    Equal row-for-row to ``operators.asof.as_of_join(..., how="inner",
    tolerance=...)`` on the same data wherever the watermark has passed
    (test-pinned across multi-batch arrival, including a late-but-
    in-watermark right row landing in a later micro-batch).

    Requirements: both inputs carry ``withWatermark`` on their ts
    columns; left rows are unique as full tuples (they carry an id —
    the aggregation groups on left's full column set); payload names
    don't collide with left's columns (the batch operator's contract).
    Emission is append-mode: a left row's match is final — and emitted —
    once the watermark passes its timestamp, because a later right row
    inside the tolerance window could otherwise still improve the match.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(f"payload/left column collision: {sorted(collisions)}")
    left_cols = list(left.columns)
    joined = stream_interval_join(
        left,
        right,
        on=on,
        left_ts=left_ts,
        right_ts=right_ts,
        lower=tolerance,
        how="inner" if how == "inner" else "leftOuter",
    )
    # latest right row per left row; ties at equal right_ts broken by the
    # largest payload struct — the same total order as the batch window's
    # (ts, payload) descending sort
    best = F.max(F.struct(F.col(right_ts), *[F.col(p) for p in right_payload if p != right_ts]))
    out = joined.groupBy(*left_cols).agg(best.alias(_BEST))
    pay = [
        F.col(f"{_BEST}.{p}").alias(p) if p != right_ts else F.col(f"{_BEST}.{right_ts}").alias(p)
        for p in right_payload
    ]
    return out.select(*left_cols, *pay)
