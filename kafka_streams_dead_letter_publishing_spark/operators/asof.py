"""As-of join — an operator Spark's DataFrame API lacks (the brief's
canonical example of a custom operator), built as a composition of
built-ins: union + last-ignore-nulls window, no UDF.

Semantics (matching DuckDB's native ``ASOF JOIN``, which serves as the
oracle): for every left row, attach the single right row with the LARGEST
``right_ts <= left_ts`` for the same key.  ``how="inner"`` drops left rows
with no such right row; ``how="left"`` keeps them with NULL payload.  A
``tolerance`` bound additionally requires ``left_ts - right_ts <=
tolerance`` — and because the as-of match is already the LATEST eligible
right row, a stale match means no earlier row could qualify either, so
staleness simply nulls/drops the match (exactly DuckDB ``ASOF LEFT JOIN``
+ a staleness CASE).

Distributed shape: one shuffle on the key (the window partition); within
each partition a single ordered pass carries the latest right payload
forward — O(n log n) for the sort, no self-join, no range explosion.  At
100 TB this is the standard event-attribution join (each side can be
petabyte-scale; only the per-key timeline must fit a window partition).

Tie rules: a right row at exactly ``left_ts`` matches (``>=``), implemented
by ordering right rows before left rows at equal timestamps.  Multiple
right rows at the SAME (key, ts) are tie-broken deterministically by their
payload struct (largest wins) — the window ordering is total, so repeated
runs can't flip the winner (r2 advice fix; DuckDB's native ASOF picks
arbitrarily, but the test corpora carry no tied rows).  Consequence: the
payload columns must be ORDERABLE types (no map<..> payloads — Spark
cannot sort a struct containing one; wrap such a column in a keyed
projection first).

NULL semantics (r6, matching the SQL oracle exactly): right rows with a
NULL timestamp or any NULL join key are dropped up front — ``right_ts <=
left_ts`` is never true for NULL, and ASOF's equi-key never matches on
NULL = NULL.  Left rows always follow ``how`` (a NULL-ts or NULL-key left
row simply has no match).  Without the filter, ascending NULLS-FIRST
ordering would carry a NULL-ts right payload into every early left row —
a fabricated match the oracle never produces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__ts", "__side", "__pay", "__match")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    how: str = "inner",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: left rows + the latest right payload at-or-before each
    left timestamp, per key.

    Parameters
    ----------
    how:
        ``"inner"`` (drop unmatched lefts) or ``"left"`` (keep them with
        NULL payload columns).
    tolerance:
        optional SQL interval expression (e.g. ``"INTERVAL 2 HOUR"``):
        a match older than ``left_ts - tolerance`` does not count.

    Returns all ``left`` columns plus ``right_payload`` columns (right's
    timestamp can be included in the payload if wanted).  Payload names
    must not collide with left column names.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    collisions = set(right_payload) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_payload names collide with left columns: {sorted(collisions)}; "
            "alias the right-side columns before joining"
        )
    for df, side in ((left, "left"), (right, "right")):
        bad = set(_RESERVED) & set(df.columns)
        if bad:
            raise ValueError(f"{side} side uses reserved column names {sorted(bad)}")

    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    # the matched right's own timestamp rides along for the tolerance check,
    # even when the caller's payload doesn't include it
    pay = F.struct(F.col(right_ts).alias("__rts"), payload_struct.alias("__data"))

    # NULL-ts / NULL-key right rows can never be an as-of match (SQL
    # comparison and equi-key semantics) — and unfiltered they WOULD match:
    # ascending NULLS FIRST sorts them before every real row, so the
    # ignorenulls carry would hand their payload to early left rows
    match_eligible = F.col(right_ts).isNotNull()
    for k in on:
        match_eligible = match_eligible & F.col(k).isNotNull()
    right = right.filter(match_eligible)

    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # rights sort BEFORE lefts at equal ts (>= semantics)
        pay.alias("__pay"),
    )
    left_cols = [c for c in left.columns]
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_right.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    # align schemas: right side lacks the left columns (ONE projection — a
    # withColumn-per-column loop builds O(n²) nested plan analysis on wide
    # left frames)
    tagged_right = tagged_right.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left_cols
        ],
    )

    unioned = tagged_left.unionByName(tagged_right)
    # __pay as the final sort key makes the ordering TOTAL for right rows:
    # among rights tied on (key, ts) the largest payload struct wins,
    # deterministically (left rows all carry NULL __pay and are already
    # uniquely placed by __side)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__pay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__pay", ignorenulls=True).over(w))

    if tolerance is not None:
        fresh = F.col("__match.__rts") >= F.col("__ts") - F.expr(tolerance)
    else:
        fresh = F.lit(True)
    match = F.when(F.col("__match").isNotNull() & fresh, F.col("__match"))
    carried = carried.withColumn("__match", match)

    out = carried.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col("__match")["__data"][c].alias(c) for c in right_payload],
    )
