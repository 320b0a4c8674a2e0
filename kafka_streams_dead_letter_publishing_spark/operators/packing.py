"""Global cross-document sequence packing ([EXT]): concatenate the whole
corpus's token stream in doc-id order and cut it into fixed-size training
sequences that CROSS document boundaries — the packing step an LLM
pretraining pipeline runs after cleaning ("fill every 2048-token sequence
completely; a sequence may hold several small docs, a large doc may span
several sequences").

Output is the segment map: one row per (sequence, document) overlap with
the document's global token offset and how many of its tokens land in
that sequence — exactly what a downstream loader needs to materialize
sequences without ever building the global concatenation.

Scale posture — same distributed two-phase prefix-sum as
``operators/budget.py`` (which orders by a HASH for uniform sampling;
packing orders by ``id`` for corpus order):

1. bucket docs by ``id // bucket_size`` (id order == (bucket, id) order);
2. one aggregate computes per-bucket token sums — #buckets metadata rows
   to the driver (data-size-independent: grows as corpus_rows /
   bucket_size, tune ``bucket_size`` to keep it in the thousands);
3. driver prefix-sums bucket totals into offsets, broadcast back;
4. bucket-partitioned windows finish the exact per-doc global offset —
   never the naive global-order window's Exchange SinglePartition;
5. each doc explodes to the sequences its token range [offset,
   offset+n) intersects: floor(offset/S) … floor((offset+n-1)/S) —
   narrow row-local arithmetic, one output row per overlap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.prefix import (
    bucketed_running_sum,
)


def _floor_div(id_col: str, divisor: int) -> Column:
    """Exact integer floor division for the bucket key — all-integer
    arithmetic, so ids above 2⁵³ keep exact buckets (float division
    double-rounds there) and negative ids get true floor buckets (integer
    ``DIV`` truncates toward zero, which makes bucket 0 twice as wide and
    stays merely *monotone*; floor keeps every bucket exactly
    ``divisor`` ids wide).  ``x - pmod(x, d)`` is the largest multiple of
    ``d`` ≤ x, and dividing an exact multiple with ``DIV`` is exact.  Out
    of contract: ids within ``divisor`` of the int64 minimum (the rounded
    multiple would underflow)."""
    x = f"CAST(`{id_col}` AS BIGINT)"
    d = int(divisor)
    return F.expr(f"({x} - pmod({x}, {d})) DIV {d}")


def pack_corpus_segments(
    docs: DataFrame,
    n_tokens_col: str,
    seq_len: int,
    id_col: str = "doc_id",
    bucket_size: int = 1024,
) -> DataFrame:
    """Segment map of the corpus-order token stream cut into
    ``seq_len``-token sequences: columns ``(seq_id, id_col, tok_start,
    n_toks)`` where ``tok_start`` is the segment's GLOBAL token offset
    and ``n_toks`` how many tokens of this doc fall in ``seq_id``.
    Zero-token docs contribute no segments.  The final sequence is the
    only one that may be short."""
    if seq_len <= 0:
        raise ValueError(f"need seq_len > 0, got {seq_len}")
    staged = docs.withColumn("_bk", _floor_div(id_col, int(bucket_size)))
    res = bucketed_running_sum(
        staged, n_tokens_col, order_col=id_col, bucket_col="_bk", out_col="_run"
    )
    if res is None:
        return docs.select(
            F.lit(None).cast("long").alias("seq_id"),
            id_col,
            F.lit(None).cast("long").alias("tok_start"),
            F.lit(None).cast("long").alias("n_toks"),
        ).limit(0)
    n = F.col(n_tokens_col).cast("long")
    s = F.lit(int(seq_len))
    # exclusive prefix: tokens BEFORE this doc = inclusive running - own n
    with_off = res.withColumn("_doc_off", F.col("_run") - n).filter(n > 0)
    seg = with_off.select(
        id_col,
        "_doc_off",
        n.alias("_n"),
        F.explode(
            F.sequence(
                F.floor(F.col("_doc_off") / s),
                F.floor((F.col("_doc_off") + n - 1) / s),
            )
        ).alias("seq_id"),
    )
    tok_start = F.greatest(F.col("_doc_off"), F.col("seq_id") * s)
    seg_end = F.least(F.col("_doc_off") + F.col("_n"), (F.col("seq_id") + 1) * s)
    return seg.select(
        "seq_id",
        id_col,
        tok_start.alias("tok_start"),
        (seg_end - tok_start).alias("n_toks"),
    )
