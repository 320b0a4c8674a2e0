"""Tokenizer vocabulary construction at corpus scale ([EXT]): global term
frequencies plus CONTIGUOUS token-id assignment (1..V, most-frequent
first) — the id table every tokenizer ships — without the naive
``row_number() OVER (ORDER BY freq DESC)``'s Exchange SinglePartition
(the whole vocabulary through one task).

Id assignment is a dense global rank, i.e. a running COUNT over the order
``(freq DESC, term)`` — exactly the distributed two-phase prefix-sum shape
(`operators/prefix.py`): bucket terms by frequency band, prefix-sum the
per-band counts on the driver (#bands metadata rows, bounded by
``max_freq / bucket_width`` — Zipfian term counts make high-frequency
bands sparse and low-frequency bands few), then finish with
band-partitioned windows.  The band column ``-(freq DIV width)`` is a
monotone prefix of the order key ``struct(-freq, term)``, which is what
the prefix-sum contract requires.

The term-count aggregation itself is the canonical explode + partial-agg
count — map-side combinable, no skew (terms hash-spread).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import (
    norm_text,
    tokens,
)
from kafka_streams_dead_letter_publishing_spark.operators.prefix import (
    bucketed_running_sum,
)

DEFAULT_BAND_WIDTH = 1024  # frequency band per driver prefix row


def term_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Global (term, freq) over the corpus — explode + partial-agg count."""
    staged = docs.select(tokens(norm_text(F.col(text_col))).alias("toks"))
    return (
        staged.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def assign_ids(counts: DataFrame, band_width: int = DEFAULT_BAND_WIDTH) -> DataFrame:
    """(term, freq, token_id): contiguous ids 1..V ordered by
    ``(freq DESC, term)``, computed band-parallel — no SinglePartition
    window.  Empty input yields an empty typed frame."""
    staged = (
        counts.withColumn("_band", F.expr(f"-(freq DIV {band_width})"))
        .withColumn("_ord", F.struct((-F.col("freq")).alias("nf"), F.col("term")))
        .withColumn("_one", F.lit(1))
    )
    ranked = bucketed_running_sum(
        staged,
        value_col="_one",
        order_col="_ord",
        bucket_col="_band",
        out_col="token_id",
    )
    if ranked is None:
        return counts.sparkSession.createDataFrame(
            [], "term string, freq bigint, token_id bigint"
        )
    return ranked.select(
        "term", F.col("freq").cast("long").alias("freq"), F.col("token_id")
    )


def vocab_ids(
    docs: DataFrame,
    text_col: str = "text",
    band_width: int = DEFAULT_BAND_WIDTH,
) -> DataFrame:
    """The vocabulary table: every distinct term with its corpus frequency
    and contiguous token id (1 = most frequent; ties broken by term)."""
    return assign_ids(term_counts(docs, text_col), band_width)
