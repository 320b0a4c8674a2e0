"""Exact-substring duplication signal at k-gram granularity ([EXT];
published method: Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better" — their ExactSubstr dedup finds 50-token spans
shared verbatim across documents via a corpus suffix array).

A distributed suffix array is the wrong tool on Spark; the k-gram
approximation is the standard one (same granularity the decontamination
family uses): slide a k-token window over every document WITH
multiplicity and positions, fingerprint each window, and a position is
DUPLICATED iff its fingerprint occurs more than once corpus-wide — i.e.
the span is shared verbatim with another document (or repeated within
this one; both are the redundancy the method measures).

Scale shape — the line-dedup posture applied to token windows:

* per-gram fingerprints are fixed-width md5 (raw gram text never enters
  the aggregation shuffle);
* the occurrence count is ``groupBy(fp).count`` — a hash aggregate whose
  map-side PARTIAL step collapses a boilerplate gram's occurrences per
  task before the shuffle (never a window);
* the count join-back is skewed on exactly those boilerplate grams but is
  a JOIN — AQE skew-splittable;
* the per-doc rollup is another partial-agg hash aggregate.

The gram explosion is the dominant cost: ~n_tokens rows per doc.  That is
the method's honest price (the suffix array pays it too, as O(corpus)
suffix entries) and it is embarrassingly parallel; k itself only affects
bytes per row, not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import ngrams


def dup_ngram_stats(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """(id, n_grams, n_dup_grams) per document: total k-gram window
    positions, and how many of them hold a gram that occurs more than
    once corpus-wide.  Documents shorter than *k* tokens yield zero
    grams and are emitted with (0, 0) — every input doc gets a row.

    ``toks_col`` must be a MATERIALIZED token-array column (the
    functions/text.py higher-order-function contract)."""
    grams = docs.select(
        id_col, F.explode(ngrams(F.col(toks_col), k)).alias("gram")
    ).select(id_col, F.md5("gram").alias("fp"))
    counts = grams.groupBy("fp").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        grams.join(counts, "fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("n_occ") > 1).cast("long"))
            .cast("long")
            .alias("n_dup_grams"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0))
            .cast("long")
            .alias("n_dup_grams"),
        )
    )
