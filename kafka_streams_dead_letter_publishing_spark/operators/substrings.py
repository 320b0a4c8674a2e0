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


def remove_dup_spans(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """The Lee-et-al dedup ACTION at k-gram granularity: every token
    position covered by a duplicated window that is NOT the gram's
    corpus-wide first occurrence (lowest (doc, pos)) is removed, and the
    document is rebuilt from the surviving tokens.  Exactly one copy of
    every shared span survives, at its first occurrence — the line-dedup
    contract applied to token windows.

    Returns (id, n_tokens, n_removed, new_text) per input document.

    Plan shape: winners + occurrence counts come from ONE
    ``groupBy(fp).agg(min(struct(doc,pos)), count)`` partial-agg hash
    aggregate (never a window); the join-back is AQE-skew-splittable; the
    per-doc coverage union is array arithmetic inside a per-doc
    aggregate, bounded by document length."""
    grams = docs.select(
        id_col, F.posexplode(ngrams(F.col(toks_col), k)).alias("pos0", "gram")
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),  # 1-based token position
        F.md5("gram").alias("fp"),
    )
    winners = grams.groupBy("fp").agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
        ).alias("_w"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    dup_windows = (
        grams.join(winners, "fp")
        .filter(
            (F.col("n_occ") > 1)
            & ~(
                (F.col(id_col) == F.col("_w.i"))
                & (F.col("pos") == F.col("_w.p"))
            )
        )
        .select(id_col, "pos")
    )
    coverage = dup_windows.groupBy(id_col).agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.sequence(F.col("pos"), F.col("pos") + (k - 1)))
                )
            )
        ).alias("_cov")
    )
    toks = F.col(toks_col)
    cov = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    kept = F.filter(
        toks, lambda x, i: ~F.array_contains(cov, (i + 1).cast("int"))
    )
    return (
        docs.join(coverage, id_col, "left")
        .select(
            id_col,
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.coalesce(F.col("_cov"), F.array().cast("array<int>")))
            .cast("long")
            .alias("n_removed"),
            F.concat_ws(" ", kept).alias("new_text"),
        )
    )
