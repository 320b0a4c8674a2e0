"""Corpus-wide exact line dedup core ([EXT]) — THE shared first-occurrence
plan (C4/RefinedWeb-style boilerplate removal; no reference counterpart —
the reference is a stateless per-record Kafka Streams app).

Scale posture (the r7→r8 de-skew): boilerplate lines are BY DEFINITION the
hot keys of this workload — "subscribe to our newsletter" can appear in
billions of documents, and blank lines appear everywhere.  The plan
therefore must never funnel all occurrences of one line through a single
task:

* blank lines are kept unconditionally and NEVER enter any shuffle — they
  are split off before the first exchange;
* the first occurrence of each non-blank line comes from
  ``groupBy(line).agg(min(struct(id, pos)))`` — a hash aggregate whose
  map-side PARTIAL step collapses every task's occurrences of a hot line
  to one row before the shuffle (a ``Window.partitionBy(line)`` +
  ``row_number`` cannot partial-aggregate: every occurrence lands in one
  task's sort — the shape this module replaces);
* the winner join-back is still keyed on the line value, but it is a
  JOIN, which AQE's skew-join splitting handles at runtime (the broadcast
  winner side is duplicated across the split partitions); a window has no
  such rescue.

Plan + behavior gates live in ``tests/test_plans.py`` (no Window operator;
partial aggregation present; a line planted in half the corpus still
yields exactly one keeper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_line_first_occurrence(
    lines: DataFrame,
    line_col: str = "line",
    id_col: str = "doc_id",
    pos_col: str = "pos",
    blank_col: str | None = None,
    seen: DataFrame | None = None,
    keep_col: str = "keep",
) -> DataFrame:
    """Add ``keep_col`` to a ``(id, pos, line)`` frame: blank lines are
    always kept; a non-blank line is kept iff this ``(id, pos)`` is its
    corpus-wide first occurrence (lowest ``(id, pos)``) AND its key is not
    in ``seen``.

    ``blank_col`` optionally names a precomputed boolean column (callers
    that dedup on a fingerprint of the line pass one — blankness is not
    derivable from a hash); otherwise blankness is ``trim(line) = ''``
    (NULL lines count as blank: always kept, never shuffled).

    ``seen`` is an optional one-column frame of already-seen ``line_col``
    keys (an ingest pipeline's growing line-fingerprint store); non-blank
    lines present in it are never kept.
    """
    if blank_col is None:
        blank = F.coalesce(F.length(F.trim(F.col(line_col))) == 0, F.lit(True))
    else:
        blank = F.coalesce(F.col(blank_col), F.lit(True))

    nonblank = lines.filter(~blank)
    winners = nonblank.groupBy(line_col).agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col(pos_col).alias("p"))
        ).alias("_w")
    )
    flagged = (
        nonblank.join(winners, line_col)
        .withColumn(
            keep_col,
            (F.col(id_col) == F.col("_w.i")) & (F.col(pos_col) == F.col("_w.p")),
        )
        .drop("_w")
    )
    if seen is not None:
        seen_keys = (
            seen.select(F.col(seen.columns[0]).alias(line_col))
            .distinct()
            .withColumn("_seen", F.lit(True))
        )
        flagged = (
            flagged.join(seen_keys, line_col, "left")
            .withColumn(keep_col, F.col(keep_col) & F.col("_seen").isNull())
            .drop("_seen")
        )
    blanks = lines.filter(blank).withColumn(keep_col, F.lit(True))
    return flagged.unionByName(blanks)
