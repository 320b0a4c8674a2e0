"""Repetition-based document quality rules ([EXT]): the Gopher-style
filters real corpus-cleaning pipelines apply before training — duplicate
line fractions and most-frequent-n-gram character fractions — as pure
Column expressions (zero Python, zero shuffles: per-row narrow work).

Rule definitions follow the published Gopher / MassiveText cleaning
heuristics (Rae et al. 2021, §A1.1) with the COUNTING CONVENTIONS of the
public reference implementations (e.g. DataTrove's
GopherRepetitionFilter): duplicates are occurrences BEYOND the first
(a line appearing twice contributes 1 duplicate, not 2), and character
fractions are over the document's text length, with the n-gram's
character span including its separators.  Exact thresholds are
caller-tunable; :func:`gopher_repetition_keep` bundles the published
defaults.

Implementation note — multiplicity via sorted-run folds: computing "the
most frequent element of an array" needs per-element counts, which would
be O(distinct·n) as a nested filter; sorting the array first makes every
multiplicity a RUN, so one left-to-right fold carrying (prev, run length,
best) computes max multiplicity — and, for duplicate counting, the
beyond-first occurrences and their characters — in O(n log n) per row
with O(1) fold state.  Equal strings have equal lengths, so char
accounting inside a run is exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import ngrams


def _nonempty_lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)


def duplicate_line_stats(text: Column) -> Column:
    """struct(n_lines, dup_lines, dup_chars): non-empty lines, the
    occurrences BEYOND THE FIRST of each repeated line (reference-
    implementation convention: a line appearing k times contributes k−1),
    and the characters those beyond-first occurrences hold.  A doc with
    every line unique scores 0/0."""
    lines = F.array_sort(_nonempty_lines(text))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("dup_lines"),
        F.lit(0).cast("long").alias("dup_chars"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"].eqNullSafe(x)
        inc = F.when(same, F.lit(1)).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            (acc["dup_lines"] + inc).alias("dup_lines"),
            (acc["dup_chars"] + inc.cast("long") * F.length(x)).alias("dup_chars"),
        )

    folded = F.aggregate(lines, init, step)
    return F.struct(
        F.size(lines).alias("n_lines"),
        folded["dup_lines"].alias("dup_lines"),
        folded["dup_chars"].alias("dup_chars"),
    )


def top_ngram_stats(toks: Column, n: int) -> Column:
    """struct(gram, count, chars): the most frequent n-gram (lowest
    lexicographic on count ties — deterministic), its multiplicity, and
    the total characters its occurrences span (count × gram string length
    INCLUDING separators — the reference accounting).  NULL gram / zeros
    when no n-grams exist.

    PERF: pass ``toks`` as a materialized column from a previous select —
    same caveat as :func:`functions.text.shingles` (higher-order functions
    get no codegen subexpression elimination, so an inline tokenize chain
    re-evaluates per gram position)."""
    grams = F.array_sort(ngrams(toks, n))
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(None).cast("string").alias("best"),
        F.lit(0).alias("best_run"),
    )

    def step(acc: Column, x: Column) -> Column:
        run2 = F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1))
        better = run2 > acc["best_run"]  # strict: first (lowest) gram wins ties
        return F.struct(
            x.alias("prev"),
            run2.alias("run"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
            F.when(better, run2).otherwise(acc["best_run"]).alias("best_run"),
        )

    folded = F.aggregate(grams, init, step)
    return F.struct(
        folded["best"].alias("gram"),
        folded["best_run"].alias("count"),
        F.coalesce(folded["best_run"] * F.length(folded["best"]), F.lit(0)).alias(
            "chars"
        ),
    )


def gopher_repetition_keep(
    text: Column,
    toks: Column,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
    max_top3gram_char_frac: float = 0.18,
) -> Column:
    """Boolean keep predicate from the published Gopher repetition rules:
    reject when too many lines are duplicates (by beyond-first line count
    or by their character mass over text length) or when a single 2-/3-
    gram's occurrences span too much of the text's characters.  Documents
    too short to evaluate a rule pass that rule (no lines → no duplicate
    lines; no repeated n-gram → no dominant n-gram), matching the
    published treatment of degenerate cases.

    PERF: pass ``toks`` as a materialized column (see
    :func:`top_ngram_stats`)."""
    ls = duplicate_line_stats(text)
    n_chars = F.length(text)
    g2 = top_ngram_stats(toks, 2)
    g3 = top_ngram_stats(toks, 3)
    line_ok = (ls["n_lines"] == 0) | (
        (ls["dup_lines"] <= F.lit(max_dup_line_frac) * ls["n_lines"])
        & (ls["dup_chars"] <= F.lit(max_dup_line_char_frac) * n_chars)
    )
    g2_ok = (g2["count"] <= 1) | (
        g2["chars"] <= F.lit(max_top2gram_char_frac) * n_chars
    )
    g3_ok = (g3["count"] <= 1) | (
        g3["chars"] <= F.lit(max_top3gram_char_frac) * n_chars
    )
    return line_ok & g2_ok & g3_ok
