"""Exact-substring dup signal (operators/substrings.py): hand-computed
ground truth incl. within-doc repeats and short docs, plan shape (no
window, partial aggregation, fixed-width keys), registry-row sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import norm_text, tokens
from kafka_streams_dead_letter_publishing_spark.operators.substrings import (
    dup_ngram_stats,
)


def _staged(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select("doc_id", tokens(norm_text(F.col("text"))).alias("toks"))


def test_hand_computed_ground_truth(spark):
    rows = [
        (1, "a b c d e"),          # grams(3): abc bcd cde
        (2, "x y a b c d q"),      # grams:   xya yab abc bcd cdq
        (3, "r r r r"),            # rrr twice -> within-doc repeat
        (4, "s t"),                # too short: 0 grams
    ]
    got = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in dup_ngram_stats(_staged(spark, rows), 3).collect()
    }
    # 'a b c' and 'b c d' are shared between docs 1 and 2; doc 3's two
    # 'r r r' windows duplicate each other
    assert got == {1: (3, 2), 2: (5, 2), 3: (2, 2), 4: (0, 0)}


def test_plan_is_window_free_with_partial_counts(spark):
    rows = [(i, "w x y z " * 5) for i in range(10)]
    plan = (
        dup_ngram_stats(_staged(spark, rows), 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_registry_row_reports_natural_redundancy(spark):
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    rows = QUERIES["docs_dup_ngram_spans"].spark(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 500
    total = sum(r.n_grams for r in rows)
    dup = sum(r.n_dup_grams for r in rows)
    assert total > 0 and 0 < dup < total
    assert all(0 <= r.n_dup_grams <= r.n_grams for r in rows)


def test_span_removal_keeps_first_occurrence_only(spark):
    """Hand-computed removal: the shared 3-gram span survives at its
    lowest-(doc,pos) occurrence only; non-shared context survives
    everywhere; a doc that is entirely a copy empties out."""
    from kafka_streams_dead_letter_publishing_spark.operators.substrings import (
        remove_dup_spans,
    )

    rows = [
        (1, "p q a b c r s"),   # first occurrence of 'a b c' (pos 3)
        (2, "m n a b c o"),     # later occurrence -> a b c removed
        (3, "a b c"),           # exact-span doc, later -> fully removed
        (4, "u v w"),           # untouched
    ]
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.new_text)
        for r in remove_dup_spans(_staged(spark, rows), 3).collect()
    }
    assert got[1] == (7, 0, "p q a b c r s")
    assert got[2] == (6, 3, "m n o")
    assert got[3] == (3, 3, "")
    assert got[4] == (3, 0, "u v w")


def test_span_removal_overlapping_windows_union_coverage(spark):
    """Two overlapping duplicated windows in one doc must remove the
    UNION of their positions, not double-count."""
    from kafka_streams_dead_letter_publishing_spark.operators.substrings import (
        remove_dup_spans,
    )

    rows = [
        (1, "a b c d z"),   # first occurrence of both 'a b c' and 'b c d'
        (2, "y a b c d"),   # both windows duplicated -> positions 2..5 go
    ]
    got = {
        r.doc_id: (r.n_removed, r.new_text)
        for r in remove_dup_spans(_staged(spark, rows), 3).collect()
    }
    assert got[1] == (0, "a b c d z")
    assert got[2] == (4, "y")


def test_span_removal_plan_is_window_free(spark):
    from kafka_streams_dead_letter_publishing_spark.operators.substrings import (
        remove_dup_spans,
    )

    rows = [(i, "w x y z " * 4) for i in range(8)]
    plan = (
        remove_dup_spans(_staged(spark, rows), 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_span_removal_registry_idempotence(spark):
    """Running removal on an already-deduped corpus removes nothing: all
    surviving spans are unique by construction... EXCEPT spans that a
    removal boundary newly juxtaposes — so instead pin the weaker, exact
    invariant: total removed positions equal the sum of per-doc coverage,
    and no doc removes more than it has."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    rows = QUERIES["docs_dup_span_removal"].spark(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 500
    assert all(0 <= r.n_removed <= r.n_tokens for r in rows)
    assert sum(r.n_removed for r in rows) > 0  # the fixture has dup spans
    # cross-check against the signal row: a doc with zero dup windows
    # removes zero positions
    signal = {
        r.doc_id: r.n_dup_grams
        for r in QUERIES["docs_dup_ngram_spans"].spark(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    for r in rows:
        if signal[r.doc_id] == 0:
            assert r.n_removed == 0, r.doc_id
