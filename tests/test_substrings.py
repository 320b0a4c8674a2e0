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
