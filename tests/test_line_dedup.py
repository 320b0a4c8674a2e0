"""Corpus-wide line dedup: de-skew plan gates + behavior parity.

The r7 verdict's one scale defect: `Window.partitionBy(line)` funnels every
occurrence of a hot boilerplate line — exactly the rows this operator
exists to remove — through ONE task's sort, and blank lines (kept
unconditionally) still rode the shuffle.  The r8 plan
(`operators/lines.py`) must keep blank lines out of every exchange and
collapse hot lines map-side via partial aggregation.  These tests pin
that plan shape and the operator's semantics against a sequential Python
reference on a deliberately skewed corpus (one line planted in half the
docs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.lines import (
    corpus_line_first_occurrence,
)

HOT = "subscribe to our newsletter today"


@pytest.fixture(scope="module")
def skewed_lines(spark):
    """(doc_id, pos, line) rows for 40 docs; every even doc carries the HOT
    boilerplate line and a blank line; each doc has one unique line."""
    rows = []
    for d in range(40):
        doc = [f"unique line of doc {d}"]
        if d % 2 == 0:
            doc += [HOT, "   "]
        for p, ln in enumerate(doc, start=1):
            rows.append((d, p, ln))
    return spark.createDataFrame(rows, "doc_id int, pos int, line string")


def _python_reference(rows):
    """Sequential first-occurrence semantics: keep = blank or first (id,pos)."""
    keep = {}
    first = {}
    for d, p, ln in sorted(rows):
        if ln.strip() == "":
            keep[(d, p)] = True
        elif ln not in first:
            first[ln] = (d, p)
            keep[(d, p)] = True
        else:
            keep[(d, p)] = False
    return keep


def test_skewed_corpus_exactly_one_keeper(spark, skewed_lines):
    flagged = corpus_line_first_occurrence(skewed_lines)
    got = {
        (r.doc_id, r.pos): r.keep for r in flagged.collect()
    }
    rows = [(r.doc_id, r.pos, r.line) for r in skewed_lines.collect()]
    assert got == _python_reference(rows)
    # the hot line survives exactly once, at its lowest (doc_id, pos)
    hot_keepers = (
        flagged.filter((F.col("line") == HOT) & F.col("keep"))
        .select("doc_id", "pos")
        .collect()
    )
    assert [(r.doc_id, r.pos) for r in hot_keepers] == [(0, 2)]
    # every blank line survives
    blanks = flagged.filter(F.trim("line") == "").collect()
    assert blanks and all(r.keep for r in blanks)


def test_plan_has_no_window_and_partial_aggregates(spark, skewed_lines):
    """The de-skew contract: no Window operator anywhere (a per-line window
    cannot partial-aggregate — one task sorts every occurrence of a hot
    line), and the first-occurrence min must run with a map-side partial
    phase so hot lines collapse before the shuffle."""
    plan = (
        corpus_line_first_occurrence(skewed_lines)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_blank_lines_never_reach_an_exchange(spark, skewed_lines):
    """The blank branch of the union is exchange-free: filtering the
    operator's output to blank rows optimizes to a plan with no shuffle
    (blank keeps are decided without ever moving the rows)."""
    blanks_only = corpus_line_first_occurrence(skewed_lines).filter(
        F.coalesce(F.length(F.trim("line")) == 0, F.lit(True))
    )
    # the union's non-blank branch contributes no blank rows, so Catalyst
    # prunes it; what remains must be scan → filter → project only
    plan = blanks_only._jdf.queryExecution().executedPlan().toString()
    n_blank = blanks_only.count()
    assert n_blank == 20
    assert "Exchange" not in plan, plan


def test_seen_store_suppresses_known_lines(spark, skewed_lines):
    seen = spark.createDataFrame([(HOT,)], "line string")
    flagged = corpus_line_first_occurrence(skewed_lines, seen=seen)
    hot = flagged.filter(F.col("line") == HOT)
    assert hot.count() == 20
    assert hot.filter(F.col("keep")).count() == 0
    # unique lines are unaffected
    uniq = flagged.filter(F.col("line").startswith("unique"))
    assert uniq.filter(~F.col("keep")).count() == 0


def test_registry_query_plan_is_window_free(spark):
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    df = QUERIES["docs_line_dedup"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_clean_corpus_pipeline_plan_is_window_free(spark):
    """r9 de-skew (VERDICT r8 #1): the composed clean-corpus pipeline's
    exact-dedup keeper pick must be the partial-agg groupBy(fp).min shape,
    not Window.partitionBy(fp)+row_number — a mass-duplicated boilerplate
    fingerprint must collapse map-side, never funnel through one task."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    df = QUERIES["docs_clean_corpus_pipeline"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan
