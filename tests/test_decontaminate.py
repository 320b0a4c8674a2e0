"""Benchmark decontamination (operators/decontaminate.py): planted-overlap
semantics against a sequential Python reference, edge cases (short docs,
multiplicity, self-overlap irrelevance), and the 100 TB plan shape — the
eval gram set must BROADCAST into the exploded-corpus join (no shuffle of
the corpus grams, no sort-merge, no cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
    eval_gram_fps,
)

K = 3  # small k so short planted docs can overlap


def _grams(text: str, k: int = K) -> set[str]:
    toks = " ".join(text.lower().split()).split(" ")
    return {
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    } if len(toks) >= k else set()


@pytest.fixture(scope="module")
def corpus(spark):
    train = [
        (0, "alpha beta gamma delta epsilon"),          # overlaps eval doc 100
        (1, "one two three four five six"),             # clean
        (2, "the quick brown fox jumps high"),          # overlaps eval doc 101
        (3, "tiny doc"),                                # < k tokens: never flagged
        (4, "alpha beta gamma beta gamma delta"),       # two distinct hit grams
        (5, "completely different words here now"),     # clean
    ]
    eval_ = [
        (100, "alpha beta gamma delta"),
        (101, "quick brown fox jumps"),
        (102, "unrelated eval content entirely"),
    ]
    return (
        spark.createDataFrame(train, "doc_id long, text string"),
        spark.createDataFrame(eval_, "doc_id long, text string"),
        train,
        eval_,
    )


def _python_report(train_rows, eval_rows, k: int = K) -> dict[int, int]:
    eval_grams = set()
    for _, t in eval_rows:
        eval_grams |= _grams(t, k)
    out = {}
    for d, t in train_rows:
        n = len(_grams(t, k) & eval_grams)
        if n:
            out[d] = n
    return out


def test_report_matches_python_reference(corpus):
    train_df, eval_df, train_rows, eval_rows = corpus
    got = {
        r.doc_id: r.n_hits
        for r in contamination_report(train_df, eval_df, k=K).collect()
    }
    assert got == _python_report(train_rows, eval_rows)
    # sanity on the fixture: both planted overlaps present, multiplicity
    # counted on DISTINCT grams (doc 4 repeats a gram textually)
    assert got[0] >= 2 and got[2] >= 1 and got[4] >= 2
    assert 1 not in got and 3 not in got and 5 not in got


def test_decontaminate_removes_exactly_the_flagged_docs(corpus):
    train_df, eval_df, train_rows, eval_rows = corpus
    flagged = set(_python_report(train_rows, eval_rows))
    survivors = {r.doc_id for r in decontaminate(train_df, eval_df, k=K).collect()}
    assert survivors == {d for d, _ in train_rows} - flagged
    # schema passes through unchanged
    assert decontaminate(train_df, eval_df, k=K).columns == train_df.columns


def test_short_docs_and_empty_eval(spark, corpus):
    train_df, _, train_rows, _ = corpus
    empty_eval = spark.createDataFrame([], "doc_id long, text string")
    assert contamination_report(train_df, empty_eval, k=K).count() == 0
    assert decontaminate(train_df, empty_eval, k=K).count() == len(train_rows)
    # an eval set made only of sub-k docs contributes no grams
    tiny_eval = spark.createDataFrame([(9, "alpha beta")], "doc_id long, text string")
    assert eval_gram_fps(tiny_eval, k=K).count() == 0


def test_plan_broadcasts_eval_grams_no_corpus_shuffle(corpus):
    train_df, eval_df, _, _ = corpus
    plan = (
        contamination_report(train_df, eval_df, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the only gram-keyed exchange allowed is the eval side's distinct —
    # benchmark-sized, beneath the BroadcastExchange (build side prints
    # after the probe side); the exploded CORPUS grams must never be
    # hash-repartitioned on the gram key
    gram_exchanges = plan.count("Exchange hashpartitioning(gram_fp")
    assert gram_exchanges <= 1
    if gram_exchanges:
        assert plan.index("BroadcastExchange") < plan.index(
            "Exchange hashpartitioning(gram_fp"
        )


def test_decontaminate_anti_join_left_to_aqe(corpus):
    """The removal is a LeftAnti whose flagged side is NOT force-broadcast
    (one common eval gram can flag a corpus-scale doc set); at toy size
    AQE still picks a broadcast — assert the shape, not a forced hint."""
    train_df, eval_df, _, _ = corpus
    df = decontaminate(train_df, eval_df, k=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly one broadcast hint (the eval gram fps); none on the flagged set
    assert analyzed.count("ResolvedHint") <= 1


def test_normalization_matches_dedup_family(spark):
    # mixed case + collapsed whitespace must hit the same grams
    train = spark.createDataFrame(
        [(0, "Alpha   BETA\tgamma delta")], "doc_id long, text string"
    )
    eval_ = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    got = contamination_report(train, eval_, k=K).collect()
    assert len(got) == 1 and got[0].n_hits == 1
