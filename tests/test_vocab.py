"""Vocabulary construction (operators/vocab.py): contiguous-id semantics
against a sequential reference, band-boundary correctness (the subtle
case: ranks crossing frequency-band edges), empty/degenerate corpora, and
the plan gate — id assignment must not fall back to a SinglePartition
global window."""

from __future__ import annotations

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.vocab import (
    assign_ids,
    term_counts,
    vocab_ids,
)


def _py_vocab(texts: list[str]) -> list[tuple[str, int, int]]:
    c = Counter(t for s in texts for t in " ".join(s.lower().split()).split(" "))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(t, f, i + 1) for i, (t, f) in enumerate(ordered)]


def test_matches_sequential_reference(spark):
    rng = random.Random(3)
    words = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choices(words, weights=range(1, 51), k=30))
        for _ in range(40)
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = sorted(
        (r.term, r.freq, r.token_id) for r in vocab_ids(docs).collect()
    )
    assert got == sorted(_py_vocab(texts))


def test_ids_are_contiguous_and_freq_ordered(spark):
    docs = spark.createDataFrame(
        [("a a a b b c",), ("b c d",)], "text string"
    )
    rows = {r.term: r for r in vocab_ids(docs).collect()}
    assert sorted(r.token_id for r in rows.values()) == [1, 2, 3, 4]
    # b (freq 3) ties a (freq 3): term tie-break puts a first
    assert rows["a"].token_id == 1 and rows["b"].token_id == 2
    assert rows["c"].token_id == 3 and rows["d"].token_id == 4


def test_band_boundaries_with_tiny_bands(spark):
    """band_width=1 makes every distinct frequency its own band — the
    maximal-banding stress: ids must still be globally contiguous."""
    rng = random.Random(9)
    texts = [" ".join(rng.choices("abcdefgh", k=20)) for _ in range(30)]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = sorted(
        (r.term, r.freq, r.token_id)
        for r in vocab_ids(docs, band_width=1).collect()
    )
    assert got == sorted(_py_vocab(texts))


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "text string")
    out = vocab_ids(docs)
    assert out.count() == 0
    assert out.columns == ["term", "freq", "token_id"]


def test_no_single_partition_window(spark):
    docs = spark.createDataFrame([("x y z x",)], "text string")
    plan = (
        vocab_ids(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_term_counts_partial_agg(spark):
    docs = spark.createDataFrame([("x y x",)], "text string")
    plan = (
        term_counts(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan  # map-side combine before the shuffle
