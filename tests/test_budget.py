"""Token-budget corpus sampling (``operators/budget.py``): greedy
hash-ordered take-until-budget via the distributed two-phase prefix-sum
— values vs a pure-Python reference, plan gated single-partition-free,
budget edges."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.budget import (
    token_budget_sample,
)


def _py_reference(rows, budget):
    """(id, n_tokens) rows -> {id: running} for the kept prefix."""
    order = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    out, run = {}, 0
    for i, n in order:
        run += n
        if run > budget:
            break
        out[i] = run
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_budget_sample_matches_python_reference(spark):
    rows = [(i, (i * 37) % 50 + 1) for i in range(500)]
    total = sum(n for _, n in rows)
    for budget in (0, total // 3, total // 2, total - 1, total, total + 10):
        got = {
            r.doc_id: r.running_tokens
            for r in token_budget_sample(_df(spark, rows), "n_tokens", budget).collect()
        }
        assert got == _py_reference(rows, budget), budget


def test_budget_sample_is_deterministic_and_prefix_closed(spark):
    """Smaller budgets select PREFIXES of larger budgets' selections (the
    reproducibility contract a mixture pipeline relies on)."""
    rows = [(i, 10) for i in range(300)]
    small = {
        r.doc_id
        for r in token_budget_sample(_df(spark, rows), "n_tokens", 500).collect()
    }
    large = {
        r.doc_id
        for r in token_budget_sample(_df(spark, rows), "n_tokens", 2000).collect()
    }
    assert small < large
    again = {
        r.doc_id
        for r in token_budget_sample(_df(spark, rows), "n_tokens", 500).collect()
    }
    assert small == again


def test_budget_sample_plan_has_no_single_partition_window(spark):
    """The scale contract: the running sum must come from bucket-
    partitioned windows + a broadcast offset join, never the naive
    global-order window's Exchange SinglePartition."""
    rows = [(i, 5) for i in range(100)]
    df = token_budget_sample(_df(spark, rows), "n_tokens", 200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, plan


def test_budget_sample_empty_input(spark):
    assert token_budget_sample(_df(spark, []), "n_tokens", 100).count() == 0


def test_budget_registry_row_totals(spark):
    """The registered row fills (close to) half the corpus's tokens and
    never exceeds it."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["docs_token_budget_sample"].spark(spark, sf)
    rows = out.collect()
    assert rows, "sample must be non-empty"
    from kafka_streams_dead_letter_publishing_spark.functions.text import (
        norm_text,
        tokens,
    )

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    total = docs.select(
        F.sum(F.size(tokens(norm_text(F.col("text"))))).cast("long").alias("t")
    ).collect()[0]["t"]
    budget = total // 2
    top = max(r.running_tokens for r in rows)
    assert top <= budget
    # greedy cut: the next doc would overflow, so the fill is within one
    # max-doc-size of the budget
    max_doc = max(r.n_tokens for r in rows)
    assert top > budget - 2 * max_doc
