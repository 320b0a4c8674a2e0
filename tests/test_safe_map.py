"""Tests for the generalized error-capturing UDF wrapper (the arbitrary-
Python form of the reference's per-record try/catch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.safe_map import safe_map, split_wrapped


@pytest.fixture(scope="module")
def wrapped_df(spark):
    def picky(v):
        if v is None:
            raise TypeError("value is required")
        if v % 3 == 0:
            # int(v): a null-bearing int column arrives as float64 (pandas
            # null semantics), so non-null values are floats here
            raise ValueError(f"no multiples of three: {int(v)}")
        return int(v) * 10

    df = spark.createDataFrame([(1,), (3,), (None,), (7,)], "n int")
    return df.withColumn("wrapped", safe_map(picky, "int")(F.col("n")))


def test_exceptions_become_data_not_task_failures(wrapped_df):
    rows = {r.n: r.wrapped for r in wrapped_df.collect()}
    assert rows[1] == (10, None, None)
    assert rows[7] == (70, None, None)
    assert rows[3] == (None, "ValueError", "no multiples of three: 3")
    assert rows[None] == (None, "TypeError", "value is required")


def test_split_matches_reference_branch_predicate(wrapped_df):
    ok, failed = split_wrapped(wrapped_df)
    assert {r.n for r in ok.collect()} == {1, 7}
    assert {r.n for r in failed.collect()} == {3, None}


def test_arrow_batched_not_row_python(wrapped_df):
    plan = wrapped_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan
