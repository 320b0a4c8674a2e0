"""As-of join semantics (operators/asof.py): latest right row at-or-before
each left timestamp, per key; unmatched lefts dropped; exact-timestamp ties
match (>= semantics, as in DuckDB's native ASOF JOIN which oracles the
registry query)."""

from __future__ import annotations

import datetime

from kafka_streams_dead_letter_publishing_spark.operators.asof import as_of_join

T = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, T(10), "p1"), (1, T(30), "p2"), (2, T(5), "p3"), (3, T(9), "p4")],
        "user_id long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, T(5), "c-old"),
            (1, T(10), "c-tie"),   # exact tie with p1 → matches (>=)
            (1, T(20), "c-mid"),
            (1, T(40), "c-late"),  # after p2 → never matched
            (2, T(6), "c-after"),  # after p3 → p3 unmatched, dropped
        ],
        "user_id long, cts timestamp, cid string",
    )
    got = {
        r.pid: r.cid
        for r in as_of_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="cts",
            right_payload=["cid"],
        ).collect()
    }
    assert got == {"p1": "c-tie", "p2": "c-mid"}  # p3: no earlier click; p4: no key 3


def test_asof_plan_has_single_key_shuffle_no_join(spark):
    left = spark.createDataFrame([(1, T(1), "x")], "user_id long, ts timestamp, pid string")
    right = spark.createDataFrame([(1, T(0), "c")], "user_id long, cts timestamp, cid string")
    df = as_of_join(left, right, ["user_id"], "ts", "cts", ["cid"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # composed from union + window, not a join
    assert plan.count("Exchange hashpartitioning(user_id") <= 2  # window partition only
