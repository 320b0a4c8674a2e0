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


def test_asof_left_keeps_unmatched_with_null_payload(spark):
    left = spark.createDataFrame(
        [(1, T(10), "p1"), (2, T(5), "p3")], "user_id long, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [(1, T(5), "c1"), (2, T(6), "c-after")], "user_id long, cts timestamp, cid string"
    )
    got = {
        r.pid: r.cid
        for r in as_of_join(
            left, right, ["user_id"], "ts", "cts", ["cid"], how="left"
        ).collect()
    }
    assert got == {"p1": "c1", "p3": None}


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, T(10), "fresh"), (1, T(50), "stale")], "user_id long, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [(1, T(8), "c1")], "user_id long, cts timestamp, cid string"
    )
    res = as_of_join(
        left, right, ["user_id"], "ts", "cts", ["cid"],
        how="left", tolerance="INTERVAL 10 MINUTE",
    )
    got = {r.pid: r.cid for r in res.collect()}
    assert got == {"fresh": "c1", "stale": None}  # 42 min old > 10 min bound
    # inner mode drops the stale row entirely
    inner = as_of_join(
        left, right, ["user_id"], "ts", "cts", ["cid"],
        tolerance="INTERVAL 10 MINUTE",
    )
    assert [r.pid for r in inner.collect()] == ["fresh"]


def test_asof_tied_right_rows_break_deterministically(spark):
    left = spark.createDataFrame([(1, T(10), "p")], "user_id long, ts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, T(5), "a"), (1, T(5), "z"), (1, T(5), "m")],
        "user_id long, cts timestamp, cid string",
    )
    for _ in range(3):  # total window order → same winner every run
        rows = as_of_join(left, right, ["user_id"], "ts", "cts", ["cid"]).collect()
        assert [r.cid for r in rows] == ["z"]  # largest payload struct wins


def test_asof_rejects_payload_name_collisions(spark):
    import pytest

    left = spark.createDataFrame([(1, T(1), "x")], "user_id long, ts timestamp, cid string")
    right = spark.createDataFrame([(1, T(0), "c")], "user_id long, cts timestamp, cid string")
    with pytest.raises(ValueError, match="collide"):
        as_of_join(left, right, ["user_id"], "ts", "cts", ["cid"])


def test_asof_plan_has_single_key_shuffle_no_join(spark):
    left = spark.createDataFrame([(1, T(1), "x")], "user_id long, ts timestamp, pid string")
    right = spark.createDataFrame([(1, T(0), "c")], "user_id long, cts timestamp, cid string")
    df = as_of_join(left, right, ["user_id"], "ts", "cts", ["cid"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # composed from union + window, not a join
    assert plan.count("Exchange hashpartitioning(user_id") <= 2  # window partition only


def test_asof_null_ts_and_null_key_rights_never_match(spark):
    """SQL-oracle NULL semantics (r6): right_ts <= left_ts is never true
    for a NULL timestamp, and the equi-key never matches on NULL = NULL —
    without the eligibility filter, ascending NULLS-FIRST ordering carried
    a NULL-ts right payload into every early left row."""
    left = spark.createDataFrame(
        [(1, T(10), "p1"), (None, T(10), "pnullkey")],
        "user_id long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, None, "c-null-ts"),     # NULL ts: never a match
            (None, T(5), "c-null-key"), # NULL key: never a match
        ],
        "user_id long, cts timestamp, cid string",
    )
    inner = as_of_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="cts",
        right_payload=["cid"], how="inner",
    ).collect()
    assert inner == []
    outer = {
        r.pid: r.cid
        for r in as_of_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="cts",
            right_payload=["cid"], how="left",
        ).collect()
    }
    assert outer == {"p1": None, "pnullkey": None}


def test_asof_null_left_ts_never_matches_but_follows_how(spark):
    left = spark.createDataFrame(
        [(1, None, "pnull")], "user_id long, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [(1, T(5), "c")], "user_id long, cts timestamp, cid string"
    )
    args = dict(on=["user_id"], left_ts="ts", right_ts="cts", right_payload=["cid"])
    assert as_of_join(left, right, how="inner", **args).collect() == []
    rows = as_of_join(left, right, how="left", **args).collect()
    assert [(r.pid, r.cid) for r in rows] == [("pnull", None)]
