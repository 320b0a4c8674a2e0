"""Golden-case tests for the dead-letter topology (SURVEY §2.3, FIXTURES §A.2).

Direct analogue of the reference's two test tiers collapsed into one: the
topology is a pure function, so the four pinned scenarios run as batch
fixtures (the reference needed an embedded broker for cases 3-4; we don't).
"""

from __future__ import annotations

import re
import struct

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.config import ERROR_HEADER, EngineConfig
from kafka_streams_dead_letter_publishing_spark.operators.headers import get_header
from kafka_streams_dead_letter_publishing_spark.operators.topology import route
from kafka_streams_dead_letter_publishing_spark.sources.records import int32be, records_df

CFG = EngineConfig()


def one_row(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0]


def header_value(df):
    return one_row(df.select(get_header(F.col("headers"), ERROR_HEADER)))[0]


@pytest.fixture(scope="module")
def routed_happy(spark):
    return route(records_df(spark, [(b"key", int32be(2))]), CFG)


def test_happy_path_two_char_string(spark, routed_happy):
    """("key", 2) → output gets a 2-char [a-z] string
    (ErrorHandlingTopologyTest.java:42-48)."""
    r = one_row(routed_happy.output)
    assert r.key == b"key"
    assert r.topic == CFG.output_topic
    assert re.fullmatch(rb"[a-z]{2}", r.value)
    assert routed_happy.process_dlt.count() == 0
    assert routed_happy.deser_dlt.count() == 0
    assert routed_happy.prod_dlt.count() == 0


def test_happy_path_deterministic_given_seed(spark):
    a = one_row(route(records_df(spark, [(b"key", int32be(8))]), CFG).output)
    b = one_row(route(records_df(spark, [(b"key", int32be(8))]), CFG).output)
    assert a.value == b.value
    c = one_row(
        route(records_df(spark, [(b"key", int32be(8))]), EngineConfig(seed=7)).output
    )
    assert c.value != a.value  # different seed ⇒ different string


def test_process_error_routes_original_value(spark):
    """("key", -1) → nothing on output; process DLT gets int32be(-1) and
    header "<class>: -1" (ErrorHandlingTopologyTest.java:50-59)."""
    routed = route(records_df(spark, [(b"key", int32be(-1))]), CFG)
    assert routed.output.count() == 0
    r = one_row(routed.process_dlt)
    assert r.key == b"key"
    assert r.topic == CFG.process_dlt
    assert r.value == struct.pack(">i", -1)  # ORIGINAL value, not the mapped one
    assert header_value(routed.process_dlt) == "NegativeLengthError: -1"


def test_deser_error_raw_bytes_preserved(spark):
    """value = UTF-8 "10" (not 4 bytes) → deser DLT gets the raw bytes and a
    size-shaped header (ErrorHandlingTopologyIntegrationTest.java:86-104)."""
    routed = route(records_df(spark, [(b"key", b"10")]), CFG)
    assert routed.output.count() == 0
    r = one_row(routed.deser_dlt)
    assert r.key == b"key"
    assert r.topic == CFG.deser_dlt
    assert r.value == b"10"  # raw, untouched
    assert header_value(routed.deser_dlt) == (
        "Size of data received by int32 deserializer is 2, expected 4"
    )


def test_production_error_truncates_to_empty(spark):
    """("key", 2_000_000) → prod DLT with EMPTY value and a size message
    naming 2,000,091 bytes vs the 1,048,576 limit
    (ErrorHandlingTopologyIntegrationTest.java:106-122)."""
    routed = route(records_df(spark, [(b"key", int32be(2_000_000))]), CFG)
    assert routed.output.count() == 0
    r = one_row(routed.prod_dlt)
    assert r.key == b"key"
    assert r.topic == CFG.prod_dlt
    assert r.value == b""  # truncated, not null
    assert header_value(routed.prod_dlt) == (
        "The message is 2000091 bytes when serialized which is larger than "
        "1048576, which is the value of the max.request.size configuration."
    )


def test_null_value_routes_to_process_dlt(spark):
    """NULL value passes Kafka's Integer deser (null→null) but the reference
    mapper would NPE ⇒ process channel."""
    routed = route(records_df(spark, [(b"key", None)]), CFG)
    r = one_row(routed.process_dlt)
    assert r.value is None
    assert header_value(routed.process_dlt) == "NullValueError: null"


def test_existing_headers_preserved(spark):
    """DLT append keeps prior headers (ErrorMessageMapper.java:36)."""
    df = records_df(spark, [(b"key", int32be(-5))], headers=[("trace", b"abc")])
    routed = route(df, CFG)
    r = one_row(routed.process_dlt)
    assert [h.key for h in r.headers] == ["trace", ERROR_HEADER]
    assert r.headers[0].value == b"abc"
    assert header_value(routed.process_dlt) == "NegativeLengthError: -5"


def test_duplicate_error_header_appends_second(spark):
    """A record that ALREADY carries ``error.message`` gets a second one
    appended, not replaced — Kafka headers allow duplicate keys and the
    reference's ``headers().add`` (ErrorMessageMapper.java:36) appends
    unconditionally; ``get_header`` reads the LAST (newest) occurrence."""
    df = records_df(spark, [(b"key", int32be(-5))], headers=[(ERROR_HEADER, b"stale")])
    routed = route(df, CFG)
    r = one_row(routed.process_dlt)
    assert [h.key for h in r.headers] == [ERROR_HEADER, ERROR_HEADER]
    assert r.headers[0].value == b"stale"
    assert header_value(routed.process_dlt) == "NegativeLengthError: -5"


def test_mixed_batch_routes_each_channel_once(spark):
    records = [
        (b"k1", int32be(5)),
        (b"k2", int32be(-1)),
        (b"k3", b"xx"),
        (b"k4", int32be(2_000_000)),
    ]
    routed = route(records_df(spark, records), CFG)
    assert routed.output.count() == 1
    assert routed.process_dlt.count() == 1
    assert routed.deser_dlt.count() == 1
    assert routed.prod_dlt.count() == 1
    out = one_row(routed.output)
    assert out.key == b"k1" and len(out.value) == 5
    assert routed.union_all().count() == 4


def test_zero_length_produces_empty_string(spark):
    """n=0 → empty string (reference: IntStream.limit(0) is empty); guards
    against Spark's descending sequence(1, 0) == [1, 0] surprise."""
    r = one_row(route(records_df(spark, [(b"key", int32be(0))]), CFG).output)
    assert r.value == b""


def test_keys_may_be_null(spark):
    routed = route(records_df(spark, [(None, int32be(3))]), CFG)
    r = one_row(routed.output)
    assert r.key is None and len(r.value) == 3


def test_boundary_size_passes_exactly_at_limit(spark):
    """value_len + key_len + overhead == max ⇒ passes; +1 ⇒ prod DLT."""
    from kafka_streams_dead_letter_publishing_spark.config import RECORD_OVERHEAD

    fits = CFG.max_request_size - RECORD_OVERHEAD - 3  # key "key" = 3 bytes
    routed = route(records_df(spark, [(b"key", int32be(fits))]), CFG)
    assert routed.output.count() == 1 and routed.prod_dlt.count() == 0
    routed2 = route(records_df(spark, [(b"key", int32be(fits + 1))]), CFG)
    assert routed2.output.count() == 0 and routed2.prod_dlt.count() == 1


def test_route_topic_label_agrees_with_route(spark):
    """The single-pass routing decision must agree with the materialized
    4-way split for every failure mode (they share predicates; this pins
    that they never drift)."""
    from kafka_streams_dead_letter_publishing_spark.operators.topology import route_topic_label

    records = [
        (b"k1", int32be(5)),
        (b"k2", int32be(-1)),
        (b"k3", b"xx"),
        (b"k4", int32be(2_000_000)),
        (b"k5", None),
        (b"k6", int32be(0)),
    ]
    df = records_df(spark, records)
    routed = route(df, CFG)
    split_counts = {
        CFG.output_topic: routed.output.count(),
        CFG.process_dlt: routed.process_dlt.count(),
        CFG.deser_dlt: routed.deser_dlt.count(),
        CFG.prod_dlt: routed.prod_dlt.count(),
    }
    label_counts = {
        r.topic: r.cnt
        for r in route_topic_label(df, CFG)
        .groupBy("topic")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert {k: v for k, v in split_counts.items() if v} == label_counts


def test_plan_is_udf_free_and_codegen(spark, routed_happy):
    """The reference-parity path must stay whole-stage-codegen (SURVEY §4.2):
    no BatchEvalPython / python UDF nodes in any channel's plan — including
    the persisted decode staging Routed now carries.  (r18 measured an
    Arrow/numpy generator for the output channel at PARITY with the SQL
    chain — 0.29 s SQL vs 0.34 s Arrow on the isolated generation stage at
    sf0.1/32c — so the zero-Python plan stays; see OPTIMIZATION_r18.md.)"""
    for df in (*routed_happy[:4], routed_happy.staged):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
