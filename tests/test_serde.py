"""Serde codec round-trips (SURVEY §1.2)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.serde import (
    int32be_decode,
    int32be_encode,
    utf8_decode,
    utf8_encode,
)

INTS = [0, 1, -1, 2, 127, 128, 255, 256, 2_000_000, 2**31 - 1, -(2**31)]


def test_int32be_decode_matches_java(spark):
    rows = [(struct.pack(">i", n),) for n in INTS]
    df = spark.createDataFrame(rows, "value binary")
    got = [r[0] for r in df.select(int32be_decode(F.col("value"))).collect()]
    assert got == INTS


def test_int32be_encode_roundtrip(spark):
    df = spark.createDataFrame([(n,) for n in INTS], "n int")
    enc = df.select(F.col("n"), int32be_encode(F.col("n")).alias("b"))
    for n, b in enc.collect():
        assert b == struct.pack(">i", n), (n, b)
    rt = enc.select(F.col("n"), int32be_decode(F.col("b")).alias("back"))
    assert all(r.n == r.back for r in rt.collect())


def test_int32be_decode_rejects_wrong_size(spark):
    rows = [(b"10",), (b"",), (b"12345",), (None,)]
    df = spark.createDataFrame(rows, "value binary")
    got = [r[0] for r in df.select(int32be_decode(F.col("value"))).collect()]
    assert got == [None, None, None, None]


def test_utf8_roundtrip(spark):
    df = spark.createDataFrame([("héllo wörld",), ("",)], "s string")
    rt = df.select(F.col("s"), utf8_decode(utf8_encode(F.col("s"))).alias("back"))
    assert all(r.s == r.back for r in rt.collect())
