"""Streaming [EXT] operator tests: watermark-bounded dedup and event-time
windowed aggregation over a file-based stream (no broker in this
container; the operators are source-agnostic)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table
from kafka_streams_dead_letter_publishing_spark.streaming.dedup import (
    dedup_within_watermark,
    windowed_type_counts,
)

SMOKE_SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("payload", StringType()),
    ]
)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "a"),
        (1, t0 + datetime.timedelta(minutes=5), "a-dup"),  # dup within delay → dropped
        (2, t0 + datetime.timedelta(minutes=10), "b"),
        (2, t0 + datetime.timedelta(minutes=11), "b-dup"),
        (3, t0 + datetime.timedelta(hours=3), "c"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(src)

    out = str(tmp_path / "out")
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        dedup_within_watermark(stream, ["event_id"], ts_col="ts", delay="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.event_id, r.payload) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """Dedup state lives in the checkpointed state store: a restarted query
    must still drop duplicates of keys seen before the restart."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            dedup_within_watermark(stream, ["event_id"], ts_col="ts", delay="2 hours")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    spark.createDataFrame([(1, t0, "a"), (2, t0, "b")], EVENT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    run_once()

    # second run, same checkpoint: a late duplicate of key 1 plus a new key
    spark.createDataFrame(
        [(1, t0 + datetime.timedelta(minutes=30), "a-dup"), (3, t0, "c")], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = sorted((r.event_id, r.payload) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


@pytest.mark.parametrize("slide", [None, "15 minutes"])
def test_streaming_windowed_counts_match_batch(spark, tmp_path, slide):
    """Windows the watermark has passed must emit exactly the batch
    aggregation's values (append mode finalizes per watermark) — both
    tumbling and hopping (slide < window) forms."""
    # watermarks require TIMESTAMP (tz-aware); the loader yields NTZ
    ev = load_table(spark, SMOKE_SF, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    out = str(tmp_path / "out")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_type_counts(
            stream, ts_col="ts", window="1 hour", delay="30 minutes", slide=slide
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        q.processAllAvailable()  # second pass: watermark advances, windows emit
    finally:
        q.stop()

    emitted = spark.read.parquet(out)
    assert emitted.count() > 0
    batch = (
        ev.groupBy(F.window("ts", "1 hour", slide or "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )
    joined = emitted.alias("e").join(
        batch.alias("b"),
        ["window_start", "event_type"],
        "left",
    )
    mismatches = joined.filter(
        F.col("b.cnt").isNull() | (F.col("e.cnt") != F.col("b.cnt"))
    ).count()
    assert mismatches == 0


def test_streaming_corpus_cleaning_pipeline(spark, tmp_path):
    """The LLM-ingest flow in STREAMING form: per-row quality filter +
    watermarked exact dedup on the content fingerprint, composed into one
    query — duplicates and junk dropped as documents arrive."""
    from kafka_streams_dead_letter_publishing_spark.functions.text import fingerprint

    t0 = datetime.datetime(2024, 1, 1)
    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    rows = [
        (1, t0, "the quick brown fox jumps over the lazy dog again and again"),
        (2, t0, "THE  QUICK  BROWN  FOX jumps over the lazy dog again and again"),  # dup of 1
        (3, t0, "too short"),  # junk: fails the length filter
        (4, t0, "a completely different document with enough words to pass the filter"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, doc_schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(doc_schema).parquet(src)
    cleaned = (
        stream.filter(F.size(F.split(F.col("text"), r"\s+")) >= 10)
        .withColumn("fp", fingerprint(F.col("text")))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["fp"])
    )
    out = str(tmp_path / "out")
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    survivors = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 3 not in survivors  # junk filtered
    assert len(survivors & {1, 2}) == 1  # formatting-noise dups collapsed
    assert 4 in survivors


def test_stream_static_join_enriches_records(spark, tmp_path):
    """Stream-static join: each micro-batch joins against a static
    dimension (the broadcast enrichment pattern — dimension re-read per
    batch, no state required)."""
    ev = load_table(spark, SMOKE_SF, "events").select("event_id", "user_id")
    src = str(tmp_path / "src")
    ev.write.parquet(src)

    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("tier", F.pmod("user_id", F.lit(3)).cast("int"))
    )
    out = str(tmp_path / "out")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream.join(F.broadcast(dim), "user_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # inner join loses nothing: dim covers all users
    assert got.filter(F.col("tier") != F.pmod("user_id", F.lit(3))).count() == 0


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks joined to impressions within
    a 10-minute window — both sides keep watermark-bounded state."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    imp_schema = StructType(
        [StructField("ad_id", LongType()), StructField("imp_ts", TimestampType())]
    )
    clk_schema = StructType(
        [StructField("ad_id", LongType()), StructField("clk_ts", TimestampType())]
    )
    imp_src, clk_src = str(tmp_path / "imp"), str(tmp_path / "clk")
    spark.createDataFrame(
        [(1, t0), (2, t0 + datetime.timedelta(minutes=5)), (3, t0)], imp_schema
    ).coalesce(1).write.parquet(imp_src)
    spark.createDataFrame(
        [
            (1, t0 + datetime.timedelta(minutes=4)),  # within window → joins
            (2, t0 + datetime.timedelta(minutes=30)),  # too late → dropped
            (4, t0),  # no matching impression
        ],
        clk_schema,
    ).coalesce(1).write.parquet(clk_src)

    imp = spark.readStream.schema(imp_schema).parquet(imp_src).withWatermark("imp_ts", "1 hour")
    clk = spark.readStream.schema(clk_schema).parquet(clk_src).withWatermark("clk_ts", "1 hour")
    joined = imp.join(
        clk,
        (imp.ad_id == clk.ad_id)
        & (clk.clk_ts >= imp.imp_ts)
        & (clk.clk_ts <= imp.imp_ts + F.expr("INTERVAL 10 MINUTES")),
    ).select(imp.ad_id, "imp_ts", "clk_ts")

    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()

    got = [(r.ad_id,) for r in spark.read.parquet(out).collect()]
    assert got == [(1,)]


def test_multimodal_map_in_pandas_features(spark):
    """The Arrow-batched mapInPandas feature extractor matches a driver-side
    Python recomputation byte-for-byte (plumbing check for the multimodal
    column surface)."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        CHECKSUM_MOD,
        CHECKSUM_PREFIX,
        FRAME_BYTES,
        extract_features,
        with_payload,
    )

    docs = load_table(spark, SMOKE_SF, "documents").limit(20)
    got = {r.doc_id: r for r in extract_features(with_payload(docs)).collect()}
    plan = extract_features(with_payload(docs))._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan

    for row in docs.select("doc_id", "text").collect():
        b = row.text.encode("utf-8")
        r = got[row.doc_id]
        assert r.n_bytes == len(b)
        assert r.checksum == sum(b[:CHECKSUM_PREFIX]) % CHECKSUM_MOD
        assert r.n_frames == len(b) // FRAME_BYTES
