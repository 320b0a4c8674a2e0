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


# ── stream-stream watermarked as-of / interval join twins (r13) ──────────
#
# streaming/joins.py: the streaming forms of events_interval_self_join and
# the bounded-staleness as-of join, pinned streaming ≡ BATCH across
# multi-batch arrival (including a late-but-in-watermark right row landing
# in a later micro-batch) — the windows-twin discipline applied to joins.

_P_SCHEMA = StructType(
    [
        StructField("purchase_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)
_C_SCHEMA = StructType(
    [
        StructField("click_id", LongType()),
        StructField("user_id", LongType()),
        StructField("click_ts", TimestampType()),
    ]
)


def _mins(x):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(minutes=x)


def test_stream_asof_join_matches_batch_across_batch_placement(spark, tmp_path):
    """stream_asof_join ≡ as_of_join(how='inner', tolerance=...) on the
    same data, with the right side deliberately split so user 2's BEST
    click arrives one micro-batch after the purchase already joined a
    worse one (the agg must upgrade the match before the watermark
    finalizes the group), plus a within-tolerance tie at equal ts
    (deterministic payload tie-break on both paths)."""
    from kafka_streams_dead_letter_publishing_spark.operators.asof import as_of_join
    from kafka_streams_dead_letter_publishing_spark.streaming.joins import (
        stream_asof_join,
    )

    purchases = [
        (100, 1, _mins(10)),
        (101, 2, _mins(12)),
        (102, 3, _mins(20)),  # only a stale click (> tolerance) → drops
        (103, 4, _mins(15)),  # no click at all → drops
        (104, 5, _mins(30)),  # two clicks tied at the same ts
    ]
    clicks_b1 = [
        (7, 1, _mins(4)),
        (8, 1, _mins(9)),
        (9, 2, _mins(11)),
        (10, 3, _mins(1)),  # 19 min before purchase 102 → stale at 15 min
        (11, 5, _mins(29)),
        (12, 5, _mins(29)),  # tie: larger click_id wins on both paths
    ]
    clicks_b2 = [
        (13, 2, _mins(12)),  # late arrival, better match for purchase 101
    ]
    psrc, csrc = str(tmp_path / "p"), str(tmp_path / "c")
    spark.createDataFrame(purchases, _P_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(psrc)
    spark.createDataFrame(clicks_b1, _C_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)

    lt = (
        spark.readStream.schema(_P_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(psrc)
        # 25-minute delay: after batch 1 (max ts = m30) the global
        # watermark sits at m4-m5, BELOW purchase 101's m12 — so its
        # aggregation group is still open when the better click arrives
        # in batch 2 (a tighter delay would finalize it early and the
        # late click would be watermark-dropped; that is correct
        # streaming semantics, but this test pins the upgrade path)
        .withWatermark("ts", "25 minutes")
    )
    rt = (
        spark.readStream.schema(_C_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(csrc)
        .withWatermark("click_ts", "25 minutes")
    )
    joined = stream_asof_join(
        lt,
        rt,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_id", "click_ts"],
        tolerance="INTERVAL 15 MINUTES",
    )
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
        # batch 2: the late click — within watermark, must upgrade 101
        spark.createDataFrame(clicks_b2, _C_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(csrc)
        q.processAllAvailable()
        # sentinels push BOTH watermarks past all real data so every
        # aggregation group finalizes (user 999 never matches: inner drop)
        spark.createDataFrame(
            [(999, 999, _mins(10_000))], _P_SCHEMA
        ).coalesce(1).write.mode("append").parquet(psrc)
        spark.createDataFrame(
            [(999, 998, _mins(10_000))], _C_SCHEMA
        ).coalesce(1).write.mode("append").parquet(csrc)
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r.purchase_id, r.user_id, r.click_id, r.click_ts)
        for r in spark.read.parquet(out).collect()
        if r.purchase_id != 999
    }

    pb = spark.createDataFrame(purchases, _P_SCHEMA)
    cb = spark.createDataFrame(clicks_b1 + clicks_b2, _C_SCHEMA).withColumnRenamed(
        "user_id", "c_user"
    )
    batch = {
        (r.purchase_id, r.user_id, r.click_id, r.click_ts)
        for r in as_of_join(
            pb,
            cb.withColumnRenamed("c_user", "user_id"),
            on=["user_id"],
            left_ts="ts",
            right_ts="click_ts",
            right_payload=["click_id", "click_ts"],
            how="inner",
            tolerance="INTERVAL 15 MINUTES",
        ).collect()
    }
    assert streamed == batch
    # spot-pin the interesting rows so the equality isn't vacuous
    got = {p: c for (p, _, c, _) in streamed}
    assert got[100] == 8  # latest of clicks 7/8
    assert got[101] == 13  # upgraded by the batch-2 late arrival
    assert got[104] == 12  # equal-ts tie → larger payload struct
    assert 102 not in got and 103 not in got  # stale / no-match drop


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """stream_interval_join ≡ the batch range join on the same pairs,
    multi-batch placement on the right side."""
    from kafka_streams_dead_letter_publishing_spark.streaming.joins import (
        stream_interval_join,
    )

    purchases = [(100, 1, _mins(10)), (101, 2, _mins(40))]
    clicks_b1 = [(7, 1, _mins(8)), (8, 2, _mins(39)), (9, 2, _mins(20))]
    clicks_b2 = [(10, 1, _mins(9))]
    psrc, csrc = str(tmp_path / "p"), str(tmp_path / "c")
    spark.createDataFrame(purchases, _P_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(psrc)
    spark.createDataFrame(clicks_b1, _C_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    lt = (
        spark.readStream.schema(_P_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(psrc)
        .withWatermark("ts", "1 hour")
    )
    rt = (
        spark.readStream.schema(_C_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(csrc)
        .withWatermark("click_ts", "1 hour")
    )
    joined = stream_interval_join(
        lt,
        rt,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        lower="INTERVAL 5 MINUTES",
    ).select("purchase_id", "click_id")
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
        spark.createDataFrame(clicks_b2, _C_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(csrc)
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.purchase_id, r.click_id) for r in spark.read.parquet(out).collect()
    }
    # batch truth: click in [ts-5min, ts]
    assert streamed == {(100, 7), (100, 10), (101, 8)}


def test_stream_asof_left_outer_matches_batch(spark, tmp_path):
    """how='left': unmatched and stale-only left rows survive with NULL
    payload, exactly as as_of_join(how='left', tolerance=...) keeps them."""
    from kafka_streams_dead_letter_publishing_spark.operators.asof import as_of_join
    from kafka_streams_dead_letter_publishing_spark.streaming.joins import (
        stream_asof_join,
    )

    purchases = [
        (100, 1, _mins(10)),  # fresh match
        (102, 3, _mins(20)),  # stale-only click → NULL payload
        (103, 4, _mins(15)),  # no click at all → NULL payload
    ]
    clicks = [(8, 1, _mins(9)), (10, 3, _mins(1))]
    psrc, csrc = str(tmp_path / "p"), str(tmp_path / "c")
    spark.createDataFrame(purchases, _P_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(psrc)
    spark.createDataFrame(clicks, _C_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(csrc)
    lt = (
        spark.readStream.schema(_P_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(psrc)
        .withWatermark("ts", "25 minutes")
    )
    rt = (
        spark.readStream.schema(_C_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(csrc)
        .withWatermark("click_ts", "25 minutes")
    )
    joined = stream_asof_join(
        lt,
        rt,
        on=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        right_payload=["click_id", "click_ts"],
        tolerance="INTERVAL 15 MINUTES",
        how="left",
    )
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
        spark.createDataFrame(
            [(999, 999, _mins(10_000))], _P_SCHEMA
        ).coalesce(1).write.mode("append").parquet(psrc)
        spark.createDataFrame(
            [(999, 998, _mins(10_000))], _C_SCHEMA
        ).coalesce(1).write.mode("append").parquet(csrc)
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.purchase_id, r.click_id, r.click_ts)
        for r in spark.read.parquet(out).collect()
        if r.purchase_id != 999
    }
    batch = {
        (r.purchase_id, r.click_id, r.click_ts)
        for r in as_of_join(
            spark.createDataFrame(purchases, _P_SCHEMA),
            spark.createDataFrame(clicks, _C_SCHEMA),
            on=["user_id"],
            left_ts="ts",
            right_ts="click_ts",
            right_payload=["click_id", "click_ts"],
            how="left",
            tolerance="INTERVAL 15 MINUTES",
        ).collect()
    }
    assert streamed == batch
    assert (100, 8, _mins(9)) in streamed
    assert (102, None, None) in streamed and (103, None, None) in streamed


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """session_window under watermark across multi-batch placement: a
    session EXTENDED by a later batch (gap < 30 min across the batch
    boundary) must merge, and the finalized sessions equal the batch
    aggregation exactly — the events_sessionization row's streaming
    shape, pinned like the tumbling/sliding windows tier."""
    e_schema = StructType(
        [StructField("user_id", LongType()), StructField("ts", TimestampType())]
    )
    b1 = [(1, _mins(0)), (1, _mins(10)), (2, _mins(5))]
    b2 = [(1, _mins(35)), (1, _mins(90)), (2, _mins(50))]
    src = str(tmp_path / "e")
    spark.createDataFrame(b1, e_schema).coalesce(1).write.mode("append").parquet(src)

    def sessions(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id", F.col("w.start").alias("session_start"), "n_events"
            )
        )

    stream = (
        spark.readStream.schema(e_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "40 minutes")
    )
    out = str(tmp_path / "out")
    q = (
        sessions(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, e_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        spark.createDataFrame([(999, _mins(10_000))], e_schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in spark.read.parquet(out).collect()
        if r.user_id != 999
    )
    want = sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in sessions(spark.createDataFrame(b1 + b2, e_schema)).collect()
    )
    assert got == want
    # the cross-batch merge actually happened: user 1's first session
    # holds 3 events (m0, m10 from batch 1 + m35 from batch 2)
    assert (1, _mins(0), 3) in got
