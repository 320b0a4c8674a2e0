"""applyInPandasWithState: state must survive across micro-batches."""

from __future__ import annotations

from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from kafka_streams_dead_letter_publishing_spark.streaming.stateful import running_user_totals

SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("value", DoubleType())]
)


def test_state_accumulates_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.user_id: (r.n_events, r.total) for r in spark.sql("SELECT * FROM totals").collect()}
        assert first[1] == (2, 15.0)
        assert first[2] == (1, 1.0)

        # batch 2: new file → state must carry over, not reset
        spark.createDataFrame([(1, 2.0), (3, 7.0)], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM totals").collect()
        latest = {}
        for r in rows:  # running counts are monotone: keep the max per key
            if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
                latest[r.user_id] = (r.n_events, r.total)
        assert latest[1] == (3, 17.0)
        assert latest[3] == (1, 7.0)
        assert latest[2] == (1, 1.0)
    finally:
        q.stop()
