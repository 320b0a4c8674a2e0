from kafka_streams_dead_letter_publishing_spark.streaming.dedup import (
    dedup_within_watermark,
    windowed_type_counts,
)
from kafka_streams_dead_letter_publishing_spark.streaming.runner import (
    DeadLetterStream,
    kafka_sink_writer,
    parquet_sink_writer,
    run_stream,
)
from kafka_streams_dead_letter_publishing_spark.streaming.stateful import running_user_totals

__all__ = [
    "DeadLetterStream",
    "dedup_within_watermark",
    "kafka_sink_writer",
    "parquet_sink_writer",
    "run_stream",
    "running_user_totals",
    "windowed_type_counts",
]
