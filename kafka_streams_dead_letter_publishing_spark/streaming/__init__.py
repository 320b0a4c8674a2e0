from kafka_streams_dead_letter_publishing_spark.streaming.runner import (
    DeadLetterStream,
    kafka_sink_writer,
    parquet_sink_writer,
    run_stream,
)

__all__ = ["DeadLetterStream", "kafka_sink_writer", "parquet_sink_writer", "run_stream"]
