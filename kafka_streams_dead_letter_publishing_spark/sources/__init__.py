from kafka_streams_dead_letter_publishing_spark.sources.records import (
    KAFKA_SOURCE_SCHEMA,
    int32be,
    records_df,
)
from kafka_streams_dead_letter_publishing_spark.sources.synth import (
    synth_documents,
    synth_embeddings,
)
from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table, load_tables

__all__ = [
    "KAFKA_SOURCE_SCHEMA",
    "int32be",
    "records_df",
    "load_table",
    "load_tables",
    "synth_documents",
    "synth_embeddings",
]
