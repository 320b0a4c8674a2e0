"""Multimodal-column query family ([EXT], SURVEY §7 M5): opaque binary
payloads + typed metadata, processed through Arrow-batched ``mapInPandas``.

The payload here is the UTF-8 bytes of ``documents.text`` (the container has
no image/audio codecs — ``functions.multimodal.decode_image`` is the
documented stub), but the Spark-side plumbing is the real thing: binary
column, metadata struct, ``mapInPandas`` with an explicit output schema over
Arrow record batches.  The oracle reproduces the byte-level features in SQL
(the corpus is pure ASCII, verified: length == octet_length for every row),
so this family gets a full hash check despite the Python stage.

Scale posture: ``mapInPandas`` is a narrow transformation over Arrow batches
— no shuffle, no per-row Python; 100 TB of media shards across executors
like any other column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
    CHECKSUM_MOD,
    CHECKSUM_PREFIX,
    FRAME_BYTES,
    extract_features,
    with_payload,
)
from kafka_streams_dead_letter_publishing_spark.plans.registry import query
from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table


@query(
    "docs_payload_features",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum([unicode(substring(text, i, 1))
                          for i in generate_series(1, least(length(text), {CHECKSUM_PREFIX}))])
                % {CHECKSUM_MOD} AS BIGINT) AS checksum,
           CAST(length(text) // {FRAME_BYTES} AS BIGINT) AS n_frames
    FROM documents
    """,
    doc="[EXT] Multimodal feature extraction: binary payload column → "
    "Arrow-batched mapInPandas computing byte length, prefix checksum and "
    "frame-sample count; the oracle recomputes the same byte-level features "
    "in SQL (ASCII corpus ⇒ unicode(char) == byte).",
    tags=("multimodal",),
)
def docs_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_payload(docs))
