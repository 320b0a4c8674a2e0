"""Kafka-source-shaped record fixtures (batch mode).

The unit tier feeds the topology a batch DataFrame shaped exactly like
``spark.readStream.format("kafka")…option("includeHeaders","true")`` — the
direct analogue of the reference's ``TopologyTestDriver`` tier
(``src/test/java/.../ErrorHandlingTopologyTest.java:31-40``), per FIXTURES.md
§A.1.
"""

from __future__ import annotations

import datetime
import struct
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_SOURCE_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("timestampType", IntegerType(), True),
        StructField(
            "headers",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType(), True),
                        StructField("value", BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

_EPOCH = datetime.datetime(2024, 1, 1)


def int32be(n: int) -> bytes:
    """4-byte big-endian two's-complement — Kafka ``IntegerSerializer`` wire
    format (pinned by ``ErrorHandlingTopologyIntegrationTest.java:103``)."""
    return struct.pack(">i", n)


def records_df(
    spark: SparkSession,
    records: Iterable[tuple[bytes | None, bytes | None]],
    topic: str = "input",
    headers: list[tuple[str, bytes]] | None = None,
) -> DataFrame:
    """Build a Kafka-source-shaped DataFrame from (key, value) byte pairs."""
    hdrs = list(headers) if headers else None
    rows = [
        (k, v, topic, 0, i, _EPOCH + datetime.timedelta(seconds=i), 0, hdrs)
        for i, (k, v) in enumerate(records)
    ]
    return spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)
