"""Record-header manipulation as Column expressions.

Kafka record headers are ``array<struct<key string, value binary>>`` (the
Spark Kafka source/sink shape with ``includeHeaders=true``).  The reference
appends a UTF-8 ``error.message`` header to every dead-letter record while
preserving existing headers (``errorhandling/ErrorMessageMapper.java:32-38``:
``wrappedRecord.headers().add(EXCEPTION_HEADER, ...)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, StructField, StructType, StringType

from kafka_streams_dead_letter_publishing_spark.config import ERROR_HEADER

HEADERS_TYPE = ArrayType(
    StructType(
        [
            StructField("key", StringType(), True),
            StructField("value", BinaryType(), True),
        ]
    )
)


def empty_headers() -> Column:
    return F.lit(None).cast(HEADERS_TYPE)


def header(name: Column | str, value: Column) -> Column:
    """One header struct; value must already be binary."""
    name_col = F.lit(name) if isinstance(name, str) else name
    return F.struct(name_col.alias("key"), value.alias("value"))


def append_header(headers: Column, name: str, utf8_value: Column) -> Column:
    """Append a UTF-8 header, preserving existing headers (NULL-safe).

    Mirrors the reference's append semantics (``ErrorMessageMapper.java:36``):
    existing headers are kept, the new one goes last.
    """
    return F.concat(
        F.coalesce(headers, F.array().cast(HEADERS_TYPE)),
        F.array(header(name, F.encode(utf8_value, "UTF-8"))),
    )


def append_error_header(headers: Column, message: Column) -> Column:
    """Append the dead-letter ``error.message`` header
    (``ErrorMessageMapper.java:12``)."""
    return append_header(headers, ERROR_HEADER, message)


def get_header(headers: Column, name: str) -> Column:
    """Extract the last header with ``name`` as a UTF-8 string (NULL if
    absent) — test/inspection helper."""
    matches = F.filter(headers, lambda h: h["key"] == F.lit(name))
    return F.element_at(matches, -1)["value"].cast("string")
