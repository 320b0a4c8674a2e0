"""Reference-parity query family: the dead-letter topology under oracle check.

Strategy: derive a deterministic Kafka-record stream from the driver's
``events`` table (same derivation spec on both sides), run the records
through the REAL engine path on the Spark side — int32be/UTF-8 serde encode,
``route()`` topology, serde decode of the results — and have the DuckDB
oracle compute the *expected* routing/contract purely logically.  Any
divergence in serde, routing predicates, header construction, size
accounting, or value preservation shows up as a hash mismatch.

Derivation spec (must stay identical in Spark code and oracle SQL):

    key_str  = user_id || '-' || event_id          (record key, UTF-8)
    deser?   = event_type = 'error' AND props IS NOT NULL
               AND octet_length(UTF-8(props)) <> 4 → value bytes = UTF-8(props)
               (the guard keeps the derivation aligned with the engine's
               byte-length routing: a NULL or exactly-4-BYTE props would
               otherwise route differently in engine vs oracle.  BYTES, not
               characters — a 2-char/4-byte props like '€a' encodes to a
               value the int32 deserializer accepts, so the engine routes
               it by the decoded n, never to the deser channel)
    n        = CASE WHEN user_id % 7  = 0 THEN -(floor(value)::int) - 1
                    WHEN user_id % 11 = 0 THEN 1100000 + (event_id % 500000)::int
                    ELSE pmod(floor(value * 10)::int, 4096) END
               (non-deser value bytes = int32-big-endian(n); pmod — always
               non-negative — is emulated in the oracle since DuckDB's %
               follows the dividend's sign)

Expected channels (the reference contract, SURVEY §2.3):
    deser    → raw bytes + "Size of data received by int32 deserializer is
               <len>, expected 4" header
    process  → n < 0: original int + "NegativeLengthError: <n>" header
    prod     → n + len(key) + 88 > 1048576: empty value + RecordTooLarge-
               shaped header naming the size and limit
    output   → everything else, value length == n
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.config import (
    DEFAULT_MAX_REQUEST_SIZE,
    ERROR_HEADER,
    RECORD_OVERHEAD,
    EngineConfig,
)
from kafka_streams_dead_letter_publishing_spark.operators.headers import get_header
from kafka_streams_dead_letter_publishing_spark.operators.topology import route
from kafka_streams_dead_letter_publishing_spark.plans.registry import query
from kafka_streams_dead_letter_publishing_spark.serde import int32be_decode, int32be_encode
from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table

MAX = DEFAULT_MAX_REQUEST_SIZE
OVH = RECORD_OVERHEAD

# ── shared derivation, Spark side ────────────────────────────────────────


def _derived_key() -> Column:
    return F.concat_ws("-", F.col("user_id"), F.col("event_id"))


def _derived_n() -> Column:
    return (
        F.when(F.col("user_id") % 7 == 0, (-F.floor(F.col("value")).cast("int")) - F.lit(1))
        .when(
            F.col("user_id") % 11 == 0,
            (F.lit(1_100_000) + (F.col("event_id") % 500_000)).cast("int"),
        )
        .otherwise(F.pmod(F.floor(F.col("value") * 10).cast("int"), F.lit(4096)))
    )


def _is_deser() -> Column:
    # Guarded so the oracle's event_type-based routing provably agrees with
    # the engine's byte-length-based routing (ADVICE r1): NULL props would
    # produce a NULL value (→ process channel in the engine), 4-byte props
    # would decode as an int — both excluded from the deser arm on BOTH
    # sides of the comparison.  The guard counts UTF-8 BYTES (length of the
    # encoded value — what the deserializer sees), not characters: a
    # 2-char/4-byte props ('€a') must NOT take the deser arm, because its
    # encoded value decodes cleanly and the engine routes it by n.
    return (
        (F.col("event_type") == "error")
        & F.col("props").isNotNull()
        & (F.length(F.encode(F.col("props"), "UTF-8")) != 4)
    )


def derived_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → Kafka-source-shaped records per the derivation spec.

    The events scan is fanned out BEFORE the serde-encode derivation so
    both the encoding and everything downstream run at session parallelism
    (the single-file scan would otherwise serialize them on one core; a
    real Kafka source arrives partitioned — this stands in for topic
    partitioning, and the oracle comparison is order-insensitive).
    """
    from kafka_streams_dead_letter_publishing_spark.sources.tables import fan_out

    ev = fan_out(load_table(spark, sf_dir, "events"), "event_id")
    key_str = _derived_key()
    n = _derived_n()
    is_deser = _is_deser()
    return ev.select(
        F.encode(key_str, "UTF-8").alias("key"),
        F.when(is_deser, F.encode(F.col("props"), "UTF-8"))
        .otherwise(int32be_encode(n))
        .alias("value"),
        F.lit("input").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
    )


# ── shared derivation, oracle side (DuckDB SQL CTE) ──────────────────────

_ORACLE_BASE = f"""
WITH derived AS (
    SELECT
        CAST(user_id AS VARCHAR) || '-' || CAST(event_id AS VARCHAR) AS key_str,
        -- octet_length(encode(..)): UTF-8 BYTE count, matching the engine's
        -- byte-length routing (LENGTH() counts characters and diverges on
        -- any non-ASCII props)
        (event_type = 'error' AND props IS NOT NULL
         AND octet_length(encode(props)) <> 4) AS is_deser,
        props,
        CASE WHEN user_id % 7 = 0 THEN -CAST(FLOOR("value") AS INTEGER) - 1
             WHEN user_id % 11 = 0 THEN CAST(1100000 + (event_id % 500000) AS INTEGER)
             ELSE ((CAST(FLOOR("value" * 10) AS INTEGER) % 4096) + 4096) % 4096
        END AS n
    FROM events
),
routed AS (
    SELECT *,
        CASE WHEN is_deser THEN 'deserialization-exception.DLT'
             -- NULL n ⇒ NULL value bytes ⇒ the engine's NullValueError
             -- process route (operators/mapper.py map_error_class); without
             -- this arm a NULL would fall through WHEN n < 0 (false for
             -- NULL) into 'output' and diverge from the engine
             WHEN n IS NULL THEN 'process-exception.DLT'
             WHEN n < 0 THEN 'process-exception.DLT'
             WHEN n + LENGTH(key_str) + {OVH} > {MAX} THEN 'production-exception.DLT'
             ELSE 'output'
        END AS topic
    FROM derived
)
"""


def _routed(spark: SparkSession, sf_dir: str):
    # parallelism comes from the fan_out inside derived_records
    return route(derived_records(spark, sf_dir), EngineConfig())


def _err() -> Column:
    """Lazy: Column construction needs an active SparkContext, and the
    registry must be importable before any session exists (ADVICE r1)."""
    return get_header(F.col("headers"), ERROR_HEADER)


# ── queries ──────────────────────────────────────────────────────────────


@query(
    "dlt_route_counts",
    _ORACLE_BASE + "SELECT topic, COUNT(*) AS cnt FROM routed GROUP BY topic",
    doc="Four-way split totals: every record lands on exactly one channel "
    "(ops #1,#2,#5,#9,#10 — ErrorHandlingTopology.java:32-44).",
    tags=("reference", "flagship", "bench"),
)
def dlt_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-pass routing decision (same predicates as route(), one scan)
    # instead of a 4-channel union that re-derives the stream per channel;
    # the per-channel value/header contracts are pinned by the four channel
    # queries below, which DO go through route()
    from kafka_streams_dead_letter_publishing_spark.operators.topology import route_topic_label

    labeled = route_topic_label(derived_records(spark, sf_dir), EngineConfig())
    return labeled.groupBy("topic").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "dlt_output_lengths",
    _ORACLE_BASE
    + "SELECT key_str, CAST(n AS BIGINT) AS out_len FROM routed WHERE topic = 'output'",
    doc="Happy path: generated value length equals the requested n for every "
    "record (ops #3,#4,#7,#8 — ErrorHandlingMapper.java:12-27); content is "
    "random by contract so the oracle pins lengths, as the reference's own "
    "tests do.",
    tags=("reference", "bench"),
)
def dlt_output_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = _routed(spark, sf_dir)
    return routed.output.select(
        F.col("key").cast("string").alias("key_str"),
        F.length("value").cast("bigint").alias("out_len"),
    )


@query(
    "dlt_process_channel",
    _ORACLE_BASE
    + """
    SELECT key_str,
           n AS original_value,
           CASE WHEN n IS NULL THEN 'NullValueError: null'
                ELSE 'NegativeLengthError: ' || CAST(n AS VARCHAR) END AS err
    FROM routed WHERE topic = 'process-exception.DLT'
    """,
    doc="Process-error channel: ORIGINAL int value restored (round-tripped "
    "through int32be serde) + '<class>: <message>' header "
    "(ErrorMessageMapper.java:27-38).",
    tags=("reference",),
)
def dlt_process_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = _routed(spark, sf_dir)
    return routed.process_dlt.select(
        F.col("key").cast("string").alias("key_str"),
        int32be_decode(F.col("value")).alias("original_value"),
        _err().alias("err"),
    )


@query(
    "dlt_deser_channel",
    _ORACLE_BASE
    + f"""
    SELECT key_str,
           props AS raw_value,
           -- octet_length: the engine reports the BYTE length of the raw
           -- value (what the deserializer received), not the char count
           'Size of data received by int32 deserializer is '
             || CAST(octet_length(encode(props)) AS VARCHAR) || ', expected 4' AS err
    FROM routed WHERE topic = 'deserialization-exception.DLT'
    """,
    doc="Deserialization-error channel: raw bytes preserved untouched + "
    "size-shaped header (DeadLetterDeserializationExceptionHandler.java:29-49).",
    tags=("reference",),
)
def dlt_deser_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = _routed(spark, sf_dir)
    return routed.deser_dlt.select(
        F.col("key").cast("string").alias("key_str"),
        F.col("value").cast("string").alias("raw_value"),
        _err().alias("err"),
    )


@query(
    "dlt_prod_channel",
    _ORACLE_BASE
    + f"""
    SELECT key_str,
           CAST(0 AS BIGINT) AS value_len,
           'The message is ' || CAST(n + LENGTH(key_str) + {OVH} AS VARCHAR)
             || ' bytes when serialized which is larger than {MAX}, which is'
             || ' the value of the max.request.size configuration.' AS err
    FROM routed WHERE topic = 'production-exception.DLT'
    """,
    doc="Production-error channel: value truncated to EMPTY, header names the "
    "serialized size and limit (DeadLetterProductionExceptionHandler.java:26-67).",
    tags=("reference",),
)
def dlt_prod_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = _routed(spark, sf_dir)
    return routed.prod_dlt.select(
        F.col("key").cast("string").alias("key_str"),
        F.length("value").cast("bigint").alias("value_len"),
        _err().alias("err"),
    )


@query(
    "dlt_udf_safe_map",
    _ORACLE_BASE
    + """
    SELECT key_str,
           CASE WHEN n >= 0 THEN SQRT(CAST(n AS DOUBLE)) END AS result,
           CASE WHEN n IS NULL THEN 'TypeError: must be real number, not NoneType'
                WHEN n < 0 THEN 'ValueError: math domain error' END AS err
    FROM derived
    """,
    doc="General per-record error capture for ARBITRARY Python transforms "
    "(the un-enumerable failure-mode form of ErrorHandlingMapper.java:22-25): "
    "math.sqrt over the derived ints through an Arrow-batched pandas_udf "
    "wrapper — negative inputs become (error_class, error_message) data "
    "instead of task failures; oracle recomputes both channels in SQL.",
    tags=("reference", "udf"),
)
def dlt_udf_safe_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from kafka_streams_dead_letter_publishing_spark.operators.mapper import error_header_text
    from kafka_streams_dead_letter_publishing_spark.operators.safe_map import safe_map
    from kafka_streams_dead_letter_publishing_spark.sources.tables import fan_out

    # fan_out: the pandas_udf is the only Python-bound stage in the family —
    # on the single-file scan's one partition it would run in ONE Python
    # worker regardless of session parallelism
    ev = fan_out(load_table(spark, sf_dir, "events"), "event_id")
    wrapped = ev.select(
        _derived_key().alias("key_str"), safe_map(math.sqrt)(_derived_n()).alias("w")
    )
    w = F.col("w")
    return wrapped.select(
        "key_str",
        w["result"].alias("result"),
        F.when(
            w["error_class"].isNotNull(),
            error_header_text(w["error_class"], w["error_message"]),
        ).alias("err"),
    )


@query(
    "serde_roundtrip_int32",
    _ORACLE_BASE + "SELECT key_str, n AS n_in, n AS n_back FROM derived",
    doc="int32 big-endian codec round-trip over the full derived value range "
    "(negative / huge / small), matching Kafka's IntegerSerializer wire "
    "format (SURVEY §1.2).",
    tags=("reference", "serde"),
)
def serde_roundtrip_int32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n = _derived_n()
    return ev.select(
        _derived_key().alias("key_str"),
        n.alias("n_in"),
        int32be_decode(int32be_encode(n)).alias("n_back"),
    )
