"""The dead-letter topology as a pure DataFrame → DataFrames function.

This is the engine core (SURVEY §2 ops #2–#10, §3.3): one function
``route(df, cfg)`` taking a Kafka-source-shaped DataFrame and returning the
four sink-shaped DataFrames (output + three dead-letter channels).  Because
it is a pure function of Column expressions it runs identically on

* a batch DataFrame built from fixtures (unit tier — the analogue of the
  reference's ``TopologyTestDriver`` tests),
* a duckdb-oracle batch derived from /root/testdata (correctness tier),
* each micro-batch inside ``foreachBatch`` (streaming tier).

Reference topology being reproduced
(``topology/ErrorHandlingTopology.java:28-45``)::

    input ─deserialize(String,Integer)─ mapValues(wrap) ─ split(hasError)
        ├─ error:   processValues(ErrorMessageMapper) → process-exception.DLT
        └─ default: mapValues(mappedValue)            → output

plus the two handler channels that sit outside the topology in the
reference: consumer-side deserialization failures
(``DeadLetterDeserializationExceptionHandler.java:29-49``) and producer-side
failures with too-large truncation
(``DeadLetterProductionExceptionHandler.java:26-45,59-67``).

Dead-letter record contract (SURVEY §2 "contract", pinned by the reference
tests): value = original/raw payload (empty for too-large production
errors), key unchanged, existing headers preserved, ``error.message`` header
appended (``"<class>: <message>"`` on the topology path, bare message on the
handler paths).

Scale posture: every channel is selects/filters off one shared scan — no
shuffle, no UDF, full whole-stage codegen; per-partition order is preserved
because nothing repartitions between decode and sink (SURVEY §3.4).  The
routing predicates are FLAT columns (decoded int, error class, value
length), so Catalyst prunes the expensive generated string out of every
channel that doesn't emit it — only the output sink pays for generation,
and only for records that will actually be produced (too-large records are
size-checked on the *declared* length and never materialized).  In
streaming the caller persists the micro-batch so the source is read once
(see ``streaming.runner``).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.config import RECORD_OVERHEAD, EngineConfig
from kafka_streams_dead_letter_publishing_spark.operators.headers import (
    append_error_header,
    empty_headers,
)
from kafka_streams_dead_letter_publishing_spark.operators.mapper import (
    error_header_text,
    map_error_class,
    map_error_message,
    random_lowercase_string,
)
from kafka_streams_dead_letter_publishing_spark.serde import (
    int32_deser_error_message,
    int32be_decode,
    int32be_encode,
    utf8_encode,
)

# re-exported for compatibility (historical home of the constant)
from kafka_streams_dead_letter_publishing_spark.operators.mapper import (  # noqa: F401
    NULL_VALUE_ERROR_CLASS,
)


class Routed(NamedTuple):
    """The four sink-shaped streams (key/value binary, headers, topic)."""

    output: DataFrame
    process_dlt: DataFrame
    deser_dlt: DataFrame
    prod_dlt: DataFrame
    #: the persisted decoded staging frame all four channels read (r18,
    #: the r17 advice: route() persists it, so the OWNER of the Routed —
    #: streaming.runner.process_batch, or any long-lived batch caller —
    #: must unpersist it once the channel writes complete; None when a
    #: custom topology built the channels without a shared staging)
    staged: DataFrame | None = None

    def union_all(self) -> DataFrame:
        """All channels as one DataFrame (inspection/testing)."""
        return (
            self.output.unionByName(self.process_dlt)
            .unionByName(self.deser_dlt)
            .unionByName(self.prod_dlt)
        )

    def unpersist_staged(self) -> None:
        """Release the staged decode cache (no-op without one).  Safe
        after the channel writes: the cache is a pure function of the
        source batch, so a late consumer just recomputes."""
        if self.staged is not None:
            self.staged.unpersist()


def _sink_shape(df: DataFrame, key: Column, value: Column, headers: Column, topic: str) -> DataFrame:
    return df.select(
        key.alias("key"),
        value.alias("value"),
        headers.alias("headers"),
        F.lit(topic).alias("topic"),
    )


def serialized_record_size(value_len: Column, key: Column) -> Column:
    """Estimated full serialized record size, as the Kafka producer counts it
    for ``max.request.size``: value + key + framing overhead (see
    ``config.RECORD_OVERHEAD``)."""
    return value_len + F.coalesce(F.length(key), F.lit(0)) + F.lit(RECORD_OVERHEAD)


def too_large_message(size: Column, max_request_size: int) -> Column:
    """Shape-faithful analogue of Kafka's ``RecordTooLargeException`` text,
    pinned by ``ErrorHandlingTopologyIntegrationTest.java:119-121``."""
    return F.concat(
        F.lit("The message is "),
        size.cast("string"),
        F.lit(" bytes when serialized which is larger than "),
        F.lit(str(max_request_size)),
        F.lit(", which is the value of the max.request.size configuration."),
    )


def route_topic_label(df: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    """Single-pass routing DECISION: each record labeled with the topic
    ``route`` would send it to, without materializing the four channels.

    Same predicates as :func:`route` in the same precedence order (deser →
    process-error → too-large → output) — use for routing counts and
    monitoring where a 4-way union would re-scan the source once per
    channel (the per-channel contracts themselves are pinned by ``route``'s
    outputs and their oracle queries).
    """
    cfg = cfg or EngineConfig()
    key, value = F.col("key"), F.col("value")
    decoded = df.withColumn("__n", int32be_decode(value))
    n = F.col("__n")
    is_deser_failure = n.isNull() & value.isNotNull()
    has_error = map_error_class(n, value).isNotNull()
    is_too_large = serialized_record_size(n.cast("long"), key) > F.lit(cfg.max_request_size)
    return decoded.select(
        F.when(is_deser_failure, F.lit(cfg.deser_dlt))
        .when(has_error, F.lit(cfg.process_dlt))
        .when(is_too_large, F.lit(cfg.prod_dlt))
        .otherwise(F.lit(cfg.output_topic))
        .alias("topic")
    )


def route(df: DataFrame, cfg: EngineConfig | None = None) -> Routed:
    """Run the full dead-letter topology over a Kafka-source-shaped batch.

    ``df`` must have ``key: binary``, ``value: binary`` and may have
    ``headers: array<struct<key string, value binary>>`` plus the usual
    source metadata (topic/partition/offset) — metadata, when present, seeds
    the deterministic random generator so repeated records decorrelate.
    """
    cfg = cfg or EngineConfig()

    cols = set(df.columns)
    if "headers" not in cols:
        df = df.withColumn("headers", empty_headers())
    uniq_parts = [F.col(c) for c in ("topic", "partition", "offset") if c in cols]
    # materialized as a column: the generator's per-block lambda references
    # it once per 13 output chars, and higher-order functions re-evaluate
    # inlined (non-attribute) expressions on every reference
    df = df.withColumn("__uniq", F.xxhash64(F.col("key"), *uniq_parts))
    uniq = F.col("__uniq")

    key, value, headers = F.col("key"), F.col("value"), F.col("headers")

    # ── op #2: typed decode; failure ⇒ NULL ⇒ deser channel (op #9) ──────
    n = F.col("__n")
    # PERSIST the decoded staging (r17, measured from the channel-query
    # plans): the four channel filters otherwise push BELOW the staged
    # __uniq/__n projections — and below any upstream repartition — where
    # Catalyst re-inlines the full decode chain into each filter
    # condition (the routing predicate ran pre-exchange on the source
    # scan's single partition, then the projection re-evaluated the same
    # chain post-exchange).  Filters cannot push below an
    # InMemoryRelation, so every channel reads the staged columns; the
    # decode runs once, at session parallelism.  Per-batch caches are
    # unpinned by the ContextCleaner once the Routed frames drop.
    decoded = df.withColumn("__n", int32be_decode(value)).persist()
    is_deser_failure = n.isNull() & value.isNotNull()

    deser_dlt = _sink_shape(
        decoded.filter(is_deser_failure),
        key,
        value,  # raw bytes untouched (DeadLetterDeserializationExceptionHandler.java:38)
        append_error_header(headers, int32_deser_error_message(value)),
        cfg.deser_dlt,
    )

    # ── op #3: error-capturing map — failure modes as FLAT columns so
    #    routing-only consumers never pay for string generation ────────────
    wrapped = (
        decoded.filter(~is_deser_failure)
        .withColumn("__error_class", map_error_class(n, value))
        .withColumn("__error_message", map_error_message(n, value))
    )
    has_error = F.col("__error_class").isNotNull()

    # ── op #5/#6: split on hasError; error branch restores the ORIGINAL
    #    value and appends "<class>: <message>" (ErrorMessageMapper) ───────
    process_dlt = _sink_shape(
        wrapped.filter(has_error),
        key,
        int32be_encode(n),  # original, pre-map value
        append_error_header(
            headers, error_header_text(F.col("__error_class"), F.col("__error_message"))
        ),
        cfg.process_dlt,
    )

    # ── op #7: success branch; mapped length == n by construction, so the
    #    size check needs no materialized string ──────────────────────────
    ok = wrapped.filter(~has_error)
    out_size = serialized_record_size(n.cast("long"), key)
    is_too_large = out_size > F.lit(cfg.max_request_size)

    # ── op #10: pre-flight production guard — Spark's Kafka sink has no
    #    post-hoc producer hook, so the size check runs before the write;
    #    too-large values are truncated to EMPTY (not null) bytes and the
    #    oversized string is NEVER generated
    #    (DeadLetterProductionExceptionHandler.java:59-67) ─────────────────
    prod_dlt = _sink_shape(
        ok.filter(is_too_large),
        key,
        F.lit(b""),
        append_error_header(headers, too_large_message(out_size, cfg.max_request_size)),
        cfg.prod_dlt,
    )

    # ── op #4/#8: generate + typed serialize, output sink only ───────────
    output = _sink_shape(
        ok.filter(~is_too_large),
        key,
        utf8_encode(random_lowercase_string(n, uniq, cfg.seed)),
        headers,
        cfg.output_topic,
    )

    return Routed(
        output=output,
        process_dlt=process_dlt,
        deser_dlt=deser_dlt,
        prod_dlt=prod_dlt,
        staged=decoded,
    )
