"""Engine configuration.

Mirrors the reference's typed config surface — topic names bound from
``application.yml`` via ``@ConfigurationProperties`` (reference
``src/main/java/de/tg/kafka/streams/dead/letter/config/TopicConfig.java:5-12``,
``src/main/resources/application.yml:14-19``) — as a plain frozen dataclass.
No schema registry (deliberately absent in the reference, ``README.md:242``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Kafka's default ``max.request.size`` — the producer limit the reference's
# integration test exercises (reference ``README.md:366``,
# ``ErrorHandlingTopologyIntegrationTest.java:119-121``).
DEFAULT_MAX_REQUEST_SIZE = 1_048_576

# Per-record framing overhead we charge when estimating a record's serialized
# size for the pre-flight production guard (key bytes + value bytes +
# RECORD_OVERHEAD).  The Kafka producer counts the whole serialized record,
# not just the value: the reference test observes a value of 2,000,000 bytes
# reported as "2000091 bytes when serialized" with a 3-byte key
# (``ErrorHandlingTopologyIntegrationTest.java:111,119``), i.e. 88 bytes of
# batch/record framing at those sizes.  We charge the same constant so the
# synthesized error message matches the reference scenario's numbers.
RECORD_OVERHEAD = 88

# Header name attached to every dead-letter record (reference
# ``errorhandling/ErrorMessageMapper.java:12``).
ERROR_HEADER = "error.message"


@dataclass(frozen=True)
class EngineConfig:
    """All knobs for one engine instance.

    Topic names default to the reference's ``application.yml:14-19``.
    """

    input_topic: str = "input"
    output_topic: str = "output"
    process_dlt: str = "process-exception.DLT"
    deser_dlt: str = "deserialization-exception.DLT"
    prod_dlt: str = "production-exception.DLT"

    bootstrap_servers: str = "localhost:9092"
    checkpoint_dir: str = "/tmp/dead-letter-engine-checkpoint"
    application_id: str = "dead-letter-engine"

    max_request_size: int = DEFAULT_MAX_REQUEST_SIZE

    # Seed for the engine's deterministic random-string generator (the
    # reference uses an unseeded ``java.util.Random``; we are deterministic
    # by construction so golden tests and the duckdb oracle can pin
    # properties).
    seed: int = 42

    # Streaming knobs — backpressure and source parallelism floor for the
    # 100 TB posture (SURVEY §4.3).
    max_offsets_per_trigger: int | None = None
    min_partitions: int | None = None

    # foreachBatch fan-out (r18, guide §2/§8): repartition each micro-batch
    # to this many partitions BEFORE routing, so the expensive
    # value-producing stage (random-string generation, ~30 µs/row) runs at
    # cluster parallelism even when the source batch arrives
    # under-partitioned (a file source delivers one partition per file; a
    # real Kafka source uses ``min_partitions`` instead, which splits at
    # the source and keeps per-partition order).  The shuffle moves only
    # the RAW records (binary key + 4-byte value), never generated output
    # — measured at sf0.1: a 25k-row single-partition trigger's output
    # write drops 1.24 s -> 0.65 s.  Trade-offs: per-partition input order
    # is no longer preserved into the sinks (the default ``None`` keeps
    # the order-preserving single-pass behavior), and each sink writes up
    # to this many files per trigger — size it to batch volume, not cores,
    # where file counts matter.
    batch_fan_out: int | None = None

    extra_kafka_options: dict[str, str] = field(default_factory=dict)

    @property
    def all_topics(self) -> tuple[str, str, str, str, str]:
        return (
            self.input_topic,
            self.output_topic,
            self.process_dlt,
            self.deser_dlt,
            self.prod_dlt,
        )
