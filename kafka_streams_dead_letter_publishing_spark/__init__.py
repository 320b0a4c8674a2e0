"""PySpark-native dead-letter stream engine.

A brand-new engine with the capabilities of
``tobias-gaenzler/kafka-streams-dead-letter-publishing`` (reference at
/root/reference, read-only): a Kafka-in/Kafka-out dataflow with typed serde
boundaries, stateless per-record transforms, predicate-based stream
splitting, record-header manipulation, and a three-channel dead-letter
protocol, plus LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

The engine core is a *pure topology function* over DataFrames
(``operators.topology.route``) built entirely from Catalyst-optimizable
Column expressions (zero Python UDFs on the reference-parity path), wrapped
by Structured Streaming ``foreachBatch`` for multi-sink Kafka routing
(``streaming.runner``). The same code path therefore runs in batch mode for
unit tests / oracle checks and in streaming mode against real Kafka.
"""

from kafka_streams_dead_letter_publishing_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
