from kafka_streams_dead_letter_publishing_spark.operators.topology import Routed, route

__all__ = ["Routed", "route"]
