from kafka_streams_dead_letter_publishing_spark.operators.safe_map import safe_map, split_wrapped
from kafka_streams_dead_letter_publishing_spark.operators.topology import Routed, route

__all__ = ["Routed", "route", "safe_map", "split_wrapped"]
