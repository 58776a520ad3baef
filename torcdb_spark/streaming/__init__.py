from torcdb_spark.streaming.connectors import (
    KAFKA_WIRE_SCHEMA,
    decode_json_events,
    dedup_by_offset,
    kafka_source,
)
from torcdb_spark.streaming.jobs import (
    apply_cdc_stream,
    events_stream,
    sessionized_stream,
    streaming_dedup,
    windowed_counts,
)

__all__ = [
    "apply_cdc_stream",
    "events_stream",
    "windowed_counts",
    "sessionized_stream",
    "streaming_dedup",
    "KAFKA_WIRE_SCHEMA",
    "decode_json_events",
    "dedup_by_offset",
    "kafka_source",
]
