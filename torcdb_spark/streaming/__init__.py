from torcdb_spark.streaming.jobs import (
    events_stream,
    sessionized_stream,
    streaming_dedup,
    windowed_counts,
)

__all__ = [
    "events_stream",
    "windowed_counts",
    "sessionized_stream",
    "streaming_dedup",
]
