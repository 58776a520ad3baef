"""Streaming connector surface: Kafka-shaped sources.

The reference consumes no message bus (RAMCloud RPCs only); a production
Spark deployment of this engine ingests CDC/event streams from Kafka. The
wire schema Spark's kafka source emits is fixed (key/value binary, topic,
partition, offset, timestamp, timestampType) — so the DECODE stage is plain
DataFrame code, testable on static frames without a broker, while the
source builder is a thin option wrapper.

The kafka-sql connector jar is not bundled in this environment;
``kafka_source`` raises a documented error if the format is unavailable.
The decode/enrich transforms below are the load-bearing code and run
against any DataFrame with the wire schema (including the unit tests').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark's kafka source output schema (fixed by the connector contract)
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from Kafka with the options a production job needs
    pinned: offset bounds per trigger (backpressure — without it the first
    batch after downtime swallows the whole backlog), explicit starting
    offsets. Raises with guidance when the connector jar is absent."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "kafka source requires the spark-sql-kafka connector on the "
            "classpath (--packages org.apache.spark:spark-sql-kafka-0-10_*)"
        ) from exc


def decode_json_events(
    wire: DataFrame,
    value_schema: T.StructType,
    key_as: str = "event_key",
    drop_corrupt: bool = True,
) -> DataFrame:
    """Decode the kafka wire frame: UTF-8 JSON value → typed columns,
    key → string, Kafka ingestion metadata preserved as ``_topic`` /
    ``_partition`` / ``_offset`` / ``_ingest_ts`` (offsets are the
    exactly-once bookkeeping downstream sinks dedup on).

    ``drop_corrupt`` discards rows whose value fails to parse — at
    100 TB/day a poison-pill message must not kill the stream. PERMISSIVE
    from_json yields an all-null struct for bad JSON (not a null struct),
    so corruption is detected via an explicit corrupt-record column in the
    parse schema, the connector-grade idiom."""
    corrupt = "_corrupt"
    schema_with_corrupt = T.StructType(
        list(value_schema.fields) + [T.StructField(corrupt, T.StringType())]
    )
    parsed = wire.select(
        F.col("key").cast("string").alias(key_as),
        F.from_json(
            F.col("value").cast("string"),
            schema_with_corrupt,
            {"columnNameOfCorruptRecord": corrupt},
        ).alias("_evt"),
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
        F.col("timestamp").alias("_ingest_ts"),
    )
    if drop_corrupt:
        parsed = parsed.where(
            F.col("_evt").isNotNull() & F.col(f"_evt.{corrupt}").isNull()
        )
    fields = [f"_evt.{f.name}" for f in value_schema.fields]
    return parsed.select(
        key_as, *fields, "_topic", "_partition", "_offset", "_ingest_ts"
    )


def dedup_by_offset(decoded: DataFrame, key_cols: list[str]) -> DataFrame:
    """At-least-once → effectively-once: keep the FIRST offset per business
    key (min_by on offset). Batch form of the sink-side idempotence a
    replayed kafka partition needs; the streaming form is
    dropDuplicatesWithinWatermark (streaming/jobs.py streaming_dedup)."""
    others = [c for c in decoded.columns if c not in key_cols]
    return decoded.groupBy(*key_cols).agg(
        *[F.min_by(c, "_offset").alias(c) for c in others]
    )
