"""Multi-format ingestion: CSV / JSON-lines / ORC → the engine's tables.

The reference ingests exactly one external format — its gzipped image files
for bulk load (TorcGraph.java:756-820). A Spark engine serving a training-
data pipeline meets raw corpora as JSONL and CSV long before they become
parquet; these readers land any of them with an EXPLICIT schema (never
inferSchema on production data — schema inference is a full extra pass over
100 TB and silently widens types), then normalize timestamps the same way
``load_table`` does so downstream operators see one type system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

READ_FORMATS = ("parquet", "csv", "json", "orc")

# canonical schema for external document corpora (JSONL/CSV drops land here)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    timestamp_cols: tuple[str, ...] = (),
    **options: str,
) -> DataFrame:
    """Read ``path`` in any supported format with a caller-supplied schema.

    CSV defaults: header on, standard quoting/escaping. JSON is JSON-lines
    (one object per line — the splittable form; multiline JSON cannot be
    parallelized across a 100 TB input). Timestamp columns arriving as
    strings or TIMESTAMP_NTZ are normalized to session-TZ TIMESTAMP.
    """
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; known: {READ_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("escape", '"')
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    for c in timestamp_cols:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def ingest_documents(
    spark: SparkSession, path: str, fmt: str = "json", **options: str
) -> DataFrame:
    """Land an external document corpus (JSONL or CSV) in the canonical
    documents schema, recomputing ``n_chars`` when the source omits it —
    the first stage of every dedup/quality pipeline in operators/."""
    df = read_any(spark, path, fmt=fmt, schema=DOCUMENTS_SCHEMA, **options)
    return df.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )
