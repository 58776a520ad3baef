"""Parquet table sources.

The reference's only data sources are RAMCloud KV tables plus an offline
image-file bulk-load path (TorcGraph.java:102-112, 756-820). Here the source
layer is Spark's native columnar scan: ``spark.read.parquet`` gives the
vectorized reader, predicate pushdown, column pruning and partition pruning
for free — the Spark analogue of the reference's multiread batching
(TorcEdgeList.java:1236-1303).

At 100 TB these same calls scan a partitioned lakehouse layout; nothing here
assumes local files beyond the path string.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The fixtures store TIMESTAMP(isAdjustedToUTC=false, MICROS), which Spark
# reads as TIMESTAMP_NTZ. The session timezone is pinned to UTC
# (session.py), so casting NTZ→TIMESTAMP is value-preserving; doing it once
# here means every downstream consumer (unix_millis, window(), watermarks,
# the DuckDB oracle comparison) sees ordinary TIMESTAMP semantics.
TIMESTAMP_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Filters/projections applied by callers are pushed
    down into this scan by Catalyst (verify with .explain: PushedFilters)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TIMESTAMP_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables as a dict of lazy DataFrames (no I/O yet)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
