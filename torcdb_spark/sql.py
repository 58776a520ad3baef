"""SQL entry point: register the fixture tables AND the property-graph
views as temp views so any query runs via ``spark.sql`` directly.

The reference exposes only a Gremlin/client API; this engine additionally
exposes the full Spark SQL surface over the same data — the practical
"switch path" for users whose workloads are relational. Views are lazy
(plain logical plans over the parquet scans), so registration costs
nothing and every Catalyst optimization applies unchanged through
``spark.sql`` exactly as through the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torcdb_spark.sources.tables import TABLE_NAMES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, include_graph: bool = True
) -> None:
    """Register every fixture table (``region`` … ``embeddings``) and —
    unless disabled — the property-graph projections ``g_vertices``
    (id, label, props) and ``g_edges`` (src, dst, label, props) as
    session-scoped temp views."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    if include_graph:
        from torcdb_spark.graph import PropertyGraph

        g = PropertyGraph.open(spark, sf_dir)
        g.vertices.createOrReplaceTempView("g_vertices")
        g.edges.createOrReplaceTempView("g_edges")


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run a SQL string over the registered views (registering them first
    when ``sf_dir`` is given) — the one-call ad-hoc entry point."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)
