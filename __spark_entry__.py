"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the declared operator inventory from SURVEY.md §2
(implemented in ``torcdb_spark/queries.py``) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 3-hop graph traversal on the property-graph view —
    BUILDING-segment customers → orders → lineitems → suppliers, with
    set-algebra composition and property hydration, aggregated to
    per-supplier revenue. Exercises S5, T1, T2, A1 end-to-end."""
    import pyspark.sql.functions as F

    from torcdb_spark import PropertyGraph, traverse, Direction, algebra
    from torcdb_spark.ids import id_lower

    g = PropertyGraph.open(spark, "/root/testdata/sf0.001")
    frontier = g.vertices.where(
        (F.col("label") == "customer")
        & (F.col("props")["c_mktsegment"] == "BUILDING")
    ).select("id")
    h1 = traverse(frontier, g.edges, "placed", Direction.OUT)
    h2 = traverse(
        h1.select(F.col("dst").alias("id")).dropDuplicates(["id"]),
        g.edges, "contains", Direction.OUT,
    )
    cust_to_line = algebra.fuse(h1, h2)
    h3 = traverse(
        cust_to_line.select(F.col("dst").alias("id")).dropDuplicates(["id"]),
        g.edges, "suppliedBy", Direction.OUT, fill_edge=True,
    )
    supplier_rev = (
        algebra.fuse(cust_to_line, h3)
        .groupBy("dst")
        .agg(F.count("*").alias("n_paths"))
        .join(g.vertices, F.col("dst") == F.col("id"))
        .select(
            id_lower(F.col("id")).alias("s_suppkey"),
            F.col("props")["s_name"].alias("s_name"),
            F.col("n_paths").cast("long").alias("n_paths"),
        )
        .orderBy("s_suppkey")
    )
    return supplier_rev


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from torcdb_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from torcdb_spark.queries import oracle_sql as _o

    return _o()
