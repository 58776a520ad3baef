"""Graph-image round-trips (S7-S10 bulk load/save surface, sources/io.py)."""

import pytest

from torcdb_spark.sources.io import (
    read_graph,
    read_graph_bucketed,
    write_graph,
    write_graph_bucketed,
)


def _fingerprint(g):
    """Order-insensitive content fingerprint of a graph."""
    from pyspark.sql import functions as F

    v = (
        g.vertices.select(
            F.xxhash64(F.hex("id"), "label", F.to_json("props")).alias("h")
        )
        .agg(F.expr("bit_xor(h)"))
        .first()[0]
    )
    e = (
        g.edges.select(
            F.xxhash64(
                F.hex("src"), "src_label", F.hex("dst"), "dst_label",
                "label", F.to_json("props"),
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)"))
        .first()[0]
    )
    return v, e


@pytest.mark.parametrize("fmt", ["parquet", "csv", "jsonl"])
def test_graph_image_roundtrip(graph, spark, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp(f"img_{fmt}"))
    write_graph(graph, path, fmt=fmt)
    back = read_graph(spark, path, fmt=fmt)
    assert back.vertices.columns == graph.vertices.columns
    assert back.edges.columns == graph.edges.columns
    assert _fingerprint(back) == _fingerprint(graph)


def test_overwrite_is_delete_graph(graph, spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("img_ow"))
    write_graph(graph, path, fmt="parquet")
    # S10 deleteGraph + reload: second overwrite replaces, not appends
    write_graph(graph, path, fmt="parquet")
    back = read_graph(spark, path, fmt="parquet")
    assert back.vertices.count() == graph.vertices.count()
    assert back.edges.count() == graph.edges.count()


def test_bucketed_join_has_no_edge_exchange(graph, spark):
    write_graph_bucketed(graph, "t_img", buckets=8)
    try:
        g2 = read_graph_bucketed(spark, "t_img")
        assert g2.edges.count() == graph.edges.count()
        # self-join two same-bucketed reads on the bucket key: with bucketing
        # Catalyst needs no shuffle on either side (disable auto-broadcast so
        # the sort-merge path — the one a 100 TB edges table would take — is
        # what gets planned)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            e1 = spark.table("t_img_edges").select("src", "label")
            e2 = spark.table("t_img_edges").select("src", "dst")
            plan = (
                e1.join(e2, "src")._jdf.queryExecution().executedPlan().toString()
            )
            assert "Exchange hashpartitioning" not in plan, plan
            assert "SortMergeJoin" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_img_vertices")
        spark.sql("DROP TABLE IF EXISTS t_img_edges")


def test_orc_roundtrip(spark, graph, tmp_path):
    from torcdb_spark.sources.io import read_graph, write_graph

    p = str(tmp_path / "orc_img")
    write_graph(graph, p, fmt="orc")
    back = read_graph(spark, p, fmt="orc")
    assert back.vertices.count() == graph.vertices.count()
    assert back.edges.count() == graph.edges.count()
    # ORC reader differs from the in-memory frame only in nullability flags
    assert [(f.name, f.dataType) for f in back.vertices.schema] == [
        (f.name, f.dataType) for f in graph.vertices.schema]


def test_write_table_partitioned_prunes(spark, tmp_path):
    from torcdb_spark.sources.io import write_table_partitioned
    import pyspark.sql.functions as F

    df = spark.range(1000).select(
        "id",
        (F.col("id") % 7).alias("day"),
        (F.col("id") * 2.0).alias("v"),
    )
    path = str(tmp_path / "events_by_day")
    write_table_partitioned(df, path, ["day"])
    back = spark.read.parquet(path).where(F.col("day") == 3)
    assert back.count() == df.where(F.col("id") % 7 == 3).count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:120]
    assert "day" in pf  # the filter prunes directories, not rows


def test_stream_to_table_exactly_once_drain(spark, tmp_path):
    """Bounded drain lands all rows; a RESTARTED drain over the same
    checkpoint adds nothing (offsets committed in the WAL)."""
    from torcdb_spark.sources.io import stream_to_table
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    src = str(tmp_path / "src")
    spark.range(500).select(
        "id", (F.col("id") % 5).alias("k")
    ).write.parquet(src)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("k", T.LongType())]
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_to_table(stream, out, ckpt, partition_cols=["k"])
        q.awaitTermination()

    drain()
    assert spark.read.parquet(out).count() == 500
    drain()  # same checkpoint: nothing new to process
    assert spark.read.parquet(out).count() == 500
