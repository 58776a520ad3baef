#!/usr/bin/env python
"""End-to-end tour of the engine's public surface — the script a user of
the reference (TorcDB) would read to switch: every section pairs the
reference's operation with its Spark-native form here. Runs standalone on
the sf0.001 fixtures in ~1 min:

    python examples/tour.py [sf_dir]

Each section prints one line of output; the script is also executed by
tests/test_examples.py so it cannot rot.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    import pyspark.sql.functions as F

    from torcdb_spark import (
        Direction,
        PropertyGraph,
        algebra,
        get_spark,
        traverse,
    )
    from torcdb_spark.graph import LABEL_TAGS
    from torcdb_spark.ids import uint128_pair

    spark = get_spark(app_name="torcdb_spark-tour")
    spark.sparkContext.setLogLevel("ERROR")

    # -- open a graph (TorcGraph.open) ----------------------------------
    g = PropertyGraph.open(spark, sf_dir)
    print("vertices:", g.vertices.count(), "edges:", g.edges.count())

    # -- point lookup (graph.vertices(ids)) -----------------------------
    ids = [uint128_pair(LABEL_TAGS["customer"], k) for k in (1, 2, 3)]
    print("lookup:", g.vertices_by_id(ids, label="customer").count())

    # -- batched traversal + set algebra (traverse/fuse/subtract) -------
    frontier = g.vertices_by_id(ids, label="customer")
    h1 = traverse(frontier, g.edges, "placed", Direction.OUT)
    h2 = traverse(
        h1.select(F.col("dst").alias("id")).dropDuplicates(["id"]),
        g.edges, "contains", Direction.OUT,
    )
    two_hop = algebra.fuse(h1, h2, dedup=True)
    print("2-hop paths:", two_hop.count())

    # -- Gremlin surface ------------------------------------------------
    from torcdb_spark.gremlin import G

    rich = (
        G(g).V().has_label("customer").as_("c")
        .match_(("c", lambda s: s.out("fromNation"), "n"))
        .select("c", "n")
    )
    print("match() bindings:", rich.count())

    # -- graph analytics ------------------------------------------------
    from torcdb_spark.analytics import connected_components_doubling

    cc = connected_components_doubling(
        g.edges.where(F.col("label") == "inRegion")
    )
    print("geo components:", cc.select("component").distinct().count())

    # -- relational / OLAP ----------------------------------------------
    from torcdb_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    q1 = (
        li.groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("l_returnflag")
    )
    print("q1 rows:", q1.count())

    # -- LLM-pipeline operators -----------------------------------------
    from torcdb_spark.operators import exact_dedup, text_stats

    docs = load_table(spark, sf_dir, "documents")
    print("exact dup groups:", exact_dedup(docs).count())
    print("text stats cols:", len(text_stats(docs).columns))

    # -- vector search --------------------------------------------------
    from torcdb_spark.operators import cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    print("ANN top-3:", cosine_topk_bruteforce(emb, qs, k=3).count())

    # -- layout maintenance ---------------------------------------------
    import tempfile

    from torcdb_spark.operators import zorder_write
    from torcdb_spark.sources import table_file_stats

    with tempfile.TemporaryDirectory() as tmp:
        out = f"{tmp}/li_zorder"
        zorder_write(
            li.select("l_partkey", "l_suppkey"), out,
            ["l_partkey", "l_suppkey"], num_files=4,
        )
        print("zorder files:", table_file_stats(out)["n_files"])


if __name__ == "__main__":
    main(*sys.argv[1:2])
