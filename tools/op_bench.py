#!/usr/bin/env python
"""Micro-operation latency harness — the engine's analogue of the
reference's op-level testers (util/OpTester.java:1-231 and
util/TorcPerf.java: per-op timing loops over vertex reads, edge-list reads
and traversals).

Times the primitive operations every query composes — point lookup,
one-hop traverse (each direction), bulk property fill, edge lookup,
set-algebra ops — on a pre-warmed graph at $SPARK_GRAFT_SF_DIR, n reps
each, and prints one JSON line {op: {"p50_ms": ..., "n": ...}}.

Usage: python tools/op_bench.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from torcdb_spark import algebra
    from torcdb_spark.graph import LABEL_TAGS, PropertyGraph
    from torcdb_spark.ids import uint128_pair
    from torcdb_spark.session import get_spark
    from torcdb_spark.traverse import Direction, fill_properties, traverse

    spark = get_spark(app_name="torcdb_spark-opbench")
    spark.sparkContext.setLogLevel("ERROR")
    g = PropertyGraph.open(spark, sf_dir)
    g.edges.count()  # warm scan
    g.vertices.count()

    seeds = [uint128_pair(LABEL_TAGS["customer"], k) for k in range(1, 101)]
    frontier = g.vertices_by_id(seeds, label="customer")
    one_hop = traverse(frontier, g.edges, "placed", Direction.OUT)

    def run(name, mk):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            times.append((time.perf_counter() - t0) * 1000)
        return name, {
            "p50_ms": round(statistics.median(times), 1),
            "min_ms": round(min(times), 1),
            "n": reps,
        }

    ops = dict(
        [
            run("vertex_lookup_100", lambda: g.vertices_by_id(
                seeds, label="customer")),
            run("edges_by_key_100", lambda: g.edges_by_key(
                [(s, uint128_pair(LABEL_TAGS["order"], 1), "placed")
                 for s in seeds[:100]])),
            run("traverse_out", lambda: traverse(
                frontier, g.edges, "placed", Direction.OUT)),
            run("traverse_in", lambda: traverse(
                one_hop.select(F.col("dst").alias("id")), g.edges, "placed",
                Direction.IN)),
            run("traverse_both", lambda: traverse(
                frontier, g.edges, "placed", Direction.BOTH)),
            run("traverse_fill_edge", lambda: traverse(
                frontier, g.edges, "placed", Direction.OUT, fill_edge=True)),
            run("fill_properties", lambda: fill_properties(
                one_hop, g.vertices)),
            run("fuse_2hop", lambda: algebra.fuse(
                one_hop,
                traverse(one_hop.select(F.col("dst").alias("id")),
                         g.edges, "contains", Direction.OUT))),
            run("intersect", lambda: algebra.intersect(one_hop, frontier)),
            run("subtract", lambda: algebra.subtract(one_hop, frontier)),
        ]
    )
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "ops": ops}))


if __name__ == "__main__":
    main()
