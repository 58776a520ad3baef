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
            # write-shaped transforms (UPDATE/DELETE — the other half of
            # the reference's MeasurementClient workload; wr2 holds the
            # correctness census, this holds the latency)
            run("set_vertex_property_100", lambda: g.set_vertex_property(
                frontier.select("id", F.lit("UPDATED").alias("value")),
                "c_mktsegment").vertices),
            run("set_edge_property_100", lambda: g.set_edge_property(
                one_hop.select("src", "dst",
                               F.lit("placed").alias("label"),
                               F.lit("1").alias("value")),
                "audit").edges),
            run("delete_edges_filter", lambda: g.delete_edges(
                (F.col("label") == "placed")
                & (F.col("props")["totalprice"].cast("double") < 5000.0)
            ).edges),
        ]
    )

    writes = write_bench(spark, sf_dir)
    print(json.dumps(
        {"sf_dir": sf_dir, "reps": reps, "ops": ops, "writes": writes}
    ))


def write_bench(
    spark,
    sf_dir: str,
    batch_rows: int = 10_000,
    clients: tuple[int, ...] = (1, 8, 32),
) -> dict:
    """Write-path throughput/latency — the analogue of the reference's
    MeasurementClient (util/MeasurementClient.java:289-534: addVertex
    ops/s vs #clients, latency CCDF). Each 'client' is a driver thread
    submitting its own Spark job (Spark schedules concurrent jobs from
    threads; the fleet analogue is one ingest job per shard):

    - add_vertices / add_edges: a batch_rows batch in the VERTEX_SCHEMA /
      EDGE_SCHEMA contract appended as parquet to a client-private shard
      dir (the multi-client ingest layout; the one-edge-per-(src,dst,
      label) invariant is enforced by the read-side graph build /
      merge job, exactly like the reference's client-side batching vs
      server-side overwrite split).
    - merge_upsert: each client MERGEs a 1000-row update batch into its
      OWN partition of a shared partitioned table (disjoint partitions —
      the per-partition-directory atomicity contract).

    Emits rows/sec aggregate and per-batch p50 latency per client count.
    """
    import shutil
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from torcdb_spark.sources.maintenance import merge_upsert

    out: dict[str, dict] = {"add_vertices": {}, "add_edges": {}, "merge_upsert": {}}
    root = tempfile.mkdtemp(prefix="torcdb_write_bench_")

    def vertex_batch(writer: int, tag: int):
        return (
            spark.range(batch_rows)
            .select(
                F.concat(
                    F.lit(bytes([tag])),
                    F.unhex(F.lpad(F.hex(
                        F.col("id") + writer * 1_000_000_000), 16, "0")),
                ).alias("id"),
                F.lit("user").alias("label"),
                F.create_map(
                    F.lit("k"), (F.col("id") % 97).cast("string")
                ).alias("props"),
            )
        )

    def edge_batch(writer: int):
        return (
            spark.range(batch_rows)
            .select(
                F.unhex(F.lpad(F.hex(
                    F.col("id") + writer * 1_000_000_000), 16, "0")).alias("src"),
                F.lit("user").alias("src_label"),
                F.unhex(F.lpad(F.hex(
                    F.col("id") + 1 + writer * 1_000_000_000), 16, "0")).alias("dst"),
                F.lit("user").alias("dst_label"),
                F.lit("follows").alias("label"),
                F.create_map(
                    F.lit("w"), (F.col("id") % 7).cast("string")
                ).alias("props"),
            )
        )

    def timed_writer(fn):
        t0 = time.perf_counter()
        fn()
        return (time.perf_counter() - t0) * 1000

    for kind, mk in (("add_vertices", vertex_batch), ("add_edges", edge_batch)):
        for n in clients:
            jobs = []
            for w in range(n):
                path = f"{root}/{kind}/c{n}/w{w}"
                if kind == "add_vertices":
                    df = mk(w, 8)
                else:
                    df = mk(w)
                jobs.append(
                    lambda df=df, path=path: df.write.mode("append").parquet(path)
                )
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=n) as ex:
                lat = list(ex.map(timed_writer, jobs))
            wall = time.perf_counter() - t0
            out[kind][str(n)] = {
                "rows_per_s": round(batch_rows * n / wall),
                "p50_batch_ms": round(statistics.median(lat), 1),
                "batch_rows": batch_rows,
            }

    # merge_upsert: shared partitioned base, one private partition per
    # client (the CDC sharding that keeps per-partition atomicity safe)
    base_path = f"{root}/upsert_base"
    max_clients = max(clients)
    (
        spark.range(max_clients * 20_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % max_clients).cast("int").alias("shard"),
            F.lit(0).alias("v"),
        )
        .write.partitionBy("shard")
        .parquet(base_path)
    )
    for n in clients:
        def upsert(w: int):
            upd = (
                spark.range(1000)
                .select(
                    (F.col("id") * max_clients + w).alias("k"),
                    F.lit(w).cast("int").alias("shard"),
                    F.lit(1).alias("v"),
                )
            )
            merge_upsert(spark, base_path, upd, ["k"], "shard")

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n) as ex:
            lat = list(
                ex.map(lambda w: timed_writer(lambda: upsert(w)), range(n))
            )
        wall = time.perf_counter() - t0
        out["merge_upsert"][str(n)] = {
            "rows_per_s": round(1000 * n / wall),
            "p50_batch_ms": round(statistics.median(lat), 1),
            "batch_rows": 1000,
        }
    shutil.rmtree(root, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
