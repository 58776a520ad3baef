#!/usr/bin/env python
"""Count Spark jobs (and wall seconds) a declared query costs end-to-end.

Usage: python tools/job_count.py <query> [query ...]

For iterative operators the per-superstep actions (eager checkpoints,
convergence probes) run while the query DataFrame is being BUILT, so the
physical plan of the returned frame understates the work. This tool runs
each query through the same noop sink as bench.py inside a job group and
reports how many Spark jobs the whole execution scheduled — the
superstep-overhead evidence the optimization rounds quote.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    from torcdb_spark.queries import queries
    from torcdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="torcdb_spark-job-count")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qmap = queries()
    for name in names:
        fn = qmap[name]
        # warm run (codegen/JIT), then the measured run in its own group
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        group = f"jc-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        took = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"job_count: {name} jobs={len(jobs)} warm_wall={took:.3f}s")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
