#!/usr/bin/env python
"""Benchmark harness: times every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is measured with a noop sink (full pipeline runs, nothing
collected to the driver) after a JVM warm-up action, so timings reflect
scan+shuffle+compute, not py4j materialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from torcdb_spark.session import get_spark
    from torcdb_spark.queries import queries

    spark = get_spark(app_name="torcdb_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up: trivial scan+agg, not counted
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in sorted(queries().items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"bench: {name} {timings[name]}s", file=sys.stderr)
        except Exception as exc:  # a failing query must not sink the bench
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total wall sec over declared query inventory",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
