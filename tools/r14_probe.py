#!/usr/bin/env python
"""Round-14 close-out probe: warm interleaved timings for the open
d18_bpe_merges flag (code untouched this round -> environment arbitration)
and a job/time breakdown for e16_semantic_dedup_exact (VERDICT #5).

Usage: python tools/r14_probe.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from torcdb_spark.queries import queries
    from torcdb_spark.session import get_spark

    spark = get_spark(app_name="torcdb_spark-r14-probe")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    qmap = queries()

    names = ["d18_bpe_merges", "e16_semantic_dedup_exact"]
    # one warm pass each (codegen/JIT/worker pool)
    for n in names:
        qmap[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    results = {n: [] for n in names}
    for r in range(reps):
        for n in names:  # interleaved: shared drift hits both equally
            group = f"probe-{n}-{r}"
            sc.setJobGroup(group, n)
            t0 = time.perf_counter()
            qmap[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            took = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            results[n].append((took, len(jobs)))
            spark.catalog.clearCache()

    for n, rows in results.items():
        best = min(t for t, _ in rows)
        print(
            f"{n}: min={best:.3f}s "
            f"runs={[f'{t:.2f}s/{j}j' for t, j in rows]}"
        )


if __name__ == "__main__":
    main()
