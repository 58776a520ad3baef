#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/r<N>/<name>_<tag>.txt.

Usage: python tools/plan_dump.py <round> <tag> <query> [query ...]

Writes plans/r<round>/<query>_<tag>.txt for each named query — the
before/after plan evidence the optimization rounds commit. Building the
DataFrame executes any eager superstep work a query does at construction
time; for those queries the committed plan is the final stitched stage
and the superstep evidence lives in the job-count tool instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    round_no, tag, *names = sys.argv[1:]
    from torcdb_spark.plans.explain import explain_str
    from torcdb_spark.queries import queries
    from torcdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", f"r{int(round_no)}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="torcdb_spark-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = queries()
    for name in names:
        if name not in qmap:
            print(f"plan_dump: unknown query {name}", file=sys.stderr)
            continue
        df = qmap[name](spark, sf_dir)
        txt = explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"plan_dump: wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
