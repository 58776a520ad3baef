#!/usr/bin/env python
"""LDBC SNB validation-style workload — the engine-side analogue of the
reference's "Running LDBC SNB Validation" workflow (reference README.md):
complex reads, short reads, and updates, each executed through the
declared query inventory so the run exercises exactly what the driver's
correctness gate hash-checks. Runs standalone on the sf0.001 fixtures in
~1 min:

    python examples/ldbc_validation.py [sf_dir]

Sections (executed by tests/test_examples.py so it cannot rot):

1. complex reads  — the 14 ldbc_ic_like_* analogues (IC1-IC14 shapes:
   friend expansion, recency windows, co-occurrence, weighted paths)
2. short reads    — the 7 ldbc_is_like_* analogues (IS1-IS7: profile,
   recent messages + thread roots, friends, content, creator, container,
   replies + knows flag)
3. updates        — wr1_upsert_census: batch addVertex/addEdge through
   the graph API plus a merge_upsert, with the post-write census (the
   update workload made hash-checkable, not just timed)

At 100 TB every section keeps the validated plan shape: seed-id IN-lists
pushed into the scans, label partition pruning, broadcast-only joins for
point lookups, WindowGroupLimit top-k inside the shuffle.
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from torcdb_spark.queries import queries
    from torcdb_spark.session import get_spark

    spark = get_spark(app_name="ldbc-validation")
    qs = queries()

    # IC13's analogue is g_path_pair (pairwise shortest path with
    # reconstruction); the other 13 IC shapes carry the prefix.
    ic = sorted(n for n in qs if n.startswith("ldbc_ic_like_"))
    ic.append("g_path_pair")
    print(f"complex reads: {len(ic)} IC analogues")
    for name in ic:
        n = qs[name](spark, sf_dir).count()
        print(f"  {name}: {n} rows")

    is_ = sorted(n for n in qs if n.startswith("ldbc_is_like_"))
    print(f"short reads: {len(is_)} IS analogues")
    for name in is_:
        n = qs[name](spark, sf_dir).count()
        print(f"  {name}: {n} rows")

    census = {
        r["metric"]: r["value"]
        for r in qs["wr1_upsert_census"](spark, sf_dir).collect()
    }
    print(
        "updates: wr1_upsert_census "
        f"vertices={census['vertices_order']} "
        f"edges={census['edges_placed']} "
        f"merged_rows={census['merged_rows']} "
        f"touched_partitions={census['touched_partitions']}"
    )


if __name__ == "__main__":
    main(*sys.argv[1:2])
