#!/usr/bin/env python
"""Standalone per-query parity check — the driver's correctness gate for a
NAMED subset of queries without the full pytest sweep: runs each query in
Spark AND its DuckDB oracle at one or more SF dirs, compares row count,
column names, and exact values order-insensitively (columns sorted by
name, rows sorted by all columns — tests/test_oracle_parity.py logic).

Usage: python tools/parity.py q1 q2 ... [--sf 0.001,0.01,0.1]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> None:
    import duckdb

    args = sys.argv[1:]
    sfs = ["0.001", "0.01", "0.1"]
    if "--sf" in args:
        i = args.index("--sf")
        sfs = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    names = args
    if not names:
        print("usage: parity.py <query> ... [--sf 0.001,0.01]")
        return

    from torcdb_spark.queries import oracle_sql, queries
    from torcdb_spark.session import get_spark

    qs, oracles = queries(), oracle_sql()
    spark = get_spark(app_name="torcdb_spark-parity")
    spark.sparkContext.setLogLevel("ERROR")
    failed = False
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if name not in oracles:
                print(f"sf{sf} {name}: {len(srows)} rows (rows-only)")
                continue
            ocur = con.sql(oracles[name])
            ocols = [d[0] for d in ocur.description]
            orows = ocur.fetchall()
            problems = []
            if sorted(scols) != sorted(ocols):
                problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
            elif len(srows) != len(orows):
                problems.append(f"rows {len(srows)} != {len(orows)}")
            else:
                got = _normalize(srows, scols)
                exp = _normalize(orows, ocols)
                if got != exp:
                    bad = [(g, e) for g, e in zip(got, exp) if g != e][:3]
                    problems.append(f"values differ, first: {bad}")
            if problems:
                failed = True
                print(f"sf{sf} {name}: FAIL — {'; '.join(problems)}")
            else:
                print(f"sf{sf} {name}: OK ({len(srows)} rows)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
