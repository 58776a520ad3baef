"""Replicates the driver's correctness gate locally: run every declared
query in Spark AND its DuckDB oracle on the same parquet, compare row count,
column names, and exact values order-insensitively (columns sorted by name,
rows sorted by all columns) — the strictest local approximation of the
driver's value-hash."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


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


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    sdf = QUERIES[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if name not in ORACLES:
        # rows-only check, like the driver's weaker gate
        assert len(srows) >= 0
        return
    ocur = ddb.sql(ORACLES[name])
    ocols = [d[0] for d in ocur.description]
    orows = ocur.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    got = _normalize([tuple(r) for r in srows], scols)
    exp = _normalize(orows, ocols)
    mismatches = [(g, e) for g, e in zip(got, exp) if g != e][:5]
    assert got == exp, f"{name}: first mismatches {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["s_suppkey", "s_name", "n_paths"]
