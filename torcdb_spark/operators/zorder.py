"""Z-order (Morton) clustering for multi-dimensional data skipping.

The reference's key-space locality comes from its label-keyed edge-list
layout (TorcHelper.java:352-370): co-accessed records share a key prefix, so
a point query touches one segment chain. The columnar analogue for MULTI-
dimensional predicates is space-filling-curve clustering: map k columns onto
one Morton code, range-partition and sort files by it, and parquet min/max
footer stats then prune files for predicates on ANY prefix-free subset of
the k dimensions — the standard lakehouse OPTIMIZE ZORDER BY layout.

Everything is JVM-side integer expressions (shift/and/or inside whole-stage
codegen): no UDF, no shuffle beyond the one repartitionByRange that IS the
clustering. At 100 TB this runs as a layout-maintenance job whose output
every subsequent scan benefits from; the interleave itself is free at write
time relative to the IO.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Scale an integer column to [0, 2^bits) with pure integer arithmetic
    (exact, engine-portable): ((v - min) * (2^bits - 1)) div (max - min)."""
    span = vmax - vmin
    # floor(double) on both engines (Spark cast double→long truncates but
    # DuckDB's rounds — floor is the portable spelling). Exact while
    # (v - min) * (2^bits - 1) stays under 2^53; document-scale keys do.
    return F.when(span <= 0, F.lit(0)).otherwise(
        F.floor(((col - vmin) * F.lit((1 << bits) - 1)) / span)
    ).cast("long")


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave ``len(cols)`` already-scaled integer columns into
    one z-value: bit b of column i lands at position b*k + i. Pure
    shift/and/or expression tree — 2*bits*k codegen'd integer ops/row."""
    k = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def zorder_code(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Append a ``_z`` Morton code over ``cols`` (integer columns), scaling
    each to [0, 2^bits) by its global min/max first.

    The min/max pass is ONE 1-row aggregate broadcast into the main scan
    (no second shuffle of the data); on a cluster it reads footer stats
    fast-path when available.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_min_{c}"), F.max(c).alias(f"_max_{c}")]
    bounds = F.broadcast(df.agg(*aggs))
    out = df.crossJoin(bounds)
    scaled = [
        _scaled(F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits)
        for c in cols
    ]
    return out.withColumn("_z", interleave_bits(scaled, bits)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` by the Morton code over ``cols`` and write parquet:
    repartitionByRange(_z) makes each output file own a contiguous z-range,
    and the within-file sort tightens every file's per-column min/max — the
    footer stats future scans prune on. ``num_files`` sizes the layout
    (at 100 TB: total_bytes / target_file_bytes)."""
    coded = zorder_code(df, cols, bits)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        coded.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def zorder_cell_stats(
    df: DataFrame, cols: list[str], bits: int = 8, cell_shift: int | None = None
) -> DataFrame:
    """Aggregate per z-cell (Morton code truncated by ``cell_shift`` low
    bits): count + per-dimension min/max. This is the inspectable form of
    the clustering — tight per-cell ranges on every dimension are exactly
    what file-level stats will look like after ``zorder_write``."""
    k = len(cols)
    shift = cell_shift if cell_shift is not None else (bits - 2) * k
    coded = zorder_code(df, cols, bits)
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).cast("long").alias(f"min_{c}"),
            F.max(c).cast("long").alias(f"max_{c}"),
        ]
    return (
        coded.groupBy(
            F.shiftrightunsigned(F.col("_z"), shift).alias("z_cell")
        )
        .agg(*aggs)
    )


def zorder_oracle_sql(
    table: str, cols: list[str], bits: int = 8, cell_shift: int | None = None
) -> str:
    """Generate the DuckDB-equivalent SQL for ``zorder_cell_stats`` — the
    same integer scale + interleave formula spelled as SQL bit ops, so the
    layout operator is exact-value verifiable like any relational query."""
    k = len(cols)
    shift = cell_shift if cell_shift is not None else (bits - 2) * k
    maxv = (1 << bits) - 1
    scaled = {
        c: (
            f"CASE WHEN max_{c} - min_{c} <= 0 THEN 0 ELSE "
            f"CAST(FLOOR((({c} - min_{c}) * {maxv}) / (max_{c} - min_{c})) AS BIGINT) END"
        )
        for c in cols
    }
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(f"(((s_{c} >> {b}) & 1) << {b * k + i})")
    z = " | ".join(terms)
    mins = ", ".join(
        f"MIN({c}) AS min_{c}, MAX({c}) AS max_{c}" for c in cols
    )
    s_cols = ", ".join(f"{scaled[c]} AS s_{c}" for c in cols)
    stat_cols = ", ".join(
        f"CAST(MIN({c}) AS BIGINT) AS min_{c}, "
        f"CAST(MAX({c}) AS BIGINT) AS max_{c}"
        for c in cols
    )
    return f"""WITH bounds AS (SELECT {mins} FROM {table}),
       scaled AS (
         SELECT t.*, {s_cols}
         FROM {table} t CROSS JOIN bounds
       ),
       coded AS (SELECT *, ({z}) AS z FROM scaled)
       SELECT (z >> {shift}) AS z_cell,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              {stat_cols}
       FROM coded GROUP BY 1"""
