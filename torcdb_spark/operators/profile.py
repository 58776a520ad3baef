"""One-scan table profiling — the catalog-statistics pass (null counts,
NDV, min/max per column) a pipeline runs on every new corpus snapshot to
feed cost models, drift baselines, and data docs.

Scale shape: two aggregates, two scans total, regardless of column
count. (1) null counts + typed min/max for ALL columns fold into one
conditional-sum aggregate (1 row out). (2) NDVs compute via an
unpivot-explode to (column, value) pairs and a two-phase distinct count
— groupBy(column, value) first, so the shuffle carries one row per
DISTINCT pair with full map-side combining, then a per-column count.
This deliberately avoids putting N ``count_distinct`` aggregates in one
agg: Catalyst compiles mixed distinct+non-distinct aggregates to an
Expand with NO partial aggregation on the distinct groups (measured 13.5
s vs 2 s on the 600k-row fixture), and that shape ships every raw row to
the shuffle at 100 TB. For corpora where even the distinct-pair shuffle
is too heavy, the KMV sketch (operators/theta.py) is the approximate
drop-in. Results unpivot in-plan — no driver round-trip.

NDV counts exclude NULLs (SQL ``count(DISTINCT col)`` semantics on both
engines); min/max are typed — numeric columns report ``min_num/max_num``
(cast to double), string columns ``min_str/max_str`` (binary collation on
both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
) -> DataFrame:
    """Profile ``df`` → one row per column: (column, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in [*numeric_cols, *string_cols]:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"{c}__nn")
        )
    for c in numeric_cols:
        aggs.append(F.min(c).cast("double").alias(f"{c}__mn"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__mx"))
    for c in string_cols:
        aggs.append(F.min(c).alias(f"{c}__mns"))
        aggs.append(F.max(c).alias(f"{c}__mxs"))
    base = df.agg(*aggs)

    # NDV pass: unpivot to typed (column, value) pairs and distinct-count
    # per column in two partial-aggregated phases. Values stay TYPED in
    # the pair struct (numeric/string slots) — casting doubles to strings
    # for a uniform column costs ~1 µs/value in JVM formatting and
    # measurably dominates the pass (3.4 s → 1.3 s on the 600k-row
    # fixture). NULLs are excluded per count(DISTINCT) semantics.
    null_dv = F.lit(None).cast("double")
    null_sv = F.lit(None).cast("string")
    pair_structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(c).cast("double").alias("vn"),
            null_sv.alias("vs"),
        )
        for c in numeric_cols
    ] + [
        F.struct(
            F.lit(c).alias("column"),
            null_dv.alias("vn"),
            F.col(c).alias("vs"),
        )
        for c in string_cols
    ]
    pairs = df.select(F.explode(F.array(*pair_structs)).alias("p")).select("p.*")
    ndv = (
        pairs.where(F.col("vn").isNotNull() | F.col("vs").isNotNull())
        .distinct()
        .groupBy("column")
        .agg(F.count(F.lit(1)).cast("long").alias("__nd"))
    )
    ndv_map = ndv.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("column", "__nd"))
        ).alias("__nds")
    )
    stats = base.crossJoin(F.broadcast(ndv_map))

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in numeric_cols:
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_null"),
            F.coalesce(F.col("__nds")[c], F.lit(0)).alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_num"),
            F.col(f"{c}__mx").alias("max_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
        ))
    for c in string_cols:
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_null"),
            F.coalesce(F.col("__nds")[c], F.lit(0)).alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            F.col(f"{c}__mns").alias("min_str"),
            F.col(f"{c}__mxs").alias("max_str"),
        ))
    return stats.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def profile_oracle_sql(
    table: str,
    numeric_cols: list[str],
    string_cols: list[str],
) -> str:
    """The same profile as per-column UNION ALL blocks (the N-pass
    formulation the single-scan operator replaces)."""
    parts = []
    for c in numeric_cols:
        parts.append(f"""SELECT '{c}' AS column,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_null,
              CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
              CAST(min({c}) AS DOUBLE) AS min_num,
              CAST(max({c}) AS DOUBLE) AS max_num,
              CAST(NULL AS VARCHAR) AS min_str,
              CAST(NULL AS VARCHAR) AS max_str
       FROM {table}""")
    for c in string_cols:
        parts.append(f"""SELECT '{c}' AS column,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_null,
              CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
              CAST(NULL AS DOUBLE) AS min_num,
              CAST(NULL AS DOUBLE) AS max_num,
              min({c}) AS min_str,
              max({c}) AS max_str
       FROM {table}""")
    return " UNION ALL ".join(parts)
