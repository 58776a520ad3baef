"""One-scan table profiling — the catalog-statistics pass (null counts,
NDV, min/max per column) a pipeline runs on every new corpus snapshot to
feed cost models, drift baselines, and data docs.

Scale shape: ALL columns profile in ONE aggregate over ONE scan of the
table. Multiple ``count_distinct`` aggregates in one pass compile to
Catalyst's Expand strategy (rows multiplied by the column count before
the partial aggregate) — still a single scan and a single shuffle, which
beats N per-column passes by N× scan I/O at 100 TB; for corpora where
even Expand is too heavy, the KMV sketch (operators/theta.py) is the
approximate drop-in. The 1-row stats result is then unpivoted to one row
per column with an in-plan ``explode`` — no driver round-trip.

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
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"{c}__nd"))
    for c in numeric_cols:
        aggs.append(F.min(c).cast("double").alias(f"{c}__mn"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__mx"))
    for c in string_cols:
        aggs.append(F.min(c).alias(f"{c}__mns"))
        aggs.append(F.max(c).alias(f"{c}__mxs"))
    stats = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in numeric_cols:
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
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
            F.col(f"{c}__nd").alias("n_distinct"),
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
