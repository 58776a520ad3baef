"""As-of (temporal/range) join — an operator the reference lacks and Spark
has no built-in for, composed from a union + per-key ordered window so it
stays fully distributed.

Semantics (backward direction, the common case): for every left row, attach
the right row with the greatest ``right_ts <= left_ts`` within the same key
group — i.e. "the most recent right event at or before this left event".
This matches DuckDB's ``ASOF JOIN`` / pandas ``merge_asof(direction=
'backward')``.

Scale shape: ONE shuffle of (left ∪ right) on the join key, then a single
per-key sort — no range cross-join, no per-row subquery. At 100 TB this is
the only as-of formulation that survives: the naive
``JOIN ON key AND r.ts <= l.ts`` + argmax explodes quadratically on hot
keys, while this is O(n log n) per key partition and AQE handles key skew.

Right side must be unique per (key, ts) — pre-aggregate if it is not
(otherwise "the" most recent row is ill-defined on ties; we document rather
than silently pick).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + most recent right row per key.

    ``right_cols`` are the right-side value columns to attach (default: all
    non-key, non-ts columns); the matched right timestamp is attached as
    ``asof_ts``. Unmatched left rows keep NULLs (left-outer semantics).
    ``tolerance`` (an interval Column, e.g. ``F.expr("INTERVAL 1 HOUR")``)
    nulls out matches older than ``left_ts - tolerance``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]

    # Tag and align the two sides on a shared layout. Right rows sort before
    # left rows at identical timestamps so an exact-tie right row is visible
    # to the left row (matches the `left_ts >= right_ts` inequality).
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (*on, left_ts)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (*on, left_ts)
        ],
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )

    out = carried.where(F.col("_side") == 1)
    if tolerance is not None:
        keep = F.col("asof_ts") >= (F.col("_ts") - tolerance)
        for c in right_cols:
            out = out.withColumn(
                f"asof_{c}", F.when(keep, F.col(f"asof_{c}"))
            )
        out = out.withColumn("asof_ts", F.when(keep, F.col("asof_ts")))
    return out.select(
        *on,
        F.col("_ts").alias(left_ts),
        *[c for c in left.columns if c not in (*on, left_ts)],
        "asof_ts",
        *[f"asof_{c}" for c in right_cols],
    )
