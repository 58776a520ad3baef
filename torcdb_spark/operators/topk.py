"""Per-group top-k — the window-function pattern the reference gets from
Gremlin's order/limit steps (SURVEY §2.4) generalized per-group.

``row_number`` over (partition, order) shuffles once on the group key and
sorts within partitions only — never a global sort. Order columns must
include a unique tiebreaker for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
