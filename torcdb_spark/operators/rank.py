"""Exact GLOBAL ranking without a single-task window — the primitive
behind curriculum ordering, percentile bucketing, top-p selection, and
any "sort the whole corpus and number the rows" step.

Spark's own ``row_number().over(Window.orderBy(...))`` with no partition
spec collapses the entire dataset into ONE task — the textbook scale
trap. The distributed formulation is the classic prefix-sum (the same
shape as operators/drift.py's ECDF): range-partition on the order key so
partition i holds globally-smaller keys than partition i+1, number rows
WITHIN each partition (a partitioned window), then add each partition's
global offset computed from the tiny (#partitions)-row count table. Two
shuffles + one broadcast join, every stage parallel.

The order columns must form a TOTAL order (add a unique id as the last
tie-break column); with ties unbroken, ranks among tied rows would be
partition-order-dependent and nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int = 32,
) -> DataFrame:
    """``df`` + a 1-based exact global row number under ``order_cols``."""
    # Pin the range partitioning once (localCheckpoint) so the two
    # branches (within-partition numbering, per-partition counts) cannot
    # resample different boundaries.
    parts = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    within = parts.withColumn("_rn", F.row_number().over(w_in))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parts.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        within.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )


def rank_buckets(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int,
    bucket_col: str = "bucket",
    num_partitions: int = 32,
) -> DataFrame:
    """Equal-size bucket assignment by exact global rank:
    ``bucket = floor((rank-1)·k/n)`` in 0..k-1 — curriculum stages,
    percentile cohorts, eval strata. The total count folds in as a
    broadcast 1-row aggregate; no driver round-trip."""
    ranked = global_rank(df, order_cols, "_grank", num_partitions)
    n = ranked.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            bucket_col,
            F.floor(
                (F.col("_grank") - 1) * num_buckets / F.col("_n")
            ).cast("long"),
        )
        .drop("_grank", "_n")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    cum_col: str = "cum",
    num_partitions: int = 32,
) -> DataFrame:
    """``df`` + the exact inclusive running sum of ``value_col`` under
    the global ``order_cols`` order — same prefix-sum shape as
    ``global_rank`` (range partition → partitioned window cumsum → tiny
    per-partition offset table), so no single-task window. Use integral
    values for cross-engine bit-exactness (float prefix sums re-order)."""
    parts = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    within = parts.withColumn("_cs", F.sum(value_col).over(w_in))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parts.groupBy("_pid")
        .agg(F.sum(value_col).alias("_t"))
        .select(
            "_pid",
            F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        within.join(F.broadcast(offsets), "_pid")
        .withColumn(cum_col, F.col("_off") + F.col("_cs"))
        .drop("_pid", "_cs", "_off")
    )


def top_p_by_weight(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    p: float,
    num_partitions: int = 32,
) -> DataFrame:
    """Budgeted prefix selection (the data-curation "top-p"): walk the
    corpus in ``order_cols`` order (best first) and keep rows while the
    INCLUSIVE running weight stays within ``p`` of the total — e.g. "the
    highest-quality documents covering 50% of all tokens". The first row
    is always kept (cum == own weight ⇔ nothing precedes it; weights
    must be POSITIVE for that equivalence), so a single over-budget row
    cannot empty the result. Threshold arithmetic is integer-safe when
    weights are integral: keep while cum ≤ floor(p·total) (total folds
    in as a broadcast 1-row aggregate)."""
    cummed = global_cumsum(
        df, order_cols, weight_col, "_cum", num_partitions
    )
    total = df.agg(F.sum(weight_col).alias("_tot"))
    return (
        cummed.crossJoin(F.broadcast(total))
        .where(
            (F.col("_cum") <= F.floor(F.col("_tot") * F.lit(p)))
            | (F.col("_cum") == F.col(weight_col))  # first row in order
        )
        .drop("_cum", "_tot")
    )


def preference_pairs(
    scored: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    score_col: str = "quality",
    k: int = 3,
    min_margin: float = 0.05,
) -> DataFrame:
    """RLHF preference-pair construction: within each group ("prompt"),
    pair the k best-scored members (chosen) against the k worst
    (rejected) and keep pairs whose score margin clears ``min_margin``
    → (group…, chosen_id, rejected_id, chosen_score, rejected_score,
    margin). This is the standard reward-model data builder: never all
    O(n²) pairs, only extremes-vs-extremes, bounded at k² per group.

    Scale shape: two row_number windows over the SAME (group, score)
    shuffle partitioning (one sort each), then a group-keyed self-join
    whose both sides are ≤ k rows per group — the join fan-out is k²,
    a constant, regardless of corpus size. Tie-breaks are (score desc,
    id asc) / (score asc, id asc), so the pair set is deterministic and
    an external engine replays it exactly."""
    from pyspark.sql.window import Window as W

    g = [F.col(c) for c in group_cols]
    top = (
        scored.withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy(*g).orderBy(
                    F.desc(score_col), F.asc(id_col)
                )
            ),
        )
        .where(F.col("_rk") <= k)
        .select(
            *group_cols,
            F.col(id_col).alias("chosen_id"),
            F.col(score_col).alias("chosen_score"),
        )
    )
    bot = (
        scored.withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy(*g).orderBy(
                    F.asc(score_col), F.asc(id_col)
                )
            ),
        )
        .where(F.col("_rk") <= k)
        .select(
            *group_cols,
            F.col(id_col).alias("rejected_id"),
            F.col(score_col).alias("rejected_score"),
        )
    )
    return (
        top.join(bot, group_cols)
        .where(
            (F.col("chosen_score") - F.col("rejected_score"))
            >= F.lit(float(min_margin))
        )
        .select(
            *group_cols,
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 4
            ).alias("margin"),
        )
    )
