"""Distribution-drift detection between two populations — the gate a
training-data pipeline runs when a new corpus snapshot or source mix
lands (did the feature/length/score distribution move?).

Two statistics, chosen for distributed-exact computability:

- **Two-sample Kolmogorov–Smirnov D** = sup_v |F_a(v) − F_b(v)|. Both
  ECDFs are step functions that change only at sample points, so the sup
  is attained at a pooled distinct value — evaluating at every distinct
  value is exact. The cumulative counts need a TOTAL order, which is the
  classic distributed prefix-sum: range-partition the distinct values,
  cumsum WITHIN each partition (window partitioned by partition id — no
  single-task global window), then add per-partition offsets computed
  from the tiny (#partitions)-row totals table. Two shuffles + one
  broadcast join, no driver-side data movement, no global-order window:
  the shape that survives 100 TB, unlike the naive
  ``Window.orderBy(value)`` which serializes into one task.

- **PSI (population stability index)** over fixed-width bins with
  Laplace smoothing ((c+1)/(n+B)), so empty bins are defined without an
  epsilon hack and the statistic stays exactly reproducible. Pure
  groupBy — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ecdf_max_gap(
    two_pop: DataFrame,
    value_col: str = "v",
    flag_col: str = "is_a",
    num_partitions: int = 32,
) -> DataFrame:
    """KS statistic for ``two_pop`` (rows tagged ``is_a`` true/false) →
    one row (n_a, n_b, ks_d). Exact; see module docstring for the
    distributed prefix-sum shape."""
    v, a = F.col(value_col), F.col(flag_col)
    counts = (
        two_pop.groupBy(v.alias("val"))
        .agg(
            F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(a, 0).otherwise(1)).cast("long").alias("cb"),
        )
    )
    # Pin the range partitioning once (localCheckpoint) so the two
    # branches below (within-partition cumsums, per-partition totals)
    # cannot resample different partition boundaries.
    parts = (
        counts.repartitionByRange(num_partitions, F.col("val"))
        .sortWithinPartitions("val")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_in = Window.partitionBy("pid").orderBy("val")
    cums = parts.select(
        "pid", "val",
        F.sum("ca").over(w_in).alias("ca_in"),
        F.sum("cb").over(w_in).alias("cb_in"),
    )
    # #partitions rows: the offsets table is tiny by construction.
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parts.groupBy("pid")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .select(
            "pid",
            F.coalesce(F.sum("ta").over(w_off), F.lit(0)).alias("off_a"),
            F.coalesce(F.sum("tb").over(w_off), F.lit(0)).alias("off_b"),
        )
    )
    ns = parts.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    gaps = (
        cums.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(ns))
        .select(
            "n_a", "n_b",
            F.abs(
                (F.col("ca_in") + F.col("off_a")) / F.col("n_a")
                - (F.col("cb_in") + F.col("off_b")) / F.col("n_b")
            ).alias("gap"),
        )
    )
    return gaps.groupBy("n_a", "n_b").agg(
        F.round(F.max("gap"), 6).alias("ks_d")
    )


def psi(
    two_pop: DataFrame,
    value_col: str = "v",
    flag_col: str = "is_a",
    bin_width: float = 60000.0,
    num_bins: int = 10,
) -> DataFrame:
    """Population stability index over fixed-width bins → one row
    (n_a, n_b, psi). Laplace-smoothed shares keep empty bins defined."""
    v, a = F.col(value_col), F.col(flag_col)
    bin_id = F.least(
        F.greatest(F.floor(v / F.lit(bin_width)), F.lit(0)),
        F.lit(num_bins - 1),
    )
    binned = (
        two_pop.groupBy(bin_id.alias("bin"))
        .agg(
            F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(a, 0).otherwise(1)).cast("long").alias("cb"),
        )
    )
    ns = binned.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    shares = binned.crossJoin(F.broadcast(ns)).select(
        "n_a", "n_b",
        ((F.col("ca") + 1) / (F.col("n_a") + num_bins)).alias("pa"),
        ((F.col("cb") + 1) / (F.col("n_b") + num_bins)).alias("pb"),
    )
    return shares.groupBy("n_a", "n_b").agg(
        F.round(
            F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))),
            6,
        ).alias("psi")
    )
