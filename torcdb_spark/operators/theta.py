"""KMV (k-minimum-values) distinct-count sketch with theta-style set
operations — fifth member of the mergeable-sketch family (HLL, histogram,
CMS, Bloom, KMV).

Where HLL only estimates distinct counts of one stream, a KMV sketch keeps
the k smallest normalized hash VALUES, which makes set algebra possible:
union = k smallest of the combined sketches, and intersection follows the
theta-sketch rule (θ = min of the two sketches' thresholds; count common
samples below θ and divide by θ). That is what a 100 TB pipeline needs for
"how many users are in BOTH cohorts" without a giant distinct-join.

Hashing uses the md5→(0,1] uniform of operators/sampling.py, so sketches
are deterministic and every estimate — not just its error bound — is
reproducible by a SQL oracle. Standard error ~ 1/sqrt(k-2).

Scale shape: per-group sketches are a window top-k on the hash (one
shuffle on the group key, WindowGroupLimit pushes the rank filter below
the sort); a global sketch is Spark's distributed TakeOrdered. Sketches
are ≤ k rows per group forever after — joins against them broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U_DENOM = float((1 << 52) + 1)


def _uniform(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform in (0,1]: first 13 md5 hex chars (52 bits) of
    ``key:seed`` → (int+1)/(2^52+1). Identical formula to
    operators/sampling.py so oracles share the idiom."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))
    return (
        F.conv(F.substring(h, 1, 13), 16, 10).cast("double") + 1.0
    ) / F.lit(_U_DENOM)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 128,
    seed: int = 0,
) -> DataFrame:
    """Build per-group KMV sketches → (group…, u, rk): the k smallest
    DISTINCT hash values per group, rank included. Duplicate keys share a
    hash, so the pre-aggregation to distinct (group, u) is the only pass
    over the data; the top-k is a window over ≤ |distinct| rows."""
    group_cols = group_cols or []
    hashed = df.select(
        *group_cols, _uniform(F.col(key_col), seed).alias("u")
    ).dropDuplicates([*group_cols, "u"])
    if not group_cols:
        # global sketch: distributed top-k (TakeOrderedAndProject — each
        # partition keeps its k smallest, the driver merges k·P values),
        # NOT an unpartitioned window, which would sort the whole corpus
        # in one task; the rank window then runs over only k rows
        smallest = hashed.orderBy("u").limit(k)
        return smallest.withColumn(
            "rk", F.row_number().over(Window.orderBy("u"))
        )
    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def kmv_estimate(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 128,
    decimals: int = 4,
) -> DataFrame:
    """Distinct-count estimate per group from a ``kmv_sketch`` output:
    exact row count when the sketch is unsaturated (< k values seen),
    else (k-1)/u_k with u_k the k-th smallest hash."""
    group_cols = group_cols or []
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("_n"), F.max("u").alias("_uk")
    )
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise((k - 1) / F.col("_uk"))
    return agg.select(
        *group_cols, F.round(est, decimals).alias("est_distinct")
    )


def kmv_intersect_estimate(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 128,
    decimals: int = 4,
) -> DataFrame:
    """Theta-style intersection estimate from two same-k global sketches:
    θ = min(θ_a, θ_b) where a sketch's θ is its k-th value when saturated
    else 1.0; estimate = |{u ∈ A∩B : u < θ}| / θ. One broadcast-sized
    equi-join on the hash value."""
    def theta(s: DataFrame) -> DataFrame:
        return s.agg(
            F.when(F.count("*") >= k, F.max("u")).otherwise(F.lit(1.0)).alias("theta")
        )

    th = (
        theta(sketch_a).crossJoin(theta(sketch_b).withColumnRenamed("theta", "theta_b"))
        .select(F.least("theta", "theta_b").alias("theta"))
    )
    common = sketch_a.select("u").join(sketch_b.select("u"), "u", "left_semi")
    return (
        common.crossJoin(F.broadcast(th))
        .where(F.col("u") < F.col("theta"))
        .groupBy("theta")
        .agg(F.count("*").alias("_m"))
        .select(F.round(F.col("_m") / F.col("theta"), decimals).alias("est_intersection"))
    )


def kmv_anotb_estimate(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 128,
    decimals: int = 4,
) -> DataFrame:
    """Theta-style A-NOT-B estimate from two same-k global sketches (the
    Apache DataSketches set-difference op): θ = min(θ_a, θ_b) with a
    sketch's θ its k-th value when saturated else 1.0; the surviving
    sample is {u ∈ A : u < θ, u ∉ B} and the estimate |sample| / θ —
    'how many users did X but never Y' without a distinct anti-join of
    the full sets. One broadcast-sized left-anti join on hash values."""
    def theta(s: DataFrame) -> DataFrame:
        return s.agg(
            F.when(F.count("*") >= k, F.max("u"))
            .otherwise(F.lit(1.0))
            .alias("theta")
        )

    th = (
        theta(sketch_a)
        .crossJoin(theta(sketch_b).withColumnRenamed("theta", "theta_b"))
        .select(F.least("theta", "theta_b").alias("theta"))
    )
    only_a = sketch_a.select("u").join(
        sketch_b.select("u"), "u", "left_anti"
    )
    # global agg (not groupBy) so an EMPTY surviving sample still yields
    # the one-row estimate 0.0 — a difference can legitimately be empty
    m = (
        only_a.crossJoin(F.broadcast(th))
        .where(F.col("u") < F.col("theta"))
        .agg(F.count("*").alias("_m"))
    )
    return m.crossJoin(F.broadcast(th)).select(
        F.round(F.col("_m") / F.col("theta"), decimals).alias("est_anotb")
    )
