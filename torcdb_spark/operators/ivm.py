"""Incremental view maintenance — keep an aggregate view current under a
stream of inserts AND deletes without recomputing from the base table
(the Δ-processing every warehouse refresh / DBSP / materialized-view
engine performs).

Deltas carry a SIGNED MULTIPLICITY column (+1 insert, −1 delete/retract),
the classic Z-set formulation: the delta first collapses to one row per
group (one partial-aggregated shuffle over the delta ONLY — at 100 TB the
view refresh touches the day's changes, never the corpus), then merges
into the view with one outer join on the group key. Groups whose
maintained count reaches zero are dropped, so a fully-retracted group
leaves the view exactly as a recompute would.

Exactness contract: measures must be INTEGRAL (counts, cents, token
counts) — integer addition is associative, so maintain(base, Δ) is
bit-identical to recompute(base ⊎ Δ), which is precisely what the oracle
checks. For float measures, incremental subtraction re-orders rounding
and drifts; scale them to integers first (the fixture uses cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_agg(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    mult_col: str = "__m",
    count_col: str = "n",
) -> DataFrame:
    """Merge a signed-multiplicity ``delta`` into an aggregate ``view``
    (columns: keys + ``count_col`` + ``sum_cols``) → the maintained view.

    One groupBy over the delta, one full-outer join on the keys,
    zero-count groups dropped."""
    m = F.col(mult_col)
    d = delta.groupBy(*keys).agg(
        F.sum(m).cast("long").alias("__dn"),
        *[
            F.sum(F.col(c) * m).cast("long").alias(f"__d_{c}")
            for c in sum_cols
        ],
    )
    merged = view.join(d, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col(count_col), F.lit(0))
         + F.coalesce(F.col("__dn"), F.lit(0))).alias(count_col),
        *[
            (F.coalesce(F.col(c), F.lit(0))
             + F.coalesce(F.col(f"__d_{c}"), F.lit(0))).alias(c)
            for c in sum_cols
        ],
    )
    return merged.where(F.col(count_col) > 0)


def delta_join(
    a: DataFrame,
    delta_a: DataFrame,
    b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
    mult_col: str = "__m",
) -> DataFrame:
    """Signed delta of the join A ⋈ B under Z-set deltas on BOTH sides —
    the bilinear rule every DBSP/materialized-view engine implements:

        Δ(A ⋈ B) = ΔA ⋈ B  ⊎  A ⋈ ΔB  ⊎  ΔA ⋈ ΔB

    with multiplicities MULTIPLYING across the join. ``a``/``b`` are the
    PRE-delta snapshots; the result carries ``mult_col`` and feeds
    ``maintain_agg`` (a join-aggregate view) or a multiplicity merge (a
    plain join view). Cost scales with |Δ|·matches, never |A ⋈ B|: each
    term joins a delta against the other side (or the other delta) on
    the join key — the refresh touches the day's changes only."""
    m = F.col(mult_col)
    a0 = a.withColumn(mult_col, F.lit(1))
    b0 = b.withColumn(mult_col, F.lit(1))

    def term(left: DataFrame, right: DataFrame) -> DataFrame:
        lm = left.withColumnRenamed(mult_col, "__ml")
        rm = right.withColumnRenamed(mult_col, "__mr")
        return (
            lm.join(rm, on)
            .withColumn(mult_col, F.col("__ml") * F.col("__mr"))
            .drop("__ml", "__mr")
        )

    return (
        term(delta_a, b0)
        .unionByName(term(a0, delta_b))
        .unionByName(term(delta_a, delta_b))
    )
