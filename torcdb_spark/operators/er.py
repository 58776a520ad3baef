"""Entity-resolution primitives: blocked fuzzy matching.

Record linkage at 100 TB is only feasible with BLOCKING: a cheap
deterministic key partitions candidates so the quadratic verify step runs
inside blocks instead of across the corpus — the same
candidate-generation/verify split as MinHash-LSH dedup
(operators/dedup.py), but for structured entity fields with edit-distance
semantics (names, addresses, brands).

Verification uses Levenshtein distance, a JVM built-in on both sides of
the engine/oracle pair, so matches are exactly replicable relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_distance: int = 2,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, name_a, name_b, dist) with
    ``dist ≤ max_distance``, generated ONLY within equal ``block_expr``
    values (id_a < id_b deduplicates the symmetric pair).

    The block key is an equi-join column, so candidate generation is one
    shuffle on it; the per-block self-join is the quadratic part — block
    key choice bounds it (e.g. a token of the name, a phonetic code, a
    sorted-neighborhood window). Skewed blocks are the operator's known
    risk at scale: AQE's skew-join split handles moderate skew, and a
    too-common block value should be excluded upstream the way stop-words
    are excluded from inverted indexes."""
    side = df.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        block_expr.alias("_blk"),
    )
    a = side.select(
        F.col("_id").alias("id_a"), F.col("_name").alias("name_a"), "_blk"
    )
    b = side.select(
        F.col("_id").alias("id_b"), F.col("_name").alias("name_b"), "_blk"
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
