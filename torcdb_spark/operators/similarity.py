"""Approximate-nearest-neighbor / similarity search over embedding columns.

Two tiers:

- ``cosine_topk_bruteforce``: query set × corpus scored with JVM-side
  higher-order functions, per-query top-k via a window. Correctness
  baseline; the query side must be small (it is broadcast). Cost is
  O(|Q|·|corpus|) but fully partition-parallel with NO shuffle of the
  corpus — at 100 TB this is the right shape for small query batches.
- ``cosine_topk_lsh``: random-hyperplane LSH — bucket corpus and queries by
  sign-bit sketches, only score within matching buckets. Sub-linear
  candidate generation for large query sets; recall tunable via
  (num_bits, num_tables).

Deterministic hyperplanes are derived from xxhash64 of (table, bit, dim) —
no RNG state, so results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from torcdb_spark.functions.vector import cosine_similarity


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 3,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, score), excluding self.

    Ties broken by neighbor id after rounding the score, so output is
    deterministic and oracle-comparable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), score_decimals).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def _hyperplane(table: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-1, 1)^dim, derived from
    md5 of (table, bit, dim-index) — computed driver-side in Python so the
    sketch expression tree stays tiny (a literal array per bit, not
    dim × num_bits hash sub-expressions; the expression-tree version took
    Catalyst longer to compile than the job took to run)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{bit}:{d}".encode()).digest()
        v = int.from_bytes(h[:8], "big")
        out.append((v % 2001 - 1000) / 1000.0)
    return out


def _sketch(vec_col, num_bits: int, table: int, dim: int):
    """Sign-bit sketch of a vector under deterministic hyperplanes: bit b =
    sign(vec · plane_b). Each dot product is one zip_with/aggregate over a
    literal coefficient array — constant-size expression tree in num_bits."""
    bit_cols = []
    for b in range(num_bits):
        plane = F.lit(_hyperplane(table, b, dim))
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda v, c: v.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_cols.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
    out = F.lit(0).cast("long")
    for i, b in enumerate(bit_cols):
        out = out.bitwiseOR(F.shiftleft(b.cast("long"), i))
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_bits: int = 8,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Corpus and queries are bucketed by (table, sketch); candidates are the
    bucket-equi-join (shuffle on the bucket key — uniform by construction),
    then exact cosine re-ranking within candidates. Recall < 1.0 by design;
    increase num_tables for higher recall."""
    def bucketize(df: DataFrame, role: str) -> DataFrame:
        v = F.col(vec_col)
        rows = [
            df.select(
                F.col(id_col).alias(f"{role}_id"),
                v.alias(f"_{role}v"),
                F.lit(t).alias("table"),
                _sketch(v, num_bits, t, dim).alias("sketch"),
            )
            for t in range(num_tables)
        ]
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    cq = bucketize(queries, "query")
    cc = bucketize(corpus, "neighbor")
    cand = (
        cq.join(cc, ["table", "sketch"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("_queryv"), F.col("_neighborv")), 3).alias(
                "score"
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )
