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

import pandas as pd  # module-level: pandas_udf resolves stringified type hints
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


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_decimals: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, score) with
    id_a < id_b and cosine ≥ threshold — the dedup-by-embedding baseline.

    Exact all-pairs form: one broadcast self-join with JVM-side dot
    products. This is the verification/baseline kernel; at corpus scale the
    pair generation must be blocked first (LSH sketch buckets as in
    ``cosine_topk_lsh``, with this exact scoring applied only within
    buckets) — all-pairs is O(n²) by definition, no partitioning fixes
    that."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_av"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_bv"))
    return (
        F.broadcast(a)
        .crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_similarity(F.col("_av"), F.col("_bv")), score_decimals
            ).alias("score"),
        )
        .where(F.col("score") >= threshold)
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


def _sketch_all_tables_udf(num_bits: int, num_tables: int, dim: int):
    """Arrow-batched numpy sketcher: ONE pass computes every table's
    sign-bit sketch — a (batch × dim) · (dim × num_tables·num_bits) matmul,
    then bit-packing. Returns array<long> of length num_tables.

    Replaces the per-(table, bit) zip_with/aggregate expression form: those
    higher-order-function lambdas are evaluated interpreted (no codegen),
    so at 4 tables × 8 bits the JVM form did 32 interpreted array folds per
    row; the numpy form is two vectorized ops per batch."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [
            _hyperplane(t, b, dim)
            for t in range(num_tables)
            for b in range(num_bits)
        ],
        dtype=np.float64,
    ).T  # (dim, num_tables*num_bits)
    shifts = np.arange(num_bits, dtype=np.int64)

    @pandas_udf("array<long>")
    def sketch(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(vecs.tolist(), dtype=np.float64)  # (n, dim)
        bits = (mat @ planes) >= 0  # (n, T*B)
        packed = (
            bits.reshape(len(mat), num_tables, num_bits).astype(np.int64) << shifts
        ).sum(axis=2)  # (n, T)
        return pd.Series(packed.tolist())

    return sketch


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
    sketcher = _sketch_all_tables_udf(num_bits, num_tables, dim)

    def bucketize(df: DataFrame, role: str) -> DataFrame:
        # one scan + one UDF pass; posexplode fans out to (table, sketch)
        # rows — vs the earlier num_tables-way self-union that re-scanned
        # and re-sketched the input once per table
        sk = df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"_{role}v"),
            sketcher(F.col(vec_col)).alias("_sks"),
        )
        return sk.select(
            f"{role}_id",
            f"_{role}v",
            F.posexplode(F.col("_sks")).alias("table", "sketch"),
        )

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
