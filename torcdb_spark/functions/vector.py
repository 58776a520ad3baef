"""Vector column functions — JVM-side, no Python UDFs.

Built on ``zip_with`` + ``aggregate`` so the arithmetic runs inside
whole-stage codegen; an Arrow-batched Pandas UDF alternative exists in
``operators/similarity.py`` for very wide vectors, but for the common
case (≤ a few thousand dims) the built-in higher-order functions keep the
whole plan in the JVM — the fast path per the 100 TB design goal.

Accumulation is sequential left-to-right, matching DuckDB's list
aggregates, which keeps floating-point results comparable with the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over two array<numeric> columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL-safe on zero-norm vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)
