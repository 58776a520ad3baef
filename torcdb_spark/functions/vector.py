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

import pandas as pd  # module-level: pandas_udf resolves stringified type hints

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


def vector_mean():
    """Grouped-aggregate Pandas UDF: element-wise mean of an
    ``array<float>`` column per group → ``array<double>`` centroid.

    The UDAF surface of the engine (SURVEY §2.5 — the reference has no
    aggregate extension point at all): usage is
    ``df.groupBy(k).agg(vector_mean()(F.col("embedding")))``. Arrow ships
    each group's vectors as one batch; numpy reduces along axis 0 — one
    shuffle on the group key, the same partial/final layout as any
    DataFrame aggregate. The per-group vector matrix must fit an executor
    (groups at 100 TB: pre-aggregate per-partition with mapInPandas, or
    use Spark's built-in ``avg(element_at(...))`` per dimension)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _vmean(v: pd.Series) -> "list":
        return np.asarray(v.tolist(), dtype=np.float64).mean(axis=0).tolist()

    return _vmean
