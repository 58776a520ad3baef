"""Python UDTF surface (Spark 4): table-generating functions.

Completes the extension trio alongside scalar pandas UDFs
(operators/similarity, serde column codecs) and the grouped-agg UDAF
(functions.vector_mean). The reference has no function extension point at
all (SURVEY §2.5) — its closest analogue is the removeEdgeIf callback
(TorcHelper.java:594-638).

UDTFs evaluate row-at-a-time in Python: they are the SLOW path, for
logic that genuinely needs per-row fan-out with Python state. Anything
expressible as explode/split/HOFs (including this module's example)
should use those in hot paths — top_terms_udtf exists as the documented
extension-surface pattern, and its query is oracle-checked to prove the
lateral-join semantics, not to win benchmarks.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="term: string, n: int")
class TopTermsUDTF:
    """LATERAL top_terms(text, k): the k most frequent whitespace tokens
    of the lowercased text, ties broken by term — one output row per
    term."""

    def eval(self, text: str, k: int):
        if text is None or k is None or k <= 0:
            return
        from collections import Counter

        toks = text.lower().strip().split()
        if not toks:
            return
        for t, c in sorted(
            Counter(toks).items(), key=lambda x: (-x[1], x[0])
        )[:k]:
            yield t, c


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's UDTFs for the SQL surface."""
    spark.udtf.register("top_terms", TopTermsUDTF)
