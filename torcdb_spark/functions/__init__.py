from torcdb_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    vector_mean,
)

__all__ = ["cosine_similarity", "dot", "l2_norm", "vector_mean"]
