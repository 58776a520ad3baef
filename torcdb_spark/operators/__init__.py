"""Extension operators beyond the reference surface: the LLM-data-pipeline
toolkit (dedup, similarity search, text analysis, multimodal columns) plus
relational helpers (per-group top-k). Every operator is DataFrame→DataFrame,
shuffle-partitionable, with no driver-side collects — designed for 100 TB.
"""

from torcdb_spark.operators.asof import asof_join
from torcdb_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
    simhash_near_dup_pairs,
)
from torcdb_spark.operators.range_join import range_join
from torcdb_spark.operators.timeseries import gap_fill, rollup, time_bucket
from torcdb_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    cosine_topk_quantized,
    ivf_topk,
    pq_topk,
)
from torcdb_spark.operators.skew import salted_join
from torcdb_spark.operators.text import text_stats, quality_score, tfidf, token_count
from torcdb_spark.operators.cms import cms_estimate, cms_merge, cms_sketch
from torcdb_spark.operators.diff import diff_summary, table_diff
from torcdb_spark.operators.histogram import (
    histogram_sketch,
    merge_histograms,
    quantiles_from_histogram,
)
from torcdb_spark.operators.sampling import neighbor_sample, random_walks
from torcdb_spark.operators.topk import topk_per_group
from torcdb_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)
from torcdb_spark.operators.theta import (
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_sketch,
)
from torcdb_spark.operators.funnel import (
    cohort_retention,
    funnel_stages,
    sessionize,
)
from torcdb_spark.operators.er import blocked_levenshtein_pairs
from torcdb_spark.operators.timeseries import trailing_zscore
from torcdb_spark.operators.text import repetition_signals
from torcdb_spark.operators.scd import scd2_build
from torcdb_spark.operators.bpe import bpe_encode, bpe_train
from torcdb_spark.operators.text import vocab_oov
from torcdb_spark.operators.sampling import (
    node2vec_walks,
    weighted_neighbor_sample,
)
from torcdb_spark.operators.zorder import (
    zorder_cell_stats,
    zorder_code,
    zorder_write,
)

__all__ = [
    "asof_join",
    "histogram_sketch",
    "merge_histograms",
    "quantiles_from_histogram",
    "neighbor_sample",
    "random_walks",
    "zorder_cell_stats",
    "zorder_code",
    "zorder_write",
    "range_join",
    "rollup",
    "gap_fill",
    "time_bucket",
    "simhash_near_dup_pairs",
    "cosine_topk_quantized",
    "cms_estimate",
    "cms_merge",
    "cms_sketch",
    "diff_summary",
    "table_diff",
    "pq_topk",
    "exact_dedup",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "ivf_topk",
    "salted_join",
    "text_stats",
    "quality_score",
    "tfidf",
    "token_count",
    "topk_per_group",
    "bloom_build",
    "bloom_merge",
    "bloom_might_contain",
    "kmv_estimate",
    "kmv_intersect_estimate",
    "kmv_sketch",
    "cohort_retention",
    "funnel_stages",
    "blocked_levenshtein_pairs",
    "trailing_zscore",
    "repetition_signals",
    "sessionize",
    "scd2_build",
    "node2vec_walks",
    "weighted_neighbor_sample",
    "bpe_encode",
    "bpe_train",
    "vocab_oov",
]
