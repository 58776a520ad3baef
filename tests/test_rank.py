"""Exact global ranking via distributed prefix-sum (operators/rank.py):
agreement with the single-task window reference, tie determinism under a
total order, bucket arithmetic."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from torcdb_spark.operators.rank import global_rank, rank_buckets


def test_global_rank_matches_window_reference(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(200)], "id long, v long"
    )
    got = {
        r.id: r.rank
        for r in global_rank(df, ["v", "id"], num_partitions=8).collect()
    }
    ref = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == ref


def test_global_rank_duplicate_keys_total_order(spark):
    # heavy ties on v; (v, id) is still a total order -> deterministic
    df = spark.createDataFrame([(i, i % 2) for i in range(50)], "id long, v long")
    a = sorted((r.id, r.rank) for r in global_rank(df, ["v", "id"], num_partitions=5).collect())
    b = sorted((r.id, r.rank) for r in global_rank(df, ["v", "id"], num_partitions=5).collect())
    assert a == b
    ranks = [rk for _, rk in a]
    assert sorted(ranks) == list(range(1, 51))


def test_rank_buckets_equal_sizes(spark):
    df = spark.createDataFrame([(i,) for i in range(40)], "id long")
    out = rank_buckets(df, ["id"], num_buckets=4, num_partitions=4)
    sizes = {
        r.bucket: r.n for r in out.groupBy("bucket").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert sizes == {0: 10, 1: 10, 2: 10, 3: 10}
    # bucket boundaries respect the order
    rows = {r.id: r.bucket for r in out.collect()}
    assert rows[0] == 0 and rows[39] == 3


def test_rank_buckets_uneven_n(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    out = rank_buckets(df, ["id"], num_buckets=3, num_partitions=3)
    sizes = sorted(
        r.n for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    )
    assert sum(sizes) == 10 and len(sizes) == 3
