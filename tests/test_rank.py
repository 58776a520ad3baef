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


def test_global_cumsum_matches_window_reference(spark):
    df = spark.createDataFrame(
        [(i, (i * 13) % 7, i % 5 + 1) for i in range(120)],
        "id long, v long, w long",
    )
    got = {
        r.id: r.cum
        for r in __import__(
            "torcdb_spark.operators.rank", fromlist=["global_cumsum"]
        ).global_cumsum(df, ["v", "id"], "w", num_partitions=6).collect()
    }
    ref = {
        r.id: r.c
        for r in df.withColumn(
            "c",
            F.sum("w").over(
                Window.orderBy("v", "id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    assert got == ref


def test_top_p_by_weight_hand_computed(spark):
    from torcdb_spark.operators.rank import top_p_by_weight

    # ordered by score: weights 4,3,2,1 (total 10); p=0.5 -> budget 5:
    # keep first two (cum 4, 7>5 stops at... cum 7 > 5 so only first)
    df = spark.createDataFrame(
        [(1, 1, 4), (2, 2, 3), (3, 3, 2), (4, 4, 1)],
        "id long, score long, w long",
    )
    kept = sorted(
        r.id for r in top_p_by_weight(df, ["score", "id"], "w", 0.5).collect()
    )
    assert kept == [1]  # cum: 4 <= 5 keep; 7 > 5 stop

    kept9 = sorted(
        r.id for r in top_p_by_weight(df, ["score", "id"], "w", 0.9).collect()
    )
    assert kept9 == [1, 2, 3]  # cum 4,7,9 <= 9; 10 > 9


def test_top_p_first_row_always_kept(spark):
    df = spark.createDataFrame(
        [(1, 1, 100), (2, 2, 1)], "id long, score long, w long"
    )
    from torcdb_spark.operators.rank import top_p_by_weight

    kept = [r.id for r in top_p_by_weight(df, ["score", "id"], "w", 0.1).collect()]
    assert kept == [1]  # over budget but first in order


def test_preference_pairs_bounds_and_margin(spark):
    from torcdb_spark.operators.rank import preference_pairs

    rows = [("g1", i, float(i)) for i in range(1, 11)]  # scores 1..10
    rows += [("g2", 100, 5.0), ("g2", 101, 5.0)]  # no margin clears 0.5
    df = spark.createDataFrame(rows, "grp string, doc_id long, score double")
    got = preference_pairs(
        df, ["grp"], "doc_id", "score", k=3, min_margin=0.5
    ).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["grp"], []).append(r)
    # k² bound: at most 9 pairs per group
    assert len(by_g.get("g1", [])) == 9
    assert "g2" not in by_g
    # chosen are the top-3 {10,9,8}, rejected the bottom-3 {1,2,3}
    assert {r["chosen_id"] for r in by_g["g1"]} == {8, 9, 10}
    assert {r["rejected_id"] for r in by_g["g1"]} == {1, 2, 3}
    for r in by_g["g1"]:
        assert r["chosen_score"] - r["rejected_score"] >= 0.5
        assert r["margin"] == round(r["chosen_score"] - r["rejected_score"], 4)


def test_preference_pairs_tiebreak_deterministic(spark):
    from torcdb_spark.operators.rank import preference_pairs

    # four docs with identical scores: top/bot picks lowest ids
    df = spark.createDataFrame(
        [("g", i, 1.0) for i in (4, 2, 3, 1)],
        "grp string, doc_id long, score double",
    )
    got = preference_pairs(df, ["grp"], "doc_id", "score", k=2, min_margin=0.0)
    pairs = {(r["chosen_id"], r["rejected_id"]) for r in got.collect()}
    assert pairs == {(1, 1), (1, 2), (2, 1), (2, 2)}
