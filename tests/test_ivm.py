"""Incremental view maintenance semantics on constructed deltas
(operators/ivm.py): insert-new-group, partial update, full retraction."""

from torcdb_spark.operators.ivm import maintain_agg


def test_maintain_agg_insert_update_retract(spark):
    view = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 30), ("c", 3, 300)],
        "k string, n long, s long",
    )
    delta = spark.createDataFrame(
        [
            ("a", 50, 1),      # insert into existing group
            ("b", 30, -1),     # retract b's only row -> group vanishes
            ("d", 7, 1),       # brand-new group
            ("c", 100, -1),    # partial retraction
        ],
        "k string, s long, __m int",
    )
    out = {
        r.k: (r.n, r.s)
        for r in maintain_agg(view, delta, ["k"], ["s"]).collect()
    }
    assert out == {"a": (3, 150), "c": (2, 200), "d": (1, 7)}


def test_maintain_agg_matches_recompute(spark):
    rows = [(f"k{i % 5}", i, 10 * i) for i in range(40)]
    full = spark.createDataFrame(rows, "k string, id long, s long")
    base = full.where("id % 3 != 0")
    from pyspark.sql import functions as F

    view = base.groupBy("k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("s").cast("long").alias("s"),
    )
    inserts = full.where("id % 3 = 0").withColumn("__m", F.lit(1))
    deletes = base.where("id % 4 = 0").withColumn("__m", F.lit(-1))
    delta = inserts.unionByName(deletes).select("k", "s", "__m")
    maintained = {
        r.k: (r.n, r.s)
        for r in maintain_agg(view, delta, ["k"], ["s"]).collect()
    }
    final = full.where("id % 3 = 0 OR id % 4 != 0")
    recomputed = {
        r.k: (r.n, r.s)
        for r in final.groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("s").cast("long").alias("s"),
        )
        .collect()
    }
    assert maintained == recomputed
