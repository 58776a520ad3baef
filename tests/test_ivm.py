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


def test_maintain_equals_recompute_property(spark):
    """Property: maintain(view(base), Δ) == recompute(base ⊎ Δ) for
    arbitrary integer-keyed bases and signed deltas whose retractions
    only remove existing rows (the Z-set well-formedness condition)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    @settings(max_examples=10, deadline=None)
    @given(
        base=st.lists(
            st.tuples(st.integers(0, 4), st.integers(-5, 5)),
            min_size=0, max_size=20,
        ),
        inserts=st.lists(
            st.tuples(st.integers(0, 6), st.integers(-5, 5)),
            min_size=0, max_size=10,
        ),
        del_idx=st.lists(st.integers(0, 19), max_size=6, unique=True),
    )
    def check(base, inserts, del_idx):
        deletes = [base[i] for i in del_idx if i < len(base)]
        # python reference: multiset of final rows
        from collections import Counter

        final = Counter(base)
        final.subtract(Counter(deletes))
        final.update(Counter(inserts))
        expect = {}
        for (k, s), m in final.items():
            if m:
                n, tot = expect.get(k, (0, 0))
                expect[k] = (n + m, tot + s * m)
        expect = {k: v for k, v in expect.items() if v[0] > 0}

        if not base and not inserts:
            return
        bdf = spark.createDataFrame(
            base or [(None, None)], "k int, s int"
        ).where("k is not null")
        view = bdf.groupBy("k").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("s").cast("long").alias("s"),
        )
        drows = [(k, s, 1) for k, s in inserts] + [
            (k, s, -1) for k, s in deletes
        ]
        if not drows:
            return
        delta = spark.createDataFrame(drows, "k int, s int, __m int")
        got = {
            r.k: (r.n, r.s)
            for r in maintain_agg(view, delta, ["k"], ["s"]).collect()
        }
        assert got == expect, (base, inserts, deletes)

    check()
