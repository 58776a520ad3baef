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


def test_delta_join_bilinear_rule_with_cross_term(spark):
    """maintain(view, delta_join) == recompute on post-change tables,
    on a toy where BOTH sides change for the same key — the ΔA⋈ΔB cross
    term is load-bearing (dropping it double-counts retractions)."""
    from pyspark.sql import functions as F

    from torcdb_spark.operators.ivm import delta_join, maintain_agg

    a0 = spark.createDataFrame(
        [(1, "p1"), (2, "p2"), (3, "p1")], "k long, g string"
    )
    b0 = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5), (3, 7)], "k long, x long"
    )
    # UPDATE key 1's group p1 -> p9 AND delete one of key 1's b rows
    d_a = spark.createDataFrame(
        [(1, "p1", -1), (1, "p9", 1)], "k long, g string, __m int"
    )
    d_b = spark.createDataFrame([(1, 20, -1)], "k long, x int, __m int")

    view0 = (
        a0.join(b0, "k").groupBy("g")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("x").cast("long").alias("x"))
    )
    dj = delta_join(a0, d_a, b0, d_b, ["k"]).select("g", "x", "__m")
    got = {
        r["g"]: (r["n"], r["x"])
        for r in maintain_agg(view0, dj, ["g"], ["x"]).collect()
    }

    a1 = spark.createDataFrame(
        [(1, "p9"), (2, "p2"), (3, "p1")], "k long, g string"
    )
    b1 = spark.createDataFrame(
        [(1, 10), (2, 5), (3, 7)], "k long, x long"
    )
    expect = {
        r["g"]: (r["n"], r["x"])
        for r in a1.join(b1, "k").groupBy("g")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("x").cast("long").alias("x")).collect()
    }
    assert got == expect
