"""Constraint-audit semantics on constructed rows: fail-closed null
handling, violation counting, uniqueness arithmetic, and referential
anti-join counts (operators/audit.py)."""

from pyspark.sql import functions as F

from torcdb_spark.operators import audit as A


def _rows(df):
    return {r.rule: (r.n_checked, r.n_violations, r.passed) for r in df.collect()}


def test_row_rules_fail_closed_on_null(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (3, "c", None), (4, "d", -1.0)],
        "id long, tag string, v double",
    )
    out = _rows(A.constraint_audit(df, [
        A.not_null("tag"),
        A.in_set("tag", ["a", "c", "d"]),
        A.in_range("v", 0, 10),
        A.satisfies("v_lt_100", F.col("v") < 100),
    ]))
    assert out["not_null(tag)"] == (4, 1, False)
    # NULL tag is a membership violation too (fail-closed)
    assert out["in_set(tag)"] == (4, 1, False)
    # 50.0 out of range, NULL v fails closed, -1 below lo
    assert out["in_range(v)"] == (4, 3, False)
    # NULL v fails closed even though NULL < 100 is UNKNOWN
    assert out["v_lt_100"] == (4, 1, False)


def test_unique_counts_rows_beyond_first(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1)], "k long, sub long"
    )
    out = _rows(A.constraint_audit(df, [
        A.unique("k"),
        A.unique("k", "sub"),
    ]))
    assert out["unique(k)"] == (4, 2, False)
    assert out["unique(k,sub)"] == (4, 1, False)


def test_foreign_key_counts_dangling(spark):
    df = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    ref = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = _rows(A.constraint_audit(df, [A.foreign_key("fk", ref, "pk")]))
    assert out["foreign_key(fk)"] == (4, 2, False)


def test_all_green_audit_passes(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, tag string")
    out = A.constraint_audit(df, [
        A.not_null("id"),
        A.unique("id"),
        A.in_set("tag", ["x", "y"]),
    ])
    assert all(r.passed for r in out.collect())
    assert out.columns == ["rule", "n_checked", "n_violations", "passed"]
