"""Drift statistics on constructed populations with hand-computed
expectations (operators/drift.py)."""

from torcdb_spark.operators.drift import ecdf_max_gap, psi


def _pop(spark, a_vals, b_vals):
    rows = [(float(v), True) for v in a_vals] + [(float(v), False) for v in b_vals]
    return spark.createDataFrame(rows, "v double, is_a boolean")


def test_ks_hand_computed(spark):
    # F_a steps at 1,2,3; F_b at 2,3,4.  Max gap is 1/3 (at v=1 or v=3).
    df = _pop(spark, [1, 2, 3], [2, 3, 4])
    row = ecdf_max_gap(df, "v", "is_a").collect()[0]
    assert (row.n_a, row.n_b) == (3, 3)
    assert abs(row.ks_d - round(1 / 3, 6)) < 1e-9


def test_ks_disjoint_supports_is_one(spark):
    df = _pop(spark, [1, 2, 3], [10, 11, 12])
    assert ecdf_max_gap(df, "v", "is_a").collect()[0].ks_d == 1.0


def test_ks_identical_is_zero(spark):
    df = _pop(spark, [5, 6, 7, 8], [5, 6, 7, 8])
    assert ecdf_max_gap(df, "v", "is_a").collect()[0].ks_d == 0.0


def test_ks_handles_ties_and_weights(spark):
    # a = {1,1,5}, b = {1,5,5}: at v=1 gap = |2/3-1/3| = 1/3, at v=5 gap 0.
    df = _pop(spark, [1, 1, 5], [1, 5, 5])
    assert abs(ecdf_max_gap(df, "v", "is_a").collect()[0].ks_d
               - round(1 / 3, 6)) < 1e-9


def test_psi_identical_populations_is_zero(spark):
    # Same counts per bin and same n on both sides → pa == pb exactly.
    df = _pop(spark, [0, 70000, 130000], [0, 70000, 130000])
    row = psi(df, "v", "is_a", bin_width=60000.0, num_bins=10).collect()[0]
    assert row.psi == 0.0


def test_psi_shifted_population_positive(spark):
    df = _pop(spark, [0, 10000, 20000], [500000, 540000, 580000])
    row = psi(df, "v", "is_a", bin_width=60000.0, num_bins=10).collect()[0]
    # Fully separated bins; smoothing (n=3, B=10) caps the divergence well
    # below the unsmoothed infinity — positive and material is the claim.
    assert row.psi > 0.5


def test_ks_matches_python_reference(spark):
    """Property: the distributed prefix-sum KS equals a pure-Python ECDF
    sup-gap on arbitrary two-sample data (ties, duplicates, negatives)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        a=st.lists(st.integers(-20, 20), min_size=1, max_size=30),
        b=st.lists(st.integers(-20, 20), min_size=1, max_size=30),
    )
    def check(a, b):
        df = _pop(spark, a, b)
        got = ecdf_max_gap(df, "v", "is_a").collect()[0]
        pooled = sorted(set(a) | set(b))
        ref = max(
            abs(
                sum(1 for x in a if x <= v) / len(a)
                - sum(1 for x in b if x <= v) / len(b)
            )
            for v in pooled
        )
        assert (got.n_a, got.n_b) == (len(a), len(b))
        assert abs(got.ks_d - round(ref, 6)) < 1e-9, (a, b)

    check()
