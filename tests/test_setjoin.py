"""operators/setjoin: exact prefix-filtered Jaccard self-join must equal
the brute-force all-pairs computation (exactness = no false negatives)."""

import itertools

import pytest

from torcdb_spark.operators.setjoin import jaccard_pairs_exact

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox leaps over the lazy dog"),   # near-dup of 0
    (2, "quick brown foxes jump over lazy dogs"),
    (3, "completely different words entirely here now"),
    (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (5, "words different completely here entirely now"),  # perm of 3
    (6, "one two"),
    (7, "one two three"),
    (8, "one"),
    (9, ""),
]


def _brute(tau_num, tau_den):
    sets = {i: set(t.split()) for i, t in DOCS if t.split()}
    out = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * tau_den >= union * tau_num:
            out.append((a, b, inter, union))
    return sorted(out)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("tau_num,tau_den", [(3, 5), (1, 2), (9, 10)])
def test_matches_brute_force(spark, docs, tau_num, tau_den):
    got = sorted(
        tuple(r)
        for r in jaccard_pairs_exact(
            docs, tau_num=tau_num, tau_den=tau_den
        )
        .select("id_a", "id_b", "inter_size", "union_size")
        .collect()
    )
    assert got == _brute(tau_num, tau_den)


def test_exact_dup_and_permutation_found(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs_exact(docs, 9, 10).collect()
    }
    assert (0, 4) in pairs  # exact duplicate
    assert (3, 5) in pairs  # word permutation: same token SET


# -- containment (asymmetric) ---------------------------------------------

from torcdb_spark.operators.setjoin import containment_pairs_exact


def _brute_containment(tau_num, tau_den):
    sets = {i: set(t.split()) for i, t in DOCS if t.split()}
    out = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter * tau_den >= len(sets[a]) * tau_num:
                out.append((a, b, inter, len(sets[a])))
    return sorted(out)


@pytest.mark.parametrize("tau_num,tau_den", [(1, 2), (2, 3), (9, 10)])
def test_containment_matches_brute_force(spark, docs, tau_num, tau_den):
    got = sorted(
        tuple(r)
        for r in containment_pairs_exact(
            docs, tau_num=tau_num, tau_den=tau_den, shingle=1
        )
        .select("id_a", "id_b", "inter_size", "size_a")
        .collect()
    )
    assert got == _brute_containment(tau_num, tau_den)


def test_containment_is_asymmetric_for_subset(spark, docs):
    # doc 6 "one two" ⊂ doc 7 "one two three": containment(6→7) = 1
    # but containment(7→6) = 2/3 — the directed pair (6,7) must appear
    # at τ=9/10 while (7,6) must not.
    pairs = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs_exact(docs, 9, 10, shingle=1).collect()
    }
    assert (6, 7) in pairs
    assert (7, 6) not in pairs
    # ...and at τ=2/3 the reverse direction qualifies too
    pairs_23 = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs_exact(docs, 2, 3, shingle=1).collect()
    }
    assert (7, 6) in pairs_23


def test_containment_hypothesis_property(spark):
    """Property: for ANY small random corpus and rational τ, the
    prefix-filtered containment join equals brute force — no false
    negatives from the asymmetric prefix theorem, no false positives
    from the verify stage."""
    from hypothesis import given, settings, strategies as st

    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]

    @settings(max_examples=8, deadline=None)
    @given(
        corpus=st.lists(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=8),
            min_size=2, max_size=8,
        ),
        tau=st.sampled_from([(1, 2), (2, 3), (3, 4), (9, 10)]),
    )
    def prop(corpus, tau):
        tn, td = tau
        docs = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
            "doc_id long, text string",
        )
        got = sorted(
            tuple(r)
            for r in containment_pairs_exact(
                docs, tau_num=tn, tau_den=td, shingle=1
            ).collect()
        )
        sets = {
            i: set(ws) for i, ws in enumerate(corpus) if set(ws) - {""}
        }
        want = sorted(
            (a, b, len(sets[a] & sets[b]), len(sets[a]))
            for a in sets
            for b in sets
            if a != b and len(sets[a] & sets[b]) * td >= len(sets[a]) * tn
        )
        assert got == want

    prop()
