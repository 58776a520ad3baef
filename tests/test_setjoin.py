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
