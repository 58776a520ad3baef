"""operators/classifier: batch perceptron trained in-engine must agree
with a pure-Python replay of the same featurization + update rule."""

import hashlib

import pytest
from pyspark.sql import functions as F

from torcdb_spark.operators.classifier import (
    perceptron_score,
    perceptron_train,
)

DOCS = [
    (0, "spark rows table join", 1),
    (1, "le chat noir dort", -1),
    (2, "fast table scan spark", 1),
    (3, "der hund läuft schnell", -1),
    (4, "join scan rows fast", 1),
    (5, "noir chat le vite", -1),
    (6, "table spark join scan rows", 1),
]
DIM = 4
EPOCHS = 3


def _feats(text):
    out = {DIM: 1}  # bias
    for term in text.strip().lower().split():
        h = hashlib.md5(term.encode()).hexdigest()
        j = int(h[:8], 16) % DIM
        s = 1 if int(h[8], 16) % 2 == 0 else -1
        out[j] = out.get(j, 0) + s
    return out


def _python_perceptron():
    rows = []
    w = [0] * (DIM + 1)
    X = [( _feats(t), y) for _, t, y in DOCS]
    for epoch in range(1, EPOCHS + 1):
        mis = [
            (x, y)
            for x, y in X
            if y * sum(w[j] * v for j, v in x.items()) <= 0
        ]
        for j in range(DIM + 1):
            w[j] += sum(y * x.get(j, 0) for x, y in mis)
        rows.extend((epoch, j, w[j], len(mis)) for j in range(DIM + 1))
    return sorted(rows), w


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def test_trajectory_matches_pure_python(spark, docs):
    label = F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    got = perceptron_train(
        spark, docs, label, dim=DIM, epochs=EPOCHS
    )
    expect, _ = _python_perceptron()
    assert sorted(tuple(r) for r in got.collect()) == expect


def test_epoch_one_counts_every_doc(spark, docs):
    # Zero initial weights ⇒ margin 0 for every doc ⇒ all misclassified.
    label = F.when(F.col("doc_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    got = perceptron_train(spark, docs, label, dim=DIM, epochs=1)
    assert {r["n_mistakes"] for r in got.collect()} == {len(DOCS)}


def test_score_agrees_with_replay(spark, docs):
    _, w = _python_perceptron()
    got = {
        r["doc_id"]: (r["margin"], r["predicted"])
        for r in perceptron_score(docs, w).collect()
    }
    for i, t, _ in DOCS:
        x = _feats(t)
        m = sum(w[j] * v for j, v in x.items())
        assert got[i] == (m, 1 if m > 0 else -1)


# ---------------------------------------------------------------- NB ----

def test_naive_bayes_separable_toy(spark):
    from torcdb_spark.operators.classifier import naive_bayes_classify

    train = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "a cat and a dog", "en"),
            (3, "le chat est sur le tapis", "fr"),
            (4, "le chien et le chat", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "the cat and the dog", "en"), (11, "le chat et le chien", "fr")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["actual"], r["predicted"])
        for r in naive_bayes_classify(train, test).collect()
    }
    assert got == {10: ("en", "en"), 11: ("fr", "fr")}


def test_naive_bayes_python_replay(spark):
    """Scores must equal an independent per-doc python NB replay."""
    import math
    from collections import Counter

    from torcdb_spark.operators.classifier import naive_bayes_classify

    tr = [
        (1, "x x y", "a"), (2, "x y y z", "a"),
        (3, "z z w", "b"), (4, "w w z x", "b"), (5, "q z w", "b"),
    ]
    te = [(10, "x y q", "a"), (11, "z w w unseen", "b")]
    train = spark.createDataFrame(tr, "doc_id long, text string, lang string")
    test = spark.createDataFrame(te, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in naive_bayes_classify(train, test).collect()
    }

    cnt = {}
    docs_c = Counter()
    vocab = set()
    for _, t, c in tr:
        docs_c[c] += 1
        for w in t.split():
            cnt[(c, w)] = cnt.get((c, w), 0) + 1
            vocab.add(w)
    n_c = Counter()
    for (c, _), v in cnt.items():
        n_c[c] += v
    V = len(vocab)
    for did, t, _ in te:
        best = None
        for c in sorted(docs_c):
            s = math.log(docs_c[c] / len(tr))
            for w, k in Counter(t.split()).items():
                s += k * math.log(
                    (cnt.get((c, w), 0) + 1.0) / (n_c[c] + float(V))
                )
            s = round(s, 4)
            if best is None or s > best[1]:
                best = (c, s)
        assert got[did] == best
