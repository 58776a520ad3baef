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
