"""In-engine linear-classifier training — the trainable quality-filter
stand-in every LLM data pipeline eventually needs (fastText-style label
screening: language-vs-rest, quality-vs-junk, domain-vs-domain).

Model: batch perceptron (Rosenblatt; the Novikoff-bounded batch variant)
over hashing-trick features (operators/text.hash_embed_sparse buckets +
a constant bias feature). Per epoch, with the weight vector broadcast as
a plan literal:

    margin_d = Σ_j w_j · x_{d,j}          (one feature-keyed aggregate)
    M        = {d : y_d · margin_d ≤ 0}   (the misclassified set)
    w        ← w + Σ_{d∈M} y_d · x_d      (one map-side-combinable agg)

This is exactly the allreduce shape of distributed model training: the
corpus is scanned, never moved; the only thing that crosses stages is
the (dim+1)-length gradient/weight vector. The driver round-trip per
epoch is bounded by DIM, not data — the same contract as bpe.py's
per-round argmax and the Pregel convergence probes.

Why a perceptron and not logistic regression: the update rule is pure
INTEGER arithmetic (token counts are integers, y ∈ {−1,+1}, unit
learning rate), so the entire training trajectory — every weight after
every epoch, every misclassification count — is bit-exact in any engine
and SQL-replayable by unrolling epochs as CTEs. A sigmoid would make
the oracle a floating-point approximation; the perceptron makes
training itself value-verifiable. (Swap in the logistic gradient and
the plan shape is unchanged — only the exactness contract weakens.)

Weights enter the per-epoch scan as literal expressions (element_at on
an array literal), so each epoch's margin pass is one whole-stage-
codegen aggregate with no join against a weights table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _featurize(
    docs: DataFrame,
    label: Column,
    dim: int,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """(features, labels): hashing-trick buckets 0..dim-1 plus the bias
    feature j=dim with x=1 for every doc; labels y ∈ {−1,+1}."""
    from torcdb_spark.operators.text import hash_embed_sparse

    feats = hash_embed_sparse(
        docs, dim=dim, text_col=text_col, id_col=id_col
    ).select(
        F.col(id_col), F.col("bucket").alias("j"), F.col("weight").alias("v")
    )
    bias = docs.select(
        F.col(id_col), F.lit(dim).cast("long").alias("j"),
        F.lit(1).cast("long").alias("v"),
    )
    labels = docs.select(F.col(id_col), label.cast("long").alias("y"))
    return feats.unionByName(bias), labels


def perceptron_train(
    spark: SparkSession,
    docs: DataFrame,
    label: Column,
    dim: int = 8,
    epochs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train and return the full trajectory: one row per
    (epoch, feature, weight, n_mistakes) — weight AFTER the epoch's
    update, n_mistakes counted BEFORE it (so epoch 1 reports the
    all-zero model's error, i.e. the corpus size). feature dim is the
    bias. Everything is a BIGINT; ties and update order cannot affect
    the result because the batch update commutes (a sum).

    ``label`` must evaluate to ±1 (e.g. ``F.when(cond, 1).otherwise(-1)``).
    """
    feats, labels = _featurize(docs, label, dim, text_col, id_col)
    # One materialization; every epoch re-reads this, never the corpus.
    x = (
        feats.join(labels, id_col)
        .select(id_col, "j", "v", "y")
        .localCheckpoint(eager=True)
    )
    w = [0] * (dim + 1)
    out: list[tuple[int, int, int, int]] = []
    for epoch in range(1, epochs + 1):
        warr = F.array(*[F.lit(int(c)).cast("long") for c in w])
        margins = x.groupBy(id_col, "y").agg(
            F.sum(
                F.col("v")
                * F.element_at(warr, (F.col("j") + 1).cast("int"))
            ).alias("margin")
        )
        mis = margins.where(F.col("y") * F.col("margin") <= 0).select(
            id_col, "y"
        )
        # ONE tiny action per epoch: the (dim+1)-row gradient, map-side
        # combinable. The misclassified-doc count rides along for free —
        # every doc has exactly one bias-feature row (j == dim), so that
        # row's count(*) IS |misclassified|.
        rows = (
            mis.join(x.select(id_col, "j", "v"), id_col)
            .groupBy("j")
            .agg(
                F.sum(F.col("y") * F.col("v")).cast("long").alias("g"),
                F.count(F.lit(1)).cast("long").alias("c"),
            )
            .collect()
        )
        upd = {r["j"]: r["g"] for r in rows}
        n_mis = next((int(r["c"]) for r in rows if r["j"] == dim), 0)
        w = [w[j] + int(upd.get(j, 0)) for j in range(dim + 1)]
        out.extend((epoch, j, w[j], n_mis) for j in range(dim + 1))
    return spark.createDataFrame(
        out, "epoch long, feature long, weight long, n_mistakes long"
    )


def perceptron_score(
    docs: DataFrame,
    weights: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inference with a trained weight vector (len dim+1, bias last):
    (id, margin, predicted) with predicted = +1 iff margin > 0. One
    feature pass + one id-keyed aggregate; the weights ride the plan as
    literals, so scoring a 100 TB corpus is a single scan."""
    dim = len(weights) - 1
    feats, _ = _featurize(
        docs, F.lit(1), dim, text_col, id_col
    )
    warr = F.array(*[F.lit(int(c)).cast("long") for c in weights])
    return (
        feats.groupBy(id_col)
        .agg(
            F.sum(
                F.col("v")
                * F.element_at(warr, (F.col("j") + 1).cast("int"))
            )
            .cast("long")
            .alias("margin")
        )
        .select(
            id_col,
            "margin",
            F.when(F.col("margin") > 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("predicted"),
        )
    )
