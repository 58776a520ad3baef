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


def naive_bayes_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes train + classify in one plan — the
    classical fastText-precursor label screen (language ID, quality
    vs junk, domain routing) that corpus pipelines train in-engine
    because shipping 100 TB to an external trainer is the bug.

    Model (add-1 smoothing):
        P(c)     = n_docs_c / n_docs
        P(t | c) = (c(c,t) + 1) / (N_c + V)
    score(d,c)  = ln P(c) + Σ_t cnt_{d,t} · ln P(t|c); predict argmax,
    ties broken by label ascending on the ROUNDED score so the argmax
    is engine-stable.

    Scale shape: the model is three map-side-combinable aggregates over
    the TRAIN split (one corpus scan); scoring fans each test (doc,term)
    row out by |classes| (a broadcast of the tiny class table — bounded
    C× blow-up, the canonical NB scoring dataflow) and left-joins the
    (term,class) count table, which is vocabulary-sized, not
    corpus-sized. One final (doc,class) aggregate + per-doc argmax
    window. All counts are BIGINT; doubles appear only in the last
    per-row log expression, and the per-(doc,class) sum is rounded
    before the argmax — the same exactness contract as
    text.bigram_perplexity (round absorbs summation-order ulps).

    Reference parity: TorcDB has no in-engine trainer; this extends the
    classifier family (perceptron_train above) that SURVEY §2 claims as
    extension operators."""
    from pyspark.sql.window import Window as W

    from torcdb_spark.operators.text import word_tokens

    def doc_terms(frame: DataFrame) -> DataFrame:
        return (
            frame.select(
                F.col(id_col),
                F.explode(word_tokens(F.col(text_col))).alias("term"),
            )
            .where(F.col("term") != "")
            .groupBy(id_col, "term")
            .agg(F.count("*").cast("long").alias("cnt"))
        )

    tr_terms = doc_terms(train).join(
        train.select(F.col(id_col), F.col(label_col).alias("_c")), id_col
    )
    # (class, term) counts — vocabulary-sized, the NB "model".
    ct = tr_terms.groupBy("_c", "term").agg(
        F.sum("cnt").cast("long").alias("c_ct")
    )
    # Per-class token totals + doc priors; |classes| rows.
    classes = tr_terms.groupBy("_c").agg(
        F.sum("cnt").cast("long").alias("n_c")
    ).join(
        train.groupBy(F.col(label_col).alias("_c")).agg(
            F.count("*").cast("long").alias("n_docs_c")
        ),
        "_c",
    )
    v_size = tr_terms.select("term").distinct().count()
    n_docs = train.count()

    te = doc_terms(test)
    scored = (
        te.crossJoin(F.broadcast(classes))
        .join(F.broadcast(ct), ["_c", "term"], "left")
        .select(
            F.col(id_col),
            "_c",
            "n_c",
            "n_docs_c",
            (
                F.col("cnt")
                * F.log(
                    (F.coalesce(F.col("c_ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_c") + F.lit(float(v_size)))
                )
            ).alias("_ll"),
        )
        .groupBy(id_col, "_c")
        .agg(
            F.first("n_docs_c").alias("_nd"),
            F.sum("_ll").alias("_s"),
        )
        .select(
            F.col(id_col),
            F.col("_c"),
            F.round(
                F.log(F.col("_nd") / F.lit(float(n_docs))) + F.col("_s"), 4
            ).alias("score"),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("_c"))
    best = scored.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") == 1
    )
    return (
        best.join(
            test.select(F.col(id_col), F.col(label_col).alias("actual")),
            id_col,
        )
        .select(
            F.col(id_col),
            "actual",
            F.col("_c").alias("predicted"),
            "score",
        )
    )
