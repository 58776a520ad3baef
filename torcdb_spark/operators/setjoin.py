"""Exact all-pairs set-similarity self-join (the PPJoin/prefix-filter
family, Chaudhuri 2006 / Xiao 2008) — every document pair whose token-set
Jaccard meets a threshold, with NO false negatives and NO probability.

The exact counterpart of MinHash-LSH (operators/dedup.py): LSH trades
recall for speed; prefix filtering keeps exactness and still never
compares all pairs. For Jaccard ≥ τ, two sets MUST share at least one
token within each set's first ``|d| − ⌈τ·|d|⌉ + 1`` tokens under any
common total order — so ordering tokens rarest-first (document frequency
asc) makes the prefixes the most selective tokens, and the candidate set
is an EQUI-join on prefix tokens, not a cross product.

Plan shape (all JVM expressions):
  1. distinct (doc, token) + token document frequencies — two map-side
     combinable aggregates;
  2. a TOTAL order over the vocabulary via rank.global_rank (freq asc,
     token asc) — the distributed prefix-sum ranking, no single-task
     window even for a 100 TB vocabulary;
  3. per-doc sorted rank arrays (one doc-keyed aggregate), prefix
     explode bounded by ⌈(1−τ)|d|⌉+1 rows per doc;
  4. candidate pairs: self-equi-join on the prefix rank with id_a <
     id_b and the length filter τ·|a| ≤ |b| ≤ |a|/τ folded into the
     join condition;
  5. verify: array_intersect on the full rank arrays; the τ test is
     cross-multiplied INTEGER arithmetic (τ = num/den), so the
     decision — and the (intersection, union) sizes returned — are
     bit-exact in any engine.

Threshold τ is passed as a rational num/den; ⌈τ·s⌉ is computed as
(num·s + den − 1) DIV den — no float boundary anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_pairs_exact(
    docs: DataFrame,
    tau_num: int = 3,
    tau_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 1,
    num_partitions: int = 32,
) -> DataFrame:
    """All pairs with set Jaccard ≥ tau_num/tau_den →
    (id_a, id_b, inter_size, union_size), id_a < id_b, exact. Set
    elements are word tokens (``shingle=1``) or distinct word n-grams
    (``shingle=n`` — the near-dup practice: on a small shared
    vocabulary, word SETS saturate and everything matches everything;
    shingles keep sets sparse and identity-bearing)."""
    from torcdb_spark.operators.rank import global_rank
    from torcdb_spark.operators.text import (
        word_shingles_from_tokens,
        word_tokens,
    )

    staged = docs.select(
        F.col(id_col).alias("id"),
        word_tokens(F.col(text_col)).alias("_ws"),
    )
    # Set semantics are established ROW-SIDE (array_distinct inside the
    # projection; word_shingles_from_tokens is already distinct), so the
    # exploded (id, term) rows need NO dropDuplicates shuffle. One
    # materialization: the explode feeds BOTH the vocabulary aggregate
    # and the per-doc array build — without the pin it runs twice.
    elems = (
        F.array_distinct(F.col("_ws"))
        if shingle <= 1
        else word_shingles_from_tokens(F.col("_ws"), n=shingle)
    )
    toks = (
        staged.select("id", F.explode(elems).alias("term"))
        .where(F.col("term") != "")
        .localCheckpoint(eager=True)
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ranked = global_rank(
        vocab, ["df", "term"], "r", num_partitions=num_partitions
    ).select("term", "r")
    # per-doc sorted rank array + size + integer prefix length
    arrs = (
        toks.join(ranked, "term")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("r")).alias("rs"))
        .withColumn("s", F.size("rs").cast("long"))
        .withColumn(
            "p",
            F.col("s")
            - F.expr(f"(s * {tau_num} + {tau_den - 1}) div {tau_den}")
            + 1,
        )
        .localCheckpoint(eager=True)
    )
    # prefix tokens WITH their 0-based position in the sorted array: the
    # position powers the PPJoin positional filter below
    pref = arrs.select(
        "id",
        "s",
        F.posexplode(F.slice("rs", 1, F.col("p").cast("int"))).alias(
            "_i", "pr"
        ),
    )
    a = pref.select(
        F.col("id").alias("id_a"), F.col("s").alias("sa"), "pr",
        F.col("_i").alias("ia"),
    )
    b = pref.select(
        F.col("id").alias("id_b"), F.col("s").alias("sb"), "pr",
        F.col("_i").alias("ib"),
    )
    # Positional filter (PPJoin): Jaccard ≥ n/d ⟺ I ≥ ⌈n(sa+sb)/(d+n)⌉,
    # and a match on the token at (0-based) positions ia/ib bounds the
    # remaining overlap by 1 + min(sa−ia−1, sb−ib−1). A true pair's FIRST
    # common token (a) lies inside both prefixes and (b) has no common
    # token before it, so its row always satisfies the bound — any pair
    # kept through ANY passing row is a superset of the true pairs, and
    # the verify stage re-checks exactly. Integer form: ubound·(d+n) ≥
    # n·(sa+sb) — no float boundary. Measured sf0.1: candidate pairs
    # 310k → far fewer reach the array_intersect verify, which dominated
    # the query (guide §3: shrink the join input, not its strategy).
    ubound = F.lit(1) + F.least(
        F.col("sa") - F.col("ia") - 1, F.col("sb") - F.col("ib") - 1
    )
    cand = (
        a.join(
            b,
            (a["pr"] == b["pr"])
            & (a["id_a"] < b["id_b"])
            # length filter: τ·max(sa,sb) ≤ min(sa,sb)
            & (
                F.greatest(a["sa"], b["sb"]) * tau_num
                <= F.least(a["sa"], b["sb"]) * tau_den
            )
            & (
                ubound * (tau_den + tau_num)
                >= tau_num * (F.col("sa") + F.col("sb"))
            ),
        )
        .select("id_a", "id_b", "sa", "sb")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = arrs.select(F.col("id").alias("id_a"), F.col("rs").alias("ra"))
    vb = arrs.select(F.col("id").alias("id_b"), F.col("rs").alias("rb"))
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        # ONE array_intersect per pair; |A∪B| = sa + sb − |A∩B| is
        # arithmetic on the sizes already carried through the join
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ra", "rb")).cast("long").alias(
                "inter_size"
            ),
            "sa",
            "sb",
        )
        .select(
            "id_a",
            "id_b",
            "inter_size",
            (F.col("sa") + F.col("sb") - F.col("inter_size"))
            .cast("long")
            .alias("union_size"),
        )
        .where(
            F.col("inter_size") * tau_den
            >= F.col("union_size") * tau_num
        )
    )
    return verified


def containment_pairs_exact(
    docs: DataFrame,
    tau_num: int = 2,
    tau_den: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    num_partitions: int = 32,
) -> DataFrame:
    """All DIRECTED pairs with set containment |A∩B| / |A| ≥
    tau_num/tau_den → (id_a, id_b, inter_size, size_a), id_a ≠ id_b,
    exact. The asymmetric cousin of ``jaccard_pairs_exact``: containment
    is the superset/near-superset test dedup pipelines use when a short
    document is embedded inside a longer one (quote inclusion, boilerplate
    wrapping, page-of-a-book) — Jaccard punishes the length mismatch,
    containment doesn't.

    Prefix filter, asymmetric form: if |A∩B| ≥ τ·|A| then at least one of
    A's first ``|A| − ⌈τ·|A|⌉ + 1`` rarest-first tokens is in B — but B
    gets NO prefix (any of its tokens may witness), so candidates are the
    equi-join of A-prefixes against B's FULL token lists. Still never a
    cross product: prefixes hold the globally rarest tokens, so the join
    key is maximally selective. There is no length filter (a tiny A can be
    contained in a huge B) — the asymmetry is inherent to the predicate.
    Same integer-rational τ arithmetic as the Jaccard path: bit-exact in
    any engine."""
    from torcdb_spark.operators.rank import global_rank
    from torcdb_spark.operators.text import (
        word_shingles_from_tokens,
        word_tokens,
    )

    staged = docs.select(
        F.col(id_col).alias("id"),
        word_tokens(F.col(text_col)).alias("_ws"),
    )
    elems = (
        F.array_distinct(F.col("_ws"))
        if shingle <= 1
        else word_shingles_from_tokens(F.col("_ws"), n=shingle)
    )
    toks = (
        staged.select("id", F.explode(elems).alias("term"))
        .where(F.col("term") != "")
        .localCheckpoint(eager=True)
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ranked = global_rank(
        vocab, ["df", "term"], "r", num_partitions=num_partitions
    ).select("term", "r")
    arrs = (
        toks.join(ranked, "term")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("r")).alias("rs"))
        .withColumn("s", F.size("rs").cast("long"))
        .withColumn(
            "p",
            F.col("s")
            - F.expr(f"(s * {tau_num} + {tau_den - 1}) div {tau_den}")
            + 1,
        )
        .localCheckpoint(eager=True)
    )
    pref = arrs.select(
        F.col("id").alias("id_a"),
        F.col("s").alias("sa"),
        F.posexplode(F.slice("rs", 1, F.col("p").cast("int"))).alias(
            "ia", "r"
        ),
    )
    # B's full sorted token list WITH positions, re-derived from the
    # checkpointed per-doc arrays instead of re-joining toks⋈ranked —
    # same (id, r) multiset, one 260k-row join less, and the position
    # powers the positional filter
    full = arrs.select(
        F.col("id").alias("id_b"),
        F.col("s").alias("sb"),
        F.posexplode("rs").alias("ib", "r"),
    )
    # Positional filter, asymmetric form: containment ≥ n/d ⟺
    # I ≥ ⌈n·sa/d⌉, and a match at (0-based) positions ia/ib bounds the
    # remaining overlap by 1 + min(sa−ia−1, sb−ib−1). A true pair's
    # first common token sits inside A's prefix (asymmetric prefix
    # theorem) with nothing common before it, so its row passes —
    # keeping pairs with ANY passing row is a superset of the truth,
    # re-checked exactly by the verify. Integer form: ubound·d ≥ n·sa.
    ubound = F.lit(1) + F.least(
        F.col("sa") - F.col("ia") - 1, F.col("sb") - F.col("ib") - 1
    )
    cand = (
        pref.join(full, "r")
        .where(F.col("id_a") != F.col("id_b"))
        .where(ubound * tau_den >= tau_num * F.col("sa"))
        .select("id_a", "id_b", "sa")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = arrs.select(F.col("id").alias("id_a"), F.col("rs").alias("ra"))
    vb = arrs.select(F.col("id").alias("id_b"), F.col("rs").alias("rb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ra", "rb")).cast("long").alias(
                "inter_size"
            ),
            F.col("sa").cast("long").alias("size_a"),
        )
        .where(
            F.col("inter_size") * tau_den >= F.col("size_a") * tau_num
        )
    )
