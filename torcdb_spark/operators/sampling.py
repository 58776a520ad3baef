"""Deterministic graph sampling: bounded neighbor fan-out and random walks.

Training pipelines over graphs (GraphSAGE/node2vec-style) need per-vertex
NEIGHBOR SAMPLES and WALKS, not full expansions — at 100 TB a hub vertex's
full neighbor list is itself a skew bomb. Sampling here is deterministic:
each candidate edge is scored by md5(src || dst || seed) and the top-k
smallest scores win. That makes runs reproducible (same seed → same sample,
the property a training pipeline needs for data lineage), makes resampling
a seed change, and — because md5 is identical everywhere — makes the
operator exactly verifiable against a SQL oracle, unlike rand()-based
sampling.

The reference's traverse() returns FULL neighbor lists (TorcGraph.java:
479-585); this is the scale-bounded variant of the same hop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _score(seed: int):
    return F.md5(
        F.concat(
            F.hex(F.col("src")), F.lit(":"), F.hex(F.col("dst")),
            F.lit(":"), F.lit(str(seed)),
        )
    )


def neighbor_sample(
    frontier: DataFrame,
    edges: DataFrame,
    edge_label: str,
    fanout: int,
    seed: int = 0,
) -> DataFrame:
    """≤ ``fanout`` OUT-neighbors per frontier vertex, chosen as the
    ``fanout`` smallest md5 scores — one hop join + one per-src window.
    The window's partition key is src, so skew is bounded by the sample
    itself: a hub emits at most ``fanout`` rows past the rank filter."""
    ids = frontier.select(F.col(frontier.columns[0]).alias("id")).dropDuplicates(["id"])
    e = edges.where(F.col("label") == edge_label).select("src", "dst")
    hop = ids.join(e, ids["id"] == e["src"], "inner").select("src", "dst")
    w = Window.partitionBy("src").orderBy(_score(seed), F.col("dst"))
    return (
        hop.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= fanout)
        .select("src", "dst", F.col("_rk").cast("long").alias("rk"))
    )


def random_walks(
    starts: DataFrame,
    edges: DataFrame,
    edge_labels: str | list[str],
    walk_len: int,
    seed: int = 0,
) -> DataFrame:
    """One deterministic walk per start vertex: at each step move to the
    argmin-md5 OUT-neighbor (seed varies per step, so walks don't collapse
    onto a single spanning path). Returns (walk_id=start, step, vertex);
    walks that hit a sink stop early.

    Per step: one equi-join frontier⋈edges + one min_by per vertex — the
    iterative-algorithm shape shared with bfs/pagerank (analytics.py), with
    the frontier never exceeding |starts|."""
    labels = [edge_labels] if isinstance(edge_labels, str) else list(edge_labels)
    e = edges.where(F.col("label").isin(labels)).select("src", "dst")
    state = starts.select(
        F.col(starts.columns[0]).alias("walk_id"),
    ).withColumn("vertex", F.col("walk_id")).withColumn("step", F.lit(0))
    out = [state]
    cur = state
    for step in range(1, walk_len + 1):
        hop = (
            cur.join(e, cur["vertex"] == e["src"], "inner")
            .select("walk_id", "src", "dst")
        )
        nxt = (
            hop.groupBy("walk_id")
            .agg(F.min_by("dst", _score(seed * 1000 + step)).alias("vertex"))
            .withColumn("step", F.lit(step))
        )
        cur = nxt
        out.append(nxt.select("walk_id", "vertex", "step"))
    res = out[0].select("walk_id", "vertex", "step")
    for part in out[1:]:
        res = res.unionByName(part)
    return res.select(
        "walk_id", F.col("step").cast("long").alias("step"), "vertex"
    )


def neighbor_sample_oracle_sql(
    fanout: int,
    seed: int,
    label_tag_src: int,
    label_tag_dst: int,
    src_table_key: str,
    edge_sql: str,
    frontier_pred: str,
) -> str:
    """Build the DuckDB oracle for ``neighbor_sample`` on the fixture
    graph: the edge relation is reconstructed from the FK tables
    (``edge_sql`` must yield columns src_key, dst_key), ids are re-encoded
    to the same 16-byte layout (ids.py: 8-byte BE label tag ++ 8-byte BE
    key), and the SAME md5 ordering is applied."""
    # 16-byte id hex = 16 hex digits of tag + 16 hex digits of key
    def hexid(tag: int, key: str) -> str:
        return (
            f"UPPER(LPAD(TO_HEX({tag}), 16, '0') || "
            f"LPAD(TO_HEX(CAST({key} AS BIGINT)), 16, '0'))"
        )

    src_hex = hexid(label_tag_src, "src_key")
    dst_hex = hexid(label_tag_dst, "dst_key")
    return f"""WITH hop AS ({edge_sql}),
       scored AS (
         SELECT src_key, dst_key,
                md5({src_hex} || ':' || {dst_hex} || ':' || '{seed}') AS sc,
                {dst_hex} AS dst_hex
         FROM hop WHERE {frontier_pred}
       ),
       ranked AS (
         SELECT src_key, dst_key,
                row_number() OVER (PARTITION BY src_key
                                   ORDER BY sc, dst_hex) AS rk
         FROM scored
       )
       SELECT src_key, dst_key, CAST(rk AS BIGINT) AS rk
       FROM ranked WHERE rk <= {fanout}"""


def _uniform(seed_parts: Column) -> Column:
    """Deterministic uniform in (0, 1]: 52 md5 bits → double. Same value
    in any engine that has md5 + hex parsing (the property every operator
    in this module trades on)."""
    h = F.md5(seed_parts)
    bits = F.conv(F.substring(h, 1, 13), 16, 10).cast("double")
    return (bits + F.lit(1.0)) / F.lit(float((1 << 52) + 1))


def weighted_neighbor_sample(
    frontier: DataFrame,
    edges: DataFrame,
    edge_label: str,
    fanout: int,
    weight: Column,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of ≤ ``fanout`` OUT-neighbors
    per frontier vertex, proportional to ``weight`` (a Column over the
    edge frame, e.g. an edge property): the Efraimidis–Spirakis A-Res
    scheme — key = u^(1/w) with u uniform per (src, dst, seed), keep the
    ``fanout`` LARGEST keys. With u from md5 the draw is deterministic
    (reproducible samples, exact SQL oracle) while remaining a faithful
    weighted sample across seeds.

    Same plan shape as ``neighbor_sample``: hop join + one per-src window
    with rank pushdown (WindowGroupLimit), hub fan-out bounded in-stage."""
    ids = frontier.select(
        F.col(frontier.columns[0]).alias("id")
    ).dropDuplicates(["id"])
    e = edges.where(F.col("label") == edge_label)
    hop = ids.join(e, ids["id"] == e["src"], "inner").select(
        "src", "dst", weight.alias("_w")
    )
    u = _uniform(
        F.concat(
            F.hex(F.col("src")), F.lit(":"), F.hex(F.col("dst")),
            F.lit(":"), F.lit(str(seed)),
        )
    )
    key = F.pow(u, F.lit(1.0) / F.col("_w"))
    w = Window.partitionBy("src").orderBy(
        F.desc(key), F.col("dst")
    )
    return (
        hop.where(F.col("_w") > 0)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= fanout)
        .select("src", "dst", F.col("_rk").cast("long").alias("rk"))
    )


def node2vec_walks(
    starts: DataFrame,
    edges: DataFrame,
    edge_labels: str | list[str],
    walk_len: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks → (walk_id, step,
    vertex): from current vertex v with previous vertex t, a candidate
    next-hop x is weighted 1/p when x == t (return), 1 when x is also an
    OUT-neighbor of t (triangle-closing / BFS-like), and 1/q otherwise
    (outward / DFS-like) — Grover & Leskovec's p/q interpolation between
    breadth- and depth-biased exploration.

    The weighted draw reuses the Efraimidis–Spirakis key pow(u, 1/w) with
    the md5 uniform of (prev, cur, cand, step, seed), argmax per walk —
    deterministic for fixed seed (data-lineage reproducible; the exact
    rule is replayed in pure Python in pytest), while faithful in
    distribution across seeds.

    Per step: candidate hop join + ONE flag join against the (deduped)
    edge pair set to test 'x ∈ N(t)' + one max_by per walk — no per-row
    neighbor-set materialization, so hub vertices cost what their edge
    lists cost and nothing more. Frontier never exceeds |starts|."""
    labels = [edge_labels] if isinstance(edge_labels, str) else list(edge_labels)
    # One dedup shuffle TOTAL: every step probes this cached edge set
    # twice (candidate hop + prev-neighbor slice); without the persist
    # each of walk_len steps would re-shuffle the full edge table for the
    # dropDuplicates — measured 6.3 s → 2.4 s at sf0.1 from this line.
    # Safe to release before returning: every per-step result is an eager
    # localCheckpoint, so the returned union no longer references e.
    e = (
        edges.where(F.col("label").isin(labels))
        .select("src", "dst")
        .dropDuplicates()
        .persist()
    )
    pair = e.select(
        F.col("src").alias("_pt"), F.col("dst").alias("_px"),
        F.lit(True).alias("_common"),
    )
    state = starts.select(
        F.col(starts.columns[0]).alias("walk_id"),
    ).withColumn("vertex", F.col("walk_id")).withColumn(
        "prev", F.lit(None).cast(starts.schema[starts.columns[0]].dataType)
    ).withColumn("step", F.lit(0))
    out = [state.select("walk_id", "vertex", "step")]
    cur = state
    for step in range(1, walk_len + 1):
        # frontier ≤ |starts| and already checkpointed: broadcast it into
        # the cached edge scan instead of shuffling e on src every step
        cand = (
            F.broadcast(cur).join(e, cur["vertex"] == e["src"], "inner")
            .select("walk_id", "prev", "src", "dst")
        )
        # slice the pair set down to the current prev-frontier FIRST (tiny
        # side broadcast into the edge scan) — the neighbor-membership
        # flag join then touches |prevs|-incident pairs, never the full
        # edge-pair table (which a direct left join would shuffle whole,
        # every step)
        prevs = cur.select(F.col("prev").alias("_pt")).where(
            F.col("_pt").isNotNull()
        ).dropDuplicates()
        pair_slice = pair.join(F.broadcast(prevs), "_pt", "left_semi")
        cand = cand.join(
            F.broadcast(pair_slice),
            (cand["prev"] == pair_slice["_pt"]) & (cand["dst"] == pair_slice["_px"]),
            "left",
        ).select(
            "walk_id", "prev", "src", "dst",
            F.coalesce(F.col("_common"), F.lit(False)).alias("_cm"),
        )
        wgt = (
            F.when(F.col("dst").eqNullSafe(F.col("prev")), F.lit(1.0 / p))
            .when(F.col("_cm"), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        u = _uniform(
            F.concat(
                F.coalesce(F.hex(F.col("prev")), F.lit("-")), F.lit(":"),
                F.hex(F.col("src")), F.lit(":"), F.hex(F.col("dst")),
                F.lit(":"), F.lit(f"{step}:{seed}"),
            )
        )
        key = F.pow(u, F.lit(1.0) / wgt)
        nxt = (
            cand.groupBy("walk_id")
            .agg(
                F.max_by(
                    F.struct(F.col("dst"), F.col("src")),
                    F.struct(key.alias("k"), F.hex(F.col("dst")).alias("h")),
                ).alias("_pick")
            )
            .select(
                "walk_id",
                F.col("_pick.dst").alias("vertex"),
                F.col("_pick.src").alias("prev"),
            )
            .withColumn("step", F.lit(step))
            # ≤|starts| rows feeding THREE consumers (next step's frontier
            # + prev-slice + the output union): eager checkpoint stops the
            # per-step chain being re-derived by each of them
            .localCheckpoint(eager=True)
        )
        cur = nxt
        out.append(nxt.select("walk_id", "vertex", "step"))
    e.unpersist()
    res = out[0]
    for part in out[1:]:
        res = res.unionByName(part)
    return res.select(
        "walk_id", F.col("step").cast("long").alias("step"), "vertex"
    )


def mixture_downsample(
    docs: DataFrame,
    source_col: str = "source",
    weight_col: Column | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Domain-mixture rebalancing by deterministic downsampling → the
    kept subset of ``docs`` (plus the applied per-source ``rate``): every
    source is sampled at rate min_total/total_source so all sources
    contribute ~the SMALLEST source's weight (token count by default) —
    the pre-training mixture-flattening pass (no upsampling; repeat
    epochs handle that).

    Fully deterministic and engine-exact: each row's uniform is the first
    13 hex digits of md5(id:seed) compared AS A STRING against the
    source's threshold printf('%013x', floor(rate·16¹³)) — IEEE double
    division/multiply + integer hex formatting reproduce bit-identically
    in any engine, so a SQL oracle replays the exact kept set (the same
    trick as the md5 samplers above, extended to data-dependent rates).

    Scale shape: one map-side-combinable per-source total, broadcast back
    into a single scan of the corpus (sources are few; the corpus is
    never shuffled); selection is a per-row string compare."""
    w = weight_col if weight_col is not None else F.lit(1)
    base = docs.withColumn("_w", w.cast("double"))
    totals = base.groupBy(source_col).agg(F.sum("_w").alias("_tot"))
    min_tot = totals.groupBy().agg(F.min("_tot").alias("_min"))
    rates = totals.crossJoin(F.broadcast(min_tot)).select(
        source_col,
        (F.col("_min") / F.col("_tot")).alias("rate"),
    )
    thr = F.lower(
        F.lpad(
            F.hex(
                F.floor(F.col("rate") * F.lit(float(1 << 52))).cast("long")
            ),
            13,
            "0",
        )
    )
    u = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 13
    )
    # rate >= 1 (the smallest source itself) must keep every row: its
    # threshold floor(1.0·16¹³) is a 14-hex-digit string that would
    # otherwise be truncated by the 13-char pad and reject ~15/16 of rows
    return (
        base.join(F.broadcast(rates), source_col)
        .where((F.col("rate") >= 1.0) | (u < thr))
        .drop("_w")
    )


def stratified_split(
    docs: DataFrame,
    fractions: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test split assignment → ``docs`` plus a
    ``split`` column. Every row's uniform is the first 13 hex digits of
    md5(id:seed) compared as a STRING against cumulative-fraction
    thresholds (the mixture_downsample trick with config-time constants):
    the thresholds are computed ONCE driver-side as printf('%013x',
    floor(cum·16¹³)) literals, so the assignment folds into codegen as a
    chained CASE — zero joins, zero shuffles, and a SQL oracle replays the
    exact same literals. Hash-based assignment is stable under corpus
    growth (a document's split never changes when new docs arrive) and
    uniform within every stratum, which is what makes it the standard
    split mechanism for 100 TB corpora — no global sort, no RNG state.
    """
    fractions = fractions or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    u = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 13
    )
    cum = 0.0
    expr = None
    for name, frac in fractions[:-1]:
        cum += frac
        thr = format(int(cum * (1 << 52)), "013x")
        cond = u < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = fractions[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.withColumn("split", split)


def split_thresholds(
    fractions: list[tuple[str, float]] | None = None,
) -> list[tuple[str, str]]:
    """The (name, 13-hex cumulative threshold) pairs ``stratified_split``
    compares against — exposed so oracles inline the IDENTICAL literals."""
    fractions = fractions or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = []
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        out.append((name, format(int(cum * (1 << 52)), "013x")))
    return out
