"""Graph analytics: DataFrame-Pregel supersteps.

TorcDB explicitly refuses OLAP graph compute (``compute()`` throws,
TorcGraph.java:315-324; feature flag :1818-1821). This module supplies it
the Spark way — iterative message-passing expressed as DataFrame joins, the
same dataflow GraphX/Pregel runs, but staying in Spark SQL so Catalyst/AQE
optimize each superstep and no RDD serialization is paid.

Superstep = messages (vertices ⋈ edges) → aggregate by dst → update state.
Each iteration ``localCheckpoint``s the state DataFrame: without it the
lineage/plan doubles per iteration and the job dies at scale long before
memory does (SURVEY §7.4, the #1 Spark-specific risk for iterative graph
work). Edges are re-used across supersteps — persist() once; at cluster
scale, bucket the edge table by src so the per-superstep join co-locates.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rows at or below which per-superstep state/frontier frames broadcast
# (map-side joins against the cached edge set; the edge side never
# shuffles). Above it the loops take the shuffle-join regime and
# pre-partition the edge side once (_relayout_edges). Parameterized for
# cluster deployments and for forcing the shuffle regime in tests/plan
# dumps; the default matches the threshold every operator shipped with.
_BCAST_ROWS = int(os.environ.get("TORCDB_BCAST_ROWS", "500000"))


def _relayout_edges(e: DataFrame, key: str) -> DataFrame:
    """Shuffle-join-regime edge layout (guide §2.4 "two operations keyed
    the same way can share one exchange"): persist the loop's edge side
    pre-partitioned on its join key, so EVERY superstep's state⋈edges
    reuses the persisted HashPartitioning and only the (small) state frame
    shuffles per superstep — the edge side is exchange-free inside the
    loop body. Called once, when a loop leaves (or starts outside) the
    broadcast regime; in the broadcast regime the edge side never shuffles
    at all and the up-front repartition would be pure cost."""
    out = e.repartition(F.col(key)).persist()
    e.unpersist()  # no-op when e was never persisted
    return out


def _checkpointed(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _ck_lazy(df: DataFrame) -> DataFrame:
    """LAZY localCheckpoint: the first action over the returned frame
    materializes (and persists) the checkpoint blocks as a side effect
    of computing it. Pairing this with the superstep's convergence/count
    probe fuses what was two blocking jobs per superstep — an eager
    materialization pass plus a probe pass over the materialized blocks
    — into ONE pass over the data. Lineage truncation and the persisted
    blocks are identical to the eager form (same RDD, same storage
    level); only the job cadence changes. On a cluster this halves the
    full passes over superstep state (guide §1.2: remove passes first).
    A lazy checkpoint with NO explicit probe materializes inside its
    first consumer's job — correct, and cheaper still, whenever the
    loop needs no datum from it on the driver."""
    return df.localCheckpoint(eager=False)


def _ck_lazy_nostats(df: DataFrame) -> DataFrame:
    """Lazy variant of ``_checkpointed_nostats``: the same stats barrier
    (LogicalRDD rebuilt without the geometric sizeInBytes rewrite), with
    materialization deferred to the caller's probe action."""
    ck = df.localCheckpoint(eager=False)
    try:
        jdf = ck._jdf
        spark = ck.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover — internal API moved; degrade
        return ck


def _checkpointed_nostats(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint + STATS BARRIER for high-fan iterative loops.

    Spark 4's ``localCheckpoint`` propagates the original plan's
    estimated statistics into the resulting LogicalRDD
    (LogicalRDD.rewriteStatsAndConstraints). The size-only join estimate
    is the PRODUCT of the children's sizeInBytes, so in a loop that
    checkpoints frames built from several joins of previous checkpoints,
    log(sizeInBytes) grows geometrically — the BigInt stats values reach
    millions of bits within a few rounds and the driver burns minutes
    inside BigInteger.multiply while planning a 46-row join (observed:
    Borůvka round 3 took 104 s of pure stats arithmetic; jstack pinned
    Thread-3 in SizeInBytesOnlyStatsPlanVisitor → BigInteger).

    The barrier rebuilds the DataFrame over the ALREADY-CHECKPOINTED
    RDD without the stats rewrite, resetting sizeInBytes to the default.
    Cost: compile-time auto-broadcast won't fire for these frames — fine
    in the loops that use this, because AQE's runtime join selection
    (enabled session-wide) decides from ACTUAL shuffle sizes, which the
    stats default doesn't affect."""
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        spark = ck.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover — internal API moved; degrade
        return ck


def pagerank(
    edges: DataFrame,
    num_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_interval: int = 2,
) -> DataFrame:
    """PageRank over a directed edge list → (id, rank).

    Dangling mass is redistributed uniformly each superstep so ranks sum to
    |V| (the GraphX convention with normalized start rank 1.0).

    The state carries ``out_deg`` alongside ``rank``: out-degree never
    changes, so folding it into the checkpointed state removes two
    ``state ⋈ out_deg`` joins per superstep (contribution and dangling
    detection become narrow projections of cached state). Per superstep the
    plan is then: edges ⋈ contribs (one shuffle) → sum by dst (one shuffle)
    → left join back to state (one shuffle), plus a 1-row dangling
    aggregate over the cached state broadcast into the update.

    ``checkpoint_interval``: supersteps between eager localCheckpoints.
    Every materialization is a full job barrier; chaining k supersteps
    into one job amortizes that overhead (measured ~2× at interval 5 on
    the full fixture edge graph) while lineage depth stays bounded at k.
    The arithmetic is identical either way — only job cadence changes."""
    # no persist: e is a narrow projection of its (columnar) source — a
    # re-scan per superstep is cheaper than building Spark's in-memory
    # cache, and at 100 TB caching the edge set is not an option anyway
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # lazy checkpoint: the vertex count below is the materializing action
    state = _ck_lazy(
        verts.join(out_deg, verts["id"] == out_deg["src"], "left")
        .select("id", F.lit(1.0).alias("rank"), "out_deg")
    )
    n = state.count()
    # |contrib| = |V| every superstep; below the same threshold the other
    # iterative operators use, broadcast it (and the dst-keyed message
    # sums) so each superstep probes the edge scan map-side instead of
    # shuffling |E| rows — the n we already count decides once for the
    # whole run. Above the threshold the ordinary shuffle path stands
    # (AQE re-plans it), which is the only viable shape at 100 TB anyway —
    # with the edge side pre-partitioned on the join key ONCE, so every
    # superstep shuffles only the |V|-row contribution frame, never |E|
    # (guide §2.4; VERDICT r13 #6).
    small = n <= _BCAST_ROWS
    if not small:
        e = _relayout_edges(e, "src")
    for i in range(num_iter):
        contrib = state.where(F.col("out_deg").isNotNull()).select(
            F.col("id").alias("csrc"), (F.col("rank") / F.col("out_deg")).alias("c")
        )
        if small:
            contrib = F.broadcast(contrib)
        msgs = (
            e.join(contrib, e["src"] == contrib["csrc"])
            .groupBy("dst")
            .agg(F.sum("c").alias("msum"))
        )
        if small:
            msgs = F.broadcast(msgs)
        # dangling vertices contribute their rank uniformly; a 1-row
        # aggregate over the cached state, broadcast into the update plan —
        # a driver-side .first() here would serialize an extra action per
        # superstep
        dangling = F.broadcast(
            state.where(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        state = (
            state.join(msgs, state["id"] == msgs["dst"], "left")
            .crossJoin(dangling)
            .select(
                "id",
                (
                    F.lit(1 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("msum"), F.lit(0.0)) + F.col("dang") / n)
                ).alias("rank"),
                "out_deg",
            )
        )
        if (i + 1) % checkpoint_interval == 0 or i == num_iter - 1:
            # lazy: lineage still truncates at the same cadence, but the
            # materialization rides the next superstep's dangling-mass
            # broadcast (or the final action) instead of a blocking
            # per-interval driver job (r13)
            state = _ck_lazy(state)
    if not small:
        # materialize the superstep chain while the relaid edge cache is
        # alive, then release it — the caller's action would otherwise
        # run every superstep against an unpersisted edge layout
        state.count()
        e.unpersist()
    return state.select("id", "rank")


def _cc_union_find(rows):
    """Sequential union-find over (a, b) pairs with union-toward-the-
    smaller-root, so every root IS the minimum id of its component —
    exactly the fixpoint the distributed label flood / star contraction
    converge to. Works for any totally ordered id type (longs, 16-byte
    binary ids: Python bytes compare unsigned-lexicographically, same as
    Spark's BinaryType ordering)."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {v: find(v) for v in parent}


def _cc_finish_local(und: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Small-core finisher for the CC operators (the _kruskal_local /
    _tarjan_local discipline): once the edge set fits one task, log-many
    more distributed rounds of fixed job overhead cost more than the
    whole remainder. One repartition(1) mapInPandas runs the union-find;
    the (id, component) result is IDENTICAL to the distributed fixpoint
    (min id per component) by construction."""
    id_t = dict(und.dtypes)[a_col]

    def _finish(batches):
        import pandas as pd

        rows = []
        for b in batches:
            rows.extend(zip(b[a_col].tolist(), b[b_col].tolist()))
        comp = _cc_union_find(rows)
        items = sorted(comp.items())
        return iter([pd.DataFrame(
            {"id": [k for k, _ in items], "component": [v for _, v in items]}
        )])

    return und.select(a_col, b_col).repartition(1).mapInPandas(
        _finish, f"id {id_t}, component {id_t}"
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Undirected connected components via iterative label propagation
    (small-label-wins) → (id, component). Converges in O(diameter)
    supersteps; each superstep is one join+min-aggregate."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .dropDuplicates(["a", "b"])
        .persist()
    )
    state = (
        und.select(F.col("a").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("component", F.col("id"))
    )
    # |state| = |V| on every superstep (labels change, membership doesn't),
    # so one up-front count decides the join strategy for the whole run:
    # below the threshold the label table broadcasts and each superstep is
    # a map-side pass over the cached edge set — no edge shuffle at all.
    # Components of a 100 TB graph exceed the threshold and take the
    # ordinary shuffle path, re-planned by AQE, with the undirected edge
    # set pre-partitioned on the join key once so each superstep shuffles
    # only the |V|-row label frame (guide §2.4; VERDICT r13 #6).
    small = state.count() <= _BCAST_ROWS
    # Small-core finisher: |V| ≤ the broadcast bar makes the edge-count
    # check worth taking (the count materializes the persisted ``und``
    # the first superstep would have paid for anyway — no extra pass);
    # under the threshold one union-find task replaces the whole flood,
    # with the identical min-id-per-component result. |V| > the bar
    # implies |und| ≥ |V| > it too, so the 100 TB path never pays the
    # probe and runs the flood unchanged.
    if small and und.count() <= local_threshold:
        out = _checkpointed(_cc_finish_local(und, "a", "b"))
        und.unpersist()
        return out
    if not small:
        und = _relayout_edges(und, "a")
    for _ in range(max_iter):
        s = F.broadcast(state) if small else state
        nbr_min = (
            und.join(s, und["a"] == s["id"])
            .groupBy("b")
            .agg(F.min("component").alias("nbr_component"))
        )
        if small:
            nbr_min = F.broadcast(nbr_min)
        # Fold convergence detection into the update itself: the join that
        # produces the new component already sees the old one, so a
        # ``changed`` flag costs nothing extra. The checkpoint is LAZY and
        # the convergence probe below is its materializing action, so the
        # superstep costs exactly one job (r13: previously an eager
        # checkpoint job plus a separate probe over the blocks).
        new_comp = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        )
        new_state = _ck_lazy(
            state.join(nbr_min, state["id"] == nbr_min["b"], "left").select(
                "id",
                new_comp.alias("component"),
                (new_comp != F.col("component")).alias("_changed"),
            )
        )
        state = new_state.select("id", "component")
        # ONE job: materializes the lazy checkpoint and evaluates the
        # convergence probe in the same pass (max over empty → NULL →
        # break, matching the old empty-frame behavior)
        if not new_state.agg(
            F.max(F.col("_changed").cast("int")).alias("c")
        ).first()["c"]:
            break
    und.unpersist()
    return state


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Multi-source BFS → (id, distance); frontier-expansion loop with an
    anti-join against the visited set (the iterative form of khop that also
    records depth). ``max_depth=None`` runs until the frontier empties —
    required by callers that interpret the result as an exact eccentricity
    (ifub_diameter): a depth-capped BFS silently truncates distances on
    graphs wider than the cap. Termination is structural either way: the
    frontier is anti-joined against visited, so it empties in ≤V supersteps."""
    # One materialization of the 2-column edge projection: every depth
    # re-joins against it, and without the persist each superstep re-scans
    # (and re-decodes) the full edge parquet — at depth d that is d full
    # scans of the largest table in the graph.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    id_c = "id" if "id" in sources.columns else sources.columns[0]
    visited = _ck_lazy(
        sources.select(F.col(id_c).alias("id")).dropDuplicates(["id"]).withColumn(
            "distance", F.lit(0)
        )
    )
    frontier = visited.select("id")
    # Checkpointing gives exact frontier/visited counts for free each depth,
    # so the expansion join and the visited anti-join get an explicit
    # broadcast hint while the build side is genuinely small — a
    # narrow-frontier BFS then never shuffles the edge table at all. Past
    # the threshold (frontier a large graph fraction), fall back to shuffle
    # joins and let AQE re-plan from runtime sizes.
    broadcast_threshold = _BCAST_ROWS
    n_frontier = n_visited = visited.count()
    depth_iter = (
        itertools.count(1) if max_depth is None else range(1, max_depth + 1)
    )
    relaid = False
    for depth in depth_iter:
        if n_frontier > broadcast_threshold and not relaid:
            # leaving the broadcast regime: pre-partition the edge cache
            # on the join key once so the remaining depths shuffle only
            # the frontier (guide §2.4; VERDICT r13 #6)
            e = _relayout_edges(e, "src")
            relaid = True
        f = (
            F.broadcast(frontier)
            if n_frontier <= broadcast_threshold
            else frontier
        )
        nxt = (
            f.join(e, f["id"] == e["src"])
            .select(F.col("dst").alias("id"))
            .dropDuplicates(["id"])
        )
        seen = visited.select("id")
        if n_visited <= broadcast_threshold:
            seen = F.broadcast(seen)
        # lazy checkpoint: the frontier count is the materializing action
        # — one job per depth instead of checkpoint + count (r13)
        nxt = _ck_lazy(nxt.join(seen, "id", "left_anti"))
        n_frontier = nxt.count()
        if n_frontier == 0:
            break
        # visited is a union of already-checkpointed frontiers — no
        # per-depth re-checkpoint: eagerly copying the whole visited set per
        # depth is O(V·depth) churn. But the union fan-in is CONSOLIDATED
        # every 8 depths (lazy — the next depth's frontier count
        # materializes it): depth-unbounded callers (ifub_diameter,
        # eccentricity) would otherwise anti-join against a linearly
        # growing union plan, O(depth²) block scans total.
        visited = visited.unionByName(nxt.withColumn("distance", F.lit(depth)))
        if depth % 8 == 0:
            visited = _ck_lazy(visited)
        n_visited += n_frontier
        frontier = nxt
    # Every per-depth frontier is already an eager localCheckpoint, so the
    # returned union plan no longer references the edge cache — safe to
    # release here rather than leaking blocks into the caller's session.
    e.unpersist()
    return visited


def triangle_count(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Per-vertex triangle counts on the undirected graph, oriented by
    DEGREE rank: each undirected edge {u,v} is kept as (a,b) where
    rank(a)=(degree(a), a) < rank(b), wedges are enumerated at the
    lowest-rank vertex, and a closure join confirms the third edge. Two
    shuffle joins — the standard distributed formulation — but the
    degree-ordered orientation bounds every vertex's oriented out-degree
    by O(sqrt(m)), so wedge fan-out stays bounded on skewed graphs (a
    109-degree hub ordered by raw id could otherwise own ~10^18 wedges at
    100 TB; ordered by degree it owns none).

    Symmetrization is ONE scan + explode, not a self-union: Catalyst has
    no common-subexpression elimination across union branches, so the
    union form pastes the (possibly expensive) edge subtree into the
    plan twice and scans the source twice — measured 2x scan cost on
    g_triangle_count's 3-branch edge construction before this form."""
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
                    ),
                    F.struct(
                        F.col(dst_col).alias("a"), F.col(src_col).alias("b")
                    ),
                )
            ).alias("_p")
        )
        .select("_p.a", "_p.b")
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = und.groupBy("a").agg(F.count("*").alias("_deg"))
    ranked = (
        und.join(deg, "a")
        .withColumn("_ra", F.struct(F.col("_deg"), F.col("a")))
        .select("a", "b", "_ra")
        .join(
            deg.select(F.col("a").alias("b"), F.col("_deg").alias("_degb")),
            "b",
        )
        .withColumn("_rb", F.struct(F.col("_degb"), F.col("b")))
    )
    # keep each undirected edge once, oriented low-rank → high-rank
    # (struct comparison is lexicographic: degree first, id tie-break)
    canon = ranked.where(F.col("_ra") < F.col("_rb")).select(
        "a", "b", "_ra", "_rb"
    ).persist()
    # wedges open at the lowest-rank vertex: pairs of out-neighbors of x
    # with rank(y) < rank(z); the closing edge (y,z) is then exactly in
    # canon's orientation, so the closure is a plain equi-join
    xy = canon.select(F.col("a").alias("x"), F.col("b").alias("y"),
                      F.col("_rb").alias("_ry"))
    xz = canon.select(F.col("a").alias("x"), F.col("b").alias("z"),
                      F.col("_rb").alias("_rz"))
    wedges = xy.join(xz, "x").where(F.col("_ry") < F.col("_rz"))
    tri = wedges.join(
        canon.select(F.col("a").alias("y"), F.col("b").alias("z")), ["y", "z"]
    )
    # credit all three corners in ONE pass over tri — the union form
    # would inline the wedge+closure join subtree three times (no
    # cross-branch CSE), tripling the two most expensive joins
    per_vertex = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return per_vertex


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str = "weight",
    max_iter: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Weighted single-source(-set) shortest paths → (id, dist): Pregel
    min-plus relaxation (the distributed Bellman-Ford). Each superstep is
    one edges⋈state join + a min-aggregate per destination + a min-merge
    into the state; convergence is detected from a ``_changed`` flag
    computed inside the merge (same one-heavy-job discipline as
    connected_components). Non-negative weights REQUIRED (min-plus
    relaxation with a bounded iteration count silently under-relaxes
    around negative cycles) — enforced with one filter-pushdown probe job
    before iterating. Converges in O(longest shortest path hops)
    supersteps."""
    # Persist the weighted projection: unlike pagerank's 2-column case the
    # weight is often a computed expression over wide source columns (e.g.
    # a property-map lookup), so each superstep would otherwise re-scan the
    # full edge source AND re-evaluate the extraction — the guard probe
    # below doubles as the materialization job.
    e = edges.select(
        F.col(src_col).alias("esrc"),
        F.col(dst_col).alias("edst"),
        F.col(weight_col).cast("double").alias("w"),
    ).persist()
    # One cheap guard job: scans the (now cached) projection once; limit(1)
    # stops at the first offender.
    bad = e.where(F.col("w") < 0).limit(1).collect()
    if bad:
        raise ValueError(
            f"shortest_paths requires non-negative weights; found w={bad[0].w} "
            f"on edge ({bad[0].esrc!r} -> {bad[0].edst!r})"
        )
    id_c = "id" if "id" in sources.columns else sources.columns[0]
    state = _ck_lazy(
        sources.select(F.col(id_c).alias("id"))
        .dropDuplicates(["id"])
        .withColumn("dist", F.lit(0.0))
    )
    # Same conditional-broadcast discipline as bfs_distances: while the
    # reached set is small (seeded SSSP stays small for many supersteps),
    # broadcasting the state keeps the relaxation join MAP-SIDE — the full
    # edge set is never shuffled. Past the threshold, fall back to shuffle
    # joins and let AQE re-plan. The state count is a cheap scan of the
    # just-checkpointed blocks.
    broadcast_threshold = _BCAST_ROWS
    n_state = state.count()
    relaid = False
    for _ in range(max_iter):
        if n_state > broadcast_threshold and not relaid:
            # leaving the broadcast regime: pre-partition the edge cache
            # on the join key once so the remaining relaxation rounds
            # shuffle only the state frame (guide §2.4; VERDICT r13 #6)
            e = _relayout_edges(e, "esrc")
            relaid = True
        s = F.broadcast(state) if n_state <= broadcast_threshold else state
        msgs = (
            s.join(e, s["id"] == e["esrc"])
            .groupBy(F.col("edst").alias("mid"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("mdist"))
        )
        merged = state.join(msgs, state["id"] == msgs["mid"], "full_outer")
        new_id = F.coalesce(F.col("id"), F.col("mid"))
        new_dist = F.least(
            F.coalesce(F.col("dist"), F.lit(float("inf"))),
            F.coalesce(F.col("mdist"), F.lit(float("inf"))),
        )
        improved = F.col("id").isNull() | (
            F.col("mdist").isNotNull() & (F.col("mdist") < F.col("dist"))
        )
        new_state = _ck_lazy(
            merged.select(
                new_id.alias("id"),
                new_dist.alias("dist"),
                improved.alias("_changed"),
            )
        )
        state = new_state.select("id", "dist")
        # ONE job per superstep (r13): the count + convergence probe is
        # the lazy checkpoint's materializing action — previously eager
        # checkpoint, count, and changed-probe were three blocking jobs
        probe = new_state.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col("_changed").cast("int")).alias("c"),
        ).first()
        n_state = probe["n"]
        if not probe["c"]:
            break
    # state is an eager localCheckpoint — it no longer references e's cache
    e.unpersist()
    return state


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 50,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Vertices of the k-core: the maximal subgraph where every vertex has
    undirected degree >= k → (id, degree) with degree measured INSIDE the
    core. Iterative peeling — drop vertices below k, recompute degrees on
    the induced subgraph, repeat to fixpoint (the standard distributed
    formulation; converges in O(peel depth) supersteps, worst case O(V)
    on a path but few tens on real skewed graphs).

    Superstep = one groupBy (degree count) + two semi-joins (induce the
    subgraph on surviving vertices); the edge frontier only SHRINKS, so
    each superstep re-checkpoints the smaller edge set and the cost decays
    geometrically on typical graphs. Same lineage discipline as the other
    Pregel loops."""
    if k < 1:
        raise ValueError(f"k_core requires k >= 1, got {k}")
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    # lazy checkpoints throughout the peel loop: each round's count is
    # the materializing action — one job per round instead of two (r13)
    live = _ck_lazy(und)
    n_edges = live.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = live.groupBy("a").agg(F.count("*").alias("degree"))
        keep = deg.where(F.col("degree") >= k).select("a")
        # |keep| <= |V| <= n_edges (known from the previous checkpoint):
        # under the threshold both induced-subgraph semi-joins probe the
        # broadcast survivor set map-side instead of shuffling the edge
        # frontier twice per peel round
        if n_edges <= 1_000_000:
            keep = F.broadcast(keep)
        nxt = _ck_lazy(
            live.join(keep, "a", "left_semi").join(
                keep.select(F.col("a").alias("b")), "b", "left_semi"
            )
        )
        n_next = nxt.count()
        if n_next == n_edges:
            break
        live, n_edges = nxt, n_next
    return live.groupBy(F.col("a").alias("id")).agg(
        F.count("*").cast("long").alias("degree")
    ).where(F.col("degree") >= k)


def shortest_path_pair(
    edges: DataFrame,
    src_id: bytes,
    dst_id: bytes,
    max_depth: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    directed: bool = False,
) -> DataFrame:
    """Unweighted shortest PATH between two vertices with full path
    reconstruction — the LDBC IC13 shape (the reference serves IC13
    through iterated traverse calls; TorcGraph.java:479-585).

    Forward pass: BFS from ``src_id`` tracking a PARENT per discovered
    vertex, chosen as min(parent id) so the reconstructed path is
    deterministic. Each level is one frontier⋈edges join + one anti-join
    against the visited set (the bfs_distances shape plus a min_by).
    Stops as soon as ``dst_id`` is discovered.

    Backward pass: walk the parent chain dst→src. The path has at most
    max_depth+1 vertices — collecting IT is O(depth), not O(graph); the
    visited/parent state itself stays distributed throughout.

    Returns (step, id) ordered src→dst; empty when no path within
    ``max_depth``.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    e = e.persist()

    spark = edges.sparkSession
    visited = _checkpointed(
        spark.createDataFrame(
            [(bytes(src_id), 0, None)], "id binary, dist int, parent binary"
        )
    )
    frontier = visited.select("id")
    found = bytes(src_id) == bytes(dst_id)
    dist = 0
    while not found and dist < max_depth:
        dist += 1
        expanded = (
            F.broadcast(frontier)
            .join(e, frontier["id"] == e["src"])
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.min("src").alias("parent"))
        )
        nxt = _ck_lazy(
            expanded.join(
                visited.select(F.col("id").alias("nid")), "nid", "left_anti"
            ).select(
                F.col("nid").alias("id"),
                F.lit(dist).alias("dist"),
                "parent",
            )
        )
        # ONE job per level (r13): frontier count + target-found probe
        # fused into the lazy checkpoint's materializing action
        # (previously: eager checkpoint + count + found-count + an eager
        # re-checkpoint of the visited union = four jobs per level).
        probe = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.max((F.col("id") == bytes(dst_id)).cast("int")).alias("f"),
        ).first()
        n_new = probe["n"]
        if n_new == 0:
            break
        # visited is a union of already-checkpointed frontiers — no
        # per-level re-checkpoint (same discipline as bfs_distances), but
        # CONSOLIDATED every 8 levels: without the periodic cut, level L's
        # anti-join re-reads all L prior frontier block-sets (O(L²) total
        # block scans) and the union plan grows linearly — fine shallow,
        # degrading on high-diameter graphs. The consolidation checkpoint
        # is lazy: the next level's probe is its materializing action.
        visited = visited.unionByName(nxt)
        if dist % 8 == 0:
            visited = _ck_lazy(visited)
        found = bool(probe["f"])
        frontier = nxt.select("id")
    e.unpersist()
    if not found:
        return spark.createDataFrame([], "step int, id binary")
    # backward walk: <= dist 1-row lookups against the distributed state;
    # only the O(depth) path itself reaches the driver
    path = [bytes(dst_id)]
    cur = bytes(dst_id)
    for _ in range(dist):
        row = visited.where(F.col("id") == cur).select("parent").first()
        if row is None or row["parent"] is None:
            break
        cur = bytes(row["parent"])
        path.append(cur)
    path.reverse()
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(path)], "step int, id binary"
    )


def connected_components_doubling(
    edges: DataFrame,
    max_rounds: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Undirected connected components in O(log n) ROUNDS via alternating
    large-star / small-star edge rewriting (the MapReduce-and-Beyond
    formulation) → (id, component), component = min vertex id.

    Complements ``connected_components`` (label propagation, O(diameter)
    supersteps): on a path-shaped or otherwise high-diameter graph — lineage
    chains, road networks, long doc-similarity chains — label propagation
    needs diameter rounds while star contraction doubles pointer reach
    every alternation. Per round: ONE groupBy-min + ONE join per star op,
    both shuffles keyed on the vertex id; the edge set only contracts, so
    round cost shrinks as components collapse.

    large-star(u): m = min(N(u) ∪ {u}); rewrite (v, m) for v ∈ N(u), v > u.
    small-star(u): m = min(N(u) ∪ {u}); rewrite (v, m) for v ∈ N(u) ∪ {u},
    v ≤ u, v ≠ m.

    Convergence: edge-multiset checksum (count + sum of xxhash64) stable
    across one full alternation; stopping early on a (2^-64) checksum
    collision is the accepted trade for not materializing set-difference
    per round.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("u"), F.col(src_col).alias("v")
            ).where(F.col("u") != F.col("v"))
        )
        .dropDuplicates(["u", "v"])
    )
    all_vertices = e.select(F.col("u").alias("id")).dropDuplicates(["id"])

    def star(cur: DataFrame, large: bool) -> DataFrame:
        # neighborhoods are over the UNDIRECTED view each round (the
        # rewrite emits one orientation only, so re-symmetrize first —
        # without this the second round sees half-neighborhoods and the
        # edge set collapses; caught by the pure-python rule simulation)
        und = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).dropDuplicates(["u", "v"])
        mins = und.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least(F.col("u"), F.col("_mv")).alias("m")
        )
        j = und.join(mins, "u")
        if large:
            out = j.where(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            keep = j.where(F.col("v") <= F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
            self_edge = mins.select("u", F.col("m").alias("v"))
            out = keep.unionByName(self_edge)
        return (
            out.where(F.col("u") != F.col("v")).dropDuplicates(["u", "v"])
        )

    def checksum(cur: DataFrame):
        r = cur.agg(
            F.count("*").alias("n"),
            # decimal(38,0) accumulator: a long sum of 64-bit hashes
            # overflows under ANSI arithmetic
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    # lazy checkpoints: the checksum aggregate IS the materializing
    # action, so each alternation round costs one job instead of an
    # eager-checkpoint job plus the checksum job (r13)
    cur = _ck_lazy(e)
    prev_sig = checksum(cur)
    # Small-core finisher (the _kruskal_local/_tarjan_local discipline):
    # the initial checksum already carries |E|, so the decision is free.
    # Under the threshold one union-find task replaces the whole
    # alternation loop with the identical min-id-per-component result;
    # a 100 TB edge set takes the star-contraction path unchanged.
    if prev_sig[0] <= local_threshold:
        return _cc_finish_local(cur, "u", "v")
    for _ in range(max_rounds):
        cur = _ck_lazy(star(star(cur, large=True), large=False))
        sig = checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged edges are star arms (v -> center=min of component)
    centers = cur.select(F.col("u").alias("id"), F.col("v").alias("component"))
    comp = (
        centers.groupBy("id").agg(F.min("component").alias("component"))
    )
    return (
        all_vertices.join(comp, "id", "left")
        .select(
            "id", F.coalesce(F.col("component"), F.col("id")).alias("component")
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    num_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_interval: int = 2,
    prune_unreachable: bool = True,
) -> DataFrame:
    """Personalized PageRank → (id, rank): the reset mass returns to the
    SOURCE set (uniformly across it) instead of all vertices, so rank
    measures proximity to the sources — the standard graph-recommendation
    primitive (LDBC-style "people you may know" ranks FOF candidates by
    exactly this).

    Same superstep shape and checkpoint cadence as ``pagerank``; the only
    structural difference is the reset term: a broadcast membership flag
    (semi-join-derived 0/1 column folded into the state) replaces the
    uniform 1/N. Dangling mass also returns to the sources — rank stays
    conserved at |S| total so disconnected vertices converge to exactly 0.

    ``prune_unreachable`` (default True) first restricts the graph to the
    ``num_iter``-hop OUT-reachable set of the sources — EXACT, because
    mass moves at most one hop per iteration, so nothing outside that
    horizon can ever hold rank (and a horizon vertex's own out-edges only
    matter post-horizon). This is the whole point of PERSONALIZED
    pagerank at scale: the computation localizes to the seeds'
    neighborhood instead of touching the full 100 TB edge set each
    superstep (measured 20 s → <2 s on the fixture purchase DAG).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    id_pre = "id" if "id" in sources.columns else sources.columns[0]
    if prune_unreachable:
        # lineage here is at most num_iter joins deep and each frontier is
        # a narrow id set — persist (lazy, reused twice) beats the eager
        # localCheckpoint job barrier that dominates wall time in the main
        # loop's long-lived state
        # One LAZY plan for the whole k-hop reachability: num_iter chained
        # frontier-hop joins unioned and distinct-ed, materialized by a
        # single checkpoint job. No per-hop driver probes — in local mode
        # each probe is a full fixed-overhead job, and on a cluster each is
        # a scheduler round-trip; the blind chain costs one pass. An empty
        # deeper frontier is a no-op join, so over-deep chains are free.
        base = e.persist()  # each hop level scans the same projection
        frontier = sources.select(F.col(id_pre).alias("id")).dropDuplicates(["id"])
        levels = [frontier]
        for _ in range(num_iter):
            frontier = (
                F.broadcast(frontier)
                .join(base, frontier["id"] == base["src"])
                .select(F.col("dst").alias("id"))
                .dropDuplicates(["id"])
                # lazy persist: level i feeds BOTH level i+1's broadcast and
                # the reach union — without it the single checkpoint job
                # re-derives every earlier hop inside each deeper hop's
                # broadcast subtree (quadratic hop-joins; measured 4.7 s →
                # 2.1 s on the fixture purchase DAG at num_iter=4)
                .persist()
            )
            levels.append(frontier)
        reach = levels[0]
        for lvl in levels[1:]:
            reach = reach.unionByName(lvl)
        reach = _checkpointed(reach.dropDuplicates(["id"]))
        for lvl in levels[1:]:
            lvl.unpersist()
        # materialize the (small) pruned edge set ONCE — every superstep
        # job would otherwise re-evaluate the semi-joins over the full
        # edge table. Lazy: the seed-count probe below materializes it
        # through the state build (r13).
        e = _ck_lazy(
            base.join(
                F.broadcast(reach.withColumnRenamed("id", "src")),
                "src", "left_semi",
            ).join(
                F.broadcast(reach.withColumnRenamed("id", "dst")),
                "dst", "left_semi",
            )
        )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
    )
    id_c = "id" if "id" in sources.columns else sources.columns[0]
    src_ids = sources.select(F.col(id_c).alias("id")).dropDuplicates(["id"])
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    state = _ck_lazy(
        verts.join(out_deg, verts["id"] == out_deg["src"], "left")
        .join(
            src_ids.withColumn("_is_src", F.lit(1)), "id", "left"
        )
        .select(
            "id",
            F.coalesce(F.col("_is_src"), F.lit(0)).alias("is_src"),
            # start rank = membership: |S| total mass, all on the sources
            F.coalesce(F.col("_is_src"), F.lit(0)).cast("double").alias("rank"),
            "out_deg",
        )
    )
    # one job: materializes state (and, through it, the lazy pruned edge
    # checkpoint above) while computing the seed count (r13)
    n_src = state.where(F.col("is_src") == 1).count()
    if prune_unreachable:
        base.unpersist()
    if n_src == 0:
        raise ValueError("personalized_pagerank requires a non-empty source set")
    for i in range(num_iter):
        contrib = state.where(F.col("out_deg").isNotNull()).select(
            F.col("id").alias("csrc"),
            (F.col("rank") / F.col("out_deg")).alias("c"),
        )
        msgs = (
            e.join(contrib, e["src"] == contrib["csrc"])
            .groupBy("dst")
            .agg(F.sum("c").alias("msum"))
        )
        dangling = F.broadcast(
            state.where(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        state = (
            state.join(msgs, state["id"] == msgs["dst"], "left")
            .crossJoin(dangling)
            .select(
                "id",
                "is_src",
                (
                    F.col("is_src")
                    * (F.lit(1 - damping) + F.lit(damping) * F.col("dang") / n_src)
                    + F.lit(damping) * F.coalesce(F.col("msum"), F.lit(0.0))
                ).alias("rank"),
                "out_deg",
            )
        )
        if (i + 1) % checkpoint_interval == 0 or i == num_iter - 1:
            # lazy: lineage still truncates at the same cadence, but the
            # materialization rides the next superstep's dangling-mass
            # broadcast (or the final action) instead of a blocking
            # per-interval driver job (r13)
            state = _ck_lazy(state)
    return state.select("id", "rank")


def hits(
    edges: DataFrame,
    num_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) → (id, hub, auth).

    Power iteration on the unweighted adjacency: auth ← Aᵀ·hub,
    hub ← A·auth, each half-step followed by an L2 normalization so the
    scores converge to the principal singular vectors of A. The
    normalizer is a 1-row aggregate broadcast into the update — same
    no-driver-roundtrip pattern as pagerank's dangling mass.

    Each half-step's message merge is an eager localCheckpoint: the state
    feeds THREE consumers per half (the norm aggregate, the next half's
    message join, and the next half's state join), so without the barrier
    every consumer re-derives the whole superstep chain and the plan cost
    compounds ~4× per iteration (measured 27 s → 3 s at 3 iterations on
    the 600k-edge fixture supply graph). State is |V| rows — the
    checkpoints are cheap; the edge re-scan per half-step is the same
    deliberate trade as pagerank.

    Deterministic for a fixed iteration count (floating-point fixpoint →
    declared rows-only for the driver gate; pytest checks exact agreement
    with a dense numpy power iteration on a constructed graph)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
    )
    state = _ck_lazy(
        verts.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    )
    for _i in range(num_iter):
        # auth half-step: sum of incoming hubs, then L2-normalize
        a_msgs = (
            e.join(
                state.select(F.col("id").alias("_s"), "hub"),
                e["src"] == F.col("_s"),
            )
            .groupBy("dst")
            .agg(F.sum("hub").alias("_a"))
        )
        # lazy: the L2-norm broadcast aggregate right below is the
        # materializing action — one job per half-step instead of an
        # eager checkpoint plus the norm job (r13)
        half = _ck_lazy(
            state.join(a_msgs, state["id"] == a_msgs["dst"], "left").select(
                "id", "hub", F.coalesce(F.col("_a"), F.lit(0.0)).alias("auth")
            )
        )
        a_norm = F.broadcast(
            half.agg(F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("_an"))
        )
        state = half.crossJoin(a_norm).select(
            "id",
            "hub",
            F.when(F.col("_an") > 0, F.col("auth") / F.col("_an"))
            .otherwise(F.lit(0.0))
            .alias("auth"),
        )
        # hub half-step: sum of outgoing auths, then L2-normalize
        h_msgs = (
            e.join(
                state.select(F.col("id").alias("_d"), "auth"),
                e["dst"] == F.col("_d"),
            )
            .groupBy("src")
            .agg(F.sum("auth").alias("_h"))
        )
        half2 = _ck_lazy(
            state.join(h_msgs, state["id"] == h_msgs["src"], "left").select(
                "id", F.coalesce(F.col("_h"), F.lit(0.0)).alias("hub"), "auth"
            )
        )
        h_norm = F.broadcast(
            half2.agg(F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("_hn"))
        )
        state = half2.crossJoin(h_norm).select(
            "id",
            F.when(F.col("_hn") > 0, F.col("hub") / F.col("_hn"))
            .otherwise(F.lit(0.0))
            .alias("hub"),
            "auth",
        )
    return state

def betweenness_sampled(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int | None = None,
) -> DataFrame:
    """Source-sampled betweenness centrality (Brandes 2001) → (id, bc):
    for each sample source s, count shortest paths (σ) with a forward BFS,
    then push dependency scores δ back down the shortest-path DAG
    (δ(v) = Σ_w σ_v/σ_w · (1+δ_w) over v's DAG successors w); bc(v) sums
    δ_s(v) over the sampled sources, v ≠ s.

    Exact Brandes is O(V·E) — at 100 TB the source SAMPLE is the standard
    estimator (Brandes/Pich 2007): bc from k sources is an unbiased
    |V|/k-scaled estimate, and the whole computation stays k·O(E) with
    every phase an equi-join keyed on (source, vertex) — the state tables
    carry one row per reached (s, v) pair, so k controls memory exactly.

    Forward phase = the multi-source BFS shape of ``bfs_distances`` with a
    σ-accumulating message sum; backward phase walks the recorded BFS
    levels deepest-first, one join per level. All levels are eager
    localCheckpoints (the lineage discipline every iterative operator here
    uses).

    ``scale``: when set, dependency accumulation runs on a FIXED INTEGER
    GRID instead of doubles — σ stays the exact BIGINT path count and the
    per-successor contribution becomes ``(σ_v · (scale + Δ_w)) div σ_w``
    (truncating integer division, identical in Spark/DuckDB/Python), so
    the whole trajectory has exactly one possible value and ``bc`` comes
    back as a driver-hashable BIGINT ≈ δ·scale. Same joins, same levels,
    same plan shape — only the arithmetic domain changes (the
    g_pr3/g_hits2 exact-witness pattern)."""
    e = (
        edges.select(F.col(src_col).alias("es"), F.col(dst_col).alias("ed"))
        .dropDuplicates()
        .persist()
    )
    one = F.lit(1).cast("long") if scale else F.lit(1.0)
    id_c = sources.columns[0]
    lvl0 = _ck_lazy(
        sources.select(F.col(id_c).alias("s"))
        .dropDuplicates(["s"])
        .select(
            "s",
            F.col("s").alias("v"),
            one.alias("sigma"),
        )
    )
    # The (s, v) state tables are k-bounded while the edge set is the
    # whole graph: when a level is small enough, broadcast IT so every
    # superstep is a map-side probe of the cached edge blocks instead of
    # re-shuffling |E| rows per depth. The level size is already material
    # (each level is an eager localCheckpoint), so the count that decides
    # is a cheap scan of local blocks, and the same count doubles as the
    # convergence probe.
    bcast_rows = _BCAST_ROWS

    def _maybe_bcast(df: DataFrame, n_rows: int) -> DataFrame:
        return F.broadcast(df) if n_rows <= bcast_rows else df

    levels = [lvl0]
    level_sizes = [lvl0.count()]
    visited = lvl0.select("s", "v")
    relaid = False
    for _d in range(1, max_depth + 1):
        if level_sizes[-1] > bcast_rows and not relaid:
            # leaving the broadcast regime: pre-partition the edge cache
            # on the join key once — both the remaining forward levels
            # and the whole backward phase join on e["es"], so each then
            # shuffles only the (s, v) level frame (guide §2.4)
            e = _relayout_edges(e, "es")
            relaid = True
        frontier = _maybe_bcast(levels[-1], level_sizes[-1])
        msgs = (
            frontier
            .join(e, frontier["v"] == e["es"])
            .select("s", F.col("ed").alias("v"), "sigma")
        )
        agg = msgs.groupBy("s", "v").agg(F.sum("sigma").alias("sigma"))
        # lazy checkpoint: the level count below is the materializing
        # action — one job per forward level instead of two (r13)
        new = _ck_lazy(agg.join(visited, ["s", "v"], "left_anti"))
        n_new = new.count()
        if n_new == 0:
            break
        levels.append(new)
        level_sizes.append(n_new)
        visited = visited.unionByName(new.select("s", "v"))
    # backward accumulation, deepest level first (its delta is 0)
    zero = F.lit(0).cast("long") if scale else F.lit(0.0)
    delta = levels[-1].select("s", "v", zero.alias("delta"))
    acc = [delta]
    for li in range(len(levels) - 2, -1, -1):
        succ = (
            levels[li + 1]
            .select("s", F.col("v").alias("w"), F.col("sigma").alias("sw"))
            .join(
                delta.select("s", F.col("v").alias("w"), "delta"),
                ["s", "w"],
            )
        )
        succ = _maybe_bcast(succ, level_sizes[li + 1])
        cur = levels[li]
        cur_b = _maybe_bcast(cur, level_sizes[li])
        per_succ = (
            F.expr(f"(sigma * ({scale} + delta)) div sw")
            if scale
            else F.col("sigma") / F.col("sw") * (F.lit(1.0) + F.col("delta"))
        )
        contrib = (
            cur_b.join(e, cur_b["v"] == e["es"])
            .select("s", "v", "sigma", F.col("ed").alias("w"))
            .join(succ, ["s", "w"])
            .groupBy("s", "v")
            .agg(F.sum(per_succ).alias("_c"))
        )
        # lazy checkpoint with NO probe: each backward level's delta
        # materializes inside its consumer (the next level's contrib
        # join / the final accumulation) while still truncating lineage
        # — the per-level blocking checkpoint job disappears (r13)
        delta = _ck_lazy(
            cur.select("s", "v")
            .join(_maybe_bcast(contrib, level_sizes[li]), ["s", "v"], "left")
            .select("s", "v", F.coalesce(F.col("_c"), zero).alias("delta"))
        )
        acc.append(delta)
    res = acc[0]
    for part in acc[1:]:
        res = res.unionByName(part)
    # The backward loop has no probe action, so none of its lazy deltas
    # have materialized yet — unpersisting e here would make the caller's
    # action re-derive the deduped edge projection once per backward
    # level. One count materializes the whole delta chain (each level's
    # checkpoint persists as a side effect) against the live edge cache.
    if len(acc) > 1:
        acc[-1].count()
    e.unpersist()
    return (
        res.where(F.col("v") != F.col("s"))
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum("delta").alias("bc"))
    )


def _lpa_local(pairs, max_iter):
    """Sequential synchronous LPA — the small-core finisher for
    ``label_propagation``. IDENTICAL update rule (votes from the
    PREVIOUS state, most-frequent label, ties to the smallest), so both
    paths produce the same assignment (pytest-pinned)."""
    nbrs: dict = {}
    verts = set()
    for a, b in pairs:
        nbrs.setdefault(b, []).append(a)
        verts.add(a)
        verts.add(b)
    comm = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            ns = nbrs.get(v)
            if not ns:
                new[v] = comm[v]
                continue
            cnt: dict = {}
            for u in ns:
                c = comm[u]
                cnt[c] = cnt.get(c, 0) + 1
            new[v] = min(cnt, key=lambda c: (-cnt[c], c))
        comm = new
    return comm


def label_propagation(
    edges: DataFrame,
    max_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 100_000,
) -> DataFrame:
    """Community detection via SYNCHRONOUS label propagation (Raghavan
    et al. 2007) → (id, community): every vertex starts as its own
    community, then each superstep adopts the most frequent label among
    its neighbors, ties broken toward the SMALLEST label. Unlike
    ``connected_components`` (min-label flood = one community per
    component) the frequency vote splits dense regions from each other.

    Deterministic by construction: synchronous updates + min-label
    tie-break have no RNG and no visit-order dependence, so the result is
    reproducible and exactly replayable by a reference implementation
    (tests/test_analytics.py) — fixed ``max_iter`` also sidesteps the
    classic LPA oscillation on bipartite shapes.

    Scale shape per superstep: one edge⋈state join, one (vertex, label)
    count aggregate (map-side combinable), one struct-min argmax per
    vertex — two bounded-key shuffles over |E| and |V|-sized frames, no
    corpus-wide window, no driver state. Below the same broadcast
    threshold ``connected_components`` uses, the |V|-sized label table
    broadcasts and each superstep is a map-only pass over the cached
    edge set."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .dropDuplicates(["a", "b"])
        .persist()
    )
    # small-core finisher (the MIS/coloring/k-truss/SCC discipline):
    # max_iter supersteps of fixed job overhead on a one-task graph cost
    # more than the whole problem — run the IDENTICAL synchronous update
    # sequentially in one partition (both paths pytest-pinned equal).
    n_edges = und.count()
    if n_edges <= local_threshold:
        id_t = dict(und.dtypes)["a"]

        def _finish_lpa(batches):
            import pandas as pd

            def norm(x):
                # binary vertex ids arrive as (unhashable) bytearrays
                return bytes(x) if isinstance(x, (bytes, bytearray)) else x

            pairs = []
            for b_ in batches:
                pairs.extend(
                    (norm(x), norm(y))
                    for x, y in zip(b_["a"].tolist(), b_["b"].tolist())
                )
            comm = _lpa_local(pairs, max_iter)
            items = sorted(comm.items())
            return iter([pd.DataFrame(
                {"id": [k for k, _ in items],
                 "community": [v for _, v in items]}
            )])

        # eager checkpoint (the CC-finisher discipline): the kernel runs
        # against the live edge cache; without it the caller's action
        # would re-derive the (scan+union+dedup) projection post-unpersist
        out = _checkpointed(und.repartition(1).mapInPandas(
            _finish_lpa, f"id {id_t}, community {id_t}"
        ))
        und.unpersist()
        return out
    state = (
        und.select(F.col("a").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("community", F.col("id"))
    )
    small = state.count() <= _BCAST_ROWS
    if not small:
        und = _relayout_edges(und, "a")
    for it in range(max_iter):
        s = F.broadcast(state) if small else state
        votes = (
            und.join(s, und["a"] == s["id"])
            .groupBy(F.col("b").alias("v"), F.col("community").alias("lbl"))
            .agg(F.count("*").alias("cnt"))
        )
        winner = votes.groupBy("v").agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("lbl")))["lbl"]
            .alias("new_community")
        )
        if small:
            winner = F.broadcast(winner)
        # checkpoint EVERY superstep (pagerank's interval-2 cadence was
        # tried and measured 40% slower here: the broadcast of a
        # NON-CHECKPOINTED state recomputes the chained superstep once
        # for the broadcast exchange and again for the join's left side
        # — a LAZY checkpoint does not have that failure mode: its first
        # compute persists the blocks every later consumer reads, so the
        # r13 lazy form keeps the cadence while dropping the blocking
        # per-superstep materialization job)
        state = _ck_lazy(
            state.join(winner, state["id"] == winner["v"], "left").select(
                "id",
                F.coalesce("new_community", "community").alias("community"),
            )
        )
    # The loop has no per-superstep probe, so nothing above has run yet —
    # unpersisting here would make the caller's first action re-derive the
    # (scan + union + dedup-shuffle) edge projection once per superstep.
    # Materialize the chain while the cache is alive, then release it.
    state.count()
    und.unpersist()
    return state


def adamic_adar(
    pairs: DataFrame,
    item_col: str = "item",
    basket_col: str = "basket",
    max_basket: int | None = 1000,
) -> DataFrame:
    """Adamic–Adar link prediction over an (item, basket) bipartite
    relation → (item_a, item_b, n_common, aa_score): candidate item pairs
    are those sharing >= 1 basket; each common basket contributes
    1/ln(|basket|), so rare contexts weigh more than popular ones — the
    classic co-occurrence link predictor (Adamic & Adar 2003).

    Scale shape: the pair blow-up is bounded by BASKET size, not corpus
    size — one within-basket self-join emits <= |b|·(|b|-1)/2 rows per
    basket, then one pair-keyed aggregate (map-side combinable).
    ``max_basket`` drops mega-baskets before the self-join (a 1M-item
    basket is 5·10¹¹ pairs and carries ~0 signal at weight 1/ln(1M) —
    capping is the standard skew guard); size-1 baskets are excluded by
    construction (ln 1 = 0 has no defined weight, and they generate no
    pairs anyway). Every step is an equi-join/aggregate on basket or pair
    keys — exactly SQL-replayable."""
    b = pairs.select(
        F.col(item_col).alias("_i"), F.col(basket_col).alias("_b")
    ).dropDuplicates()
    deg = b.groupBy("_b").agg(F.count("*").alias("_deg"))
    if max_basket is not None:
        deg = deg.where(F.col("_deg") <= max_basket)
    deg = deg.where(F.col("_deg") >= 2)
    bd = b.join(deg, "_b")
    left = bd.select(F.col("_b"), F.col("_i").alias("item_a"), "_deg")
    right = bd.select(F.col("_b").alias("_b2"), F.col("_i").alias("item_b"))
    co = left.join(
        right,
        (left["_b"] == right["_b2"]) & (left["item_a"] < right["item_b"]),
    )
    return co.groupBy("item_a", "item_b").agg(
        F.count("*").cast("long").alias("n_common"),
        F.round(F.sum(F.lit(1.0) / F.log(F.col("_deg"))), 4).alias("aa_score"),
    )


def _kruskal_local(rows):
    """Sequential Kruskal over (u, v, w, cu, cv) rows under the strict
    (w, u, v) total order — the MST small-core finisher. The strict
    order makes the minimum spanning forest UNIQUE, so Kruskal here and
    Borůvka above choose the SAME edges (the exact-agreement pytest in
    tests/test_mst.py is the proof obligation)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = []
    for u, v, w, cu, cv in sorted(rows, key=lambda r: (r[2], r[0], r[1])):
        ru, rv = find(cu), find(cv)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            chosen.append((u, v, w))
    return chosen


def boruvka_mst(
    edges: DataFrame,
    max_rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Minimum spanning forest via distributed Borůvka → the MST edge set
    (src, dst, w), one row per chosen edge, deterministic.

    Borůvka is THE distributed MST formulation (components halve every
    round → ≤ log₂V rounds, each round a constant number of joins/aggs),
    unlike Kruskal/Prim whose sequential union-find/heap has no dataflow
    equivalent. Per round:

      1. drop intra-component edges, orient each survivor both ways;
      2. every component picks its minimum incident edge — ties broken on
         the total order (w, src, dst), which makes the forest UNIQUE
         (same argument as Kruskal with a strict ordering) and therefore
         exactly replayable by a sequential reference;
      3. contract: selected edges define a pointer graph comp→comp; with
         consistent tie-breaking its only cycles are 2-cycles, broken by
         pointing the larger id at the smaller, then pointer-doubling
         folds every chain onto its root (≤ log rounds, same
         hash-to-min discipline as ``connected_components``).

    State is (vertex → component) plus the shrinking candidate edge set;
    both localCheckpoint per round (the module's standard lineage
    barrier). Edge weights must be comparable doubles; multi-edges are
    fine (the min pick sees them all).
    """
    e0 = (
        edges.select(
            F.col(src_col).alias("u"),
            F.col(dst_col).alias("v"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .where(F.col("u") != F.col("v"))
    )
    verts = (
        e0.select(F.col("u").alias("id"))
        .unionByName(e0.select(F.col("v").alias("id")))
        .dropDuplicates(["id"])
    )
    # lazy checkpoints: round 0's keyed-edge count materializes comp,
    # cand and keyed in one job instead of three eager barriers (r13)
    comp = _ck_lazy_nostats(verts.select("id", F.col("id").alias("comp")))
    cand = _ck_lazy_nostats(e0)
    chosen = None
    for _r in range(max_rounds):
        # re-key candidate edges to current components, drop internals
        cu = comp.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        keyed = (
            cand.join(cu, "u").join(cv, "v")
            .where(F.col("cu") != F.col("cv"))
        )
        keyed = _ck_lazy_nostats(keyed)
        n_keyed = keyed.count()
        if n_keyed == 0:
            break
        # small-core finisher (the SCC/_tarjan_local discipline): once
        # the inter-component edge set fits one task, log-many more
        # distributed rounds of fixed job overhead cost more than the
        # whole remainder — finish with sequential Kruskal under the
        # SAME (w, u, v) order (strict total order ⇒ the forest is
        # unique, so both paths choose identical edges).
        # threshold sizing: 1M (u,v,w,cu,cv) rows ≈ 40 MB — one task's
        # working set; a 100 TB edge set runs distributed rounds until
        # contraction shrinks the inter-component remainder under it
        if n_keyed <= local_threshold:
            id_t = dict(keyed.dtypes)["u"]

            def _finish_mst(batches):
                import pandas as pd

                rows = []
                for b in batches:
                    rows.extend(zip(
                        b["u"].tolist(), b["v"].tolist(), b["w"].tolist(),
                        b["cu"].tolist(), b["cv"].tolist(),
                    ))
                got = _kruskal_local(rows)
                return iter([pd.DataFrame(
                    {
                        "u": [g[0] for g in got],
                        "v": [g[1] for g in got],
                        "w": [g[2] for g in got],
                    }
                )])

            tail = _ck_lazy_nostats(
                keyed.select("u", "v", "w", "cu", "cv")
                .repartition(1)
                .mapInPandas(_finish_mst, f"u {id_t}, v {id_t}, w double")
            )
            chosen = tail if chosen is None else chosen.unionByName(tail)
            break
        # Edge cleaning (standard Borůvka reduction): between two
        # components only the MINIMUM edge under the total order can ever
        # be selected, now or after any further contraction (cut
        # property; contraction only coarsens the pairs, so the per-pair
        # min is a superset of every future round's candidates). The
        # carried edge set collapses from |E| to ≤ (#components choose 2),
        # which is what keeps rounds 2+ cheap when |E| is 100 TB-scale.
        # Skipped on round 0, where components ARE the vertices and the
        # pair-min would reproduce the edge set at the cost of an extra
        # |E| shuffle.
        if _r == 0:
            cand = keyed.select("u", "v", "w")
        else:
            cand = (
                keyed.groupBy(
                    F.least("cu", "cv").alias("_x"),
                    F.greatest("cu", "cv").alias("_y"),
                )
                .agg(F.min(F.struct("w", "u", "v")).alias("m"))
                .select(
                    F.col("m.u").alias("u"),
                    F.col("m.v").alias("v"),
                    F.col("m.w").alias("w"),
                )
            )
        # each component's min incident edge under the (w, u, v) order
        both = keyed.select(
            F.col("cu").alias("c"), "w", "u", "v", F.col("cv").alias("other")
        ).unionByName(
            keyed.select(
                F.col("cv").alias("c"), "w", "u", "v", F.col("cu").alias("other")
            )
        )
        picked = both.groupBy("c").agg(
            F.min(F.struct("w", "u", "v", "other")).alias("m")
        ).select(
            "c",
            F.col("m.w").alias("w"),
            F.col("m.u").alias("u"),
            F.col("m.v").alias("v"),
            F.col("m.other").alias("other"),
        )
        # an edge may be picked by both endpoints' components — one row each
        new_edges = picked.select("u", "v", "w").dropDuplicates(["u", "v", "w"])
        chosen = (
            new_edges if chosen is None
            else chosen.unionByName(new_edges)
        )
        # lazy: the accumulated forest materializes through its next
        # consumer (the following round's union or the final select)
        chosen = _ck_lazy_nostats(chosen)
        # pointer graph: c -> other; break 2-cycles toward the smaller id
        ptr = picked.select("c", F.col("other").alias("p"))
        # 2-cycle break: if a.p = b and b.p = a, the larger points to the
        # smaller and the smaller points to itself
        back = ptr.select(F.col("c").alias("p2c"), F.col("p").alias("p2p"))
        ptr = ptr.join(
            back, (ptr["p"] == back["p2c"]) & (back["p2p"] == ptr["c"]), "left"
        ).select(
            "c",
            F.when(
                F.col("p2p").isNotNull() & (F.col("c") < F.col("p")), F.col("c")
            ).otherwise(F.col("p")).alias("p"),
        )
        # Pointer doubling to the root. The moved flag rides the jump
        # frame itself, so convergence costs one isEmpty on the local
        # checkpoint blocks — not extra joins (the original two-join
        # probe tripled the job count and dominated wall time).
        ptr = _ck_lazy_nostats(ptr)
        for _j in range(64):
            nxt = ptr.select(F.col("c").alias("jc"), F.col("p").alias("jp"))
            jumped = _ck_lazy_nostats(
                ptr.join(nxt, ptr["p"] == nxt["jc"], "left").select(
                    "c",
                    F.coalesce(F.col("jp"), F.col("p")).alias("p"),
                    (
                        F.col("jp").isNotNull()
                        & (F.col("jp") != F.col("p"))
                    ).alias("moved"),
                )
            )
            # ONE job per jump: the moved-probe materializes the lazy
            # checkpoint (max over empty → NULL → done, as before)
            done = not bool(
                jumped.agg(F.max(F.col("moved").cast("int")).alias("m"))
                .first()["m"]
            )
            ptr = jumped.select("c", "p")
            if done:
                break
        # fold vertex components through the round's pointer map (lazy:
        # the next round's keyed-edge count materializes it)
        comp = _ck_lazy_nostats(
            comp.join(
                ptr.select(F.col("c").alias("comp"), "p"), "comp", "left"
            ).select("id", F.coalesce(F.col("p"), F.col("comp")).alias("comp"))
        )
    else:
        # max_rounds exhausted without contraction finishing or the
        # small-core finisher firing. If inter-component edges remain,
        # the returned forest would silently be non-spanning — check
        # once (exhaustion path only) and fail loudly.
        cu = comp.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        leftover = (
            cand.join(cu, "u").join(cv, "v")
            .where(F.col("cu") != F.col("cv"))
        )
        if not leftover.isEmpty():
            raise RuntimeError(
                "boruvka_mst: inter-component edges remain after"
                f" max_rounds={max_rounds}; raise max_rounds or"
                " local_threshold — returning now would yield a"
                " non-spanning forest."
            )
    out = e0.limit(0) if chosen is None else chosen
    return out.select(
        F.col("u").alias(src_col),
        F.col("v").alias(dst_col),
        F.col("w").alias(weight_col),
    )


def _tarjan_local(pairs):
    """Iterative Tarjan over an in-memory edge list → {vertex: min-id of
    its SCC}. The single-partition finisher for
    ``strongly_connected_components`` — runs inside one task, never on
    the driver."""
    import collections

    adj = collections.defaultdict(list)
    nodes = set()
    for s_, d_ in pairs:
        nodes.add(s_)
        nodes.add(d_)
        if s_ != d_:
            adj[s_].append(d_)
    index, low, onstk, stk, out = {}, {}, {}, [], {}
    cnt = [0]
    for v0 in sorted(nodes):
        if v0 in index:
            continue
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = cnt[0]
                cnt[0] += 1
                stk.append(v)
                onstk[v] = True
            descend = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    descend = True
                    break
                elif onstk.get(w):
                    low[v] = min(low[v], index[w])
            if descend:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def strongly_connected_components(
    edges: DataFrame,
    max_outer: int = 20,
    max_prop: int = 30,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph → (id, scc_id)
    with ``scc_id`` = the smallest member id (deterministic). The one
    graph decomposition the undirected family (connected_components /
    cc_doubling) cannot express: mutual reachability, the "core loop"
    structure of navigation graphs, crawl graphs, dependency graphs.

    Algorithm: forward-backward-min peeling (the FW-BW-Trim family,
    Slota et al.; GraphX's scc runs the same dataflow). Per outer round
    over the still-active subgraph:

    1. **Trim**: a vertex with no active in-edges or no active
       out-edges can't be in a cycle — emit it as a singleton SCC.
       Repeated to a bounded fixpoint; each pass is two semi-joins.
    2. **F** = min id each vertex can REACH, by min-label propagation
       along out-edges (O(diameter) join+agg supersteps); **B** = min
       id that REACHES each vertex, same along in-edges.
    3. **Peel**: F(v) == B(v) == m ⇒ v and m are mutually reachable,
       and whole SCCs share (F, B), so {v : F(v)=B(v)=m} IS the SCC of
       m. At minimum the SCC of the globally-min active id peels each
       round, so the loop terminates; DAG-ish periphery goes via trim.

    Every superstep is a LAZY localCheckpoint (lineage discipline,
    module docstring) whose materializing action is the loop probe that
    follows it — one job per superstep instead of two (r13). Worst case (a long path of singleton SCCs)
    costs O(path) trim passes — the known bound of this family; real
    web/navigation graphs resolve in a few rounds. Self-loops are
    stripped from propagation (a self-loop never changes an SCC).
    """
    e_all = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).dropDuplicates(["src", "dst"])
    verts = (
        e_all.select(F.col("src").alias("id"))
        .unionByName(e_all.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
    )
    active_e = _ck_lazy_nostats(e_all.where(F.col("src") != F.col("dst")))
    active_v = _ck_lazy_nostats(verts)
    done_parts: list[DataFrame] = []
    # The stats barrier (mandatory here: the per-round label self-joins
    # would otherwise explode the checkpoint size estimates geometrically,
    # the Borůvka failure mode) also disables compile-time auto-broadcast,
    # so the small-side joins get explicit hints behind the same counted
    # threshold the other iterative operators use. Every build side below
    # is bounded by |active vertices|, which only shrinks.
    small = active_v.count() <= _BCAST_ROWS

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if small else df

    def _propagate_fb(ev: DataFrame, vs: DataFrame) -> DataFrame:
        """Both min-label fixpoints at once → (id, f, b): f = min id the
        vertex REACHES (flows against edge direction: v adopts its
        out-neighbors' f), b = min id REACHING it (flows with edge
        direction). The two propagations are independent, so fusing them
        halves the supersteps — rounds = max(diam_F, diam_B), one
        checkpoint per round. (Pointer-jumping f[v] ← f[f[v]] was tried
        and does NOT help here: on a near-cycle core every label stays
        at its own id until the min wave arrives, so the jump target is
        the vertex itself — measured no round reduction for 2 extra
        joins/round. The small-core finisher below is what bounds the
        superstep count instead.)

        Returns (labels, converged). A non-converged label frame MUST
        NOT be peeled: with partial propagation only part of an SCC
        satisfies F==B (e.g. a directed cycle longer than ~2*max_prop
        peels only its min-id vertex), and removing that subset severs
        the SCC so trim then mislabels the rest as singletons."""
        lab = _ck_lazy_nostats(
            vs.select("id", F.col("id").alias("f"), F.col("id").alias("b"))
        )
        converged = False
        for _ in range(max_prop):
            fmsg = (
                ev.join(
                    _b(lab.select(F.col("id").alias("_fid"), "f")),
                    ev["dst"] == F.col("_fid"),
                )
                .groupBy("src")
                .agg(F.min("f").alias("nf"))
            )
            bmsg = (
                ev.join(
                    _b(lab.select(F.col("id").alias("_bid"), "b")),
                    ev["src"] == F.col("_bid"),
                )
                .groupBy("dst")
                .agg(F.min("b").alias("nb"))
            )
            new_f = F.least(F.col("f"), F.coalesce(F.col("nf"), F.col("f")))
            new_b = F.least(F.col("b"), F.coalesce(F.col("nb"), F.col("b")))
            step = _ck_lazy_nostats(
                lab.join(_b(fmsg), lab["id"] == fmsg["src"], "left")
                .join(_b(bmsg), lab["id"] == bmsg["dst"], "left")
                .select(
                    "id",
                    new_f.alias("f"),
                    new_b.alias("b"),
                    (
                        (new_f != F.col("f")) | (new_b != F.col("b"))
                    ).alias("_chg"),
                )
            )
            lab = step.select("id", "f", "b")
            if step.where(F.col("_chg")).isEmpty():
                converged = True
                break
        return lab, converged

    for _outer in range(max_outer):
        if active_v.isEmpty():
            break
        # 1. small-core finisher: distributed propagation costs O(core
        # diameter) full job barriers, so once the active subgraph fits
        # comfortably in ONE task, finish it with a sequential Tarjan
        # inside mapInPandas — a single-partition job, never a driver
        # collect (the classic switch-to-local-below-threshold design,
        # cf. the IVF operator's packed-centroid row). Vertex self-pairs
        # ride along so vertices isolated by self-loop stripping or
        # earlier peels still get their singleton row. At 100 TB the
        # trim/propagate/peel rounds below shrink the graph until it
        # crosses this threshold.
        core = active_e.unionByName(
            active_v.select(
                F.col("id").alias("src"), F.col("id").alias("dst")
            )
        )
        if core.count() <= local_threshold:
            id_t = dict(active_e.dtypes)["src"]

            def _finish(batches):
                import pandas as pd

                pairs = []
                for b in batches:
                    pairs.extend(zip(b["src"].tolist(), b["dst"].tolist()))
                comp = _tarjan_local(pairs)
                yield pd.DataFrame(
                    {
                        "id": list(comp.keys()),
                        "scc_id": list(comp.values()),
                    }
                )

            done_parts.append(
                _ck_lazy_nostats(
                    core.repartition(1).mapInPandas(
                        _finish, f"id {id_t}, scc_id {id_t}"
                    )
                )
            )
            break
        # 2. trim singleton SCCs (no in- or no out-edge in the active
        # set). One checkpoint per pass: the cyclic flag is computed with
        # two left joins so survivors and trimmed both filter off the same
        # materialized frame; edge refiltering stays lazy across passes
        # (two semi-joins per pass over a bounded fixpoint) and is pinned
        # once after the loop.
        while True:
            has_out = (
                active_e.select(F.col("src").alias("id"))
                .dropDuplicates(["id"])
                .withColumn("_o", F.lit(True))
            )
            has_in = (
                active_e.select(F.col("dst").alias("id"))
                .dropDuplicates(["id"])
                .withColumn("_i", F.lit(True))
            )
            flagged = _ck_lazy_nostats(
                active_v.join(_b(has_out), "id", "left")
                .join(_b(has_in), "id", "left")
                .select(
                    "id",
                    (
                        F.col("_o").isNotNull() & F.col("_i").isNotNull()
                    ).alias("_cyc"),
                )
            )
            trimmed = flagged.where(~F.col("_cyc")).select(
                "id", F.col("id").alias("scc_id")
            )
            if trimmed.isEmpty():
                break
            done_parts.append(trimmed)
            active_v = flagged.where(F.col("_cyc")).select("id")
            active_e = active_e.join(
                _b(active_v), active_e["src"] == active_v["id"], "left_semi"
            ).join(_b(active_v), active_e["dst"] == active_v["id"], "left_semi")
        if active_v.isEmpty():
            break
        active_e = _ck_lazy_nostats(active_e)
        # 3. fused forward/backward min-label fixpoint on the cyclic core
        fb, fb_converged = _propagate_fb(active_e, active_v)
        if not fb_converged:
            # Peeling from truncated labels silently splits SCCs (only
            # the min-id part of a long cycle satisfies F==B) — fail
            # loudly instead, matching k_truss/temporal_min_arrival.
            raise RuntimeError(
                "strongly_connected_components: min-label propagation did"
                f" not converge within max_prop={max_prop} supersteps on"
                " an active core above local_threshold; raise max_prop"
                " or local_threshold — peeling now would emit wrong"
                " scc_ids."
            )
        # 4. peel complete SCCs where F == B
        peeled = _ck_lazy_nostats(
            fb.where(F.col("f") == F.col("b")).select(
                "id", F.col("f").alias("scc_id")
            )
        )
        done_parts.append(peeled)
        active_v = _ck_lazy_nostats(
            active_v.join(_b(peeled), "id", "left_anti")
        )
        active_e = _ck_lazy_nostats(
            active_e.join(_b(peeled), active_e["src"] == peeled["id"], "left_anti")
            .join(_b(peeled), active_e["dst"] == peeled["id"], "left_anti")
        )
    else:
        # max_outer exhausted without a break: any still-active vertices
        # would silently vanish from the output — fail loudly instead
        # (the k_truss/temporal_min_arrival discipline).
        if not active_v.isEmpty():
            raise RuntimeError(
                "strongly_connected_components: trim/peel loop exhausted"
                f" max_outer={max_outer} with active vertices remaining;"
                " raise max_outer or local_threshold — returning now"
                " would drop those vertices from the output."
            )
    if not done_parts:
        return verts.limit(0).withColumn("scc_id", F.col("id"))
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out


def _luby_local(pairs):
    """Sequential Luby on a collected edge list — the small-core finisher
    for maximal_independent_set. IDENTICAL algorithm and md5 priorities
    as the distributed loop, so both paths select the same set."""
    import hashlib

    def pri(v, rnd):
        return int(
            hashlib.md5(f"{v}:{rnd}".encode()).hexdigest()[:15], 16
        )

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    mis = set()
    rnd = 0
    while active:
        rnd += 1
        sel = set()
        for v in active:
            key = (pri(v, rnd), v)
            if all(
                key < (pri(u, rnd), u) for u in adj[v] if u in active
            ):
                sel.add(v)
        mis |= sel
        removed = set(sel)
        for v in sel:
            removed |= {u for u in adj[v] if u in active}
        active -= removed
    return mis


def _greedy_color_local(pairs):
    """Sequential greedy coloring in fixed md5-priority order — exactly
    what Jones-Plassmann computes; the coloring small-core finisher."""
    import hashlib

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def pri(v):
        return int(hashlib.md5(f"{v}".encode()).hexdigest()[:15], 16)

    colors = {}
    for v in sorted(adj, key=lambda u: (pri(u), u)):
        used = {colors[u] for u in adj[v] if u in colors}
        c = 1
        while c in used:
            c += 1
        colors[v] = c
    return colors


def maximal_independent_set(
    edges: DataFrame,
    max_rounds: int = 40,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 100_000,
) -> DataFrame:
    """Maximal independent set via Luby's algorithm → (id) — one row per
    selected vertex, deterministic.

    Luby is the canonical distributed MIS (Luby 1986): per round every
    ACTIVE vertex draws a priority; a vertex joins the MIS iff its
    priority is a strict local minimum among active neighbors; selected
    vertices AND their neighbors deactivate. Expected O(log n) rounds.
    The reference has no MIS; this extends the G4 analytics family with
    the standard symmetry-breaking primitive (graph coloring, parallel
    matching, and landmark selection all reduce to it).

    Determinism: the "random" priority is md5-derived —
    ``conv(substr(md5(id || ':' || round), 1, 15), 16, 10)`` with ties
    broken by vertex id, so every engine (and the sequential pytest
    replay, tests/test_mis.py) selects the IDENTICAL set; md5 keeps the
    per-round draws independent enough for Luby's round bound.

    Scale shape per round: priorities are per-row expressions (no join
    to a priority table); the local-min test is one edge-keyed
    aggregate; deactivation is two hash anti-joins. Active state
    localCheckpoints with the module's stats barrier (high-fan loop).
    Isolated-by-removal vertices self-select in their next round (no
    neighbors ⇒ vacuous local minimum), so termination sweeps the tail.
    """

    def pri(col: Column, rnd: int) -> Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f":{rnd}"))), 1, 15
            ),
            16,
            10,
        ).cast("long")

    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            ).where(F.col("a") != F.col("b"))
        )
        .distinct()
    )
    # small-core finisher (the SCC/_tarjan_local discipline): below the
    # threshold the whole graph is one task's work, and 3+ Luby rounds of
    # distributed fixed job overhead cost more than the entire problem —
    # run the IDENTICAL algorithm sequentially in one partition. Both
    # paths select the same set (md5 priorities; pytest-pinned).
    sym = _ck_lazy(sym)
    if sym.count() <= local_threshold:
        id_t = dict(sym.dtypes)["a"]

        def _finish_mis(batches):
            import pandas as pd

            pairs = []
            for b in batches:
                pairs.extend(zip(b["a"].tolist(), b["b"].tolist()))
            return iter([pd.DataFrame({"id": sorted(_luby_local(pairs))})])

        return sym.repartition(1).mapInPandas(_finish_mis, f"id {id_t}")
    active_v = _ck_lazy(
        sym.select(F.col("a").alias("id"))
        .unionByName(sym.select(F.col("b").alias("id")))
        .distinct()
    )
    active_e = sym
    mis_parts: list[DataFrame] = []
    for rnd in range(1, max_rounds + 1):
        if active_v.isEmpty():
            break
        # min (priority, id) over active neighbors, per vertex
        nbr_min = active_e.groupBy(F.col("a").alias("id")).agg(
            F.min(F.struct(pri(F.col("b"), rnd).alias("p"),
                           F.col("b").alias("i"))).alias("nb")
        )
        cand = (
            active_v.join(nbr_min, "id", "left")
            .where(
                F.col("nb").isNull()
                | (
                    F.struct(
                        pri(F.col("id"), rnd).alias("p"),
                        F.col("id").alias("i"),
                    )
                    < F.col("nb")
                )
            )
            .select("id")
        )
        selected = cand  # lazy: parents are checkpointed, re-derive is
        # one small join; saves one eager job per round
        mis_parts.append(selected)
        # deactivate selected ∪ neighbors(selected)
        removed = selected.unionByName(
            active_e.join(
                selected.withColumnRenamed("id", "a"), "a"
            ).select(F.col("b").alias("id"))
        ).distinct()
        active_v = _ck_lazy_nostats(
            active_v.join(removed, "id", "left_anti")
        )
        active_e = _ck_lazy_nostats(
            active_e.join(active_v.withColumnRenamed("id", "a"), "a")
            .join(active_v.withColumnRenamed("id", "b"), "b")
            .select("a", "b")
        )
    else:
        # max_rounds exhausted: still-active vertices mean the set is
        # not yet maximal — fail loudly rather than return a non-MIS.
        if not active_v.isEmpty():
            raise RuntimeError(
                "maximal_independent_set: Luby loop exhausted"
                f" max_rounds={max_rounds} with active vertices"
                " remaining; raise max_rounds or local_threshold —"
                " the selected set would not be maximal."
            )
    if not mis_parts:  # empty / self-loop-only graph
        return sym.select(F.col("a").alias("id")).limit(0)
    out = mis_parts[0]
    for p in mis_parts[1:]:
        out = out.unionByName(p)
    return out


def greedy_coloring(
    edges: DataFrame,
    max_rounds: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 100_000,
) -> DataFrame:
    """Proper vertex coloring via Jones-Plassmann → (id, color): draw a
    fixed md5 priority per vertex; each round, every uncolored vertex
    whose priority beats all its UNCOLORED neighbors takes the smallest
    color absent among its colored neighbors (mex). All colors resolve
    in ONE loop of O(log n) expected rounds — unlike iterated-MIS
    coloring, whose cost is colors × MIS-rounds (the first cut of this
    operator; 12s on the 175-edge fixture core vs ~3s for this form).

    With a FIXED priority order, JP computes exactly the SEQUENTIAL
    greedy coloring in priority order (each vertex waits for all
    higher-priority neighbors, then takes mex) — so the assignment is
    unique, C ≤ Δ+1, and a trivial sequential replay verifies it
    exactly (tests/test_mis.py::test_coloring_*).

    Per round: one uncolored-neighbor min join (am I the local
    priority minimum?), one colored-neighbor mex aggregate, two
    anti-join shrinks; state checkpoints with the stats barrier."""

    def pri(col: Column) -> Column:
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("long")

    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            ).where(F.col("a") != F.col("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # small-core finisher: sequential greedy in priority order IS the
    # JP fixed-priority result (same md5 order; pytest-pinned equal)
    if sym.count() <= local_threshold:
        id_t = dict(sym.dtypes)["a"]

        def _finish_color(batches):
            import pandas as pd

            pairs = []
            for b in batches:
                pairs.extend(zip(b["a"].tolist(), b["b"].tolist()))
            colors = _greedy_color_local(pairs)
            ids = sorted(colors)
            return iter([pd.DataFrame(
                {"id": ids, "color": [colors[i] for i in ids]}
            )])

        return sym.repartition(1).mapInPandas(
            _finish_color, f"id {id_t}, color long"
        )
    uncolored = _ck_lazy(
        sym.select(F.col("a").alias("id")).distinct()
    )
    colored = uncolored.limit(0).withColumn(
        "color", F.lit(0).cast("long")
    ).select("id", "color")
    parts: list[DataFrame] = []
    for _ in range(max_rounds):
        if uncolored.isEmpty():
            break
        unc_a = uncolored.withColumnRenamed("id", "a")
        unc_b = uncolored.withColumnRenamed("id", "b")
        # blocked: an uncolored neighbor with smaller (pri, id) exists
        blocked = (
            sym.join(unc_a, "a")
            .join(unc_b, "b")
            .where(
                F.struct(pri(F.col("b")).alias("p"), F.col("b").alias("i"))
                < F.struct(pri(F.col("a")).alias("p"), F.col("a").alias("i"))
            )
            .select(F.col("a").alias("id"))
            .distinct()
        )
        ready = uncolored.join(blocked, "id", "left_anti")
        # mex over colored neighbors: smallest color in 1..deg+1 not used
        nbr_colors = (
            sym.join(ready.withColumnRenamed("id", "a"), "a")
            .join(
                colored.withColumnRenamed("id", "b"), "b"
            )
            .groupBy(F.col("a").alias("id"))
            .agg(F.collect_set("color").alias("_used"))
        )
        assigned = (
            ready.join(nbr_colors, "id", "left")
            .select(
                "id",
                F.array_min(
                    F.array_except(
                        F.sequence(
                            F.lit(1),
                            F.coalesce(F.size("_used"), F.lit(0)) + 1,
                        ).cast("array<long>"),
                        F.coalesce(
                            F.col("_used"),
                            F.array().cast("array<long>"),
                        ),
                    )
                ).alias("color"),
            )
        )
        assigned = _ck_lazy(assigned)
        parts.append(assigned)
        # lazy union of checkpointed parts — no extra eager job
        colored = colored.unionByName(assigned)
        uncolored = _ck_lazy_nostats(
            uncolored.join(assigned, "id", "left_anti")
        )
    else:
        # max_rounds exhausted: uncolored vertices would vanish from
        # the output, violating the documented totality — fail loudly.
        if not uncolored.isEmpty():
            raise RuntimeError(
                "greedy_coloring: Jones-Plassmann loop exhausted"
                f" max_rounds={max_rounds} with uncolored vertices"
                " remaining; raise max_rounds or local_threshold —"
                " the coloring would be partial."
            )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def temporal_min_arrival(
    transitions: DataFrame,
    seeds: DataFrame,
    max_iter: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "tsm",
) -> DataFrame:
    """Time-respecting reachability with earliest-arrival times →
    (id, arrival) for every vertex reachable from the seed set along
    paths whose edge timestamps STRICTLY INCREASE (Holme & Saramäki
    temporal-network semantics): an edge (u→v, t) extends a journey iff
    u was reached strictly before t. The static-graph operators (BFS,
    CC, SCC) are blind to this — a road that exists only before you
    arrive is not a road.

    Execution: DELTA-frontier label-correcting relaxation over PACKED
    edges. Parallel (u→v) edges collapse once into a sorted distinct-
    timestamp array per vertex pair (the multiplicity lives in data, not
    in join fan-out: 98k raw transitions → ~10k packed pairs on the
    sf0.1 navigation graph); relaxing a pair is then
    ``array_min(filter(ts_arr, t > arr))`` — the first usable departure
    after the source's arrival. Each superstep relaxes ONLY pairs whose
    source arrival changed last round (new arrivals can appear nowhere
    else), min-merges into the state, and derives the next frontier in
    the same aggregate; convergence = empty frontier (one probe per
    round, against the already-checkpointed frame). Arrival times only
    decrease and are bounded below, so the fixpoint exists; rounds ≤ the
    longest shortest journey's hop count. Raises RuntimeError if
    ``max_iter`` is hit before the fixpoint — parity with the oracle's
    recursive closure must never silently truncate.

    All-integer state (epoch micros), so the fixpoint is engine-exact
    and a recursive-CTE oracle replays it value-for-value."""
    neg_inf = -(1 << 62)
    packed = (
        transitions.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(ts_col).cast("long").alias("tsm"),
        )
        .groupBy("src", "dst")
        .agg(F.array_sort(F.collect_set("tsm")).alias("_ts"))
        .localCheckpoint(eager=True)
    )
    def step(
        arrival: DataFrame, delta: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        relaxed = (
            packed.join(delta.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.array_min(
                    F.filter(F.col("_ts"), lambda t: t > F.col("arr"))
                ).alias("_cand"),
            )
            .where(F.col("_cand").isNotNull())
            .groupBy("id")
            .agg(F.min("_cand").alias("arr"))
        )
        merged = (
            arrival.select("id", "arr", F.lit(True).alias("_old"))
            .unionByName(
                relaxed.select("id", "arr", F.lit(False).alias("_old"))
            )
            .groupBy("id")
            .agg(
                F.min("arr").alias("arr"),
                # improved iff the best candidate beats every old value
                # (min_by is order-unstable on ties; this form is not)
                (
                    F.min("arr")
                    < F.min(F.when(F.col("_old"), F.col("arr")))
                ).alias("_chg"),
                F.max(F.col("_old")).alias("_seen"),
            )
            .select(
                "id",
                "arr",
                (F.coalesce(F.col("_chg"), F.lit(False)) | ~F.col("_seen"))
                .alias("_changed"),
            )
        )
        return merged, merged.where(F.col("_changed")).select("id", "arr")

    arrival = _ck_lazy(
        seeds.select(F.col("id"), F.lit(neg_inf).cast("long").alias("arr"))
        .distinct()
    )
    delta = arrival
    delta_nonempty = not delta.isEmpty()
    for _ in range(max_iter):
        if not delta_nonempty:
            return arrival.select("id", "arr")
        # TWO relaxations fuse into one lazy plan per checkpoint round:
        # the state frame is vocabulary-sized, so plan depth is cheap and
        # halving the per-round job count halves local-mode wall time.
        # The checkpoint is lazy and the frontier-emptiness probe is its
        # materializing action — one job per round, not two (r13).
        mid, delta_mid = step(arrival, delta)
        merged, _ = step(mid.select("id", "arr"), delta_mid)
        arrival = _ck_lazy_nostats(merged)
        delta = arrival.where(F.col("_changed")).select("id", "arr")
        delta_nonempty = bool(
            arrival.agg(F.max(F.col("_changed").cast("int")).alias("c"))
            .first()["c"]
        )
    raise RuntimeError(
        f"temporal_min_arrival did not converge in {max_iter} supersteps"
    )


def _ktruss_local(pairs, k):
    """Sequential support peeling — the k-truss small-core finisher
    (identical fixpoint; peeling order cannot matter)."""
    e = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        kept = {
            (a, b) for a, b in e if len(adj[a] & adj[b]) >= k - 2
        }
        if kept == e:
            return e
        e = kept


def k_truss(
    edges: DataFrame,
    k: int = 4,
    max_rounds: int = 30,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 100_000,
) -> DataFrame:
    """k-truss decomposition → the maximal subgraph's edge set (a, b)
    with a < b, where every edge participates in ≥ k−2 triangles WITHIN
    the subgraph — the standard cohesive-subgraph refinement of k-core
    (an edge-wise, triangle-witnessed density guarantee; Cohen 2008).

    Execution: support peeling. Per round: count each edge's triangles
    with the canonical a<b<c wedge join (the same two-shuffle plan as
    triangle_count), drop edges under k−2, repeat on the shrunk edge
    set until no edge falls. Edge sets only shrink, so the fixpoint
    exists and is THE k-truss (peeling order cannot matter — an edge
    below threshold now stays below it forever). Deterministic; exact
    agreement with a sequential replay is pytest-proven
    (tests/test_temporal.py sibling suite tests/test_ktruss.py)."""
    # lazy checkpoint: the edge count is the materializing action (r13)
    e = _ck_lazy(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    thresh = k - 2
    n = e.count()
    # small-core finisher (the SCC/_tarjan_local discipline): a fixpoint
    # of wedge joins on a one-task graph is all fixed job overhead
    if n <= local_threshold:
        id_t = dict(e.dtypes)["a"]

        def _finish_truss(batches):
            import pandas as pd

            pairs = []
            for b in batches:
                pairs.extend(zip(b["a"].tolist(), b["b"].tolist()))
            kept = sorted(_ktruss_local(pairs, k))
            return iter([pd.DataFrame(
                {"a": [p[0] for p in kept], "b": [p[1] for p in kept]}
            )])

        return e.repartition(1).mapInPandas(
            _finish_truss, f"a {id_t}, b {id_t}"
        )
    for _ in range(max_rounds):
        if n == 0:
            return e
        u = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
        v = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
        tri = (
            u.join(v, "y")
            .join(
                e.select(F.col("a").alias("x"), F.col("b").alias("z")),
                ["x", "z"],
            )
        )
        # each (x<y<z) triangle supports its three edges
        sup = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .unionByName(
                tri.select(F.col("y").alias("a"), F.col("z").alias("b"))
            )
            .unionByName(
                tri.select(F.col("x").alias("a"), F.col("z").alias("b"))
            )
            .groupBy("a", "b")
            .agg(F.count("*").alias("_sup"))
        )
        kept = _ck_lazy_nostats(
            e.join(sup, ["a", "b"], "left")
            .where(F.coalesce(F.col("_sup"), F.lit(0)) >= thresh)
            .select("a", "b")
        )
        n_new = kept.count()
        if n_new == n:
            return kept
        e, n = kept, n_new
    raise RuntimeError(f"k_truss did not converge in {max_rounds} rounds")


def _double_sweep_local(pairs, seed_ids):
    """Sequential double sweep — the diameter small-core finisher
    (identical BFS levels and (distance, id) tie-breaks)."""
    from collections import deque

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def bfs(srcs):
        dist = {s: 0 for s in srcs if s in adj}
        dq = deque(dist)
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    d1 = bfs(set(seed_ids))
    far1 = max(d1, key=lambda v: (d1[v], -v))
    d2 = bfs({far1})
    far2 = max(d2, key=lambda v: (d2[v], -v))
    return d1[far1], d2[far2], far2


def double_sweep_diameter(
    edges: DataFrame,
    seed: DataFrame,
    max_depth: int = 32,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 100_000,
) -> DataFrame:
    """Double-sweep diameter estimate (Magnien/Latapy/Habib 2009) of the
    UNDIRECTED graph → one row (sweep1_ecc, diameter_lb, peripheral_id):
    BFS from a seed, restart from the farthest vertex found (ties by
    id), and report that vertex's eccentricity — a lower bound that is
    exact on trees and empirically tight on real graphs. Two
    ``bfs_distances`` runs — 2·O(diameter) supersteps — instead of the
    O(V) BFS sweeps exact diameter needs; THE scalable first question
    ("how wide is this graph?") asked of any new 100 TB edge set."""
    sym = _ck_lazy(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).unionByName(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        ).where(F.col("src") != F.col("dst")).distinct()
    )
    # small-core finisher: two BFS fixpoints of fixed job overhead cost
    # more than a one-task sweep below the threshold (same discipline as
    # MIS/coloring/k-truss/MST; both paths pytest-pinned equal)
    if sym.count() <= local_threshold:
        # orderBy before limit: without it the seed subset (and hence
        # the sweep-1 start) would depend on partition order.
        first = seed.columns[0]
        seed_ids = [r[0] for r in seed.orderBy(first).limit(1000).collect()]

        def _finish_sweep(batches):
            import pandas as pd

            pairs = []
            for b in batches:
                pairs.extend(zip(b["src"].tolist(), b["dst"].tolist()))
            e1, lb, pid = _double_sweep_local(pairs, seed_ids)
            return iter([pd.DataFrame(
                {"sweep1_ecc": [e1], "diameter_lb": [lb],
                 "peripheral_id": [pid]}
            )])

        id_t = dict(sym.dtypes)["src"]
        return sym.repartition(1).mapInPandas(
            _finish_sweep,
            f"sweep1_ecc long, diameter_lb long, peripheral_id {id_t}",
        )
    d1 = bfs_distances(sym, seed, max_depth=max_depth)
    far1 = (
        d1.orderBy(F.desc("distance"), F.asc("id")).limit(1)
        .localCheckpoint(eager=True)
    )
    ecc1 = far1.select(F.col("distance").alias("sweep1_ecc"))
    d2 = bfs_distances(sym, far1.select("id"), max_depth=max_depth)
    far2 = d2.orderBy(F.desc("distance"), F.asc("id")).limit(1)
    return (
        ecc1.crossJoin(
            far2.select(
                F.col("distance").alias("diameter_lb"),
                F.col("id").alias("peripheral_id"),
            )
        )
    )


def _ifub_local(pairs, seed_ids, max_ecc_bfs):
    """Sequential iFUB (Crescenzi/Grossi/Habib/Lanzi/Marino 2013) on an
    in-memory edge list → (lb, ub, exact, n_bfs). The small-core
    finisher for ``ifub_diameter``; IDENTICAL sweep seeds, midpoint
    choice, fringe order, AND probe-budget semantics (a fringe level the
    remaining budget cannot fully cover is skipped whole, never probed
    partway) as the distributed loop, so both paths return the same
    bounds for the same ``max_ecc_bfs`` — no separate default here."""
    from collections import deque

    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    if not adj:
        return 0, 0, True, 0

    def bfs(srcs):
        dist = {s: 0 for s in srcs if s in adj}
        dq = deque(dist)
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return dist

    n_bfs = 0
    # double sweep: seed -> a (farthest, ties by min id) -> b
    d0 = bfs(set(seed_ids))
    n_bfs += 1
    a = max(d0, key=lambda v: (d0[v], -v))
    d_a = bfs({a})
    n_bfs += 1
    b = max(d_a, key=lambda v: (d_a[v], -v))
    lb = d_a[b]
    d_b = bfs({b})
    n_bfs += 1
    # midpoint of the a-b shortest path: on-path (d_a+d_b == d(a,b))
    # at level d(a,b)//2 from a, ties by min id
    half = lb // 2
    on_path = [
        v for v in d_a
        if v in d_b and d_a[v] + d_b[v] == lb and d_a[v] == half
    ]
    w = min(on_path) if on_path else a
    d_w = bfs({w})
    n_bfs += 1
    ecc_w = max(d_w.values())
    lb = max(lb, ecc_w)
    ub = 2 * ecc_w
    levels: dict[int, list] = {}
    for v, d in d_w.items():
        levels.setdefault(d, []).append(v)
    i = ecc_w
    while lb < ub and i > 0 and n_bfs < max_ecc_bfs:
        level = sorted(levels.get(i, []))
        if len(level) > max_ecc_bfs - n_bfs:
            # budget cannot cover this whole level: bounds stay valid,
            # exactness unproven (mirrors the distributed loop exactly)
            break
        for v in level:
            dv = bfs({v})
            n_bfs += 1
            lb = max(lb, max(dv.values()))
        # every unprocessed vertex now sits at level <= i-1, so its
        # eccentricity is at most 2*(i-1) (triangle inequality via w)
        ub_next = 2 * (i - 1)
        if lb > ub_next:
            ub = lb
            break
        ub = min(ub, ub_next)
        i -= 1
    return lb, ub, lb >= ub, n_bfs


def ifub_diameter(
    edges: DataFrame,
    seed: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    local_threshold: int = 100_000,
    max_ecc_bfs: int = 16,
) -> DataFrame:
    """iFUB exact-diameter refinement of the double sweep → ONE row
    (diameter_lb, diameter_ub, exact, n_bfs) for the UNDIRECTED graph
    (the seed's component, like ``double_sweep_diameter``).

    iFUB's observation: after a BFS from a well-chosen root w (the
    midpoint of the double-sweep path), every vertex at BFS level ≤ i−1
    has eccentricity ≤ 2(i−1), so processing fringe levels top-down and
    keeping lb = max eccentricity seen certifies lb as the EXACT
    diameter the moment lb > 2(i−1) — on real graphs typically after a
    handful of BFS runs, vs the Θ(V) all-pairs sweeps exact diameter
    naively needs. Each eccentricity probe is one ``bfs_distances``
    fixpoint run to FRONTIER EXHAUSTION (max_depth=None) — a depth-capped
    BFS would truncate eccentricities and make ub=2·ecc_w an invalid
    upper bound, so there is deliberately no depth knob here.
    ``max_ecc_bfs`` caps the probe budget, and an exhausted budget
    returns exact=False with the bounds as-is — the bounds are always
    valid, exactness is what the budget buys. Below ``local_threshold``
    edges the IDENTICAL algorithm (same seeds, midpoint, fringe order,
    and budget semantics) runs sequentially in one task (pytest-pinned
    equal on path/star/tripartite fixtures, both paths)."""
    sym = _ck_lazy(
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).unionByName(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        ).where(F.col("src") != F.col("dst")).distinct()
    )
    if sym.count() <= local_threshold:
        first = seed.columns[0]
        seed_ids = [r[0] for r in seed.orderBy(first).limit(1000).collect()]

        def _finish_ifub(batches):
            import pandas as pd

            pairs = []
            for b_ in batches:
                pairs.extend(zip(b_["src"].tolist(), b_["dst"].tolist()))
            lb, ub, exact, nb = _ifub_local(pairs, seed_ids, max_ecc_bfs)
            return iter([pd.DataFrame(
                {"diameter_lb": [lb], "diameter_ub": [ub],
                 "exact": [bool(exact)], "n_bfs": [nb]}
            )])

        return sym.repartition(1).mapInPandas(
            _finish_ifub,
            "diameter_lb long, diameter_ub long, exact boolean, n_bfs long",
        )

    def _ecc_and_far(srcs: DataFrame):
        d = bfs_distances(sym, srcs, max_depth=None)
        far = (
            d.orderBy(F.desc("distance"), F.asc("id")).limit(1)
            .localCheckpoint(eager=True)
        )
        r = far.collect()[0]
        return d, int(r["distance"]), r["id"]

    n_bfs = 0
    _, _, a = _ecc_and_far(seed.select(F.col(seed.columns[0]).alias("id")))
    n_bfs += 1
    spark = edges.sparkSession
    d_a, lb, b = _ecc_and_far(spark.createDataFrame([(a,)], ["id"]))
    n_bfs += 1
    d_b, _, _ = _ecc_and_far(spark.createDataFrame([(b,)], ["id"]))
    n_bfs += 1
    half = lb // 2
    mid = (
        d_a.alias("x")
        .join(d_b.alias("y"), "id")
        .where(
            (F.col("x.distance") + F.col("y.distance") == F.lit(lb))
            & (F.col("x.distance") == F.lit(half))
        )
        .orderBy("id")
        .limit(1)
        .collect()
    )
    w = mid[0]["id"] if mid else a
    d_w, ecc_w, _ = _ecc_and_far(spark.createDataFrame([(w,)], ["id"]))
    n_bfs += 1
    d_w = _checkpointed(d_w)
    lb = max(lb, ecc_w)
    ub = 2 * ecc_w
    i = ecc_w
    while lb < ub and i > 0 and n_bfs < max_ecc_bfs:
        # fringe level i, ascending id (deterministic); each vertex is
        # one eccentricity probe. Fringe sizes are bounded-collected
        # only up to the probe budget — never an unbounded collect.
        fringe = [
            r["id"]
            for r in d_w.where(F.col("distance") == i)
            .orderBy("id")
            .limit(max_ecc_bfs - n_bfs + 1)
            .collect()
        ]
        if len(fringe) > max_ecc_bfs - n_bfs:
            # budget cannot cover this level: bounds stay valid,
            # exactness unproven
            break
        for v in fringe:
            _, ecc_v, _ = _ecc_and_far(spark.createDataFrame([(v,)], ["id"]))
            n_bfs += 1
            lb = max(lb, ecc_v)
        ub_next = 2 * (i - 1)
        if lb > ub_next:
            ub = lb
            break
        ub = min(ub, ub_next)
        i -= 1
    return spark.createDataFrame(
        [(lb, ub, lb >= ub, n_bfs)],
        "diameter_lb long, diameter_ub long, exact boolean, n_bfs long",
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    num_iter: int = 3,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank in FIXED-POINT integer arithmetic → (id, rank_fp) with
    rank_fp the scaled-integer rank after ``num_iter`` unrolled rounds —
    the hash-checkable witness for the float ``pagerank`` (g_pagerank,
    rows-only): every update is

        r'(v) = floor(scale·(1−d)) + Σ_{u→v} floor(d·r(u) / deg(u))

    with d = damp_num/damp_den applied as integer cross-multiplication
    (floor((num·r)/(den·deg)) over exact BIGINTs — identical in any
    engine), so an unrolled-CTE SQL oracle replays the whole trajectory
    value-for-value (the km2/cl1 treatment applied to PageRank; dangling
    mass simply evaporates — a documented, equally deterministic
    convention). Per round the plan is the float version's: edges ⋈
    ranks (one shuffle) → sum by dst (one shuffle) — nothing about
    fixed-point changes the 100 TB shape."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = int(scale * (damp_den - damp_num) // damp_den)
    if seeds is not None:
        # personalized variant: start mass and teleport land ONLY on the
        # seed set (PPR semantics) — same integer update otherwise
        seed_ids = seeds.select(F.col(seeds.columns[0]).alias("id"))
        is_seed = nodes.join(seed_ids, "id", "left_semi").withColumn(
            "_b", F.lit(base).cast("long")
        ).withColumn("_r0", F.lit(scale).cast("long"))
        base_df = nodes.join(is_seed.select("id", "_b", "_r0"), "id", "left")
        ranks = base_df.select(
            "id", F.coalesce(F.col("_r0"), F.lit(0)).cast("long").alias("rank_fp")
        )
        bases = base_df.select(
            "id", F.coalesce(F.col("_b"), F.lit(0)).cast("long").alias("_base")
        ).localCheckpoint(eager=True)
    else:
        ranks = nodes.withColumn("rank_fp", F.lit(scale).cast("long"))
        bases = nodes.withColumn("_base", F.lit(base).cast("long"))
    for _ in range(num_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(
                "dst",
                F.floor(
                    (F.lit(damp_num) * F.col("rank_fp")).cast("double")
                    / (F.lit(damp_den) * F.col("deg"))
                ).cast("long").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            bases.join(
                contrib.withColumnRenamed("dst", "id"), "id", "left"
            )
            .select(
                "id",
                (
                    F.col("_base")
                    + F.coalesce(F.col("in_sum"), F.lit(0))
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def hits_integer(
    edges: DataFrame,
    num_iter: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs/authorities WITHOUT per-round normalization →
    (id, hub_i, auth_i) integer scores after ``num_iter`` mutual-
    reinforcement rounds — the hash-checkable witness for the float
    ``hits`` (g_hits_parts, rows-only): starting from all-ones,
    a'(v) = Σ_{u→v} h(u) and h'(u) = Σ_{u→v} a'(v) are pure BIGINT
    sums, and since L2 normalization is a positive scalar per round the
    top-k ORDERING is identical to the normalized iteration — the
    witness checks the same ranking the production operator serves,
    with an unrolled-CTE oracle replaying every score exactly. Bounded:
    scores grow ≤ (max_deg²)^iter — two rounds on a degree-10⁴ graph
    stay < 2⁶³ with orders of magnitude to spare."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)
    hubs = (
        e.select(F.col("src").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("h", F.lit(1).cast("long"))
    )
    auths = None
    for _ in range(num_iter):
        auths = (
            e.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .withColumnRenamed("dst", "id")
            .localCheckpoint(eager=True)
        )
        hubs = (
            e.join(auths.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .withColumnRenamed("src", "id")
            .localCheckpoint(eager=True)
        )
    return (
        hubs.withColumnRenamed("id", "hid")
        .join(
            auths.withColumnRenamed("id", "hid"), "hid", "full"
        )
        .select(
            F.col("hid").alias("id"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub"),
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth"),
        )
    )
