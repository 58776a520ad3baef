"""Gremlin-ish fluent traversal layer compiling to DataFrame operations.

The reference executes standard Gremlin traversals with a custom bulk
VertexStep + label-pushdown strategy (TorcVertexStep.java:43-175,
TorcGraphProviderOptimizationStrategy.java:51-105). Here each step is one
DataFrame transform appended to a lazy plan, so the whole traversal compiles
to a single Catalyst plan — the strategy rewrite and frontier barrier are
subsumed by predicate pushdown and shuffle stages (SURVEY §3.1).

Covered step surface (SURVEY §2.4): V / out / in / both / outE / inE /
hasLabel / has / values / valueMap / dedup / count / order / limit /
groupCount / path-length bookkeeping via hop counters.

State of a traversal = a DataFrame with columns:
  _start  BINARY(16)  — origin vertex id
  _cur    BINARY(16)  — current element id (vertex) or edge row
plus optional hydrated columns. Terminal steps (toDF/count) hand back plain
DataFrames/values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from torcdb_spark.graph import PropertyGraph
from torcdb_spark.traverse import Direction


class GraphTraversal:
    def __init__(
        self,
        graph: PropertyGraph,
        frame: DataFrame,
        side_effects: dict | None = None,
    ):
        self._g = graph
        self._df = frame
        # Side-effect registry (store/aggregate … cap) scoped to THIS
        # traversal chain: every derived step shares the root's dict via
        # _spawn, so store→hop→cap composes, while two traversals rooted
        # at separate V()/E() calls on the same graph handle can never
        # see (or contaminate) each other's bags — and a chain abandoned
        # by an error drops its entries with the chain, no graph-handle
        # residue.
        self._sfx: dict = {} if side_effects is None else side_effects

    def _spawn(self, frame: DataFrame) -> "GraphTraversal":
        """Derive the next step: same graph handle, same chain-scoped
        side-effect registry."""
        return GraphTraversal(self._g, frame, self._sfx)

    # -- navigation steps ---------------------------------------------------

    def _hop(self, direction: Direction, *labels: str) -> "GraphTraversal":
        """One Gremlin hop = ONE join of the traversal frame against the
        label-filtered edge table — the frame appears exactly once in the
        resulting plan, so an n-hop traversal is a linear chain of n joins
        (the reference's per-step bulk fetch, TorcVertexStep.java:83-166).

        An earlier formulation derived a deduped frontier from the frame,
        ran ``traverse`` on it, and re-joined the result back to the frame;
        that references the upstream plan twice per hop, doubling work each
        step — quadratic-and-worse at depth. Gremlin semantics need no
        per-hop dedup anyway: one traverser per path, and edges are unique
        per (src, dst, label) (TorcGraph.java:74-78)."""
        if not labels:
            raise ValueError("edge label required (TorcGraph.java:853-859: "
                             "traversals must specify the edge label)")
        e = self._g.edges.where(F.col("label").isin(list(labels)))

        def orient(src_col: str, dst_col: str) -> DataFrame:
            return e.select(
                F.col(src_col).alias("_hop_src"), F.col(dst_col).alias("_nbr")
            )

        if direction == Direction.OUT:
            h = orient("src", "dst")
        elif direction == Direction.IN:
            h = orient("dst", "src")
        else:
            # BOTH: an edge is traversable from either endpoint; per-pair
            # dedup matches traverse()'s per-call dedup map semantics.
            # The deduped bidirectional set comes from the graph-level
            # cache so consecutive both() hops share one persisted copy
            # instead of re-shuffling the edge set per hop.
            h = self._g.both_edges(labels).select(
                F.col("near").alias("_hop_src"), F.col("far").alias("_nbr")
            )
        joined = self._df.join(h, self._df["_cur"] == h["_hop_src"])
        cols = [F.col("_start"), F.col("_nbr").alias("_cur"), *self._carry()]
        if "_path" in self._df.columns:
            cols.append(
                F.concat(F.col("_path"), F.array(F.col("_nbr"))).alias("_path")
            )
        return self._spawn(joined.select(*cols))

    def _carry(self) -> list[Column]:
        """Frame columns that ride along through hops: as_() step labels
        and the per-traverser sack value."""
        return [
            F.col(c)
            for c in self._df.columns
            if c.startswith("_as_") or c == "_sack"
        ]

    def out(self, *labels: str) -> "GraphTraversal":
        return self._hop(Direction.OUT, *labels)

    def in_(self, *labels: str) -> "GraphTraversal":
        return self._hop(Direction.IN, *labels)

    def both(self, *labels: str) -> "GraphTraversal":
        return self._hop(Direction.BOTH, *labels)

    # -- edge-valued steps (outE/inE … inV/outV, TorcVertexStep's edge mode,
    # TorcVertexStep.java:59-66 'returnClass Edge') ------------------------

    def _hop_e(self, direction: Direction, *labels: str) -> "GraphTraversal":
        """outE/inE: move the traverser onto the incident edges — the frame
        gains the far endpoint (`_edst`) and the edge property map
        (`_eprops`); `in_v`/`out_v` completes the hop."""
        if not labels:
            raise ValueError("edge label required (TorcGraph.java:853-859)")
        e = self._g.edges.where(F.col("label").isin(list(labels)))
        near, far = ("src", "dst") if direction == Direction.OUT else ("dst", "src")
        h = e.select(
            F.col(near).alias("_hop_src"),
            F.col(far).alias("_edst"),
            F.col("props").alias("_eprops"),
        )
        cols = [F.col("_start"), F.col("_cur"), F.col("_edst"),
                F.col("_eprops"), *self._carry()]
        if "_path" in self._df.columns:
            cols.append(F.col("_path"))
        joined = self._df.join(h, self._df["_cur"] == h["_hop_src"]).select(*cols)
        return self._spawn(joined)

    def out_e(self, *labels: str) -> "GraphTraversal":
        return self._hop_e(Direction.OUT, *labels)

    def in_e(self, *labels: str) -> "GraphTraversal":
        return self._hop_e(Direction.IN, *labels)

    def both_e(self, *labels: str) -> "GraphTraversal":
        """bothE: incident edges regardless of direction — TorcVertexStep's
        BOTH edge mode (TorcVertexStep.java:59-66). The two orientations are
        unioned; an edge between two frontier vertices yields one traverser
        per endpoint, matching TinkerPop (no per-pair dedup here — the edge
        is incident to each endpoint separately)."""
        if not labels:
            raise ValueError("edge label required (TorcGraph.java:853-859)")
        e = self._g.edges.where(F.col("label").isin(list(labels)))

        def orient(near: str, far: str) -> DataFrame:
            return e.select(
                F.col(near).alias("_hop_src"),
                F.col(far).alias("_edst"),
                F.col("props").alias("_eprops"),
            )

        h = orient("src", "dst").unionByName(orient("dst", "src"))
        cols = [F.col("_start"), F.col("_cur"), F.col("_edst"),
                F.col("_eprops"), *self._carry()]
        if "_path" in self._df.columns:
            cols.append(F.col("_path"))
        joined = self._df.join(h, self._df["_cur"] == h["_hop_src"]).select(*cols)
        return self._spawn(joined)

    def has_edge(self, key: str, predicate) -> "GraphTraversal":
        """Filter on an edge property of the current outE/inE frame;
        ``predicate`` maps the (string) property Column to a boolean Column
        — the Gremlin ``has`` on edges / removeEdgeIf analogue."""
        if "_eprops" not in self._df.columns:
            raise ValueError("has_edge requires a preceding out_e/in_e step")
        return self._spawn(self._df.where(predicate(F.col("_eprops")[key]))
        )

    def in_v(self) -> "GraphTraversal":
        """Move from edges to their far endpoint (inV after outE, outV
        after inE — the stored frame already holds the far side)."""
        if "_edst" not in self._df.columns:
            raise ValueError("in_v/out_v requires a preceding out_e/in_e step")
        cols = [F.col("_start"), F.col("_edst").alias("_cur"), *self._carry()]
        if "_path" in self._df.columns:
            cols.append(
                F.concat(F.col("_path"), F.array(F.col("_edst"))).alias("_path")
            )
        return self._spawn(self._df.select(*cols))

    out_v = in_v  # far endpoint of an in_e frame — same stored column

    # -- filter steps -------------------------------------------------------

    def has_label(self, *labels: str) -> "GraphTraversal":
        v = self._g.vertices.where(F.col("label").isin(list(labels))).select("id")
        out = self._df.join(v, self._df["_cur"] == v["id"], "left_semi")
        return self._spawn(out)

    def has(self, key: str, value) -> "GraphTraversal":
        v = self._g.vertices.where(
            F.col("props")[key] == F.lit(value).cast("string")
        ).select("id")
        out = self._df.join(v, self._df["_cur"] == v["id"], "left_semi")
        return self._spawn(out)

    _P_OPS = {
        "eq": lambda c, v: c == v,
        "neq": lambda c, v: c != v,
        "gt": lambda c, v: c > v,
        "gte": lambda c, v: c >= v,
        "lt": lambda c, v: c < v,
        "lte": lambda c, v: c <= v,
        "within": lambda c, v: c.isin(list(v)),
        "without": lambda c, v: ~c.isin(list(v)),
    }

    def has_p(
        self, key: str, op: str, value, cast: str | None = None
    ) -> "GraphTraversal":
        """``has(key, P.op(value))`` — TinkerPop's predicate-valued has:
        op ∈ {eq, neq, gt, gte, lt, lte, within, without}. ``cast`` coerces
        the stored string property before comparing (e.g. 'double' for
        numeric predicates — without it '9' > '100' lexically). Same
        semi-join shape as has(); the predicate pushes into the vertex
        scan."""
        if op not in self._P_OPS:
            raise ValueError(f"unknown predicate {op!r}; one of {sorted(self._P_OPS)}")
        col = F.col("props")[key]
        if cast:
            col = col.cast(cast)
        v = self._g.vertices.where(self._P_OPS[op](col, value)).select("id")
        out = self._df.join(v, self._df["_cur"] == v["id"], "left_semi")
        return self._spawn(out)

    def dedup(self) -> "GraphTraversal":
        return self._spawn(self._df.dropDuplicates(["_start", "_cur"]))

    # -- traversal-filter composition (where/and/or/not) --------------------

    def _match_set(self, step_fn) -> DataFrame:
        """Distinct current vertices from which ``step_fn``'s sub-traversal
        yields at least one traverser. The sub-traversal outcome depends
        only on the element it starts from, so it runs ONCE over the
        distinct ``_cur`` set (not per traverser) and the result drives a
        semi/anti join — set-at-a-time, like every other operator here."""
        seeds = self._df.select(F.col("_cur").alias("id")).dropDuplicates(["id"])
        sub = step_fn(self._spawn(seeds.select(F.col("id").alias("_start"), F.col("id").alias("_cur")),
        ))
        return sub._df.select(F.col("_start").alias("_m")).dropDuplicates(["_m"])

    def match_(self, *patterns) -> "GraphTraversal":
        """TinkerPop ``match()`` — conjunctive pattern matching over binder
        variables. Each pattern is ``(start, step_fn, end)``: a
        sub-traversal from the element bound to ``start`` whose results
        bind (or constrain) ``end``.

        Where TinkerPop solves match() with a runtime backtracking solver
        (MatchStep), here every pattern compiles to ONE distinct-seeded
        sub-traversal producing a (start, end) pair frame, and binding
        composition is plain equi-joins over the binder columns — so
        Catalyst cost-reorders the pattern joins, broadcasts small pair
        frames, and pushes filters across patterns; the optimizer IS the
        solver. New ``end`` variables multiply traversers per solution
        (TinkerPop multiplicity); already-bound ``end`` variables act as
        constraints (semi-join).

        ``start`` must be bound before its pattern runs (by ``as_`` or an
        earlier pattern in the same match) — the left-to-right evaluation
        TinkerPop documents for dependent patterns.
        """
        df = self._df
        for start, step_fn, end in patterns:
            ca, cb = f"_as_{start}", f"_as_{end}"
            if ca not in df.columns:
                raise ValueError(
                    f"match_ pattern start {start!r} is unbound; bind it "
                    "with as_() or an earlier pattern"
                )
            seeds = df.select(F.col(ca).alias("id")).dropDuplicates(["id"])
            sub = step_fn(self._spawn(seeds.select(F.col("id").alias("_start"),
                             F.col("id").alias("_cur")),
            ))
            pairs = sub._df.select(
                F.col("_start").alias("_pa"), F.col("_cur").alias("_pb")
            ).dropDuplicates(["_pa", "_pb"])
            if cb in df.columns:
                df = df.join(
                    pairs,
                    (df[ca] == pairs["_pa"]) & (df[cb] == pairs["_pb"]),
                    "left_semi",
                )
            else:
                df = (
                    df.join(pairs, df[ca] == pairs["_pa"], "inner")
                    .withColumn(cb, F.col("_pb"))
                    .drop("_pa", "_pb")
                )
        return self._spawn(df)

    def where_(self, step_fn) -> "GraphTraversal":
        """Gremlin ``where(traversal)``: keep traversers whose sub-traversal
        produces at least one result (TinkerPop filter semantics)."""
        m = self._match_set(step_fn)
        return self._spawn(self._df.join(m, self._df["_cur"] == m["_m"], "left_semi")
        )

    def not_(self, step_fn) -> "GraphTraversal":
        """Gremlin ``not(traversal)``: keep traversers whose sub-traversal
        is empty — compiles to a LEFT ANTI join."""
        m = self._match_set(step_fn)
        return self._spawn(self._df.join(m, self._df["_cur"] == m["_m"], "left_anti")
        )

    def and_(self, *step_fns) -> "GraphTraversal":
        """Gremlin ``and(a, b, …)``: every sub-traversal must match —
        a chain of semi-joins."""
        if not step_fns:
            raise ValueError("and_ requires at least one sub-traversal")
        t = self
        for fn in step_fns:
            t = t.where_(fn)
        return t

    def or_(self, *step_fns) -> "GraphTraversal":
        """Gremlin ``or(a, b, …)``: at least one sub-traversal matches —
        the union of the match sets drives one semi-join."""
        if not step_fns:
            raise ValueError("or_ requires at least one sub-traversal")
        m = self._match_set(step_fns[0])
        for fn in step_fns[1:]:
            m = m.unionByName(self._match_set(fn)).dropDuplicates(["_m"])
        return self._spawn(self._df.join(m, self._df["_cur"] == m["_m"], "left_semi")
        )

    # -- as()/select() step labels ------------------------------------------

    def as_(self, name: str) -> "GraphTraversal":
        """Label the current element (TinkerPop ``as('x')``) — materialized
        as an extra frame column, O(1) per traverser."""
        return self._spawn(self._df.withColumn(f"_as_{name}", F.col("_cur"))
        )

    def select_(self, name: str) -> "GraphTraversal":
        """``select('x')`` as a traversal step: jump the traverser back to
        the element labeled ``name`` (TinkerPop select-one semantics)."""
        col = f"_as_{name}"
        if col not in self._df.columns:
            raise ValueError(f"no as_({name!r}) label on this traversal")
        cols = [F.col(c) for c in self._df.columns if c != "_cur"]
        return self._spawn(self._df.select(*cols, F.col(col).alias("_cur"))
        )

    def select(self, *names: str) -> DataFrame:
        """Terminal multi-select: one column per label (TinkerPop
        ``select('a', 'b')`` projection of the path bindings)."""
        missing = [n for n in names if f"_as_{n}" not in self._df.columns]
        if missing:
            raise ValueError(f"no as_() label(s): {missing}")
        return self._df.select(
            *[F.col(f"_as_{n}").alias(n) for n in names]
        )

    # -- branch / loop / path steps ----------------------------------------

    def repeat(self, step_fn, times: int, emit: bool = False) -> "GraphTraversal":
        """Bounded ``repeat(...).times(n)``: apply ``step_fn`` (a
        GraphTraversal → GraphTraversal function) n times. Compiles to a
        LINEAR chain of n hop-joins in one Catalyst plan — no driver-side
        materialization between iterations, so at cluster scale each
        iteration is one shuffle stage, not a job barrier. (Unbounded
        ``until()`` loops are the analytics path: analytics.py's Pregel
        loop with per-superstep checkpoints.)

        ``emit=True`` pools every intermediate frontier into the result
        (TinkerPop ``repeat(..).emit()`` with emit-after semantics: levels
        1..n), still one lazy plan — a union of the n chain prefixes, each
        prefix shared structurally with the next."""
        if times < 0:
            raise ValueError("times must be >= 0")
        t = self
        levels = []
        for _ in range(times):
            t = step_fn(t)
            if emit:
                levels.append(t)
        if not emit:
            return t
        keep = ["_start", "_cur"] + [
            c for c in self._df.columns
            if c == "_path" or c.startswith("_as_")
        ]
        if not levels:
            # emit-after with 0 iterations yields no traversers (TinkerPop)
            return self._spawn(self._df.select(*keep).limit(0))
        out = levels[0]._df.select(*keep)
        for lv in levels[1:]:
            out = out.unionByName(lv._df.select(*keep))
        return self._spawn(out)

    def union(self, *step_fns) -> "GraphTraversal":
        """Gremlin ``union(a, b, ...)``: run each sub-traversal from the
        current frame and pool the traversers (bag semantics — duplicates
        kept, as in TinkerPop; follow with dedup() for set semantics).
        Path tracking (`_path`) and step labels (`_as_*`) present on the
        incoming frame survive the union — every step preserves them, so
        each branch frame still carries them."""
        if not step_fns:
            raise ValueError("union requires at least one sub-traversal")
        keep = ["_start", "_cur"] + [
            c for c in self._df.columns
            if c == "_path" or c.startswith("_as_")
        ]
        frames = [step_fn(self)._df.select(*keep) for step_fn in step_fns]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return self._spawn(out)

    def optional(self, step_fn) -> "GraphTraversal":
        """Gremlin ``optional(sub)``: traversers whose sub-traversal
        produces results follow it; the rest pass through unchanged.
        Compiled as sub-result ∪ (frame ⋉̸ matched-seeds) — two joins, no
        per-traverser execution."""
        m = self._match_set(step_fn)
        moved = step_fn(self.where_(step_fn))
        kept = self._spawn(self._df.join(m, self._df["_cur"] == m["_m"], "left_anti")
        )
        keep = [c for c in moved._df.columns if c in kept._df.columns]
        return self._spawn(moved._df.select(*keep).unionByName(kept._df.select(*keep)),
        )

    def coalesce_(self, *step_fns) -> "GraphTraversal":
        """Gremlin ``coalesce(a, b, …)``: each traverser follows the FIRST
        sub-traversal that yields results for it. Later branches run only
        over the seeds every earlier branch missed (anti-join cascade), so
        branch priority costs one extra join per branch, not a re-execution
        of the frame."""
        if not step_fns:
            raise ValueError("coalesce requires at least one sub-traversal")
        remaining = self
        outs = []
        for fn in step_fns[:-1]:
            outs.append(fn(remaining.where_(fn)))
            remaining = remaining.not_(fn)
        outs.append(step_fns[-1](remaining))
        keep = None
        for t in outs:
            cols = set(t._df.columns)
            keep = cols if keep is None else (keep & cols)
        keep = sorted(keep)
        out = outs[0]._df.select(*keep)
        for t in outs[1:]:
            out = out.unionByName(t._df.select(*keep))
        return self._spawn(out)

    def choose_(self, pred_fn, true_fn, false_fn) -> "GraphTraversal":
        """Gremlin ``choose(predicate, trueTraversal, falseTraversal)``:
        traversers whose ``pred_fn`` sub-traversal yields results follow
        ``true_fn``; the rest follow ``false_fn``. Compiled exactly like
        ``optional``: one semi/anti join pair splits the frame, each branch
        runs ONCE over its whole cohort (set-at-a-time, never
        per-traverser), results union on the common columns."""
        t_out = true_fn(self.where_(pred_fn))
        f_out = false_fn(self.not_(pred_fn))
        keep = sorted(set(t_out._df.columns) & set(f_out._df.columns))
        return self._spawn(t_out._df.select(*keep).unionByName(f_out._df.select(*keep)),
        )

    def tail_(self, n: int) -> "GraphTraversal":
        """``tail(n)``: the LAST n traversers of the current order — the
        mirror of ``limit``. Executes as a distributed top-n on the
        REVERSED sort key (TakeOrderedAndProject — the frame never
        collapses to one partition), so tail is as scale-safe as limit."""
        spec = self.__dict__.get("_order_spec") or [("_cur", True), ("_start", True)]
        rev = [F.col(c).desc() if asc else F.col(c).asc() for c, asc in spec]
        out = self._spawn(self._df.orderBy(*rev).limit(int(n)))
        out.__dict__["_order_cols"] = self.__dict__.get("_order_cols")
        out.__dict__["_order_spec"] = spec
        return out

    def sample_(self, n: int) -> "GraphTraversal":
        """``sample(n)``: n pseudo-random traversers. DELIBERATE deviation
        from TinkerPop: the sample is DETERMINISTIC (ordered by xxhash64 of
        the element id) so distributed re-execution — retries, speculative
        tasks, oracle comparison — sees the same rows; a seeded true-random
        sample cannot offer that across partition re-splits. Executes as a
        distributed top-n on the hash."""
        return self._spawn(self._df.orderBy(
                F.xxhash64(F.col("_cur")).asc(), F.col("_cur").asc()
            ).limit(int(n)),
        )

    def with_path(self) -> "GraphTraversal":
        """Enable path tracking: subsequent hops append the visited vertex
        to a `_path` array column (TinkerPop path()). Array length is
        bounded by hop count, so the per-traverser state stays O(depth)."""
        if "_path" in self._df.columns:
            return self
        return self._spawn(self._df.withColumn("_path", F.array(F.col("_cur")))
        )

    def simple_path(self) -> "GraphTraversal":
        """Keep only traversers whose path has no repeated vertex
        (Gremlin simplePath()). Requires with_path()."""
        if "_path" not in self._df.columns:
            raise ValueError("simple_path requires a preceding with_path()")
        return self._spawn(self._df.where(
                F.size(F.array_distinct(F.col("_path"))) == F.size(F.col("_path"))
            ),
        )

    def with_sack(self, init) -> "GraphTraversal":
        """``withSack(v)``: give every traverser a private sack value
        (TinkerPop SackValueStep family; inherited by the reference via
        gremlin-core 3.2.4). The sack is a frame column that rides
        through hops like as_() labels — pure per-row state, no shuffle
        of its own."""
        col = init if isinstance(init, Column) else F.lit(init)
        return self._spawn(self._df.withColumn("_sack", col)
        )

    def sack_(self, op: str, value: Column) -> "GraphTraversal":
        """``sack(op).by(value)``: fold ``value`` (any Column over the
        current frame — edge property, vertex id, literal) into each
        traverser's sack. ops: sum, minus, mult, div, min, max, mean,
        assign (the gremlin-core 3.2.4 Operator surface). A
        whole-stage-codegen expression per traverser."""
        if "_sack" not in self._df.columns:
            raise ValueError("sack_ requires a preceding with_sack()")
        s = F.col("_sack")
        ops = {
            "sum": s + value,
            "minus": s - value,
            "mult": s * value,
            "div": s / value,
            "min": F.least(s, value),
            "max": F.greatest(s, value),
            # TinkerPop Operator.mean folds a running mean; per-row that
            # is the midpoint fold mean(a,b) = (a+b)/2 — double
            # arithmetic, so pair with a double-typed with_sack.
            "mean": (s + value) / F.lit(2.0),
            "assign": value,
        }
        if op not in ops:
            raise ValueError(f"unknown sack op {op!r}; one of {sorted(ops)}")
        return self._spawn(self._df.withColumn("_sack", ops[op])
        )

    def sack(self) -> DataFrame:
        """Terminal ``sack()``: one row per traverser with its sack
        value (start, cur, sack)."""
        if "_sack" not in self._df.columns:
            raise ValueError("sack requires a preceding with_sack()")
        return self._df.select(
            F.col("_start").alias("start"),
            F.col("_cur").alias("cur"),
            F.col("_sack").alias("sack"),
        )

    def cyclic_path(self) -> "GraphTraversal":
        """Keep only traversers whose path REVISITS a vertex (Gremlin
        cyclicPath()) — the exact complement of ``simple_path``; their
        union partitions the path-tracked frame (pytest-pinned in
        tests/test_gremlin.py). Requires with_path(). Inherited by the
        reference via gremlin-core 3.2.4 (pom.xml:17-20,
        CyclicPathStep)."""
        if "_path" not in self._df.columns:
            raise ValueError("cyclic_path requires a preceding with_path()")
        return self._spawn(self._df.where(
                F.size(F.array_distinct(F.col("_path"))) < F.size(F.col("_path"))
            ),
        )

    def coin(self, p: float, seed: int = 0) -> "GraphTraversal":
        """``coin(p)``: keep each traverser with probability p. DELIBERATE
        deviation from TinkerPop (same rationale as ``sample_``): the coin
        is a DETERMINISTIC xxhash64 threshold on the traverser's current
        vertex + seed, so retries, speculative tasks, and oracle
        comparison all see the identical subset — a true random draw
        cannot survive partition re-splits. Pure per-row JVM expression;
        no shuffle."""
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"coin probability must be in [0,1], got {p}")
        bucket = F.pmod(
            F.xxhash64(F.col("_cur"), F.lit(int(seed))), F.lit(1_000_000)
        )
        return self._spawn(self._df.where(bucket < F.lit(int(round(p * 1_000_000))))
        )

    def local_(self, step_fn, limit_per: int | None = None) -> "GraphTraversal":
        """``local(sub)``: apply a sub-traversal to each traverser as an
        isolated unit (TinkerPop LocalStep). The common composition —
        ``local(out(...).limit(n))`` — needs the limit scoped PER parent
        traverser, not globally; pass the unlimited sub-step plus
        ``limit_per=n``. Executes as the sub-traversal's join chain with
        the parent vertex riding along, then one rank-filter window per
        parent (Catalyst's WindowGroupLimit pushes the top-n into the
        shuffle, so no group ever materializes fully — scale-safe where
        TinkerPop's per-traverser iteration is inherently serial).
        Deterministic order: results ranked by current-vertex id."""
        parent = "_as___local"
        tagged = self._spawn(self._df.withColumn(parent, F.col("_cur"))
        )
        sub = step_fn(tagged)
        out = sub._df
        if limit_per is not None:
            # Rank by (_cur, _start) THEN every other carried column
            # (_as_* labels, _sack, _path): a parent can reach the same
            # current vertex via traversers that differ only in carried
            # state, and without the full key the row_number tie-break —
            # hence which carried values survive the cut — would depend
            # on partition order.
            tiebreak = [
                F.col(c).asc()
                for c, t in sorted(out.dtypes)
                if c not in ("_cur", "_start", parent)
                and not t.startswith("map")  # maps aren't orderable
            ]
            w = Window.partitionBy(parent).orderBy(
                F.col("_cur").asc(), F.col("_start").asc(), *tiebreak
            )
            out = (
                out.withColumn("_lrn", F.row_number().over(w))
                .where(F.col("_lrn") <= int(limit_per))
                .drop("_lrn")
            )
        return self._spawn(out.drop(parent))

    # -- side-effect collections (store/aggregate … cap, TinkerPop
    # StoreStep/AggregateStep/SideEffectCapStep — inherited by the
    # reference via gremlin-core 3.2.4, pom.xml:17-20) ---------------------

    def _side_effects(self) -> dict:
        # Side-effect registry scoped to the ROOT TRAVERSAL CHAIN (the
        # dict every _spawn-derived step shares), NOT the graph handle:
        # store→hop→cap composes along a chain, while separate V()/E()
        # roots on the same graph — including concurrent ones — can
        # never union stale or foreign frontiers into a cap_ result,
        # and a chain abandoned mid-query drops its entries with it.
        return self._sfx

    def store_(self, name: str) -> "GraphTraversal":
        """``store(x)``: lazily add the current vertices to side-effect
        bag ``x`` (duplicates kept, TinkerPop bag semantics) and continue
        unchanged. Nothing materializes until ``cap_`` — the bag is a
        lazy DataFrame union, so storing at three points of a chain
        costs three plan branches, not three jobs."""
        reg = self._side_effects()
        cur = self._df.select(F.col("_cur").alias("value"))
        reg[name] = reg[name].unionAll(cur) if name in reg else cur
        return self

    def aggregate_(self, name: str) -> "GraphTraversal":
        """``aggregate(x)``: like ``store`` but set-semantics (deduped) —
        the eager-barrier nuance of TinkerPop's AggregateStep is moot
        here because the whole chain is one lazy Catalyst plan."""
        reg = self._side_effects()
        cur = self._df.select(F.col("_cur").alias("value"))
        reg[name] = (
            reg[name].unionAll(cur) if name in reg else cur
        ).dropDuplicates(["value"])
        return self

    def cap_(self, name: str, keep: bool = False) -> DataFrame:
        """``cap(x)``: emit side-effect collection ``x``. DELIBERATE
        deviation from TinkerPop, which emits ONE traverser holding the
        entire collection — a driver-sized object that cannot scale; the
        unfolded one-row-per-element frame (= ``cap(x).unfold()``) is the
        distributed representation. Pops the entry unless ``keep=True``;
        the registry itself is chain-scoped (see ``_side_effects``), so
        names can never leak across root traversals anyway."""
        reg = self._side_effects()
        if name not in reg:
            raise KeyError(f"no side-effect collection named {name!r}")
        return reg.pop(name) if not keep else reg[name]

    def path(self) -> DataFrame:
        """Terminal path(): the full visited-vertex array per traverser."""
        if "_path" not in self._df.columns:
            raise ValueError("path requires a preceding with_path()")
        return self._df.select(
            F.col("_start").alias("start"), F.col("_path").alias("path")
        )

    def tree(self) -> DataFrame:
        """Terminal ``tree()`` (TinkerPop TreeStep, gremlin-core 3.2.4):
        the traversal paths aggregated into their prefix tree. DELIBERATE
        deviation from TinkerPop's single driver-sized nested-Map
        traverser (the same scaling rationale as ``cap_``): the
        distributed representation is one row per TREE NODE —
        ``(depth, node, parent, n_traversers)`` where a node is a path
        prefix's last vertex, parent its predecessor (NULL at the root),
        and n_traversers how many walks pass through that prefix.
        Exactly the information in the nested map, flattened. One
        explode over the bounded-by-hop-count path array + one groupBy —
        no joins, no driver materialization. Requires with_path()."""
        if "_path" not in self._df.columns:
            raise ValueError("tree requires a preceding with_path()")
        # posexplode gives (depth idx, node); the parent is path[idx-1].
        # Group by the full PREFIX (two walks sharing only a suffix are
        # different tree nodes), represented as the sliced array.
        node = self._df.select(
            F.posexplode(F.col("_path")).alias("_d", "_node"),
            F.col("_path"),
        ).select(
            F.col("_d"),
            F.slice(F.col("_path"), 1, F.col("_d") + 1).alias("_prefix"),
        )
        return (
            node.groupBy("_prefix")
            .agg(F.count("*").alias("n_traversers"))
            .select(
                (F.size("_prefix") - 1).alias("depth"),
                F.element_at("_prefix", -1).alias("node"),
                F.when(
                    F.size("_prefix") > 1, F.element_at("_prefix", -2)
                ).alias("parent"),
                "n_traversers",
            )
        )

    def barrier(self) -> "GraphTraversal":
        """``barrier()`` (TinkerPop NoOpBarrierStep): collect all
        traversers before continuing. API parity only — every step here
        already executes set-at-a-time over the whole frame (the lazy
        Catalyst plan IS one global barrier per shuffle), so there is
        nothing to synchronize; returns the traversal unchanged, exactly
        like TinkerPop's strategy-inserted no-op barriers."""
        return self

    # -- terminal steps -----------------------------------------------------

    def values(self, key: str) -> DataFrame:
        v = self._g.vertices.select("id", F.col("props")[key].alias(key))
        return (
            self._df.join(v, self._df["_cur"] == v["id"])
            .select(F.col("_start").alias("start"), F.col(key))
        )

    def value_map(self) -> DataFrame:
        return (
            self._df.join(self._g.vertices, self._df["_cur"] == F.col("id"))
            .select(
                F.col("_start").alias("start"),
                F.col("id"),
                F.col("label"),
                F.col("props"),
            )
        )

    def group_count(self) -> DataFrame:
        """groupCount() by current vertex — (id, count)."""
        return (
            self._df.groupBy(F.col("_cur").alias("id"))
            .agg(F.count("*").cast("long").alias("count"))
        )

    def group_by_values(
        self, key: str, agg: str = "count", cast: str | None = None
    ) -> DataFrame:
        """``group().by('prop')`` with a value modulator: group traversers
        by a property of the current vertex. ``agg='count'`` is
        ``.by(count())`` → (group_key, n); ``agg='fold'`` is the default
        ``.by(fold())`` → (group_key, sorted array of element ids) —
        sorted so the grouped value is deterministic (TinkerPop's list
        order is stream order, which a distributed shuffle does not have).
        One hydration join + one shuffle on the group key."""
        v = self._g.vertices.select("id", F.col("props")[key].alias("_grp"))
        gcol = F.col("_grp").cast(cast) if cast else F.col("_grp")
        joined = self._df.join(v, self._df["_cur"] == v["id"])
        grouped = joined.groupBy(gcol.alias("group_key"))
        if agg == "count":
            return grouped.agg(F.count("*").cast("long").alias("n"))
        if agg == "fold":
            return grouped.agg(
                F.array_sort(F.collect_list(F.col("_cur"))).alias("members")
            )
        raise ValueError(f"unsupported group modulator {agg!r}")

    def project_(self, **clauses) -> DataFrame:
        """TinkerPop ``project('a','b').by(...)``: one output row per
        traverser with one column per clause. Each clause value is either

        - a property key string (optionally ``'key:cast'``) → hydrated from
          the current vertex in ONE shared join across all property
          clauses, or
        - a sub-traversal callable → ``by(sub.count())``: the sub-traversal
          runs ONCE over the distinct current-vertex set (set-at-a-time,
          like where_/optional), aggregated to a per-seed count and left-
          joined back (missing → 0).

        Columns: (start, current, *clauses)."""
        out = self._df.select(
            F.col("_start").alias("start"), F.col("_cur").alias("current")
        )
        prop_clauses = {
            n: v for n, v in clauses.items() if isinstance(v, str)
        }
        if prop_clauses:
            sel = [F.col("id").alias("_pid")]
            for name, spec in prop_clauses.items():
                key, _, cast = spec.partition(":")
                col = F.col("props")[key]
                sel.append((col.cast(cast) if cast else col).alias(name))
            v = self._g.vertices.select(*sel)
            out = out.join(v, out["current"] == v["_pid"], "left").drop("_pid")
        for name, fn in clauses.items():
            if isinstance(fn, str):
                continue
            seeds = self._df.select(F.col("_cur").alias("id")).dropDuplicates(["id"])
            sub = fn(self._spawn(seeds.select(F.col("id").alias("_start"), F.col("id").alias("_cur")),
            ))
            cnt = sub._df.groupBy(F.col("_start").alias("_sid")).agg(
                F.count("*").cast("long").alias(name)
            )
            out = (
                out.join(cnt, out["current"] == cnt["_sid"], "left")
                .drop("_sid")
                .withColumn(name, F.coalesce(F.col(name), F.lit(0).cast("long")))
            )
        return out

    def values_stats(self, key: str, cast: str = "double") -> DataFrame:
        """The numeric terminals ``sum()/min()/max()/mean()`` over a
        property of the current vertices, as one single-row frame
        (sum_v, min_v, max_v, mean_v) — one hydration join + one global
        aggregate (map-side partials, no shuffle wider than one row)."""
        v = self._g.vertices.select("id", F.col("props")[key].alias("_val"))
        val = F.col("_val").cast(cast)
        joined = self._df.join(v, self._df["_cur"] == v["id"])
        return joined.agg(
            F.sum(val).alias("sum_v"),
            F.min(val).alias("min_v"),
            F.max(val).alias("max_v"),
            F.avg(val).alias("mean_v"),
        )

    def range_(self, low: int, high: int) -> "GraphTraversal":
        """``range(low, high)``: traversers [low, high) of the current
        order. TinkerPop's range is stream-ordered; the distributed frame
        has no stream, so the order is the preceding ``order_by_values``
        sort key (tracked on the frame) with the element id as tie-break —
        a total, deterministic order. Scale shape: a distributed top-high
        (TakeOrderedAndProject via orderBy+limit), then a row_number window
        over only those ``high`` rows — the full frame never collapses to
        one partition when ``high`` is bounded. ``skip(n)`` (``high=None``)
        has no such bound and pays a global window — inherent to unbounded
        offset semantics, bound ``high`` where scale matters."""
        order_cols = self.__dict__.get("_order_cols") or [
            F.col("_cur").asc(), F.col("_start").asc()
        ]
        if high is not None:
            bounded = self._df.orderBy(*order_cols).limit(int(high))
        else:
            bounded = self._df
        if low <= 0 and high is None:
            return self._spawn(bounded)
        w = Window.orderBy(*order_cols)
        df = (
            bounded.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > int(low))
            .drop("_rn")
        )
        return self._spawn(df)

    def skip(self, n: int) -> "GraphTraversal":
        """``skip(n)`` — TinkerPop alias for range(n, -1)."""
        return self.range_(n, None)

    def order_by(self, col: Column | str, ascending: bool = True) -> "GraphTraversal":
        df = self._df.orderBy(F.asc(col) if ascending else F.desc(col))
        return self._spawn(df)

    def order_by_values(
        self, key: str, ascending: bool = True, cast: str | None = None
    ) -> "GraphTraversal":
        """``order().by('prop')`` — order traversers by a property of the
        current vertex (TinkerPop by(key) modulator). One hydration join,
        then a sort; ties broken by the element id so the order is total
        and deterministic. ``cast`` coerces the stored string value
        (e.g. 'double' for numeric sorts)."""
        v = self._g.vertices.select("id", F.col("props")[key].alias("_ord"))
        val = F.col("_ord").cast(cast) if cast else F.col("_ord")
        joined = self._df.join(v, self._df["_cur"] == v["id"])
        df = joined.orderBy(
            val.asc() if ascending else val.desc(), F.col("_cur").asc()
        ).select(*[F.col(c) for c in self._df.columns], val.alias("_ordval"))
        t = self._spawn(df)
        # remember the sort key so a following range_()/skip() slices by it
        t._order_cols = [
            F.col("_ordval").asc() if ascending else F.col("_ordval").desc(),
            F.col("_cur").asc(),
        ]
        t._order_spec = [("_ordval", ascending), ("_cur", True)]
        return t

    def limit(self, n: int) -> "GraphTraversal":
        return self._spawn(self._df.limit(n))

    def count(self) -> int:
        return self._df.count()

    def to_df(self) -> DataFrame:
        return self._df.select(
            F.col("_start").alias("start"), F.col("_cur").alias("current")
        )


class G:
    """Entry point: ``G(graph).V().has_label("customer").out("placed")…``"""

    def __init__(self, graph: PropertyGraph):
        self._g = graph

    def V(self, *ids: bytes) -> GraphTraversal:
        v = self._g.vertices_by_id(list(ids)).select("id")
        frame = v.select(F.col("id").alias("_start"), F.col("id").alias("_cur"))
        # Root of a chain: fresh side-effect registry (chain-scoped).
        return GraphTraversal(self._g, frame)

    def E(self, *labels: str) -> GraphTraversal:
        """``g.E([label…])``: start the traversal AT the edges (TinkerPop
        GraphStep over edges). The frame is shaped exactly like an ``out_e``
        step's (near endpoint as ``_cur``, far as ``_edst``, properties as
        ``_eprops``) so every edge-step — ``has_edge``, ``in_v``/``out_v``
        — composes unchanged; an unlabeled E() scans all labels (the
        label-partitioned store prunes when labels are given)."""
        e = self._g.edges
        if labels:
            e = e.where(F.col("label").isin(list(labels)))
        frame = e.select(
            F.col("src").alias("_start"),
            F.col("src").alias("_cur"),
            F.col("dst").alias("_edst"),
            F.col("props").alias("_eprops"),
        )
        # Root of a chain: fresh side-effect registry (chain-scoped).
        return GraphTraversal(self._g, frame)
