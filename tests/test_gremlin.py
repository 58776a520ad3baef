"""Fluent Gremlin-ish layer tests vs direct SQL on the fixtures."""

import duckdb
import pytest

from torcdb_spark.gremlin import G
from torcdb_spark.graph import LABEL_TAGS
from torcdb_spark.ids import uint128_pair


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_v_out_count(graph, ddb):
    n = G(graph).V().has_label("customer").out("placed").count()
    exp = ddb.sql("select count(*) from orders").fetchone()[0]
    assert n == exp


def test_v_ids_out_values(graph, ddb):
    cid = uint128_pair(LABEL_TAGS["customer"], 1)
    vals = G(graph).V(cid).out("placed").values("o_orderstatus").collect()
    exp = ddb.sql(
        "select o_orderstatus, count(*) from orders where o_custkey=1 group by 1"
    ).fetchall()
    got = {}
    for r in vals:
        got[r.o_orderstatus] = got.get(r.o_orderstatus, 0) + 1
    assert got == dict(exp)


def test_has_filter_pushes_into_traversal(graph, ddb):
    n = (
        G(graph)
        .V()
        .has_label("customer")
        .has("c_mktsegment", "BUILDING")
        .out("placed")
        .count()
    )
    exp = ddb.sql(
        """select count(*) from orders join customer on c_custkey=o_custkey
           where c_mktsegment='BUILDING'"""
    ).fetchone()[0]
    assert n == exp


def test_in_traversal(graph, ddb):
    nid = uint128_pair(LABEL_TAGS["nation"], 3)
    n = G(graph).V(nid).in_("fromNation").count()
    exp = ddb.sql("select count(*) from customer where c_nationkey=3").fetchone()[0]
    assert n == exp


def test_two_hop_dedup_group_count(graph, ddb):
    cid = uint128_pair(LABEL_TAGS["customer"], 2)
    out = (
        G(graph).V(cid).out("placed").out("contains").dedup().group_count()
    )
    total = sum(r["count"] for r in out.collect())
    exp = ddb.sql(
        """select count(*) from lineitem join orders on l_orderkey=o_orderkey
           where o_custkey=2"""
    ).fetchone()[0]
    assert total == exp


def test_missing_edge_label_raises(graph):
    with pytest.raises(ValueError):
        G(graph).V().out()


def test_repeat_equals_unrolled(graph):
    base = G(graph).V().has_label("customer")
    unrolled = base.out("placed").out("contains").count()
    repeated = (
        G(graph).V().has_label("customer")
        .repeat(lambda t: t, 0)  # identity
        .out("placed").out("contains")
        .count()
    )
    assert unrolled == repeated
    # a 2-times repeat of alternating labels is illegal (labels differ), but
    # both(fromNation) twice is the canonical homogeneous loop
    two = G(graph).V().has_label("customer").repeat(
        lambda t: t.both("fromNation"), 2
    ).count()
    man = (
        G(graph).V().has_label("customer")
        .both("fromNation").both("fromNation").count()
    )
    assert two == man


def test_union_is_bag_sum(graph, ddb):
    n = (
        G(graph).V().has_label("customer")
        .union(lambda t: t.out("placed"), lambda t: t.out("fromNation"))
        .count()
    )
    orders = ddb.sql("select count(*) from orders").fetchone()[0]
    custs = ddb.sql("select count(*) from customer").fetchone()[0]
    assert n == orders + custs  # every customer has exactly one nation edge


def test_simple_path_removes_backtracks(graph, ddb):
    cid = uint128_pair(LABEL_TAGS["customer"], 1)
    t = G(graph).V(cid).with_path().both("fromNation").both("fromNation")
    all_n = t.count()
    simple_n = t.simple_path().count()
    same_nation = ddb.sql(
        """select count(*) from customer c2 join customer c1
             on c1.c_custkey=1 and c2.c_nationkey=c1.c_nationkey"""
    ).fetchone()[0]
    assert all_n == same_nation
    assert simple_n == same_nation - 1  # drops the start-revisit path


def test_path_terminal_shape(graph):
    cid = uint128_pair(LABEL_TAGS["customer"], 1)
    rows = (
        G(graph).V(cid).with_path().out("fromNation").path().collect()
    )
    assert len(rows) == 1
    assert len(rows[0].path) == 2  # [start, nation]


# ---------------------------------------------------------------------------
# Round-2 step completeness: bothE, where/and/or/not, as/select,
# order().by(property), path across union
# ---------------------------------------------------------------------------


def test_both_e_sees_both_orientations(spark, graph):
    from torcdb_spark.gremlin import G

    n_nation = graph.vertices.where("label='nation'").count()
    t = G(graph).V().has_label("nation", "region").both_e("inRegion")
    # each nation contributes 1 (src side), each region its member nations
    assert t.count() == 2 * n_nation


def test_where_and_or_not(spark, graph):
    import pyspark.sql.functions as F
    from torcdb_spark.gremlin import G

    base = G(graph).V().has_label("customer")
    n_total = base.count()
    with_orders = base.where_(lambda t: t.out("placed")).count()
    without = base.not_(lambda t: t.out("placed")).count()
    assert with_orders + without == n_total
    # and_ of the same predicate twice == where_ once
    assert base.and_(
        lambda t: t.out("placed"), lambda t: t.out("placed")
    ).count() == with_orders
    # or_ of (has orders, has no orders) == everything
    assert base.or_(
        lambda t: t.out("placed"),
        lambda t: t.not_(lambda u: u.out("placed")),
    ).count() == n_total


def test_as_select_roundtrip(spark, graph):
    from torcdb_spark.gremlin import G
    import pyspark.sql.functions as F

    sel = (
        G(graph).V().has_label("nation").as_("n")
        .out("inRegion").as_("r")
        .select("n", "r")
    )
    rows = sel.count()
    assert rows == graph.vertices.where("label='nation'").count()
    # select_ jumps the traverser back: n -> r -> back to n
    t = (
        G(graph).V().has_label("nation").as_("n")
        .out("inRegion").select_("n")
    )
    got = t.to_df().select("current").dropDuplicates().count()
    assert got == rows


def test_order_by_values_with_tiebreak(spark, graph):
    from torcdb_spark.gremlin import G
    from torcdb_spark.ids import id_lower
    import pyspark.sql.functions as F

    t = (
        G(graph).V().has_label("customer")
        .order_by_values("c_acctbal", ascending=False, cast="double")
        .limit(5)
    )
    got = {r.k for r in t._df.select(id_lower(F.col("_cur")).alias("k")).collect()}
    exp_df = (
        graph.vertices.where("label='customer'")
        .select(
            id_lower(F.col("id")).alias("k"),
            F.col("props")["c_acctbal"].cast("double").alias("b"),
        )
        .orderBy(F.desc("b"), F.asc("k"))
        .limit(5)
    )
    assert got == {r.k for r in exp_df.collect()}


def test_path_survives_union_and_as_labels(spark, graph):
    from torcdb_spark.gremlin import G

    t = (
        G(graph).V().has_label("nation").with_path().as_("n")
        .union(lambda x: x.in_("fromNation"), lambda x: x.in_("suppFromNation"))
    )
    df = t._df
    assert "_path" in df.columns and "_as_n" in df.columns
    p = t.path()
    sizes = {r[0] for r in p.select(__import__("pyspark.sql.functions", fromlist=["size"]).size("path")).distinct().collect()}
    assert sizes == {2}


def test_optional_moves_matched_keeps_rest(spark, graph):
    from torcdb_spark.gremlin import G

    base = G(graph).V().has_label("customer")
    n_total = base.count()
    n_with = base.where_(lambda t: t.out("placed")).count()
    opt = base.optional(lambda t: t.out("placed"))
    # movers produce one traverser per order; non-movers pass through
    n_orders_of_with = base.where_(lambda t: t.out("placed")).out("placed").count()
    assert opt.count() == n_orders_of_with + (n_total - n_with)


def test_coalesce_branch_priority(spark, graph):
    import pyspark.sql.functions as F
    from torcdb_spark.gremlin import G
    from torcdb_spark.ids import id_lower

    base = G(graph).V().has_label("customer")
    n_total = base.count()
    n_with = base.where_(lambda t: t.out("placed")).count()
    # first branch: orders; fallback: stay via nation hop (every customer
    # has a fromNation edge) — result = orders for buyers, nations for rest
    co = base.coalesce_(
        lambda t: t.out("placed"),
        lambda t: t.out("fromNation"),
    )
    n_orders_of_with = base.where_(lambda t: t.out("placed")).out("placed").count()
    assert co.count() == n_orders_of_with + (n_total - n_with)
    # fallback rows end on nation vertices
    ends = co.to_df().select("current")
    nation_ids = graph.vertices.where("label='nation'").select(
        F.col("id").alias("current")
    )
    n_nation_ends = ends.join(nation_ids, "current", "left_semi").count()
    assert n_nation_ends == n_total - n_with


def test_repeat_emit_pools_levels(spark, graph):
    from torcdb_spark.gremlin import G

    base = G(graph).V().has_label("nation")
    l1 = base.in_("fromNation").count()            # customers (level 1)
    l2 = base.in_("fromNation").out("placed").count()  # their orders (2)
    # heterogeneous chain via a stateful step fn: level 1 hops fromNation,
    # level 2 hops placed
    calls = {"n": 0}

    def step(t):
        calls["n"] += 1
        return t.in_("fromNation") if calls["n"] == 1 else t.out("placed")

    emitted = base.repeat(step, 2, emit=True)
    assert emitted.count() == l1 + l2
    # emit=False returns only the final level
    calls["n"] = 0
    assert base.repeat(step, 2).count() == l2
    # emit-after with 0 iterations yields no traversers (TinkerPop); with
    # emit=False it is the identity traversal
    assert base.repeat(step, 0, emit=True).count() == 0
    assert base.repeat(step, 0).count() == base.count()


def test_group_fold_members_sorted(graph, ddb):
    """group().by(prop).by(fold()): member arrays are the sorted element
    ids — cross-checked against SQL string_agg per group."""
    from torcdb_spark.ids import id_lower
    import pyspark.sql.functions as F

    ids = [uint128_pair(LABEL_TAGS["customer"], k) for k in range(1, 21)]
    got = (
        G(graph).V(*ids).out("placed")
        .group_by_values("o_orderstatus", agg="fold")
    )
    rows = {
        r.group_key: [int.from_bytes(m[8:], "big") for m in r.members]
        for r in got.collect()
    }
    exp = ddb.sql(
        """SELECT o_orderstatus, list(o_orderkey ORDER BY o_orderkey)
           FROM orders WHERE o_custkey BETWEEN 1 AND 20 GROUP BY 1"""
    ).fetchall()
    assert rows == {k: list(v) for k, v in exp}


def test_range_and_skip_slices(graph, ddb):
    ids = [uint128_pair(LABEL_TAGS["customer"], k) for k in range(1, 21)]
    base = (
        G(graph).V(*ids).out("placed")
        .order_by_values("o_totalprice", ascending=False, cast="double")
    )
    exp = [
        r[0] for r in ddb.sql(
            """SELECT o_orderkey FROM orders WHERE o_custkey BETWEEN 1 AND 20
               ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey"""
        ).fetchall()
    ]
    got = [
        int.from_bytes(r._cur[8:], "big")
        for r in base.range_(3, 8)._df.collect()
    ]
    assert sorted(got) == sorted(exp[3:8])
    # skip(n) == range(n, None): everything after the first n
    got_skip = {
        int.from_bytes(r._cur[8:], "big")
        for r in base.skip(5)._df.collect()
    }
    assert got_skip == set(exp[5:])


def test_choose_branches_cover_frame(spark, sf_dir):
    """choose(pred, t, f): every traverser follows exactly one branch."""
    from torcdb_spark.gremlin import G
    from torcdb_spark.graph import PropertyGraph, LABEL_TAGS
    from torcdb_spark.ids import uint128_pair
    import pyspark.sql.functions as F

    g = PropertyGraph.open(spark, sf_dir)
    ids = [uint128_pair(LABEL_TAGS["customer"], k) for k in range(1, 21)]
    base = G(g).V(*ids)
    pred = lambda s: s.out("placed").has("o_orderstatus", "F")
    chosen = base.choose_(pred, lambda s: s.out("placed"), lambda s: s)
    n_true_seeds = base.where_(pred).count()
    n_false_seeds = base.not_(pred).count()
    assert n_true_seeds + n_false_seeds == 20
    n_true_out = base.where_(pred).out("placed").count()
    assert chosen.count() == n_true_out + n_false_seeds


def test_tail_is_reverse_of_limit(spark, sf_dir):
    from torcdb_spark.gremlin import G
    from torcdb_spark.graph import PropertyGraph

    g = PropertyGraph.open(spark, sf_dir)
    asc = (
        G(g).V().has_label("region")
        .order_by_values("r_name", ascending=True, cast=None)
    )
    all_rows = [r.current for r in asc.to_df().collect()]
    tail2 = {r.current for r in asc.tail_(2).to_df().collect()}
    # last 2 of the ascending order (order_by_values ties broken by id)
    assert tail2 == set(all_rows[-2:])


def test_sample_deterministic_subset(spark, sf_dir):
    from torcdb_spark.gremlin import G
    from torcdb_spark.graph import PropertyGraph

    g = PropertyGraph.open(spark, sf_dir)
    s1 = {r.current for r in G(g).V().has_label("customer").sample_(5).to_df().collect()}
    s2 = {r.current for r in G(g).V().has_label("customer").sample_(5).to_df().collect()}
    assert s1 == s2 and len(s1) == 5
    allc = {r.current for r in G(g).V().has_label("customer").to_df().collect()}
    assert s1 <= allc


def test_has_p_predicates(spark, sf_dir):
    from torcdb_spark.gremlin import G
    from torcdb_spark.graph import PropertyGraph
    import pytest as _pytest

    g = PropertyGraph.open(spark, sf_dir)
    cust = G(g).V().has_label("customer")
    n_cust = cust.count()
    gt = cust.has_p("c_acctbal", "gt", 5000, cast="double").count()
    lte = cust.has_p("c_acctbal", "lte", 5000, cast="double").count()
    assert gt + lte == n_cust and 0 < gt < n_cust
    base = G(g).V().has_label("nation")
    n_all = base.count()
    within = base.has_p("n_name", "within", ["NATION_0", "NATION_7"]).count()
    assert within == 2
    without = base.has_p("n_name", "without", ["NATION_0", "NATION_7"]).count()
    assert without == n_all - 2
    with _pytest.raises(ValueError):
        base.has_p("n_name", "like", "x")


def test_project_props_and_subtraversal_counts(spark, sf_dir):
    from torcdb_spark.gremlin import G
    from torcdb_spark.graph import PropertyGraph, LABEL_TAGS
    from torcdb_spark.ids import uint128_pair

    g = PropertyGraph.open(spark, sf_dir)
    ids = [uint128_pair(LABEL_TAGS["customer"], k) for k in range(1, 6)]
    rows = G(g).V(*ids).project_(
        seg="c_mktsegment", n_orders=lambda s: s.out("placed")
    ).collect()
    assert len(rows) == 5
    assert all(r.seg is not None for r in rows)
    # counts match a direct traversal per seed
    for r in rows:
        k = G(g).V(bytes(r.current)).out("placed").count()
        assert r.n_orders == k


def test_match_binds_new_and_constrains_existing(spark, sf_dir):
    """match(): a pattern with an unbound end variable multiplies
    traversers per solution; repeating a pattern with the variable now
    bound acts as a constraint (semi-join) and changes nothing; an unbound
    START raises."""
    import pyspark.sql.functions as F
    import pytest

    from torcdb_spark.graph import PropertyGraph
    from torcdb_spark.gremlin import G

    g = PropertyGraph.open(spark, sf_dir)
    base = (
        G(g).V().has_label("customer").as_("c")
        .match_(("c", lambda s: s.out("placed"), "o"))
    )
    n_orders = g.edges.where("label = 'placed'").count()
    assert base.select("c", "o").count() == n_orders

    # re-asserting the same pattern with both sides bound is a no-op filter
    again = base.match_(("c", lambda s: s.out("placed"), "o"))
    assert again.select("c", "o").count() == n_orders

    # a contradictory constraint empties the result
    none = base.match_(("c", lambda s: s.out("fromNation"), "o"))
    assert none.select("c", "o").count() == 0

    with pytest.raises(ValueError):
        G(g).V().has_label("customer").match_(
            ("zzz", lambda s: s.out("placed"), "o")
        )


def test_match_solution_multiplicity_two_patterns(spark, sf_dir):
    """Two patterns from the same binder: solutions are the cross of each
    customer's orders with its (single) nation — |placed| rows."""
    from torcdb_spark.graph import PropertyGraph
    from torcdb_spark.gremlin import G

    g = PropertyGraph.open(spark, sf_dir)
    t = (
        G(g).V().has_label("customer").as_("c")
        .match_(
            ("c", lambda s: s.out("placed"), "o"),
            ("c", lambda s: s.out("fromNation"), "n"),
        )
    )
    assert t.select("c", "o", "n").count() == g.edges.where(
        "label = 'placed'"
    ).count()


def test_edge_start_traversal(spark, sf_dir):
    """g.E(label): edge-first entry composes with has_edge and in_v; the
    unlabeled form scans all labels."""
    import pyspark.sql.functions as F

    from torcdb_spark.graph import PropertyGraph
    from torcdb_spark.gremlin import G

    g = PropertyGraph.open(spark, sf_dir)
    n_placed = g.edges.where("label = 'placed'").count()
    t = G(g).E("placed")
    assert t._df.count() == n_placed
    assert G(g).E()._df.count() == g.edges.count()

    filtered = (
        G(g).E("placed")
        .has_edge("totalprice", lambda v: v.cast("double") > 150000.0)
        .in_v()
    )
    from torcdb_spark.sources.tables import load_table

    want = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 150000
    ).count()
    assert filtered._df.count() == want


# ---------------------------------------------------------------------------
# Round-6 step completeness: cyclicPath, coin, local, store/aggregate/cap
# ---------------------------------------------------------------------------


def test_cyclic_path_complements_simple_path(graph):
    """cyclicPath ∪ simplePath == all path-tracked traversers, disjoint;
    on the 2-hop both() walk the only cyclic paths are start-revisits."""
    cid = uint128_pair(LABEL_TAGS["customer"], 1)
    t = G(graph).V(cid).with_path().both("fromNation").both("fromNation")
    all_n = t.count()
    simple_n = t.simple_path().count()
    cyclic_n = t.cyclic_path().count()
    assert simple_n + cyclic_n == all_n
    assert cyclic_n == 1  # exactly the c1 -> nation -> c1 revisit


def test_coin_deterministic_partition(graph):
    """coin(p) ∪ coin-complement == frame; rerun selects the same subset;
    p=0/1 are empty/identity."""
    t = G(graph).V().has_label("customer")
    n = t.count()
    kept = t.coin(0.25)
    k1 = {r["_cur"] for r in kept._df.collect()}
    k2 = {r["_cur"] for r in t.coin(0.25)._df.collect()}
    assert k1 == k2  # deterministic across re-execution
    assert 0 < len(k1) < n
    assert t.coin(0.0).count() == 0
    assert t.coin(1.0).count() == n
    # a different seed draws a different (still deterministic) subset
    k3 = {r["_cur"] for r in t.coin(0.25, seed=7)._df.collect()}
    assert k3 != k1


def test_local_limit_scopes_per_parent(graph, ddb):
    """local(out('placed').limit(2)) keeps ≤2 orders PER customer, not 2
    globally — ranked by order id, so the kept set is the SQL top-2 per
    customer."""
    t = G(graph).V().has_label("customer").local_(
        lambda s: s.out("placed"), limit_per=2
    )
    got = sorted(
        (int.from_bytes(r["_cur"][8:], "big"))
        for r in t._df.collect()
    )
    exp = sorted(
        r[0]
        for r in ddb.sql(
            """select o_orderkey from (
                 select o_orderkey,
                        row_number() over (partition by o_custkey
                                           order by o_orderkey) rn
                 from orders) where rn <= 2"""
        ).fetchall()
    )
    assert got == exp


def test_store_aggregate_cap(graph):
    """store keeps duplicates (bag), aggregate dedups (set); cap unfolds
    the collection as rows and pops the registry name."""
    import pytest as _pytest

    cid = uint128_pair(LABEL_TAGS["customer"], 1)
    t = G(graph).V(cid).with_path().both("fromNation").both("fromNation")
    n = t.count()
    bag = t.store_("b1").cap_("b1")
    assert bag.count() == n  # duplicates kept
    st = t.aggregate_("s1").cap_("s1")
    assert st.count() == t._df.select("_cur").distinct().count()
    # cap popped the name: a second cap raises
    with _pytest.raises(KeyError):
        t.cap_("b1")
    # store at two points of a chain unions both frontiers
    t2 = G(graph).V(cid).store_("b2").out("fromNation").store_("b2")
    both = t2.cap_("b2")
    assert both.count() == 2  # customer + its nation


def test_side_effect_registry_is_chain_scoped(graph):
    """Two root traversals on the SAME graph handle reusing one bag name
    never see each other's entries; an abandoned (e.g. errored) chain
    leaves no residue for a later chain to union in."""
    import pytest as _pytest

    cid = uint128_pair(LABEL_TAGS["customer"], 1)
    # chain A stores under "x" but is abandoned before cap (error path)
    a = G(graph).V(cid).store_("x").out("fromNation")
    # chain B reuses "x": its cap must contain ONLY chain-B rows
    b = G(graph).V(cid).out("fromNation").store_("x")
    assert b.cap_("x").count() == 1  # just the nation, not A's customer
    # chain A's own bag is intact and independent
    assert a.cap_("x").count() == 1  # just the customer
    # and a fresh root sees an empty registry, not a graph-handle one
    with _pytest.raises(KeyError):
        G(graph).V(cid).cap_("x")


def test_sack_accumulates_along_walk(graph, ddb):
    """with_sack/sack_ fold per-traverser values through hops; the
    2-hop cents sum matches SQL exactly (integer arithmetic)."""
    import pyspark.sql.functions as F

    t = (
        G(graph).V().has_label("customer")
        .with_sack(F.lit(0).cast("long"))
        .out_e("placed")
        .sack_("sum", F.round(
            F.col("_eprops")["totalprice"].cast("double") * 100, 0
        ).cast("long"))
        .in_v()
    )
    got = {
        int.from_bytes(r["start"][8:], "big"): r["total"]
        for r in t.sack().groupBy("start").agg(
            F.sum("sack").alias("total")
        ).collect()
    }
    exp = dict(
        ddb.sql(
            """select o_custkey,
                      sum(cast(round(o_totalprice*100,0) as bigint))
               from orders group by 1"""
        ).fetchall()
    )
    assert got == exp
    # sack ops: mult / min / max / assign sanity on one traverser
    base = G(graph).V().has_label("region").with_sack(F.lit(3).cast("long"))
    assert base.sack_("mult", F.lit(4)).sack().collect()[0]["sack"] == 12
    assert base.sack_("min", F.lit(1)).sack().collect()[0]["sack"] == 1
    assert base.sack_("max", F.lit(9)).sack().collect()[0]["sack"] == 9
    assert base.sack_("assign", F.lit(7)).sack().collect()[0]["sack"] == 7


def test_tree_prefix_aggregation(graph, ddb):
    """tree() flattens the traversal prefix tree: node counts at each
    depth match the FK rollups, parents link correctly, and barrier()
    is a pure no-op in the same chain."""
    from pyspark.sql import functions as F

    t = (
        G(graph).V().has_label("region").with_path().barrier()
        .in_("inRegion").in_("fromNation")
    )
    tr = t.tree().select(
        "depth",
        F.conv(F.hex(F.substring("node", 9, 8)), 16, 10).cast("long").alias("nk"),
        "n_traversers",
    ).collect()
    by_depth = {}
    for r in tr:
        by_depth.setdefault(r["depth"], {})[r["nk"]] = r["n_traversers"]
    exp0 = dict(ddb.sql(
        """select n_regionkey, count(*) from customer
           join nation on n_nationkey=c_nationkey group by 1"""
    ).fetchall())
    exp1 = dict(ddb.sql(
        """select n_nationkey, count(*) from customer
           join nation on n_nationkey=c_nationkey group by 1"""
    ).fetchall())
    assert by_depth[0] == exp0
    assert by_depth[1] == exp1
    n_cust = ddb.sql("select count(*) from customer").fetchone()[0]
    assert len(by_depth[2]) == n_cust
    assert set(by_depth[2].values()) == {1}


def test_sack_mean_div_minus_ops(graph):
    """The gremlin-core Operator surface additions: minus, div, mean."""
    from pyspark.sql import functions as F

    cid = uint128_pair(LABEL_TAGS["customer"], 1)
    t = (
        G(graph).V(cid)
        .with_sack(F.lit(8.0))
        .sack_("minus", F.lit(2.0))   # 6
        .sack_("div", F.lit(3.0))     # 2
        .sack_("mean", F.lit(10.0))   # (2+10)/2 = 6
    )
    vals = [r["sack"] for r in t.sack().collect()]
    assert vals == [6.0]
