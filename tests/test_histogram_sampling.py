"""Histogram sketch: exact bin counts, mergeability (sum of partial
sketches == sketch of the union), and quantile error bounded by one bin
width. Sampling: deterministic md5 selection verified against a
hand-computed pick on a constructed graph, and reproducibility/seed
sensitivity on the fixture graph."""

import hashlib

import pyspark.sql.functions as F
import pytest

from torcdb_spark.operators.histogram import (
    histogram_sketch,
    merge_histograms,
    quantiles_from_histogram,
)
from torcdb_spark.operators.sampling import neighbor_sample, random_walks


def test_histogram_exact_bins(spark):
    df = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    hist = histogram_sketch(df, "x", lo=0.0, hi=100.0, n_bins=10)
    rows = {r["bin"]: r["n"] for r in hist.collect()}
    assert rows == {b: 10 for b in range(10)}


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0,), (500.0,), (50.0,)], ["x"])
    hist = histogram_sketch(df, "x", lo=0.0, hi=100.0, n_bins=10)
    rows = {r["bin"]: r["n"] for r in hist.collect()}
    assert rows == {0: 1, 9: 1, 5: 1}


def test_histogram_merge_equals_union(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    ha = histogram_sketch(a, "l_extendedprice", 0.0, 100000.0, 32)
    hb = histogram_sketch(b, "l_extendedprice", 0.0, 100000.0, 32)
    merged = merge_histograms(ha.unionByName(hb))
    full = histogram_sketch(li, "l_extendedprice", 0.0, 100000.0, 32)
    m = {r["bin"]: r["n"] for r in merged.collect()}
    f = {r["bin"]: r["n"] for r in full.collect()}
    assert m == f


def test_histogram_quantile_within_bin_width(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo, hi, n_bins = 0.0, 110000.0, 256
    width = (hi - lo) / n_bins
    hist = histogram_sketch(li, "l_extendedprice", lo, hi, n_bins)
    est = quantiles_from_histogram(hist, [0.5, 0.95], lo, hi, n_bins).first()
    exact = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    ).first()
    assert abs(est["q50"] - exact["p50"]) <= width
    assert abs(est["q95"] - exact["p95"]) <= width


def _mk_edges(spark, triples):
    return spark.createDataFrame(
        [(bytes([0] * 15 + [s]), bytes([0] * 15 + [d]), lab)
         for s, d, lab in triples],
        "src binary, dst binary, label string",
    )


def test_neighbor_sample_matches_hand_md5(spark):
    # vertex 1 has neighbors 2,3,4; fanout 2 must keep the two smallest
    # md5(srchex:dsthex:seed) scores — recompute the ranking in Python
    edges = _mk_edges(spark, [(1, 2, "e"), (1, 3, "e"), (1, 4, "e")])
    frontier = spark.createDataFrame([(bytes([0] * 15 + [1]),)], ["id"])
    out = neighbor_sample(frontier, edges, "e", fanout=2, seed=7).collect()

    def score(s, d):
        sh = bytes([0] * 15 + [s]).hex().upper()
        dh = bytes([0] * 15 + [d]).hex().upper()
        return hashlib.md5(f"{sh}:{dh}:7".encode()).hexdigest()

    expect = sorted([2, 3, 4], key=lambda d: (score(1, d)))[:2]
    got = sorted((r["dst"][-1], r["rk"]) for r in out)
    assert sorted(d for d, _ in got) == sorted(expect)
    assert {r["rk"] for r in out} == {1, 2}


def test_neighbor_sample_bounds_fanout_and_reproduces(spark, sf_dir):
    from torcdb_spark.graph import PropertyGraph

    g = PropertyGraph.open(spark, sf_dir)
    cust = g.vertices.where("label = 'customer'").select("id").limit(200)
    s1 = neighbor_sample(cust, g.edges, "placed", fanout=3, seed=42)
    per_src = s1.groupBy("src").count().agg(F.max("count")).first()[0]
    assert per_src <= 3
    # same seed → identical sample; different seed → different sample
    s1b = neighbor_sample(cust, g.edges, "placed", fanout=3, seed=42)
    assert s1.exceptAll(s1b).isEmpty()
    s2 = neighbor_sample(cust, g.edges, "placed", fanout=3, seed=43)
    assert not s1.exceptAll(s2).isEmpty()


def test_random_walks_deterministic_and_stops_at_sink(spark):
    # 1 -> {2,3}; 2 -> {4}; 3 -> {}; walk from 1, len 3: step1 picks
    # argmin-md5 of {2,3}; a walk reaching 3 stops (sink), via 2 reaches 4
    edges = _mk_edges(
        spark, [(1, 2, "e"), (1, 3, "e"), (2, 4, "e")]
    )
    starts = spark.createDataFrame([(bytes([0] * 15 + [1]),)], ["id"])
    out = random_walks(starts, edges, "e", walk_len=3, seed=5)
    rows = sorted(
        (r["step"], r["vertex"][-1]) for r in out.collect()
    )
    assert rows[0] == (0, 1)

    def score(s, d, step):
        sh = bytes([0] * 15 + [s]).hex().upper()
        dh = bytes([0] * 15 + [d]).hex().upper()
        return hashlib.md5(f"{sh}:{dh}:{5 * 1000 + step}".encode()).hexdigest()

    pick1 = min([2, 3], key=lambda d: score(1, d, 1))
    if pick1 == 3:
        assert rows == [(0, 1), (1, 3)]  # sink: walk ends
    else:
        assert rows == [(0, 1), (1, 2), (2, 4)]


def test_random_walks_multi_label(spark, sf_dir):
    from torcdb_spark.graph import PropertyGraph

    g = PropertyGraph.open(spark, sf_dir)
    cust = g.vertices.where("label = 'customer'").select("id").limit(50)
    walks = random_walks(
        cust, g.edges, ["fromNation", "inRegion"], walk_len=3, seed=1
    )
    per_step = {r["step"]: r["count"] for r in
                walks.groupBy("step").count().collect()}
    # every customer has a nation, every nation a region, regions are sinks
    assert per_step[0] == 50 and per_step[1] == 50 and per_step[2] == 50
    assert 3 not in per_step


def test_histogram_totals_and_merge_property(spark):
    """Property: (1) bin counts always total the row count (clamping never
    drops); (2) merging the sketches of ANY split equals the sketch of the
    union — the mergeability contract, for arbitrary data/splits/bounds."""
    from hypothesis import given, settings, strategies as st

    from torcdb_spark.operators.histogram import (
        histogram_sketch,
        merge_histograms,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.floats(-50, 150, width=16, allow_nan=False), min_size=1,
            max_size=40,
        ),
        split=st.integers(0, 39),
        n_bins=st.sampled_from([1, 7, 32]),
    )
    def check(vals, split, n_bins):
        df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
        full = histogram_sketch(df, "x", 0.0, 100.0, n_bins)
        assert sum(r["n"] for r in full.collect()) == len(vals)
        s = min(split, len(vals))
        a = spark.createDataFrame(
            [(float(v),) for v in vals[:s]] or [(None,)], "x double"
        ).where("x is not null")
        b = spark.createDataFrame(
            [(float(v),) for v in vals[s:]] or [(None,)], "x double"
        ).where("x is not null")
        ha = histogram_sketch(a, "x", 0.0, 100.0, n_bins)
        hb = histogram_sketch(b, "x", 0.0, 100.0, n_bins)
        merged = {r["bin"]: r["n"]
                  for r in merge_histograms(ha.unionByName(hb)).collect()}
        want = {r["bin"]: r["n"] for r in full.collect()}
        assert merged == want

    check()


def test_table_diff_matches_python_reference_property(spark):
    """Property: table_diff classification equals a dict-based reference
    implementation for arbitrary old/new keyed maps."""
    from hypothesis import given, settings, strategies as st

    from torcdb_spark.operators.diff import table_diff

    @settings(max_examples=10, deadline=None)
    @given(
        old=st.dictionaries(st.integers(0, 15), st.integers(0, 3), max_size=12),
        new=st.dictionaries(st.integers(0, 15), st.integers(0, 3), max_size=12),
    )
    def check(old, new):
        if not old and not new:
            return
        odf = spark.createDataFrame(
            [(k, v) for k, v in old.items()] or [(None, None)], "k int, v int"
        ).where("k is not null")
        ndf = spark.createDataFrame(
            [(k, v) for k, v in new.items()] or [(None, None)], "k int, v int"
        ).where("k is not null")
        got = {r["k"]: r["change"]
               for r in table_diff(odf, ndf, ["k"]).collect()}
        want = {}
        for k in old.keys() | new.keys():
            if k not in old:
                want[k] = "inserted"
            elif k not in new:
                want[k] = "deleted"
            elif old[k] != new[k]:
                want[k] = "updated"
        assert got == want

    check()


def test_zorder_interleave_roundtrip_property(spark):
    """Property: the Morton interleave is a bijection — de-interleaving the
    z value recovers the original scaled coordinates."""
    from hypothesis import given, settings, strategies as st

    import pyspark.sql.functions as F

    from torcdb_spark.operators.zorder import interleave_bits

    @settings(max_examples=8, deadline=None)
    @given(
        pts=st.lists(
            st.tuples(st.integers(0, 255), st.integers(0, 255)),
            min_size=1, max_size=30,
        )
    )
    def check(pts):
        df = spark.createDataFrame(pts, ["x", "y"])
        out = df.select(
            "x", "y",
            interleave_bits([F.col("x"), F.col("y")], bits=8).alias("z"),
        ).collect()
        for r in out:
            z = r["z"]
            x = sum(((z >> (2 * b)) & 1) << b for b in range(8))
            y = sum(((z >> (2 * b + 1)) & 1) << b for b in range(8))
            assert (x, y) == (r["x"], r["y"])

    check()


def test_weighted_sample_biases_toward_heavy_edges(spark):
    """Across many seeds, a neighbor with 10x the weight must be chosen
    (fanout=1) several times more often than a light one; zero/negative
    weights are never chosen; same seed reproduces exactly."""
    import pyspark.sql.functions as F

    from torcdb_spark.operators.sampling import weighted_neighbor_sample

    def b(i):
        return bytes([0] * 15 + [i])

    # vertex 1 -> {2 (w=10), 3 (w=1), 4 (w=0)}
    edges = spark.createDataFrame(
        [(b(1), b(2), "e", 10.0), (b(1), b(3), "e", 1.0),
         (b(1), b(4), "e", 0.0)],
        "src binary, dst binary, label string, w double",
    )
    frontier = spark.createDataFrame([(b(1),)], ["id"])
    picks = {2: 0, 3: 0}
    for seed in range(40):
        out = weighted_neighbor_sample(
            frontier, edges, "e", fanout=1, weight=F.col("w"), seed=seed
        ).collect()
        assert len(out) == 1
        picks[out[0]["dst"][-1]] += 1
    assert picks[2] > picks[3] * 2, picks  # E[ratio] = 10:1
    assert picks[2] + picks[3] == 40      # w=0 never chosen

    a = weighted_neighbor_sample(
        frontier, edges, "e", fanout=2, weight=F.col("w"), seed=5
    )
    b2 = weighted_neighbor_sample(
        frontier, edges, "e", fanout=2, weight=F.col("w"), seed=5
    )
    assert a.exceptAll(b2).isEmpty()


def test_node2vec_walks_match_pure_python_replay(spark):
    """Replay the exact second-order rule (md5 uniform → Efraimidis key →
    argmax with hex(dst) tie-break) in pure Python and require identical
    walks — the strongest determinism check short of a SQL oracle."""
    from torcdb_spark.operators.sampling import node2vec_walks

    triples = [
        (1, 2, "e"), (1, 3, "e"), (2, 1, "e"), (2, 3, "e"), (2, 4, "e"),
        (3, 4, "e"), (4, 2, "e"), (4, 5, "e"), (3, 1, "e"),
    ]
    edges = _mk_edges(spark, triples)
    starts = spark.createDataFrame(
        [(bytes([0] * 15 + [1]),), (bytes([0] * 15 + [2]),)], ["id"]
    )
    p_, q_, seed, walk_len = 0.5, 2.0, 11, 4
    out = node2vec_walks(starts, edges, "e", walk_len, p=p_, q=q_, seed=seed)
    got = {
        (r.walk_id[-1], r.step): r.vertex[-1] for r in out.collect()
    }

    adj = {}
    pairs = set()
    for s, d, _l in triples:
        adj.setdefault(s, []).append(d)
        pairs.add((s, d))

    def hx(v):
        return bytes([0] * 15 + [v]).hex().upper()

    def uniform(prev, src, dst, step):
        ph = hx(prev) if prev is not None else "-"
        h = hashlib.md5(f"{ph}:{hx(src)}:{hx(dst)}:{step}:{seed}".encode()).hexdigest()
        return (int(h[:13], 16) + 1.0) / float((1 << 52) + 1)

    expect = {}
    for start in (1, 2):
        prev, cur = None, start
        expect[(start, 0)] = start
        for step in range(1, walk_len + 1):
            cands = adj.get(cur, [])
            if not cands:
                break
            best = None
            for x in cands:
                if prev is not None and x == prev:
                    w = 1.0 / p_
                elif prev is not None and (prev, x) in pairs:
                    w = 1.0
                else:
                    w = 1.0 / q_
                key = uniform(prev, cur, x, step) ** (1.0 / w)
                cand_key = (key, hx(x))
                if best is None or cand_key > best[0]:
                    best = (cand_key, x)
            prev, cur = cur, best[1]
            expect[(start, step)] = cur
    assert got == expect


def test_node2vec_p_bias_returns_more(spark):
    """Across many starts, a tiny p (return-friendly) must produce far
    more immediate backtracks at step 2 than a huge p."""
    from torcdb_spark.operators.sampling import node2vec_walks

    # star-ish graph: hub 0 <-> leaves, leaves also chain to each other
    triples = []
    for leaf in range(1, 41):
        triples.append((0, leaf, "e"))
        triples.append((leaf, 0, "e"))
        triples.append((leaf, (leaf % 40) + 1, "e"))
    edges = _mk_edges(spark, triples)
    starts = spark.createDataFrame(
        [(bytes([0] * 15 + [v]),) for v in range(1, 41)], ["id"]
    )

    def backtracks(p):
        out = node2vec_walks(starts, edges, "e", 2, p=p, q=1.0, seed=3)
        rows = {(r.walk_id[-1], r.step): r.vertex[-1] for r in out.collect()}
        # walk start=leaf: step1 either 0 or next leaf; count step2 == start
        return sum(
            1 for v in range(1, 41) if rows.get((v, 2)) == v
        )

    many = backtracks(0.01)   # 1/p = 100: strongly prefer returning
    few = backtracks(100.0)   # 1/p = 0.01: strongly avoid returning
    assert many > few
    # only walks whose step-1 went to the hub CAN backtrack (the leaf
    # chain is one-directional), i.e. ~20 of 40; near-all of those must
    assert many >= 12


def test_mixture_downsample_flattens_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from torcdb_spark.operators.sampling import mixture_downsample

    # source A: 300 docs, B: 100, C: 100 -> A sampled at ~1/3, B/C kept
    rows = (
        [(i, "A") for i in range(300)]
        + [(1000 + i, "B") for i in range(100)]
        + [(2000 + i, "C") for i in range(100)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = mixture_downsample(df, source_col="source")
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    rates = {r.source: r.rate for r in kept.select("source", "rate").distinct().collect()}
    assert rates["B"] == rates["C"] == 1.0
    assert abs(rates["A"] - 1 / 3) < 1e-9
    assert counts["B"] == counts["C"] == 100  # rate 1.0 keeps everything
    assert 60 <= counts["A"] <= 140  # ~100 expected, md5-binomial spread
    # deterministic: same seed -> identical kept set
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(r.doc_id for r in mixture_downsample(df, source_col="source").collect())
    assert ids1 == ids2
    # different seed -> (almost surely) different selection within A
    ids3 = sorted(
        r.doc_id
        for r in mixture_downsample(df, source_col="source", seed=7).collect()
    )
    assert ids1 != ids3


def test_kmv_value_sample_deterministic_and_mergeable(spark):
    import pyspark.sql.functions as F

    from torcdb_spark.operators.histogram import kmv_value_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    a = kmv_value_sample(df, "v", "k", ["g"], k=16)
    b = kmv_value_sample(df.repartition(7), "v", "k", ["g"], k=16)
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )  # partitioning-independent
    # mergeability: re-taking the k smallest of the two halves' samples
    # must equal the full-data sample
    lo = df.where("k < 500")
    hi = df.where("k >= 500")
    both = (
        kmv_value_sample(lo, "v", "k", ["g"], k=16)
        .unionByName(kmv_value_sample(hi, "v", "k", ["g"], k=16))
    )
    from pyspark.sql import Window
    w = Window.partitionBy("g").orderBy("u")
    retaken = (
        both.withColumn("rk", F.row_number().over(w))
        .where("rk <= 16").drop("rk")
    )
    assert sorted(map(tuple, retaken.collect())) == sorted(
        map(tuple, a.collect())
    )


def test_quantiles_from_sample_lower_value_rule(spark):
    import pyspark.sql.functions as F

    from torcdb_spark.operators.histogram import (
        kmv_value_sample,
        quantiles_from_sample,
    )

    df = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit("g").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    sample = kmv_value_sample(df, "v", "k", ["g"], k=1000)  # keeps all 50
    row = quantiles_from_sample(sample, ["g"], (0.5, 0.95)).collect()[0]
    assert row.n_sample == 50
    # sorted values are 0..49; floor(q*(n-1)) lower-value rule
    assert row.p50 == float(int(0.5 * 49))
    assert row.p95 == float(int(0.95 * 49))
