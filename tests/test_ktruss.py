"""k-truss peeling (analytics.k_truss) vs a sequential replay."""

from torcdb_spark.analytics import k_truss


def _replay(edge_list, k):
    e = {tuple(sorted(p)) for p in edge_list if p[0] != p[1]}
    while True:
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in e
        }
        kept = {p for p in e if sup[p] >= k - 2}
        if kept == e:
            return e
        e = kept


EDGES = [
    (1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4),   # K4: a 4-truss
    (4, 5), (5, 6), (4, 6),                            # triangle tail
    (6, 7), (7, 8),                                    # path
]


def test_k_truss_matches_replay(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    for k in (3, 4, 5):
        for threshold in (10_000, 0):  # finisher AND distributed loop
            got = {
                (r["a"], r["b"])
                for r in k_truss(
                    df, k=k, local_threshold=threshold
                ).collect()
            }
            assert got == _replay(EDGES, k), (k, threshold)


def test_k4_is_the_4_truss(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r["a"], r["b"]) for r in k_truss(df, k=4).collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)}


def test_double_sweep_diameter_exact_on_path_and_tree(spark):
    from torcdb_spark.analytics import double_sweep_diameter

    # path 1-2-3-4-5: diameter 4; seed mid-path
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seed = spark.createDataFrame([(3,)], "id long")
    for threshold in (10_000, 0):  # finisher AND distributed sweeps
        r = double_sweep_diameter(
            path, seed, local_threshold=threshold
        ).collect()[0]
        assert r["diameter_lb"] == 4, threshold
        assert r["sweep1_ecc"] == 2, threshold
        assert r["peripheral_id"] in (1, 5)
    # star: diameter 2 from any seed
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    for threshold in (10_000, 0):
        r2 = double_sweep_diameter(
            star, spark.createDataFrame([(0,)], "id long"),
            local_threshold=threshold,
        ).collect()[0]
        assert r2["diameter_lb"] == 2, threshold


def test_double_sweep_seed_deterministic_across_partitionings(spark):
    """The small-core finisher truncates the seed frame to 1000 ids;
    without an orderBy before the limit the kept subset would depend on
    partition order. Pin: a >1000-id seed frame produces the identical
    result whether delivered as 1 partition or 16 shuffled ones."""
    from torcdb_spark.analytics import double_sweep_diameter

    # path 0-1-...-40 — diameter 40; seed with 1200 ids, most of them
    # absent from the graph, so only the ordered-first-1000 subset
    # (which contains all real vertices) matters
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    ids = list(range(1200))
    rows = [(i,) for i in ids]
    one = spark.createDataFrame(rows, "id long").coalesce(1)
    many = (
        spark.createDataFrame(list(reversed(rows)), "id long")
        .repartition(16)
    )
    r_one = double_sweep_diameter(path, one).collect()[0]
    r_many = double_sweep_diameter(path, many).collect()[0]
    assert r_one == r_many
    assert r_one["diameter_lb"] == 40
