"""Property tests for operators/graph.py — the q318/q319 oracles gate
cross-engine value parity; these pin the algorithms themselves
(brute-force triangle parity, PageRank fixed points and invariances)
on adversarial shapes the fixture graphs don't contain."""

import itertools

import pytest

from distcpplus_spark.operators.graph import count_triangles, pagerank


def _triangle_truth(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_bruteforce_parity(spark):
    # hub + cliques + chain: exercises the orientation tie-break and
    # the "last reducer" hub shape
    edges = (
        [(0, i) for i in range(1, 12)]  # hub 0
        + [(i, j) for i, j in itertools.combinations([1, 2, 3, 4], 2)]
        + [(i, j) for i, j in itertools.combinations([20, 21, 22], 2)]
        + [(30, 31), (31, 32), (32, 33)]  # triangle-free chain
        + [(5, 6), (6, 7), (7, 5)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"] for r in count_triangles(df).collect()
    }
    assert got == _triangle_truth(edges)


def test_triangles_direction_and_dup_invariant(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    noisy = edges + [(b, a) for a, b in edges] + edges + [(1, 1), (2, 2)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"] for r in count_triangles(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_none_on_bipartite(spark):
    # bipartite graphs have no odd cycles, hence no triangles
    edges = [(a, 100 + b) for a in range(5) for b in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert count_triangles(df).count() == 0


def test_pagerank_cycle_fixed_point(spark):
    # directed cycle: rank 1.0 everywhere is the exact fixed point of
    # r = 0.15 + 0.85 * r_pred / 1, reached at every iteration count
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    assert set(ranks) == set(range(n))
    for v in ranks.values():
        assert v == pytest.approx(1.0, abs=1e-12)


def test_pagerank_star_ordering_and_symmetry(spark):
    # undirected star: the hub outranks the leaves and all leaves tie
    hub_edges = [(0, i) for i in range(1, 9)]
    und = hub_edges + [(b, a) for a, b in hub_edges]
    df = spark.createDataFrame(und, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(df, iters=8).collect()}
    leaf_vals = {round(ranks[i], 12) for i in range(1, 9)}
    assert len(leaf_vals) == 1
    assert ranks[0] > max(ranks[i] for i in range(1, 9))


def test_bfs_chain_distances_and_cap(spark):
    from distcpplus_spark.operators.graph import bfs_distances

    # undirected chain 0-1-2-...-9, source {0}
    fwd = [(i, i + 1) for i in range(9)]
    edges = fwd + [(b, a) for a, b in fwd]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(e, s, max_hops=4).collect()
    }
    # nodes beyond 4 hops are absent; others exact
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_multi_source_takes_nearest(spark):
    from distcpplus_spark.operators.graph import bfs_distances

    fwd = [(i, i + 1) for i in range(9)]
    edges = fwd + [(b, a) for a, b in fwd]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,), (9,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(e, s, max_hops=9).collect()
    }
    assert got == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 4, 6: 3, 7: 2, 8: 1, 9: 0
    }
    # disconnected component never appears
    e2 = spark.createDataFrame(edges + [(100, 101), (101, 100)],
                               "src long, dst long")
    got2 = {
        r["node"]: r["dist"]
        for r in bfs_distances(e2, s, max_hops=9).collect()
    }
    assert 100 not in got2 and 101 not in got2


def test_association_rules_hand_computed(spark):
    from distcpplus_spark.operators.basket import association_rules

    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "bk int, it string")
    out = {
        (r["antecedent"], r["consequent"]): (
            r["pair_count"], r["support"], r["confidence"], r["lift"]
        )
        for r in association_rules(
            df, "bk", "it", min_support=0.0, min_confidence=0.0
        ).collect()
    }
    # n(a)=3, n(b)=3, n(c)=1, N=4, n(ab)=2, n(ac)=1
    assert out[("a", "b")] == (2, 0.5, 2 / 3, (2 / 3) / (3 / 4))
    assert out[("b", "a")] == (2, 0.5, 2 / 3, (2 / 3) / (3 / 4))
    assert out[("a", "c")] == (1, 0.25, 1 / 3, (1 / 3) / (1 / 4))
    assert out[("c", "a")] == (1, 0.25, 1.0, 1.0 / (3 / 4))
    # duplicate (basket, item) rows must not inflate counts
    out2 = association_rules(
        df.unionAll(df), "bk", "it", min_support=0.0, min_confidence=0.0
    ).collect()
    assert {
        (r["antecedent"], r["consequent"]): r["pair_count"] for r in out2
    } == {k: v[0] for k, v in out.items()}


def test_random_walks_are_valid_paths_and_deterministic(spark):
    from distcpplus_spark.operators.graph import random_walks

    fwd = [(i, j) for i in range(6) for j in range(6) if i != j and (i + j) % 3]
    edges = spark.createDataFrame(fwd, "src long, dst long")
    starts = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    rows = random_walks(
        edges, starts, walk_len=3, walks_per_node=2, seed=11
    ).collect()
    eset = set(fwd)
    walks = {}
    for r in rows:
        walks.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["node"]
    assert len(walks) == 6  # 3 starts x 2 walks
    for (s, _w), path in walks.items():
        assert sorted(path) == [0, 1, 2, 3]  # steps 0..3, no gaps
        assert path[0] == s
        for i in range(3):
            assert (path[i], path[i + 1]) in eset
    rows2 = random_walks(
        edges, starts, walk_len=3, walks_per_node=2, seed=11
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # a different seed changes at least one step somewhere
    rows3 = random_walks(
        edges, starts, walk_len=3, walks_per_node=2, seed=12
    ).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, rows3))


def test_random_walks_dead_end_freezes(spark):
    from distcpplus_spark.operators.graph import random_walks

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")  # 1 is a sink
    starts = spark.createDataFrame([(0,)], "node long")
    rows = random_walks(
        edges, starts, walk_len=3, walks_per_node=1, seed=5
    ).collect()
    path = {r["step"]: r["node"] for r in rows}
    assert path == {0: 0, 1: 1, 2: 1, 3: 1}


def _und(spark, pairs):
    """Undirected edge list as both directions."""
    both = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame(both, "src long, dst long")


def test_k_core_clique_plus_pendants(spark):
    from distcpplus_spark.operators.graph import k_core

    # K4 clique (0-3) + pendant chain 3-4-5; 3-core = the clique only.
    edges = _und(
        spark,
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)],
    )
    rows = {r["node"]: r["core_degree"] for r in k_core(edges, 3).collect()}
    assert rows == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_cascading_peel(spark):
    from distcpplus_spark.operators.graph import k_core

    # Chain 0-1-2-3-4: 2-core is empty, peeled from both ends over
    # multiple rounds (the cascade the fixpoint loop must follow).
    edges = _und(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert k_core(edges, 2).count() == 0
    # cycle of 5 IS its own 2-core
    cyc = _und(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    rows = {r["node"]: r["core_degree"] for r in k_core(cyc, 2).collect()}
    assert rows == {i: 2 for i in range(5)}


def test_k_core_cap_raises(spark):
    import pytest as _pt

    from distcpplus_spark.operators.graph import k_core

    # A long chain peels one layer per round from each end under k=2;
    # a 1-round cap must raise, never return a partial core.
    edges = _und(spark, [(i, i + 1) for i in range(10)])
    with _pt.raises(RuntimeError):
        k_core(edges, 2, max_rounds=1)
