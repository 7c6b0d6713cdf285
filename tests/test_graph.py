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
