"""Multi-probe LSH: measured recall vs the collision-probability
theory, on the REAL (near-orthogonal) embeddings fixture.

x13 stays a rows-only diagnostic because no ANN method has an honest
recall bound on near-orthogonal geometry — but the LOW recall itself
is predictable: for hyperplane LSH, a query and a corpus vector at
angle θ land on the same side of one random plane with probability
p = 1 − θ/π (Goemans–Williamson / Charikar SimHash analysis, public
literature). Multi-probe with Hamming-1 expansion recovers a true
neighbor iff AT MOST ONE of the P planes separates the pair:

    P(recovered) = p^P + P · p^(P-1) · (1 − p)

This test computes that prediction per true-neighbor pair from the
exact angles, then asserts the measured recall of the engine's
lsh_topk(multi_probe=True) sits inside a 4.5-sigma binomial band
around the prediction (the q223 device). The planes are seeded, so
a failure means the MATH or the IMPLEMENTATION drifted, not luck.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
K = 5
N_QUERIES = 5
N_PLANES = 8


def test_multiprobe_recall_matches_collision_theory(spark):
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    bf = brute_force_topk(emb, queries, "embedding", "vec_id", k=K)
    true_pairs = {
        (r["query_id"], r["corpus_id"]): r["cos_sim"]
        for r in bf.select("query_id", "corpus_id", "cos_sim").collect()
    }
    assert len(true_pairs) == N_QUERIES * K

    approx = lsh_topk(
        emb, queries, "embedding", "vec_id",
        k=K, n_planes=N_PLANES, multi_probe=True,
    )
    got = {
        (r["query_id"], r["corpus_id"])
        for r in approx.select("query_id", "corpus_id").collect()
    }
    hits = sum(1 for pair in true_pairs if pair in got)
    measured = hits / len(true_pairs)

    # per-pair recovery probability from the exact angle
    probs = []
    for cos_sim in true_pairs.values():
        theta = math.acos(max(-1.0, min(1.0, cos_sim)))
        p = 1.0 - theta / math.pi
        probs.append(
            p ** N_PLANES
            + N_PLANES * p ** (N_PLANES - 1) * (1.0 - p)
        )
    predicted = float(np.mean(probs))
    # Poisson-binomial variance of the hit count
    var = float(np.sum([q * (1 - q) for q in probs]))
    sigma = math.sqrt(var) / len(probs)

    # the fixture is near-orthogonal: the prediction itself must be
    # LOW (this is why x13 is diagnostic-only, in numbers)
    assert predicted < 0.5, predicted
    assert abs(measured - predicted) <= 4.5 * sigma + 1e-9, (
        f"measured recall {measured:.3f} vs theory {predicted:.3f} "
        f"± {4.5 * sigma:.3f}"
    )


def test_multiprobe_candidates_superset_of_single_probe(spark):
    """Hamming-1 probes contain the identity probe, so multi-probe's
    retrieved set can never lose a pair single-probe found — the one
    bound that holds on ANY geometry (a theorem, not a measurement)."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.operators.similarity import lsh_topk

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    kw = dict(k=1000, n_planes=N_PLANES)  # k big enough to not truncate
    single = {
        (r["query_id"], r["corpus_id"])
        for r in lsh_topk(
            emb, queries, "embedding", "vec_id", **kw
        ).collect()
    }
    multi = {
        (r["query_id"], r["corpus_id"])
        for r in lsh_topk(
            emb, queries, "embedding", "vec_id", multi_probe=True, **kw
        ).collect()
    }
    assert single <= multi
    assert len(multi) > len(single)
