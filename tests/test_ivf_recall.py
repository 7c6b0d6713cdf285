"""IVF recall@10 contract at REALISTIC index geometry — the number a
100 TB operator would actually quote (round-11 verdict ask #2).

tests/test_ivf.py pins exactness (exhaustive probe == brute force) and
a coarse recall floor on the tiny sf0.001 fixture with toy geometry
(n_lists=8). This file pins the full recall CURVE on trained Lloyd
centroids (q239 machinery: ivf_build iters=2) at production-shaped
geometry — n_lists ~ sqrt(n), the standard IVF sizing rule — across a
sweep of nprobe, at both sf0.1 (n=2000, n_lists=45) and sf1
(n=20000, n_lists=141).

Contract semantics:
* recall@10(nprobe) = |IVF top-10 ∩ exact top-10| / |exact top-10|
  over 30 query vectors, ground truth from brute_force_topk.
* Monotonicity is EXACT, not statistical: nprobe+1 probes a superset
  of lists, so the candidate pool is a superset and the exact-cosine
  top-10 can only gain true neighbors — any decrease is a bug in the
  probe ranking or the assignment, not noise.
* The pinned floors carry ~0.05-0.10 margin under the measured curve
  (sf0.1: 0.907..0.973, sf1: 0.957..0.987 for nprobe 1..16, measured
  round 12); the build and search are fully deterministic (seeded
  Lloyd, no RNG), so a floor breach means the operator regressed, not
  the dice.

The sf1 leg needs the regenerated fixture (tools/gen_fixture.py,
round-start ritual) and skips with a pointer if absent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distcpplus_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_search,
)

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/fixtures/sf1"

# (sf_dir, n_lists ~ sqrt(n), {nprobe: recall@10 floor})
CURVES = [
    pytest.param(
        SF01,
        45,
        {1: 0.80, 2: 0.82, 4: 0.85, 8: 0.88, 16: 0.90},
        id="sf0.1-n2000-nlists45",
        marks=pytest.mark.skipif(
            not os.path.isdir(SF01),
            reason="driver testdata sf0.1 not present on this host",
        ),
    ),
    pytest.param(
        SF1,
        141,
        {1: 0.85, 2: 0.86, 4: 0.88, 8: 0.90, 16: 0.92},
        id="sf1-n20000-nlists141",
        marks=pytest.mark.skipif(
            not os.path.isdir(SF1),
            reason="sf1 fixture not generated "
            "(python tools/gen_fixture.py 1 fixtures/sf1)",
        ),
    ),
]


@pytest.mark.parametrize("sf_dir,n_lists,floors", CURVES)
def test_recall_curve_at_sqrt_n_geometry(spark, sf_dir, n_lists, floors):
    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).cache()
    try:
        queries = emb.filter(F.col("vec_id") < 30)
        truth = {
            (r["query_id"], r["corpus_id"])
            for r in brute_force_topk(
                emb, queries, "embedding", "vec_id", k=10
            ).collect()
        }
        assert truth, "ground truth empty — fixture problem"
        assigned, centroids = ivf_build(
            emb, "embedding", "vec_id", n_lists=n_lists, iters=2
        )
        curve = {}
        for nprobe in sorted(floors):
            got = {
                (r["query_id"], r["corpus_id"])
                for r in ivf_search(
                    assigned,
                    centroids,
                    queries,
                    "embedding",
                    "vec_id",
                    k=10,
                    nprobe=nprobe,
                ).collect()
            }
            curve[nprobe] = len(got & truth) / len(truth)
        # pinned floors
        for nprobe, floor in floors.items():
            assert curve[nprobe] >= floor, (
                f"recall@10 regressed at nprobe={nprobe}: "
                f"{curve[nprobe]:.3f} < {floor} (curve: {curve})"
            )
        # exact monotonicity (superset candidate pools)
        probes = sorted(curve)
        for lo, hi in zip(probes, probes[1:]):
            assert curve[hi] >= curve[lo], (
                f"recall not monotone in nprobe: {curve}"
            )
    finally:
        emb.unpersist()
