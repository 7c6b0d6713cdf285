"""IVF-ANN: exhaustive-probe exactness, determinism, probe-cut recall."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from distcpplus_spark.operators.similarity import (
    brute_force_topk,
    ivf_build,
    ivf_search,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.cache()


def _key(rows):
    return sorted((r["query_id"], r["corpus_id"], r["rank"]) for r in rows)


def test_exhaustive_probe_equals_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    assigned, centroids = ivf_build(emb, "embedding", "vec_id", n_lists=4, iters=2)
    ivf = ivf_search(
        assigned, centroids, queries, "embedding", "vec_id", k=5, nprobe=4
    )
    bf = brute_force_topk(emb, queries, "embedding", "vec_id", k=5)
    assert _key(ivf.collect()) == _key(bf.collect())


def test_build_is_deterministic(spark, emb):
    a1, c1 = ivf_build(emb, "embedding", "vec_id", n_lists=8, iters=2)
    a2, c2 = ivf_build(emb, "embedding", "vec_id", n_lists=8, iters=2)
    assert sorted(map(tuple, a1.select("corpus_id", "list_id").collect())) == sorted(
        map(tuple, a2.select("corpus_id", "list_id").collect())
    )


def test_every_vector_in_exactly_one_list(spark, emb):
    assigned, _ = ivf_build(emb, "embedding", "vec_id", n_lists=8, iters=2)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("corpus_id").distinct().count() == n


def test_probe_cut_keeps_reasonable_recall(spark, emb):
    # nprobe=2 of 8 lists: top-1 neighbor recall should beat random
    # scanning by a wide margin; >= 60% on the fixture's clustered data.
    queries = emb.filter(F.col("vec_id") < 10)
    assigned, centroids = ivf_build(emb, "embedding", "vec_id", n_lists=8, iters=2)
    ivf = ivf_search(
        assigned, centroids, queries, "embedding", "vec_id", k=1, nprobe=2
    )
    bf = brute_force_topk(emb, queries, "embedding", "vec_id", k=1)
    ivf_top = {(r["query_id"], r["corpus_id"]) for r in ivf.collect()}
    bf_top = {(r["query_id"], r["corpus_id"]) for r in bf.collect()}
    recall = len(ivf_top & bf_top) / len(bf_top)
    assert recall >= 0.6, recall


def test_or_amplification_improves_recall(spark, emb):
    from distcpplus_spark.operators.similarity import (
        pairwise_above_threshold,
        pairwise_above_threshold_amplified,
    )

    # fixture embeddings are near-orthogonal: use the top tail of the
    # actual cosine range (~0.44 max) so the pair sets are NON-empty —
    # an empty-vs-empty comparison would vacuously pass
    sub = emb.filter((emb.vec_id < 120))
    single = {
        (r["id_a"], r["id_b"])
        for r in pairwise_above_threshold(
            sub, "embedding", "vec_id", 0.2, n_planes=4, seed=42
        ).collect()
    }
    amplified = {
        (r["id_a"], r["id_b"])
        for r in pairwise_above_threshold_amplified(
            sub, "embedding", "vec_id", 0.2, n_planes=4,
            seeds=(42, 43, 44),
        ).collect()
    }
    assert amplified, "amplified pair set must be non-empty"
    # OR-amplification can only ADD candidate pairs
    assert single <= amplified
    assert len(amplified) >= len(single)
