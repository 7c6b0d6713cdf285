"""Product-quantization ANN (operators/similarity.pq_build/pq_search):
ADC scoring invariant, exactness on codebook-resident vectors,
cluster-level retrieval, and determinism."""

import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

from distcpplus_spark.operators.similarity import (
    brute_force_topk,
    pq_build,
    pq_search,
)


def _pattern_corpus(spark, m=4, sub_d=4, kpat=4, n=100, seed=7):
    """Vectors assembled from kpat fixed patterns per subspace; the
    first kpat rows enumerate the patterns so the deterministic seeds
    ARE the patterns and k-means converges to them exactly."""
    rnd = random.Random(seed)
    patterns = [
        [[rnd.uniform(-1, 1) for _ in range(sub_d)] for _ in range(kpat)]
        for _ in range(m)
    ]
    rows = []
    for j in range(kpat):
        v = []
        for s in range(m):
            v += patterns[s][j]
        rows.append((j, v))
    for i in range(kpat, n):
        v = []
        for s in range(m):
            v += patterns[s][rnd.randrange(kpat)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_exact_when_vectors_sit_on_codebook(spark):
    """A corpus whose vectors are exact codebook combinations
    reconstructs losslessly, so PQ ranks == brute-force ranks and
    approx_cos == true cosine."""
    corpus = _pattern_corpus(spark)
    codes, books = pq_build(corpus, "embedding", "vec_id", m=4, k=4, iters=2)
    queries = corpus.filter(F.col("vec_id") < 3)
    pq = {
        (r["query_id"], r["rank"]): (r["corpus_id"], round(r["approx_cos"], 9))
        for r in pq_search(
            codes, books, queries, "embedding", "vec_id", k=5
        ).collect()
    }
    bf = {
        (r["query_id"], r["rank"]): (r["corpus_id"], round(r["cos_sim"], 9))
        for r in brute_force_topk(
            corpus, queries, "embedding", "vec_id", k=5
        ).collect()
    }
    assert pq == bf


def test_adc_invariant_matches_reconstruction(spark):
    """The ADC fold must equal cosine(query, reconstructed corpus
    vector) computed independently in Python — for ANY data, exact
    to float noise. This pins the zip_with/element_at/aggregate
    scoring expression and the stored reconstruction norms."""
    rnd = random.Random(3)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(32)]) for i in range(60)
    ]
    corpus = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    m, k = 8, 8
    codes, books = pq_build(corpus, "embedding", "vec_id", m=m, k=k, iters=1)
    code_map = {
        r["corpus_id"]: list(r["_codes"]) for r in codes.collect()
    }
    queries = corpus.filter(F.col("vec_id") < 2)
    got = pq_search(codes, books, queries, "embedding", "vec_id", k=60).collect()
    vecs = dict(rows)
    sub_d = 32 // m
    for r in got:
        recon = []
        for s in range(m):
            recon += books[s][code_map[r["corpus_id"]][s]]
        q = vecs[r["query_id"]]
        dp = sum(a * b for a, b in zip(q, recon))
        denom = math.sqrt(sum(a * a for a in q)) * math.sqrt(
            sum(a * a for a in recon)
        )
        assert abs(r["approx_cos"] - dp / denom) < 1e-9


def test_cluster_level_retrieval(spark):
    """PQ cannot rank WITHIN a cluster (same-cluster points share
    codes — by design), but it must retrieve the right cluster: for a
    query in cluster g, >=90% of its top-(cluster_size) hits are
    cluster-g members."""
    rnd = random.Random(11)
    dim, n_clusters, per = 64, 12, 20
    centers = [
        [rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = [
        (i, [x + rnd.gauss(0, 0.15) for x in centers[i % n_clusters]])
        for i in range(n_clusters * per)
    ]
    corpus = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    codes, books = pq_build(corpus, "embedding", "vec_id", m=8, k=16, iters=2)
    queries = corpus.filter(F.col("vec_id") < 4)
    got = pq_search(
        codes, books, queries, "embedding", "vec_id", k=per - 1
    ).collect()
    hits = defaultdict(list)
    for r in got:
        hits[r["query_id"]].append(r["corpus_id"])
    for qid, ids in hits.items():
        same = sum(1 for i in ids if i % n_clusters == qid % n_clusters)
        assert same >= 0.9 * len(ids), (qid, same, len(ids))


def test_build_and_search_deterministic(spark):
    from distcpplus_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    runs = []
    for _ in range(2):
        codes, books = pq_build(emb, "embedding", "vec_id", m=8, k=16, iters=2)
        runs.append(
            (
                books,
                sorted(
                    map(
                        tuple,
                        pq_search(
                            codes, books, queries, "embedding", "vec_id", k=5
                        ).collect(),
                    )
                ),
            )
        )
    assert runs[0] == runs[1]


def test_codes_are_compact(spark):
    """The representation contract: m codes per vector, codebooks
    m x k x (dim/m)."""
    from distcpplus_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    codes, books = pq_build(emb, "embedding", "vec_id", m=8, k=16, iters=1)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    row = codes.limit(1).collect()[0]
    assert len(row["_codes"]) == 8
    assert all(0 <= c < 16 for c in row["_codes"])
