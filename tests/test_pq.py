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


def test_kernel_assignment_matches_fold(spark):
    """Round-14: pq_build's Arrow-kernel assignment must be
    BIT-IDENTICAL to the round-13 broadcast packed-struct F.aggregate
    fold it replaced — codebooks after both Lloyd iterations AND the
    final codes (including the _recon_norm2 float sum, hex-compared,
    which pins the kernel's row emission order = posexplode order)."""
    from pyspark.sql import functions as F

    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.functions.vectors import dot, to_double_array

    m, k, iters = 8, 16, 2
    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    # --- round-13 fold formulation, verbatim ---
    c = corpus.select(
        F.col("vec_id").alias("corpus_id"),
        to_double_array(F.col("embedding")).alias("_cv"),
    )
    dim = c.select(F.size("_cv").alias("d")).limit(1).collect()[0]["d"]
    sub_d = dim // m
    slices = F.array(
        *[F.slice("_cv", s * sub_d + 1, sub_d) for s in range(m)]
    )
    subs = c.select("corpus_id", F.posexplode(slices).alias("_sub", "_sv"))
    seed_rows = c.orderBy("corpus_id").limit(k).select("_cv").collect()
    codebooks = [
        [list(r["_cv"])[s * sub_d : (s + 1) * sub_d] for r in seed_rows]
        for s in range(m)
    ]

    def _codebook_frame():
        return spark.createDataFrame(
            [(s, j, codebooks[s][j]) for s in range(m) for j in range(k)],
            schema="_sub INT, _code INT, _centroid ARRAY<DOUBLE>",
        )

    def _assign(sub_frame):
        packed = (
            _codebook_frame()
            .groupBy("_sub")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "_code",
                            "_centroid",
                            dot(F.col("_centroid"), F.col("_centroid"))
                            .alias("_cn2"),
                        )
                    )
                ).alias("_cents")
            )
        )

        def step(acc, x):
            d2 = x["_cn2"] - 2.0 * dot(F.col("_sv"), x["_centroid"])
            return F.when(
                d2 < acc["_d2"],
                F.struct(
                    d2.alias("_d2"),
                    x["_code"].alias("_c"),
                    x["_cn2"].alias("_n2"),
                ),
            ).otherwise(acc)

        best = F.aggregate(
            F.col("_cents"),
            F.struct(
                F.lit(float("inf")).cast("double").alias("_d2"),
                F.lit(-1).alias("_c"),
                F.lit(0.0).cast("double").alias("_n2"),
            ),
            step,
        )
        return (
            sub_frame.join(F.broadcast(packed), "_sub")
            .withColumn("_best", best)
            .select(
                "corpus_id",
                "_sub",
                "_sv",
                F.col("_best._c").alias("_code"),
                F.col("_best._n2").alias("_cn2"),
            )
        )

    for _ in range(iters):
        mean_rows = (
            _assign(subs)
            .select("_sub", "_code", F.posexplode("_sv").alias("_pos", "_x"))
            .groupBy("_sub", "_code", "_pos")
            .agg(F.avg("_x").alias("_mean"))
            .collect()
        )
        acc = {}
        for r in mean_rows:
            acc.setdefault((r["_sub"], r["_code"]), {})[r["_pos"]] = r["_mean"]
        for (s, j), d in acc.items():
            codebooks[s][j] = [d[i] for i in range(len(d))]
    fold_codes = (
        _assign(subs)
        .groupBy("corpus_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_sub", "_code"))),
                lambda x: x["_code"],
            ).alias("_codes"),
            F.sum("_cn2").alias("_recon_norm2"),
        )
    )

    # --- the shipped kernel path ---
    k_codes, k_books = pq_build(
        corpus, "embedding", "vec_id", m=m, k=k, iters=iters
    )

    assert k_books == codebooks
    want = {
        r["corpus_id"]: (tuple(r["_codes"]), r["_recon_norm2"].hex())
        for r in fold_codes.collect()
    }
    got = {
        r["corpus_id"]: (tuple(r["_codes"]), r["_recon_norm2"].hex())
        for r in k_codes.collect()
    }
    assert got == want and len(got) > 0
