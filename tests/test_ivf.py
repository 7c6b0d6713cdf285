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


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """Embeddings WITH near-duplicate structure (20 tight clusters):
    the operating point LSH is built for. The random fixture table is
    the adversarial case — its "neighbors" sit at cosine ~0, which no
    sublinear method can recover without scanning everything."""
    import math
    import random

    rng = random.Random(7)
    dim, n_clusters, per = 64, 20, 25
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in center))
        center = [x / norm for x in center]
        for _ in range(per):
            v = [x + rng.gauss(0.0, 0.01) for x in center]
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>"
    ).cache()


def test_multiprobe_lsh_recall_beats_single_probe(spark, clustered_emb):
    """Hamming-1 multi-probe lifts recall@5 to >=0.9 on clustered
    embeddings, strictly above single-probe."""
    from distcpplus_spark.operators.similarity import lsh_topk

    emb = clustered_emb
    queries = emb.filter(F.col("vec_id") % 25 == 0).limit(20)
    bf = brute_force_topk(emb, queries, "embedding", "vec_id", k=5)
    bf_top = {(r["query_id"], r["corpus_id"]) for r in bf.collect()}

    def recall(multi):
        got = lsh_topk(
            emb, queries, "embedding", "vec_id", k=5,
            n_planes=8, multi_probe=multi,
        )
        pairs = {(r["query_id"], r["corpus_id"]) for r in got.collect()}
        return len(pairs & bf_top) / len(bf_top)

    r1 = recall(False)
    rm = recall(True)
    assert rm >= 0.9
    assert rm > r1  # single-probe misses cross-plane neighbors


def test_multiprobe_no_duplicate_pairs(spark, emb):
    from distcpplus_spark.operators.similarity import lsh_topk

    queries = emb.filter(F.col("vec_id") < 5)
    got = lsh_topk(
        emb, queries, "embedding", "vec_id", k=50, n_planes=6,
        multi_probe=True,
    )
    n = got.count()
    nd = got.select("query_id", "corpus_id").distinct().count()
    assert n == nd


# ---------------------------------------------------------------------------
# Arrow-kernel vs interpreted-fold bit parity
#
# The round-13 rewrite moved IVF assignment and scoring from
# higher-order F.aggregate folds into vectorized mapInPandas kernels
# (operators/similarity.py). The kernels claim BIT-IDENTICAL results
# via column-order accumulation; these tests pin that claim against a
# frozen copy of the fold implementation they replaced.


def _fold_assign_reference(c, centroids):
    """Frozen round-10..12 packed-struct fold assignment — the
    arithmetic _assign_lists' Arrow kernel must reproduce exactly."""
    from distcpplus_spark.functions.vectors import dot

    packed = centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "list_id",
                    "_centroid",
                    F.sqrt(
                        dot(F.col("_centroid"), F.col("_centroid"))
                    ).alias("_cent_norm"),
                )
            )
        ).alias("_cents")
    )
    norm = F.sqrt(dot(F.col("_cv"), F.col("_cv")))

    def step(acc, x):
        s = dot(F.col("_cv"), x["_centroid"]) / (
            F.col("_cnorm") * x["_cent_norm"]
        )
        return F.when(
            s > acc["_s"],
            F.struct(
                s.alias("_s"), x["list_id"].cast("long").alias("_lid")
            ),
        ).otherwise(acc)

    best = F.aggregate(
        F.col("_cents"),
        F.struct(
            F.lit(float("-inf")).cast("double").alias("_s"),
            F.lit(-1).cast("long").alias("_lid"),
        ),
        step,
    )
    return (
        c.crossJoin(F.broadcast(packed))
        .withColumn("_cnorm", norm)
        .withColumn("list_id", best["_lid"])
        .select("corpus_id", "_cv", "list_id")
    )


def test_pdot_bit_identical_to_fold(spark, emb):
    """functions.vectors.pdot (Arrow kernel) vs the F.aggregate fold:
    bitwise-equal dots on real pairs, NULL-parity on the edges."""
    import struct

    from distcpplus_spark.functions.vectors import dot, pdot, to_double_array

    v = emb.select(
        "vec_id", to_double_array(F.col("embedding")).alias("v")
    )
    pairs = v.limit(40).crossJoin(
        F.broadcast(
            v.select(F.col("vec_id").alias("w_id"), F.col("v").alias("w"))
            .limit(25)
        )
    )
    rows = pairs.select(
        dot(F.col("v"), F.col("w")).alias("fold"),
        pdot(F.col("v"), F.col("w")).alias("kern"),
    ).collect()
    assert len(rows) == 1000
    for r in rows:
        assert struct.pack("<d", r["fold"]) == struct.pack("<d", r["kern"])
    edge = spark.createDataFrame(
        [([], []), (None, [1.0]), ([1.0, 2.0], [3.0]), ([1.5, 2.5], [2.0, 4.0])],
        "a array<double>, b array<double>",
    ).select(
        dot(F.col("a"), F.col("b")).alias("fold"),
        pdot(F.col("a"), F.col("b")).alias("kern"),
    )
    for r in edge.collect():
        assert r["fold"] == r["kern"]


def test_kernel_assignment_bit_identical_to_fold(spark, emb):
    from distcpplus_spark.functions.vectors import to_double_array
    from distcpplus_spark.operators.similarity import (
        _assign_lists,
        ivf_build,
    )

    # Lloyd-trained centroids = realistic (non-lattice) doubles
    _, centroids = ivf_build(emb, "embedding", "vec_id", n_lists=8, iters=2)
    c = emb.select(
        F.col("vec_id").alias("corpus_id"),
        to_double_array(F.col("embedding")).alias("_cv"),
    )
    got = {
        r["corpus_id"]: r["list_id"]
        for r in _assign_lists(c, centroids).collect()
    }
    want = {
        r["corpus_id"]: r["list_id"]
        for r in _fold_assign_reference(c, centroids).collect()
    }
    assert got == want


def test_kernel_scoring_bit_identical_to_fold(spark, emb):
    """ivf_search's kernel cosine must equal the fold cosine to the
    LAST BIT (struct.pack comparison, not approx) — the column-order
    accumulation contract, exhaustive and probed."""
    import struct

    from distcpplus_spark.functions.vectors import dot, l2_norm
    from distcpplus_spark.operators.similarity import ivf_build, ivf_search

    assigned, centroids = ivf_build(
        emb, "embedding", "vec_id", n_lists=8, iters=2
    )
    queries = emb.filter(F.col("vec_id") < 7)
    for nprobe in (None, 3):
        got = {
            (r["query_id"], r["corpus_id"]): struct.pack("<d", r["cos_sim"])
            for r in ivf_search(
                assigned, centroids, queries, "embedding", "vec_id",
                k=5, nprobe=nprobe,
            ).collect()
        }
        # fold reference: score the top-k pairs the kernel returned
        from distcpplus_spark.functions.vectors import to_double_array

        q = queries.select(
            F.col("vec_id").alias("query_id"),
            to_double_array(F.col("embedding")).alias("_qv"),
        ).withColumn("_qnorm", l2_norm(F.col("_qv")))
        ref = (
            assigned.withColumn("_cnorm_s", l2_norm(F.col("_cv")))
            .join(F.broadcast(q), F.col("query_id") != F.col("corpus_id"))
            .select(
                "query_id",
                "corpus_id",
                (
                    dot(F.col("_qv"), F.col("_cv"))
                    / (F.col("_qnorm") * F.col("_cnorm_s"))
                ).alias("cos_sim"),
            )
            .collect()
        )
        want = {
            (r["query_id"], r["corpus_id"]): struct.pack("<d", r["cos_sim"])
            for r in ref
        }
        assert got, "kernel returned no rows"
        for pair, bits in got.items():
            assert want[pair] == bits, (pair, nprobe)


def test_fused_defer_assignment_equals_staged(spark, emb):
    """ivf_build(defer_assignment=True) + ivf_search must return the
    staged path's exact rows (incl. cos_sim bits) for both exhaustive
    and finite nprobe — the fusion is a pure Arrow-boundary saving."""
    import struct

    queries = emb.filter(F.col("vec_id") < 5)
    for nprobe in (None, 2):
        a_s, c_s = ivf_build(
            emb, "embedding", "vec_id", n_lists=4, iters=0, persist=False
        )
        staged = ivf_search(
            a_s, c_s, queries, "embedding", "vec_id", k=5, nprobe=nprobe
        ).collect()
        a_f, c_f = ivf_build(
            emb, "embedding", "vec_id", n_lists=4, iters=0, persist=False,
            defer_assignment=True,
        )
        assert "list_id" not in a_f.columns
        fused = ivf_search(
            a_f, c_f, queries, "embedding", "vec_id", k=5, nprobe=nprobe
        ).collect()

        def key(rows):
            return sorted(
                (
                    r["query_id"],
                    r["corpus_id"],
                    r["rank"],
                    struct.pack("<d", r["cos_sim"]),
                )
                for r in rows
            )

        assert key(staged) == key(fused), f"nprobe={nprobe}"


def test_defer_assignment_rejects_lloyd_and_persist(spark, emb):
    with pytest.raises(ValueError):
        ivf_build(
            emb, "embedding", "vec_id", n_lists=4, iters=2, persist=False,
            defer_assignment=True,
        )
    with pytest.raises(ValueError):
        ivf_build(
            emb, "embedding", "vec_id", n_lists=4, iters=0, persist=True,
            defer_assignment=True,
        )
