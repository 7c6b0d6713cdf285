"""Properties of the session-3 statistical queries (queries/llm6.py).

KN smoothing invariants are checked on the real sf0.001 corpus: the
estimator must be a proper (sub-)distribution per context, strictly
positive, and the perplexity filter must produce per-language doc
counts that reconcile with the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_kn_is_subdistribution_per_context(spark):
    """Sum of p_kn over OBSERVED w3 for any (w1,w2) context must be
    <= 1 (the held-out mass covers unseen continuations) and every
    probability must be strictly positive."""
    from distcpplus_spark.queries.llm6 import _kn_scored_types

    _tri, scored = _kn_scored_types(spark, SF_DIR)
    sums = (
        scored.groupBy("w1", "w2")
        .agg(F.sum("p_kn").alias("mass"), F.min("p_kn").alias("pmin"))
        .agg(
            F.max("mass").alias("max_mass"),
            F.min("pmin").alias("min_p"),
        )
        .collect()[0]
    )
    assert sums["max_mass"] <= 1.0 + 1e-9
    assert sums["min_p"] > 0.0


def test_kn_high_count_dominates_low_count_same_context(spark):
    """Within one context, a higher trigram count can never get a
    lower KN probability (discounting is monotone in count)."""
    from distcpplus_spark.queries.llm6 import _kn_scored_types

    _tri, scored = _kn_scored_types(spark, SF_DIR)
    # Self-join pairs within a context where cnt strictly dominates
    # but p_kn inverted — excluding the continuation-probability term
    # differences requires cnt gap >= 1; we assert no pair violates
    # a slack of the max continuation contribution (0.75*fertility/c2
    # bounded by 1), so use strict count dominance with p gap < -1e-12
    # only when the backoff term is identical (same w3 is impossible;
    # instead verify via per-context rank correlation on counts>=2).
    a = scored.select("w1", "w2", "w3", "cnt", "p_kn")
    b = (
        scored.select(
            F.col("w1"),
            F.col("w2"),
            F.col("w3").alias("w3b"),
            F.col("cnt").alias("cntb"),
            F.col("p_kn").alias("p_knb"),
        )
    )
    viol = (
        a.join(b, ["w1", "w2"])
        .filter(
            (F.col("cnt") >= F.col("cntb") + 3)
            & (F.col("p_kn") < F.col("p_knb") - 0.05)
        )
        .count()
    )
    # A >=3-count advantage can only be overturned by backoff mass,
    # which is bounded well below 0.05 at this corpus's context sizes.
    assert viol == 0


def test_pca_recovers_planted_direction(spark):
    """Vectors = t*u + small orthogonal noise: PC1 must align with u
    (|cos| > 0.99) and eig1 must dominate eig2 by the planted SNR."""
    import numpy as np

    from distcpplus_spark.operators.pca import fit_pca, project

    rng_free = [(i, None) for i in range(200)]
    u = np.zeros(8)
    u[0], u[3] = 3.0, 4.0
    u /= 5.0
    rows = []
    for i, _ in rng_free:
        t = (i % 41) - 20.0
        noise = np.array(
            [((i * 7 + j * 13) % 11 - 5) * 0.02 for j in range(8)]
        )
        rows.append((i, (t * u + noise).tolist()))
    df = spark.createDataFrame(rows, "id LONG, v ARRAY<DOUBLE>")
    n, mean, comps, eigs, cov = fit_pca(df, "v", 2)
    assert n == 200
    cos = abs(float(np.dot(comps[0], u)))
    assert cos > 0.99
    assert eigs[0] > 50 * eigs[1]
    # Distributed projection onto PC1 reproduces eig1 as its variance.
    import pyspark.sql.functions as SF

    centered = df.withColumn(
        "c",
        SF.zip_with(
            SF.col("v"),
            SF.array(*[SF.lit(float(m)) for m in mean]),
            lambda a, b: a - b,
        ),
    )
    pvar = (
        project(centered, "c", comps[:1])
        .agg(SF.var_pop("proj_0").alias("s2"))
        .collect()[0]["s2"]
    )
    assert abs(pvar - float(eigs[0])) < 1e-8


def test_catalog_stats_advisor_branches(spark):
    """The relative broadcast cutoff must fire BOTH branches at the
    smallest sf: lineitem shuffles, region/nation broadcast."""
    from distcpplus_spark.queries.llm6 import q289_catalog_stats_advisor

    plans = {
        r["table_name"]: r["join_plan"]
        for r in q289_catalog_stats_advisor(spark, SF_DIR).collect()
    }
    assert plans["lineitem"] == "shuffle"
    assert plans["region"] == "broadcast"
    assert plans["nation"] == "broadcast"


def test_sorted_neighborhood_candidates_bounded(spark):
    """Sorted-neighborhood candidates are <= w*n and every returned
    pair clears the Jaccard threshold."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.queries.llm6 import (
        q290_sorted_neighborhood_pairs,
    )

    out = q290_sorted_neighborhood_pairs(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(out) <= 3 * n_docs
    assert all(r["jac6"] >= 0.85 for r in out)
    assert all(r["doc_a"] != r["doc_b"] for r in out)


def test_join_cardinality_identity_holds(spark):
    """Every estimate row must report predicted == actual (the inner
    product identity is exact with exact histograms)."""
    from distcpplus_spark.queries.llm6 import (
        q292_join_cardinality_estimator,
    )

    rows = q292_join_cardinality_estimator(spark, SF_DIR).collect()
    assert len(rows) == 3
    assert all(r["estimate_exact"] for r in rows)
    assert all(r["predicted_pairs"] == r["actual_pairs"] for r in rows)


def test_bitmap_index_counts_agree(spark):
    """Bitmap AND/OR popcounts must equal direct predicate counts,
    and the word count must be ceil(n_rows/32)."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.queries.llm6 import (
        q293_bitmap_index_intersection,
    )

    r = q293_bitmap_index_intersection(spark, SF_DIR).collect()[0]
    assert r["bitmap_agrees"]
    n = load_table(spark, SF_DIR, "orders").count()
    assert r["n_words"] == (n + 31) // 32
    # Inclusion-exclusion sanity: |A|+|B| = |A∩B|+|A∪B| is implied by
    # agreement with direct counts; check AND <= OR explicitly.
    assert r["n_and"] <= r["n_or"]


def test_maxsim_bounded_by_query_token_count(spark):
    """MaxSim of unit-capped cosines is bounded by the number of
    query tokens, and every doc scores all 8 query tokens."""
    from distcpplus_spark.queries.llm6 import (
        q294_maxsim_late_interaction,
    )

    rows = q294_maxsim_late_interaction(spark, SF_DIR).collect()
    assert rows, "retrieval returned no docs"
    assert all(r["n_query_tokens"] == 8 for r in rows)
    assert all(-8.0 <= r["maxsim6"] <= 8.0 for r in rows)
    scores = [r["maxsim6"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_perplexity_filter_reconciles_doc_counts(spark):
    """Every document with >= 3 tokens is scored exactly once; the
    per-language doc counts must match a direct count."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.queries.llm6 import q287_kn_perplexity_filter

    out = {
        r["lang"]: r["n_docs"]
        for r in q287_kn_perplexity_filter(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents")
    direct = {
        r["lang"]: r["n"]
        for r in docs.filter(
            F.size(
                F.filter(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda x: x != "",
                )
            )
            >= 3
        )
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out == direct
