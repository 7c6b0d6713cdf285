"""LLM-data-pipeline operators (SURVEY.md §2b) in oracle-checkable form.

Dedup (exact, MinHash, n-gram Jaccard, SimHash), similarity search over
embeddings, and text analysis (token stats, language-ID heuristic,
quality scoring, fingerprinting). Every query here is expressed with
engine-portable primitives (md5, string ops, higher-order list
functions) so the DuckDB oracle computes bit-identical results.

The reusable column expressions live in distcpplus_spark.functions.*;
these queries wire them to the fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.functions.text import (
    char_shingles,
    punct_count,
    quality_score_cols,
    rolling_hash,
    stopword_hits,
)
from distcpplus_spark.functions.vectors import cosine_similarity
from distcpplus_spark.queries import query, small_sort

# ---------------------------------------------------------------------------
# Exact deduplication
# ---------------------------------------------------------------------------


@query(
    "q50_exact_dedup_groups",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper,
           CAST(count(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY md5(text)
    ORDER BY text_hash
    """,
)
def q50_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy text, keep min(doc_id) per group.

    Scale: group key is the 128-bit hash, not the text — the shuffle
    moves 16-byte keys instead of documents. This is THE pattern for
    exact dedup at 100 TB.

    Round-14 optimization (guide §2.4 — two operations keyed the same
    way share one exchange): groupBy-then-orderBy planned TWO
    exchanges of ~|distinct hashes| rows (hash for the agg, range for
    the sort) although dedup keys are ~unique (exact-dup rate ~0.16%),
    so the agg's partial combine saved almost nothing. Range-partition
    the hash FIRST: RangePartitioning(text_hash) satisfies the agg's
    ClusteredDistribution, so the aggregate runs in-place and
    sortWithinPartitions yields the same global order — ONE exchange
    (plus the range sampler's cheap key scan). Measured 2.08→1.53 s at
    sf3, 1.13→1.03 s at sf1, ~wash at sf0.1; rows identical.
    """
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            F.md5(F.col("text").cast("binary")).alias("text_hash"), "doc_id"
        )
        .repartitionByRange("text_hash")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count("*").alias("group_size"),
        )
        .sortWithinPartitions("text_hash")
    )


@query(
    "q51_exact_dedup_survivors",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dropped
    FROM documents
    """,
)
def q51_exact_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup summary: total vs unique vs dropped counts."""
    return load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5(F.col("text").cast("binary")))).alias(
            "n_dropped"
        ),
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "q52_text_stats",
    oracle="""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(round(avg(n_chars), 6) AS DOUBLE) AS avg_chars,
           CAST(round(avg(len(string_split(text, ' '))), 6) AS DOUBLE)
               AS avg_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def q52_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics by language × source."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.avg(F.size(F.split("text", " ", -1))), 6).alias("avg_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "q53_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_bpe_est,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_unique_tokens
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def q53_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a chars/4 BPE estimate
    (the standard ~4-chars-per-token heuristic)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(F.split("text", " ", -1)).cast("bigint").alias("n_ws_tokens"),
            F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("n_bpe_est"),
            F.size(F.array_distinct(F.split("text", " ", -1)))
            .cast("bigint")
            .alias("n_unique_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "q54_language_id",
    oracle="""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
                    >= 2
                THEN 'en' ELSE 'other' END AS predicted_lang
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def q54_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic (≥2 English stopwords → en).
    A real n-gram classifier would rank per-language profiles; the
    declared operator is the scoring plumbing, oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(stopword_hits(F.col("text")) >= 2, "en")
        .otherwise("other")
        .alias("predicted_lang"),
    ).orderBy("doc_id")


@query(
    "q55_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(round(least(n_chars / 500.0, 1.0), 6) AS DOUBLE) AS len_score,
           CAST(round(len(list_filter(string_split(text, ' '),
                t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
                / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS DOUBLE)
               AS stopword_ratio,
           CAST(round(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                / CAST(length(text) AS DOUBLE), 6) AS DOUBLE) AS punct_ratio
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def q55_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality signals: length score, stopword ratio,
    punctuation ratio — the standard C4/Gopher-style filter features."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ls, sr, pr = quality_score_cols(F.col("text"), F.col("n_chars"))
    return docs.select(
        "doc_id",
        ls.alias("len_score"),
        sr.alias("stopword_ratio"),
        pr.alias("punct_ratio"),
    ).orderBy("doc_id")


@query(
    "q56_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                 i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT) AS poly_hash,
           md5(substr(text, 1, 64)) AS prefix_hash
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q56_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash (base 31,
    mod 1e9+7) over characters + an md5 prefix hash."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        rolling_hash(F.col("text")).alias("poly_hash"),
        F.md5(F.substring("text", 1, 64).cast("binary")).alias("prefix_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Near-duplicate detection: n-gram Jaccard, MinHash, SimHash
# ---------------------------------------------------------------------------

_SHINGLES_SQL = """
  SELECT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, greatest(length(text) - 7, 0) + 1),
             i -> substr(text, CAST(i AS INTEGER), 8)))) AS shingle
    FROM documents
    WHERE doc_id < 60
  )
"""


@query(
    "q57_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
              FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(round(n_common /
                CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS DOUBLE)
               AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.1
    ORDER BY doc_a, doc_b
    """,
)
def q57_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (char 8-shingle) Jaccard similarity for doc pairs
    sharing shingles, thresholded at 0.1.

    Scale: the shingle self-join is the exact-but-quadratic baseline;
    q58/q59 are the LSH path that bounds candidate pairs. Restricting
    doc_id < 60 keeps the oracle cheap; the operator itself is generic.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(char_shingles(F.col("text"), 8))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q58_minhash_signatures",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL})
    SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
    FROM sh, (VALUES (0), (1), (2), (3)) seeds(seed)
    GROUP BY doc_id, seed
    ORDER BY doc_id, seed
    """,
)
def _minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, minhash) signature table, UNSORTED.

    Round-14 optimization (guide §2.3 — aggregate before you shuffle /
    don't expand rows you immediately re-collapse): the old pipeline
    EXPLODED each shingle row into 4 seed rows and grouped by
    (doc_id, seed). The 4 seeded md5s are computed per shingle either
    way, so the explode only multiplied the rows the partial aggregate
    had to hash-group (4×). Now one groupBy(doc_id) takes the 4 mins
    as 4 aggregate columns and stack() unpivots the 4-wide result back
    to (seed, minhash) rows AFTER aggregation — output rows and
    schema identical (seed stays INT). Measured ~0.50→0.36 s for the
    materialized signature pass at sf0.1.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(char_shingles(F.col("text"), 8))).alias("shingle"),
    )
    aggs = [
        F.min(
            F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary"))
        ).alias(f"_m{i}")
        for i in range(4)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.expr(
                "stack(4, 0, _m0, 1, _m1, 2, _m2, 3, _m3) AS (seed, minhash)"
            ),
        )
    )


def q58_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: min over shingles of a seeded md5, 4 seeds.

    md5 (not murmur) keeps the hash engine-portable and deterministic —
    the LSH property only needs a uniform hash, not a fast one; swap in
    xxhash64 when oracle parity is not required.
    """
    return _minhash_sig(spark, sf_dir).orderBy("doc_id", "seed")


@query(
    "q59_minhash_candidates",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
      FROM sh, (VALUES (0), (1), (2), (3)) seeds(seed)
      GROUP BY doc_id, seed
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_matching_seeds
    FROM sig a JOIN sig b
      ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    ORDER BY doc_a, doc_b
    """,
)
def q59_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: docs agreeing on ≥2 of 4 minhashes.

    Scale: the join is on (seed, minhash) — i.e. LSH bucketing — so
    candidate generation never enumerates the O(n^2) pair space. The
    signature table is materialized once (localCheckpoint) before the
    self-join: signatures are 4 tiny rows per document, while
    recomputing them on both join sides would re-run the whole
    shingle-explode pipeline twice (~30% of this query's cost).
    Round 14: the checkpoint materializes the UNSORTED signature table
    (_minhash_sig) — q58's orderBy only existed for its own declared
    output, and sorting before a hash self-join is wasted work
    (guide §2.4: an orderBy used only to make output deterministic is
    an accidental exchange).
    """
    sig = _minhash_sig(spark, sf_dir).localCheckpoint(eager=True)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.seed") == F.col("b.seed"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_matching_seeds"))
        .filter(F.col("n_matching_seeds") >= 2)
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q60_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 100
    ),
    bits AS (
      SELECT doc_id, bit.i,
             CASE WHEN substr(md5(tok), CAST(bit.i AS INTEGER), 1) >= '8'
                  THEN 1 ELSE -1 END AS sign
      FROM toks, (SELECT unnest(range(1, 17)) AS i) bit
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN bit_sum >= 0 THEN
                CAST(power(2, i - 1) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS simhash16
    FROM (
      SELECT doc_id, i, sum(sign) AS bit_sum
      FROM bits GROUP BY doc_id, i
    )
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q60_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over whitespace tokens.

    Bit i of a token's hash = high bit of hex digit i of its md5 (a
    portable trick: '8' <= hexchar compares correctly in ASCII for
    0-9a-f). SimHash bit = sign of the per-bit vote sum.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = docs.select("doc_id", F.explode(F.split("text", " ", -1)).alias("tok"))
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(16))).alias("i"),
        F.md5(F.col("tok").cast("binary")).alias("tok_md5"),
    ).select(
        "doc_id",
        "i",
        F.when(F.expr("substring(tok_md5, i, 1)") >= "8", 1).otherwise(-1).alias("sign"),
    )
    votes = bits.groupBy("doc_id", "i").agg(F.sum("sign").alias("bit_sum"))
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("bit_sum") >= 0,
                    F.pow(F.lit(2), F.col("i") - 1).cast("bigint"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("simhash16")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@query(
    "q61_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS qid,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS cid,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
          FROM embeddings),
    scored AS (
      SELECT qid, cid,
             list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) *
                sqrt(list_dot_product(cv, cv))) AS cos_sim
      FROM q, c WHERE qid != cid
    ),
    ranked AS (
      SELECT qid, cid, cos_sim,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY cos_sim DESC, cid) AS BIGINT) AS rk
      FROM scored
    )
    SELECT qid, cid, CAST(round(cos_sim, 6) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY qid, rk
    """,
)
def q61_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 5 query vectors vs the corpus,
    through the shared operator (operators.similarity.brute_force_topk
    — round 13 unified the previously-inline scorer).

    Scale path: the 5-query block rides the task closure and scoring
    is one vectorized Arrow kernel over the corpus scan (each corpus
    vector crosses Arrow once, column-order accumulation keeps cos_sim
    bit-identical to the old fold), then per-query top-k via
    WindowGroupLimit before the single query_id shuffle. For corpus-
    vs-corpus, switch to the LSH-bucketed variant (q62 machinery).
    """
    from distcpplus_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    hits = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), "embedding", "vec_id", k=5
    )
    return (
        hits.select(
            F.col("query_id").alias("qid"),
            F.col("corpus_id").alias("cid"),
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("bigint").alias("rk"),
        )
        .transform(small_sort, "qid", "rk")
    )


@query(
    "q62_embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings WHERE vec_id < 150),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             a.label AS label_a, b.label AS label_b,
             list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, CAST(label_a AS BIGINT) AS label_a,
           CAST(label_b AS BIGINT) AS label_b,
           CAST(round(cos_sim, 6) AS DOUBLE) AS cos_sim
    FROM pairs WHERE cos_sim >= 0.3
    ORDER BY id_a, id_b
    """,
)
def q62_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.3) on a
    bounded slice. The production-scale variant buckets by random
    hyperplane signs first (distcpplus_spark.operators.similarity)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine_similarity(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").cast("bigint").alias("label_a"),
            F.col("b.label").cast("bigint").alias("label_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
        .select("id_a", "id_b", "label_a", "label_b", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy("id_a", "id_b")
    )


@query(
    "q75_ivf_exhaustive_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS qid,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS cid,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
          FROM embeddings),
    scored AS (
      SELECT qid, cid,
             list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) *
                sqrt(list_dot_product(cv, cv))) AS cos_sim
      FROM q, c WHERE qid != cid
    ),
    ranked AS (
      SELECT qid, cid, cos_sim,
             CAST(row_number() OVER (PARTITION BY qid
               ORDER BY cos_sim DESC, cid) AS BIGINT) AS rk
      FROM scored
    )
    SELECT qid, cid, CAST(round(cos_sim, 6) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY qid, rk
    """,
)
def q75_ivf_exhaustive_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN (operators.similarity.ivf_build/ivf_search) probed
    exhaustively: nprobe = n_lists covers every inverted list, so the
    result must equal exact brute-force top-k — which is what the
    oracle computes. Proves the index machinery loses nothing; the
    approximation is only ever the nprobe cut (x09 exercises that).
    """
    from distcpplus_spark.operators.similarity import ivf_build, ivf_search
    from distcpplus_spark.queries import small_sort

    emb = load_table(spark, sf_dir, "embeddings")
    # zero Lloyd iterations: with nprobe = n_lists the search is exact
    # regardless of quantizer quality, so refinement only buys bench
    # time, not correctness (x09 exercises the tuned quantizer).
    # defer_assignment=True (round 14): the assignment argmax runs
    # INSIDE ivf_search's scoring kernel — one mapInPandas stage
    # instead of two chained ones, so each corpus vector crosses the
    # Arrow boundary once, not twice (guide §4.1), and the centroid
    # table is collected once instead of twice. Identical math and
    # results (test_ivf.py pins fused == staged); the staged build
    # (persist=True, materialized list_id) remains the right call for
    # repeated searches over one index.
    assigned, centroids = ivf_build(
        emb, "embedding", "vec_id", n_lists=4, iters=0, persist=False,
        defer_assignment=True,
    )
    hits = ivf_search(
        assigned,
        centroids,
        emb.filter(F.col("vec_id") < 5),
        "embedding",
        "vec_id",
        k=5,
        nprobe=None,  # exhaustive: probe every list, skip the ranking
    )
    return hits.select(
        F.col("query_id").alias("qid"),
        F.col("corpus_id").alias("cid"),
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("bigint").alias("rk"),
    ).transform(small_sort, "qid", "rk")


@query(
    "q79_training_data_pipeline",
    oracle="""
    WITH lang_ok AS (
      SELECT * FROM documents
      WHERE len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) >= 2
    ),
    quality_ok AS (
      SELECT * FROM lang_ok
      WHERE n_chars >= 100
        AND length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
              / CAST(length(text) AS DOUBLE) <= 0.10
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                     ORDER BY doc_id) AS rn
        FROM quality_ok
      ) WHERE rn = 1
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(round(avg(n_chars), 6) AS DOUBLE) AS avg_chars
    FROM deduped
    GROUP BY source
    ORDER BY source
    """,
)
def q79_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation in one plan: language-ID
    filter → quality filter (length + punctuation ratio) → exact dedup
    keeping the lowest doc_id → per-source token accounting.

    Scale shape: the two filters are predicate-pushdown-friendly scans
    (no shuffle); everything the downstream stages need (md5, token
    count, length) is PROJECTED BELOW the dedup exchange, so the
    shuffle carries ~48-byte rows instead of full documents (round-13
    fix — the text column used to ride the exchange only to be token-
    counted after dedup; at 100 TB the shuffle IS the pipeline cost,
    so shuffle bytes/row is the number to engineer). The final agg
    partial-aggregates. This is the composition the individual
    q50-q56 operators exist for.
    """
    from distcpplus_spark.queries import small_sort

    docs = load_table(spark, sf_dir, "documents")
    lang_ok = docs.filter(stopword_hits(F.col("text")) >= 2)
    punct_ratio = punct_count(F.col("text")) / F.length("text").cast(
        "double"
    )
    quality_ok = lang_ok.filter(
        (F.col("n_chars") >= 100) & (punct_ratio <= 0.10)
    )
    slim = quality_ok.select(
        "source",
        "doc_id",
        "n_chars",
        F.md5(F.col("text").cast("binary")).alias("_h"),
        F.size(F.split("text", " ", -1)).alias("_tok"),
    )
    w = W.partitionBy("_h").orderBy("doc_id")
    deduped = (
        slim.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .transform(small_sort, "source")
    )


@query(
    "q80_train_test_split",
    oracle="""
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 10 AS h
        FROM documents
      )
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM tagged
    GROUP BY split
    ORDER BY split
    """,
)
def q80_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-stable
    hash — REPRODUCIBLE across engines, runs, and cluster sizes, unlike
    sample()/randomSplit whose partition-dependent RNG reshuffles
    examples every re-run. Hash the id, bucket mod 10: any engine
    computing the same md5 assigns every document identically — which
    is exactly what the oracle verifies.
    """
    from distcpplus_spark.queries import small_sort

    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    tagged = docs.select(
        "doc_id",
        F.when(h < 8, "train").when(h == 8, "val").otherwise("test").alias(
            "split"
        ),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .transform(small_sort, "split")
    )


@query(
    "q94_document_chunking",
    oracle="""
    SELECT doc_id,
           CAST(t.i AS BIGINT) AS chunk_idx,
           substr(text, CAST(t.i * 200 + 1 AS INTEGER), 256) AS chunk_text,
           CAST(length(substr(text, CAST(t.i * 200 + 1 AS INTEGER), 256))
                AS BIGINT) AS chunk_len
    FROM documents,
         unnest(range(0, CAST(ceil(length(text) / 200.0) AS BIGINT))) t(i)
    WHERE doc_id < 100
    ORDER BY doc_id, chunk_idx
    """,
)
def q94_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 256-char windows every 200
    chars (56 overlap) — the RAG/pre-training chunker. One row explodes
    into ceil(len/stride) chunk rows; substring stays in codegen.

    Scale: explode fan-out is bounded by len/stride; chunk extraction
    is pure projection (no shuffle at all until a downstream groupBy).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    n_chunks = F.ceil(F.length("text") / 200.0).cast("bigint")
    chunked = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)
        ).alias("chunk_idx"),
        F.col("text"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.expr("substring(text, CAST(chunk_idx * 200 + 1 AS INT), 256)").alias(
            "chunk_text"
        ),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        F.length("chunk_text").cast("bigint").alias("chunk_len"),
    ).orderBy("doc_id", "chunk_idx")


@query(
    "q95_sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id < 500
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048)
                 AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY pack_id
    ORDER BY pack_id
    """,
)
def q95_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs
    (2048 tokens) by cumulative token count — the same prefix-sum
    bucketing as the copy planner's cost buckets (O10), applied to the
    training-batch packing problem.

    Scale: the cumulative token count is a DISTRIBUTED two-phase
    prefix sum (operators.scale.partitioned_running_agg): per-bucket
    running sums in parallel, one carry-in offset per bucket through
    the driver — no partition-less window anywhere in the plan. At
    100 TB only the per-bucket totals (one row per 128 doc ids) ever
    serialize.
    """
    from distcpplus_spark.operators.scale import partitioned_running_agg
    from distcpplus_spark.queries import small_sort

    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select(
            "doc_id",
            F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("n_tokens"),
        )
    )
    packed = partitioned_running_agg(
        toks,
        ["doc_id"],
        "n_tokens",
        "_cum",
        bucket=F.floor(F.col("doc_id") / 128).cast("bigint"),
    ).withColumn(
        "pack_id",
        F.floor((F.col("_cum") - F.col("n_tokens")) / 2048).cast("bigint"),
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .transform(small_sort, "pack_id")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed near-dup pairs — the scale-safe variant, oracle-checked
# ---------------------------------------------------------------------------

def _neardup_planes() -> list[list[float]]:
    """The q103 hyperplane set: identical constants on both engines
    (Python float repr round-trips exactly through DuckDB's parser)."""
    from distcpplus_spark.operators.similarity import make_hyperplanes

    return make_hyperplanes(64, 8, 42)


def _lsh_neardup_oracle() -> str:
    planes = _neardup_planes()
    bits = " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ",".join(repr(x) for x in p)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    return f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    b AS (SELECT vec_id, v, {bits} AS bucket FROM e),
    pairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             list_dot_product(a.v, b2.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b2.v, b2.v))) AS cos_sim
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    )
    SELECT id_a, id_b, CAST(round(cos_sim, 6) AS DOUBLE) AS cos_sim
    FROM pairs WHERE cos_sim >= 0.2
    ORDER BY id_a, id_b
    """


@query("q103_lsh_neardup_pairs", oracle=_lsh_neardup_oracle())
def q103_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vs-corpus near-dup pairs via hyperplane-LSH bucketing —
    the SCALE-SAFE path (operators.similarity.pairwise_above_threshold)
    as a hash-checked declared query, replacing q62's bounded all-pairs
    slice as the production recipe.

    Candidates are generated strictly within sign-signature buckets
    (cost Σ|bucket|², never n²); exact cosine runs only on candidates.
    The oracle reproduces the bucketing bit-for-bit: the hyperplane
    constants are inlined as literals and both engines fold the dot
    product sequentially in double (projection margins ≥6e-4 at this
    seed, 10 orders above summation noise — signs cannot diverge).
    """
    from distcpplus_spark.operators.similarity import pairwise_above_threshold

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = pairwise_above_threshold(
        emb, "embedding", "vec_id", threshold=0.2, n_planes=8, dim=64, seed=42
    )
    return (
        pairs.select(
            "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
        )
        .transform(small_sort, "id_a", "id_b")
    )


def _semantic_dedup_oracle() -> str:
    planes = _neardup_planes()
    bits = " || ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ",".join(repr(x) for x in p)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    return f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    b AS (SELECT vec_id, v, {bits} AS bucket FROM e)
    SELECT a.vec_id AS vec_id
    FROM b a
    WHERE NOT EXISTS (
      SELECT 1 FROM b o
      WHERE o.bucket = a.bucket AND o.vec_id < a.vec_id
        AND list_dot_product(a.v, o.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(o.v, o.v))) >= 0.2
    )
    ORDER BY vec_id
    """


@query("q180_semantic_dedup", oracle=_semantic_dedup_oracle())
def q180_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup survivors under the driver's
    hash gate (operators/dedup.py:semantic_dedup): a vector is pruned
    iff a smaller-id vector in its sign-LSH bucket has cosine >= 0.2.
    The keep-first rule replaces learned k-means clustering with a
    closed-form contract both engines compute exactly — the oracle
    inlines the q103 hyperplane constants and mirrors the EXISTS
    semantics directly (same sign-margin argument as q103: >=6e-4 at
    this seed, signs cannot diverge across engines)."""
    from distcpplus_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        semantic_dedup(
            emb, "embedding", "vec_id",
            threshold=0.2, n_planes=8, dim=64, seed=42,
        )
        .select(F.col("vec_id").cast("bigint").alias("vec_id"))
        .transform(small_sort, "vec_id")
    )
