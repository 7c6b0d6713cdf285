"""Round-8 continuation queries (session 5): retrieval fusion and
evaluation, counts-based text classification, time-series diagnostics,
weighted sampling, multi-pattern matching.

Reference parity notes cite turn/DistCPPlus files as provenance
(what to compute), never as implementation source — the execution
design here is Spark-first (see SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    to_double_array,
)
from distcpplus_spark.queries import local_rows, money_sum, query, small_sort


def _term_count(toks, term):
    # single-arg lambda: a two-parameter lambda would be treated as
    # (element, index) by the higher-order filter (q220 precedent)
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


_COS_SQL = """round(list_dot_product({a}, {b})
        / (sqrt(list_dot_product({a}, {a}))
           * sqrt(list_dot_product({b}, {b}))), 6)"""


@query(
    "q325_rrf_hybrid_retrieval",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents WHERE doc_id < 300
    ),
    sp AS (
      SELECT doc_id,
             round((len(list_filter(toks, x -> x = 'data'))
                  + len(list_filter(toks, x -> x = 'model')))
                  / CAST(len(list_filter(toks, t -> t <> ''))
                         AS DOUBLE), 6) AS s
      FROM docs
      WHERE len(list_filter(toks, t -> t <> '')) > 0
    ),
    spr AS (
      SELECT doc_id, rk FROM (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rk
        FROM sp WHERE s > 0
      ) WHERE rk <= 20
    ),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 300
    ),
    qv AS (SELECT v FROM e WHERE vec_id = 7),
    dn AS (
      SELECT e.vec_id AS doc_id,
             {_COS_SQL.format(a="e.v", b="q.v")} AS s
      FROM e, qv q WHERE e.vec_id <> 7
    ),
    dnr AS (
      SELECT doc_id, rk FROM (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rk
        FROM dn
      ) WHERE rk <= 20
    )
    SELECT doc_id,
           CAST(round(COALESCE(1.0 / (60 + a.rk), 0.0)
                      + COALESCE(1.0 / (60 + b.rk), 0.0), 6) AS DOUBLE)
               AS rrf_6,
           CAST(a.rk AS BIGINT) AS sparse_rk,
           CAST(b.rk AS BIGINT) AS dense_rk
    FROM spr a FULL OUTER JOIN dnr b USING (doc_id)
    ORDER BY rrf_6 DESC, doc_id
    LIMIT 10
    """,
)
def q325_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of a sparse (term-frequency) ranker and a
    dense (cosine) ranker — the standard hybrid-retrieval combiner for
    RAG corpora (score = Σ 1/(60+rank_i), Cormack et al. SIGIR'09) —
    under the driver hash gate. Each ranker contributes its top-20
    (rank from ROUNDED score with doc_id tie-break, the
    round-then-rank discipline); fusion is a full outer join of two
    20-row frames.

    Scale: each ranker's top-k is a TakeOrderedAndProject (per-
    partition heap, driver merge) — the fused join touches only
    2·k rows no matter the corpus size. Ranks over the 20 surviving
    rows run through operators.scale.distributed_ranks (two-phase
    prefix sums) like every other global rank in the registry — the
    window-audit whitelist is empty; no partition-less Window exists
    anywhere, bounded or not."""
    from distcpplus_spark.operators.scale import distributed_ranks
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id", F.split(F.lower("text"), " ", -1).alias("toks")
        )
    )
    dlen = F.size(F.filter(F.col("toks"), lambda t: t != ""))
    sp = (
        docs.withColumn("dlen", dlen)
        .filter(F.col("dlen") > 0)
        .select(
            "doc_id",
            F.round(
                (
                    _term_count(F.col("toks"), "data")
                    + _term_count(F.col("toks"), "model")
                )
                / F.col("dlen").cast("double"),
                6,
            ).alias("s"),
        )
        .filter(F.col("s") > 0)
    )
    # top-k via orderBy().limit(): TakeOrderedAndProject; ranks over
    # the 20 survivors via the distributed prefix-sum machinery
    # ((s desc, doc_id) is a total order)
    spr = distributed_ranks(
        sp.orderBy(F.desc("s"), F.asc("doc_id")).limit(20),
        order=[("s", False), ("doc_id", True)],
        row_number_col="rk",
    ).select("doc_id", "rk")
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", to_double_array("embedding").alias("v"))
    )
    qv = emb.filter(F.col("vec_id") == 7).select(F.col("v").alias("qv"))
    dn = (
        emb.filter(F.col("vec_id") != 7)
        .join(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine_similarity(F.col("v"), F.col("qv")), 6
            ).alias("s"),
        )
    )
    dnr = distributed_ranks(
        dn.orderBy(F.desc("s"), F.asc("doc_id")).limit(20),
        order=[("s", False), ("doc_id", True)],
        row_number_col="rk",
    ).select("doc_id", "rk")
    fused = (
        spr.withColumnRenamed("rk", "sparse_rk")
        .join(
            dnr.withColumnRenamed("rk", "dense_rk"),
            "doc_id",
            "full_outer",
        )
        .select(
            "doc_id",
            F.round(
                F.coalesce(
                    1.0 / (F.lit(60) + F.col("sparse_rk")), F.lit(0.0)
                )
                + F.coalesce(
                    1.0 / (F.lit(60) + F.col("dense_rk")), F.lit(0.0)
                ),
                6,
            ).alias("rrf_6"),
            F.col("sparse_rk").cast("bigint").alias("sparse_rk"),
            F.col("dense_rk").cast("bigint").alias("dense_rk"),
        )
    )
    return (
        fused.orderBy(F.desc("rrf_6"), F.asc("doc_id"))
        .limit(10)
        .transform(small_sort, F.desc("rrf_6"), "doc_id")
    )


_MMR_SIM = _COS_SQL.format(a="p.v", b="c.v")

_MMR_ORACLE = f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    qv AS (SELECT v FROM e WHERE id = 7),
    cand AS (
      SELECT id, v, rel FROM (
        SELECT e.id, e.v,
               {_COS_SQL.format(a="e.v", b="q.v")} AS rel,
               row_number() OVER (
                 ORDER BY {_COS_SQL.format(a="e.v", b="q.v")} DESC, e.id
               ) AS rk
        FROM e, qv q WHERE e.id <> 7
      ) WHERE rk <= 10
    ),
    s0 AS (
      SELECT id, v, rel, round(0.7 * rel, 6) AS sc,
             CAST(0.0 AS DOUBLE) AS mx
      FROM cand ORDER BY round(0.7 * rel, 6) DESC, id LIMIT 1
    ),
    d1 AS (
      SELECT p.id, p.v, p.rel, greatest(p.mx, {_MMR_SIM}) AS mx
      FROM (SELECT id, v, rel, CAST(0.0 AS DOUBLE) AS mx
            FROM cand WHERE id NOT IN (SELECT id FROM s0)) p, s0 c
    ),
    s1 AS (
      SELECT id, v, rel, round(0.7 * rel - 0.3 * mx, 6) AS sc, mx
      FROM d1 ORDER BY round(0.7 * rel - 0.3 * mx, 6) DESC, id LIMIT 1
    ),
    d2 AS (
      SELECT p.id, p.v, p.rel, greatest(p.mx, {_MMR_SIM}) AS mx
      FROM (SELECT id, v, rel, mx FROM d1
            WHERE id NOT IN (SELECT id FROM s1)) p, s1 c
    ),
    s2 AS (
      SELECT id, v, rel, round(0.7 * rel - 0.3 * mx, 6) AS sc, mx
      FROM d2 ORDER BY round(0.7 * rel - 0.3 * mx, 6) DESC, id LIMIT 1
    ),
    d3 AS (
      SELECT p.id, p.v, p.rel, greatest(p.mx, {_MMR_SIM}) AS mx
      FROM (SELECT id, v, rel, mx FROM d2
            WHERE id NOT IN (SELECT id FROM s2)) p, s2 c
    ),
    s3 AS (
      SELECT id, v, rel, round(0.7 * rel - 0.3 * mx, 6) AS sc, mx
      FROM d3 ORDER BY round(0.7 * rel - 0.3 * mx, 6) DESC, id LIMIT 1
    )
    SELECT CAST(sel_round AS INTEGER) AS sel_round,
           CAST(id AS BIGINT) AS vec_id,
           CAST(round(rel, 6) AS DOUBLE) AS rel_6,
           CAST(sc AS DOUBLE) AS mmr_6
    FROM (
      SELECT 0 AS sel_round, id, rel, sc FROM s0
      UNION ALL SELECT 1, id, rel, sc FROM s1
      UNION ALL SELECT 2, id, rel, sc FROM s2
      UNION ALL SELECT 3, id, rel, sc FROM s3
    )
    ORDER BY sel_round
    """


@query("q326_mmr_diversified_topk", oracle=_MMR_ORACLE)
def q326_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98): pick 4 results from the cosine top-10 that trade
    relevance against redundancy, score = λ·rel − (1−λ)·max_{j∈S}
    sim(i,j), λ=0.7 — the diversity selector RAG pipelines run after
    retrieval. The oracle replays the same greedy trajectory as
    unrolled CTEs (the q313 k-center device, with greatest/cosine in
    place of least/L2). Both engines round scores to 6 BEFORE each
    argmax and break ties by min id, so the trajectory is exact.

    Scale: the candidate fetch is the distributed part (broadcast
    query vector, TakeOrderedAndProject top-k); the greedy loop runs
    on the driver over k=10 collected vectors — MMR is inherently
    O(k²) on a bounded set, never on the corpus."""
    from distcpplus_spark.operators.similarity import mmr_select

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 7).select(
        F.col("v").alias("qv"), l2_norm(F.col("v")).alias("qn")
    )
    cand = (
        emb.filter(F.col("vec_id") != 7)
        .withColumn("cn", l2_norm(F.col("v")))
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            "v",
            # query norm rides the broadcast row (folds are
            # interpreted; same operand order as the inline cosine)
            F.round(
                dot(F.col("v"), F.col("qv"))
                / (F.col("cn") * F.col("qn")),
                6,
            ).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    rows = mmr_select(
        [(r["vec_id"], list(r["v"]), float(r["rel"])) for r in cand],
        k=4,
        lam=0.7,
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("sel_round", T.IntegerType(), False),
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("rel_6", T.DoubleType(), False),
            T.StructField("mmr_6", T.DoubleType(), False),
        ]
    )
    return local_rows(spark, rows, schema).orderBy("sel_round")


@query(
    "q327_retrieval_eval_metrics",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv
          FROM e WHERE vec_id < 5),
    nrel AS (
      SELECT q.qid, count(*) AS n_rel
      FROM q JOIN e ON e.label = q.qlabel AND e.vec_id <> q.qid
      GROUP BY q.qid
    ),
    scored AS (
      SELECT q.qid,
             CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel,
             round(list_dot_product(e.v, q.qv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS s,
             e.vec_id AS cid
      FROM q JOIN e ON e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, rel, rk FROM (
        SELECT qid, rel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY s DESC, cid) AS rk
        FROM scored
      ) WHERE rk <= 10
    ),
    agg AS (
      SELECT qid,
             sum(rel) AS hits,
             max(CASE WHEN rel = 1 THEN 1.0 / rk ELSE 0.0 END) AS mrr,
             sum(rel / log2(rk + 1.0)) AS dcg
      FROM ranked GROUP BY qid
    ),
    ideal AS (
      SELECT n.qid,
             sum(1.0 / log2(i + 1.0)) AS idcg
      FROM nrel n, unnest(range(1, 11)) t(i)
      WHERE i <= least(n.n_rel, 10)
      GROUP BY n.qid
    )
    SELECT a.qid,
           CAST(round(a.hits / 10.0, 6) AS DOUBLE) AS p_at_10,
           CAST(round(a.hits / CAST(n.n_rel AS DOUBLE), 6) AS DOUBLE)
               AS recall_at_10,
           CAST(round(a.mrr, 6) AS DOUBLE) AS mrr_6,
           CAST(round(a.dcg / i.idcg, 4) AS DOUBLE) AS ndcg_4
    FROM agg a
    JOIN nrel n USING (qid)
    JOIN ideal i ON i.qid = a.qid
    ORDER BY a.qid
    """,
)
def q327_retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation under the driver hash gate:
    precision@10, recall@10, MRR and nDCG@10 for the brute-force
    cosine ranker, with the embeddings table's own cluster labels as
    ground truth (a candidate is relevant iff it shares the query's
    label) — the metric suite that gates every ANN variant the engine
    ships (q75 IVF, q232 LSH, q258 multiprobe, q294 MaxSim).

    Determinism: ranks come from ROUNDED cosine with candidate-id
    tie-break; p/recall/MRR are exact rationals; DCG sums
    irrational 1/log2 terms, so nDCG rounds to 4 (the q220 slack for
    order-dependent float sums). Scale: candidate scoring is a
    broadcast of 5 query vectors against the corpus; per-query ranks
    use a PARTITIONED window with a rank<=10 filter (WindowGroupLimit
    pushdown keeps a 10-row heap per partition)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    nrel = (
        emb.join(
            F.broadcast(q),
            (F.col("label") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .groupBy("qid")
        .agg(F.count("*").alias("n_rel"))
    )
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        F.when(F.col("label") == F.col("qlabel"), 1)
        .otherwise(0)
        .alias("rel"),
        F.round(cosine_similarity(F.col("v"), F.col("qv")), 6).alias("s"),
        F.col("vec_id").alias("cid"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("s"), F.asc("cid"))
    ranked = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )
    agg = ranked.groupBy("qid").agg(
        F.sum("rel").alias("hits"),
        F.max(
            F.when(F.col("rel") == 1, 1.0 / F.col("rk")).otherwise(0.0)
        ).alias("mrr"),
        F.sum(F.col("rel") / F.log2(F.col("rk") + 1.0)).alias("dcg"),
    )
    # IDCG: Σ_{i=1..min(n_rel,10)} 1/log2(i+1) — n_rel is per-query,
    # the 10-element harmonic frame is a broadcast literal
    ideal = (
        nrel.join(
            F.broadcast(
                spark.range(1, 11).select(F.col("id").alias("i"))
            ),
            F.col("i") <= F.least(F.col("n_rel"), F.lit(10)),
        )
        .groupBy("qid")
        .agg(F.sum(1.0 / F.log2(F.col("i") + 1.0)).alias("idcg"))
    )
    return (
        agg.join(nrel, "qid")
        .join(ideal, "qid")
        .select(
            "qid",
            F.round(F.col("hits") / 10.0, 6).alias("p_at_10"),
            F.round(
                F.col("hits") / F.col("n_rel").cast("double"), 6
            ).alias("recall_at_10"),
            F.round("mrr", 6).alias("mrr_6"),
            F.round(F.col("dcg") / F.col("idcg"), 4).alias("ndcg_4"),
        )
        .transform(small_sort, "qid")
    )


_NB_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


@query(
    "q328_naive_bayes_train",
    oracle=f"""
    WITH train AS (
      SELECT doc_id, lang, {_NB_TOKS} AS toks
      FROM documents WHERE doc_id % 5 <> 0
    ),
    tok AS (
      SELECT lang, unnest(toks) AS token FROM train
    ),
    tc AS (
      SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token
    ),
    tot AS (SELECT lang, sum(n) AS tot FROM tc GROUP BY lang),
    vocab AS (SELECT count(DISTINCT token) AS v FROM tok)
    SELECT tc.lang, tc.token, CAST(tc.n AS BIGINT) AS n,
           CAST(round(ln((tc.n + 1.0) / (t.tot + v.v)), 6) AS DOUBLE)
               AS logp_6
    FROM tc JOIN tot t USING (lang) CROSS JOIN vocab v
    ORDER BY tc.lang, tc.token
    """,
)
def q328_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes training under the driver hash gate:
    per-(class, token) Laplace-smoothed log-likelihoods
    ln((n+1)/(tot_c+V)) over the train split (doc_id % 5 != 0), with
    language as the class — the classic counts-only text classifier
    a curation pipeline trains in one pass to route or QA documents.

    Scale: ONE shuffle (the (lang, token) hash agg with map-side
    combine); class totals and the vocab size are scalar aggregates
    broadcast into the final projection. No iteration, no driver
    state beyond two scalars — the model itself stays distributed and
    feeds q329 as a broadcast."""
    train = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 != 0)
        .select(
            "lang",
            F.filter(
                F.split(F.lower("text"), " ", -1), lambda t: t != ""
            ).alias("toks"),
        )
    )
    tok = train.select("lang", F.explode("toks").alias("token"))
    tc = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    tot = tc.groupBy("lang").agg(F.sum("n").alias("tot"))
    v = tok.agg(F.countDistinct("token").alias("v"))
    return (
        tc.join(F.broadcast(tot), "lang")
        .join(F.broadcast(v))
        .select(
            "lang",
            "token",
            F.col("n").cast("bigint").alias("n"),
            F.round(
                F.log((F.col("n") + 1.0) / (F.col("tot") + F.col("v"))), 6
            ).alias("logp_6"),
        )
        .transform(small_sort, "lang", "token")
    )


@query(
    "q329_naive_bayes_classify",
    oracle=f"""
    WITH train AS (
      SELECT doc_id, lang, {_NB_TOKS} AS toks
      FROM documents WHERE doc_id % 5 <> 0
    ),
    tok AS (SELECT lang, unnest(toks) AS token FROM train),
    tc AS (
      SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token
    ),
    tot AS (SELECT lang, sum(n) AS tot FROM tc GROUP BY lang),
    vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
    prior AS (
      SELECT lang, ln(count(*) / CAST((SELECT count(*) FROM train)
                                       AS DOUBLE)) AS logprior
      FROM train GROUP BY lang
    ),
    test AS (
      SELECT doc_id, lang AS true_lang,
             unnest({_NB_TOKS}) AS token
      FROM documents WHERE doc_id % 5 = 0
    ),
    dt AS (
      SELECT doc_id, true_lang, token, count(*) AS cnt
      FROM test GROUP BY doc_id, true_lang, token
    ),
    scored AS (
      SELECT dt.doc_id, dt.true_lang, t.lang,
             sum(dt.cnt * ln(COALESCE(tc.n, 0) + 1.0)
                 - dt.cnt * ln(t.tot + v.v)) AS loglik
      FROM dt
      CROSS JOIN tot t
      CROSS JOIN vocab v
      LEFT JOIN tc ON tc.lang = t.lang AND tc.token = dt.token
      GROUP BY dt.doc_id, dt.true_lang, t.lang
    ),
    scf AS (
      SELECT s.doc_id, s.true_lang, s.lang,
             round(s.loglik + p.logprior, 4) AS score_4
      FROM scored s JOIN prior p ON p.lang = s.lang
    )
    SELECT doc_id, true_lang, lang AS pred_lang, score_4,
           CAST(true_lang = lang AS INTEGER) AS is_correct
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_4 DESC, lang) AS rk
      FROM scf
    ) WHERE rk = 1
    ORDER BY doc_id
    """,
)
def q329_naive_bayes_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive Bayes scoring on the held-out split (doc_id % 5 == 0)
    under the driver hash gate: argmax_c [ln prior_c + Σ_t cnt_t ·
    ln p(t|c)], unseen (class, token) pairs falling back to the
    Laplace floor ln(1/(tot_c+V)) via a left join + COALESCE. The
    argmax uses ROUNDED-4 scores with lexicographic class tie-break
    (round-then-rank; 4 decimals is the q220 slack for order-
    dependent float sums — the log-likelihood is a ~100-term sum).

    Scale: doc-token counts shuffle once on (doc_id, token); the
    model (vocab × classes) and priors are broadcast; the per-doc
    argmax is a partitioned window over |classes| rows per doc."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
    train = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "lang", toks.alias("toks")
    )
    tok = train.select("lang", F.explode("toks").alias("token"))
    tc = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    tot = tc.groupBy("lang").agg(F.sum("n").alias("tot"))
    v = tok.agg(F.countDistinct("token").alias("v"))
    n_train = train.count()
    prior = (
        train.groupBy("lang")
        .agg(F.log(F.count("*") / F.lit(float(n_train))).alias("logprior"))
    )
    test = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(toks).alias("token"),
        )
    )
    dt = test.groupBy("doc_id", "true_lang", "token").agg(
        F.count("*").alias("cnt")
    )
    model = tc.withColumnRenamed("lang", "mlang").withColumnRenamed(
        "token", "mtoken"
    )
    scored = (
        dt.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(v))
        .join(
            F.broadcast(model),
            (F.col("mlang") == F.col("lang"))
            & (F.col("mtoken") == F.col("token")),
            "left",
        )
        .groupBy("doc_id", "true_lang", "lang")
        .agg(
            F.sum(
                F.col("cnt") * F.log(F.coalesce(F.col("n"), F.lit(0)) + 1.0)
                - F.col("cnt") * F.log(F.col("tot") + F.col("v"))
            ).alias("loglik")
        )
    )
    full = scored.join(F.broadcast(prior), "lang").select(
        "doc_id",
        "true_lang",
        "lang",
        F.round(F.col("loglik") + F.col("logprior"), 4).alias("score_4"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score_4"), F.asc("lang"))
    return (
        full.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("pred_lang"),
            "score_4",
            (F.col("true_lang") == F.col("lang"))
            .cast("int")
            .alias("is_correct"),
        )
        .orderBy("doc_id")
    )


@query(
    "q330_chi2_feature_selection",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             list_distinct({_NB_TOKS}) AS toks
      FROM documents
    ),
    pres AS (
      SELECT lang, unnest(toks) AS token FROM d
    ),
    ct AS (
      SELECT lang, token, count(*) AS a FROM pres GROUP BY lang, token
    ),
    tokdf AS (SELECT token, sum(a) AS df FROM ct GROUP BY token),
    clsn AS (SELECT lang, count(*) AS nc FROM d GROUP BY lang),
    n AS (SELECT count(*) AS n FROM d),
    cells AS (
      SELECT c.lang, c.token,
             CAST(c.a AS DOUBLE) AS a,
             CAST(cl.nc - c.a AS DOUBLE) AS b,
             CAST(t.df - c.a AS DOUBLE) AS c,
             CAST(n.n - cl.nc - t.df + c.a AS DOUBLE) AS d,
             CAST(n.n AS DOUBLE) AS n
      FROM ct c
      JOIN clsn cl USING (lang)
      JOIN tokdf t USING (token)
      CROSS JOIN n
    ),
    chi AS (
      SELECT lang, token,
             round(n * (a * d - b * c) * (a * d - b * c)
                   / ((a + b) * (c + d) * (a + c) * (b + d)), 4)
                 AS chi2_4
      FROM cells
      WHERE (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 AND (b + d) > 0
    )
    SELECT lang, token, chi2_4, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT lang, token, chi2_4,
             row_number() OVER (PARTITION BY lang
                                ORDER BY chi2_4 DESC, token) AS rk
      FROM chi
    ) WHERE rk <= 5
    ORDER BY lang, rk
    """,
)
def q330_chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature selection under the driver hash gate: for
    every (class, token) pair the 2×2 document-presence contingency
    statistic N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)), top-5 tokens per
    language — the filter-method feature ranker that pairs with q328's
    classifier and q140's tf-idf.

    Determinism: chi2 is a single rational expression per row (no
    float sums), rounded to 4 before the per-class rank with token
    tie-break. Scale: presence counts are one (lang, token) hash agg;
    the marginals join back on token (hash join co-partitioned with
    the count frame) and lang (broadcast); the top-5-per-class window
    is partitioned with a rank<=5 filter (WindowGroupLimit heap)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
        ).alias("toks"),
    )
    pres = d.select("lang", F.explode("toks").alias("token"))
    ct = pres.groupBy("lang", "token").agg(F.count("*").alias("a"))
    tokdf = ct.groupBy("token").agg(F.sum("a").alias("df"))
    clsn = d.groupBy("lang").agg(F.count("*").alias("nc"))
    n_docs = d.count()
    cells = (
        ct.join(F.broadcast(clsn), "lang")
        .join(tokdf, "token")
        .select(
            "lang",
            "token",
            F.col("a").cast("double").alias("a"),
            (F.col("nc") - F.col("a")).cast("double").alias("b"),
            (F.col("df") - F.col("a")).cast("double").alias("c"),
            (F.lit(n_docs) - F.col("nc") - F.col("df") + F.col("a"))
            .cast("double")
            .alias("d"),
        )
    )
    a, b, c, dd = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    chi = (
        cells.filter(
            ((a + b) > 0) & ((c + dd) > 0) & ((a + c) > 0) & ((b + dd) > 0)
        )
        .select(
            "lang",
            "token",
            F.round(
                F.lit(float(n_docs))
                * (a * dd - b * c)
                * (a * dd - b * c)
                / ((a + b) * (c + dd) * (a + c) * (b + dd)),
                4,
            ).alias("chi2_4"),
        )
    )
    w = W.partitionBy("lang").orderBy(F.desc("chi2_4"), F.asc("token"))
    return (
        chi.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .transform(small_sort, "lang", "rk")
    )


@query(
    "q331_acf_lags",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    paired AS (
      SELECT a.event_type, l.lag, a.cnt AS x, b.cnt AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type
                  AND b.d = a.d + CAST(l.lag AS INTEGER)
    )
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(corr(x, y), 6) AS DOUBLE) AS acf_6
    FROM paired
    GROUP BY event_type, lag
    ORDER BY event_type, lag
    """,
)
def q331_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation diagnostics of the daily event-count series at
    lags 1..7 under the driver hash gate — the seasonality probe run
    before windowing/forecasting choices. The lagged pairing is an
    equi-join on (event_type, date+lag), NOT a window shift, so it
    stays a hash join at any scale; Pearson corr is a single
    distributed aggregate on each (type, lag) slice.

    Determinism: corr is a ratio of centered sums — reorder noise is
    ~1e-12 on 30-point integer-count series; rounded to 6. The series
    length is calendar-bounded (30 days regardless of SF), only the
    per-day counts grow with data."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count("*").cast("double").alias("cnt")
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("cnt").alias("y"),
    )
    paired = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (
                F.col("bd")
                == F.date_add(F.col("d"), F.col("lag").cast("int"))
            ),
        )
    )
    return (
        paired.groupBy("event_type", "lag")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.corr(F.col("cnt"), F.col("y")), 6).alias("acf_6"),
        )
        .select(
            "event_type",
            F.col("lag").cast("bigint").alias("lag"),
            "n_pairs",
            "acf_6",
        )
        .transform(small_sort, "event_type", "lag")
    )


@query(
    "q332_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                   / count(*), 4) AS m
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    base AS (
      SELECT event_type, avg(m) AS mu, count(*) AS n_days
      FROM daily GROUP BY event_type
    ),
    cus AS (
      SELECT d.event_type, d.d, b.n_days,
             round(sum(d.m - b.mu) OVER (
               PARTITION BY d.event_type ORDER BY d.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                 AS s
      FROM daily d JOIN base b USING (event_type)
    )
    SELECT event_type, d AS cp_date,
           CAST(abs(s) AS DOUBLE) AS max_abs_cusum_4,
           CAST(n_days AS BIGINT) AS n_days
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type ORDER BY abs(s) DESC, d) AS rk
      FROM cus
    ) WHERE rk = 1
    ORDER BY event_type
    """,
)
def q332_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily mean `value` series
    per event type (Page 1954): S_t = Σ_{i≤t}(x_i − x̄), changepoint
    = argmax |S_t| (earliest date on ties) — the standard shift
    locator a data-quality monitor runs over ingestion metrics.

    Determinism: daily means round to 4 BEFORE the prefix sum; the
    argmax ranks |S_t| rounded to 4 with date tie-break. Scale: the
    heavy reduction is the (type, day) hash agg over raw events; the
    prefix-sum window is PARTITIONED by type over a calendar-bounded
    frame (30 rows per type regardless of SF), and the argmax is a
    rank-1 filter (WindowGroupLimit heap)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "value"
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.round(money_sum(F.col("value")) / F.count("*"), 4).alias("m")
    )
    base = daily.groupBy("event_type").agg(
        F.avg("m").alias("mu"), F.count("*").alias("n_days")
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cus = (
        daily.join(F.broadcast(base), "event_type")
        .withColumn(
            "s", F.round(F.sum(F.col("m") - F.col("mu")).over(wcum), 4)
        )
    )
    wrk = W.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("s"))), F.asc("d")
    )
    return (
        cus.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").alias("cp_date"),
            F.abs(F.col("s")).alias("max_abs_cusum_4"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
        .transform(small_sort, "event_type")
    )


@query(
    "q333_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    tr AS (
      SELECT event_type, d, cnt,
             avg(cnt) OVER w AS trend,
             count(*) OVER w AS wn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT event_type, d, cnt, trend,
             day(d) % 7 AS phase,
             cnt - trend AS detr
      FROM tr WHERE wn = 7
    ),
    seas AS (
      SELECT event_type, phase, round(avg(detr), 4) AS seasonal_4
      FROM det GROUP BY event_type, phase
    )
    SELECT d.event_type, d.d AS day,
           CAST(d.cnt AS BIGINT) AS cnt,
           CAST(round(d.trend, 4) AS DOUBLE) AS trend_4,
           s.seasonal_4,
           CAST(round(d.detr - s.seasonal_4, 4) AS DOUBLE) AS resid_4
    FROM det d JOIN seas s ON s.event_type = d.event_type
                          AND s.phase = d.phase
    ORDER BY d.event_type, d.d
    """,
)
def q333_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily count
    series (trend = centered 7-day moving average over complete
    frames only, seasonal = per-phase mean of the detrended values,
    residual = remainder) — the series triage step before anomaly
    thresholds. Phase is day-of-month % 7 on BOTH engines, dodging
    the Spark(1=Sunday) vs DuckDB(0=Sunday) dayofweek convention
    mismatch entirely.

    Determinism: trend averages 7 exact integer counts; seasonal
    means round to 4 BEFORE the residual subtraction. Scale: raw
    events reduce in one (type, day) hash agg; every window is
    partitioned with a calendar-bounded frame; the seasonal join is
    a broadcast of |types|·7 rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count("*").cast("double").alias("cnt")
    )
    wma = (
        W.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "d",
        "cnt",
        F.avg("cnt").over(wma).alias("trend"),
        F.count("*").over(wma).alias("wn"),
    )
    det = tr.filter(F.col("wn") == 7).select(
        "event_type",
        "d",
        "cnt",
        "trend",
        (F.dayofmonth("d") % 7).alias("phase"),
        (F.col("cnt") - F.col("trend")).alias("detr"),
    )
    seas = det.groupBy("event_type", "phase").agg(
        F.round(F.avg("detr"), 4).alias("seasonal_4")
    )
    return (
        det.join(F.broadcast(seas), ["event_type", "phase"])
        .select(
            "event_type",
            F.col("d").alias("day"),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round("trend", 4).alias("trend_4"),
            "seasonal_4",
            F.round(F.col("detr") - F.col("seasonal_4"), 4).alias(
                "resid_4"
            ),
        )
        .transform(small_sort, "event_type", "day")
    )


@query(
    "q334_weighted_sample_wor",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(ln(((doc_id * 2654435761 + 1013904223) % 1000003
                        + 0.5) / 1000003.0) / n_chars, 6) AS key_6
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(key_6 AS DOUBLE) AS key_6
    FROM keyed
    ORDER BY key_6 DESC, doc_id
    LIMIT 20
    """,
)
def q334_weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006): each row draws key = ln(u)/w from a
    deterministic integer-mixer uniform, and the k largest keys are
    the sample — inclusion probability proportional to weight, no
    sequential pass, no rejection loop. This is the distributed
    WOR sampler (the repo's q114/q115 sample WITH replacement /
    stratified); n_chars is the weight, so long documents are
    favored exactly proportionally.

    Determinism: u = ((id·2654435761 + 1013904223) mod 1000003 +
    0.5)/1000003 — exact 64-bit integer arithmetic, no RNG; keys
    round to 6 before the rank with doc_id tie-break. Scale: the
    whole query is one map + TakeOrderedAndProject top-k (per-
    partition k-row heap, driver merge) — ZERO shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    u = (
        (F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223))
        % F.lit(1000003)
        + 0.5
    ) / 1000003.0
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        F.round(F.log(u) / F.col("n_chars"), 6).alias("key_6"),
    )
    return (
        keyed.orderBy(F.desc("key_6"), F.asc("doc_id"))
        .limit(20)
        .transform(small_sort, F.desc("key_6"), "doc_id")
    )


@query(
    "q335_benford_digit_test",
    oracle="""
    WITH digits AS (
      SELECT o_orderpriority AS priority,
             CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
                                   AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT priority, digit, count(*) AS n
      FROM digits GROUP BY priority, digit
    ),
    tot AS (SELECT priority, sum(n) AS nt FROM obs GROUP BY priority),
    scored AS (
      SELECT o.priority, o.digit, o.n, t.nt,
             o.n / CAST(t.nt AS DOUBLE) AS share,
             log10(1.0 + 1.0 / o.digit) AS exp_share
      FROM obs o JOIN tot t USING (priority)
    ),
    termed AS (
      SELECT *, nt * (share - exp_share) * (share - exp_share)
                / exp_share AS term
      FROM scored
    ),
    chi AS (
      SELECT priority,
             round(sum(CASE WHEN digit = 1 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 2 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 3 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 4 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 5 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 6 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 7 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 8 THEN term ELSE 0 END)
                 + sum(CASE WHEN digit = 9 THEN term ELSE 0 END),
                 4) AS chi2_4
      FROM termed GROUP BY priority
    )
    SELECT t.priority, CAST(t.digit AS INTEGER) AS digit,
           CAST(t.n AS BIGINT) AS n,
           CAST(round(t.share, 6) AS DOUBLE) AS obs_share_6,
           CAST(round(t.exp_share, 6) AS DOUBLE) AS benford_6,
           CAST(c.chi2_4 AS DOUBLE) AS chi2_4
    FROM termed t JOIN chi c USING (priority)
    ORDER BY priority, digit
    """,
)
def q335_benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance test on order totals by
    priority class — the fraud/synthetic-data smell test a curation
    pipeline runs over numeric columns. The first significant digit
    comes from the DECIMAL STRING of round(price·100) (prices carry
    2 decimals), NOT from floor(log10): at exact powers of ten a
    1-ulp log10 difference flips the digit between engines, while
    bigint-to-string is identical everywhere.

    Per (priority, digit): observed share vs log10(1+1/d), plus the
    per-priority Pearson chi² = Σ N(obs−exp)²/exp via a window over
    the ≤9 digit rows (bounded frame). Scale: one (priority, digit)
    hash agg; everything after operates on ≤45 rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    digits = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit"),
    )
    obs = digits.groupBy("priority", "digit").agg(F.count("*").alias("n"))
    tot = obs.groupBy("priority").agg(F.sum("n").alias("nt"))
    scored = obs.join(F.broadcast(tot), "priority").select(
        "priority",
        "digit",
        "n",
        "nt",
        (F.col("n") / F.col("nt").cast("double")).alias("share"),
        F.log10(1.0 + 1.0 / F.col("digit")).alias("exp_share"),
    )
    termed = scored.withColumn(
        "term",
        F.col("nt")
        * (F.col("share") - F.col("exp_share"))
        * (F.col("share") - F.col("exp_share"))
        / F.col("exp_share"),
    )
    # chi2 = fixed-order 9-term expression over pivoted single-cell
    # sums (each sum has at most ONE non-zero addend, so it is exact;
    # the combining additions run in the same literal order in both
    # engines) — bit-identical at ANY corpus size, where a plain
    # 9-row SUM depends on partial-sum order once the statistic's
    # magnitude crosses the round-4 margin (~1e12 at fixture effect
    # size). The q382 device applied to chi-square cells.
    cell = None
    for d in range(1, 10):
        t = F.sum(F.when(F.col("digit") == d, F.col("term")).otherwise(0.0))
        cell = t if cell is None else cell + t
    chi = termed.groupBy("priority").agg(F.round(cell, 4).alias("chi2_4"))
    return (
        termed.join(F.broadcast(chi), "priority")
        .select(
            "priority",
            F.col("digit").cast("int").alias("digit"),
            F.col("n").cast("bigint").alias("n"),
            F.round("share", 6).alias("obs_share_6"),
            F.round("exp_share", 6).alias("benford_6"),
            "chi2_4",
        )
        .transform(small_sort, "priority", "digit")
    )


@query(
    "q336_poisson_bootstrap",
    oracle="""
    WITH draws AS (
      SELECT r.r, d.doc_id, d.n_chars,
             ((d.doc_id * 1315423911 + r.r * 2654435761 + 1013904223)
              % 1000003 + 0.5) / 1000003.0 AS u
      FROM documents d
      CROSS JOIN (SELECT unnest(range(0, 50)) AS r) r
    ),
    weighted AS (
      SELECT r, doc_id, n_chars,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847  THEN 1
                  WHEN u < 0.9196986029286058  THEN 2
                  WHEN u < 0.9810118431238462  THEN 3
                  WHEN u < 0.9963401531726563  THEN 4
                  WHEN u < 0.9994058151824183  THEN 5
                  ELSE 6 END AS w
      FROM draws
    )
    SELECT CAST(r AS BIGINT) AS resample,
           CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(round(sum(CAST(w * n_chars AS BIGINT)) / CAST(sum(w) AS DOUBLE), 4)
                AS DOUBLE) AS mean_4
    FROM weighted
    GROUP BY r
    ORDER BY r
    """,
)
def q336_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. 2012 — the resampling scheme
    built for map-reduce): each of 50 resamples assigns every row an
    independent Poisson(1) weight from a deterministic inverse-CDF
    lookup on an integer-mixer uniform, so resample r's mean is
    Σwx/Σw — no per-resample pass over indices, no sampling state.
    Output is the full resample distribution of mean(n_chars); CI
    quantiles are a driver-side afterthought on 50 numbers.

    Determinism: the CDF thresholds e⁻¹·Σ 1/k! are shared literal
    constants; weights and Σwx are exact integers (the mean is ONE
    float division, no float sum). Scale: the explode is rows×50 but
    map-side (no shuffle amplification — partial aggs combine before
    the 50-group exchange); for 100 TB inputs you'd keep R·row
    expansion map-local exactly like this, never materialized."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    rs = spark.range(0, 50).select(F.col("id").alias("r"))
    draws = docs.crossJoin(F.broadcast(rs)).select(
        "r",
        "doc_id",
        "n_chars",
        (
            (
                (
                    F.col("doc_id") * F.lit(1315423911)
                    + F.col("r") * F.lit(2654435761)
                    + F.lit(1013904223)
                )
                % F.lit(1000003)
                + 0.5
            )
            / 1000003.0
        ).alias("u"),
    )
    u = F.col("u")
    w = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .when(u < 0.9994058151824183, 5)
        .otherwise(6)
    )
    return (
        draws.withColumn("w", w)
        .groupBy("r")
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.round(
                F.sum(F.col("w") * F.col("n_chars"))
                / F.sum("w").cast("double"),
                4,
            ).alias("mean_4"),
        )
        .select(F.col("r").cast("bigint").alias("resample"), "n_eff", "mean_4")
        .transform(small_sort, "resample")
    )


_AC_PATTERNS = ["data", "model", "spark", "table scan", "row batch"]


@query(
    "q337_multi_pattern_match",
    oracle="""
    WITH pats AS (
      SELECT unnest(['data', 'model', 'spark', 'table scan',
                     'row batch']) AS pattern
    ),
    hits AS (
      SELECT d.doc_id, p.pattern,
             (length(lower(d.text))
              - length(replace(lower(d.text), p.pattern, '')))
             / length(p.pattern) AS cnt
      FROM documents d CROSS JOIN pats p
    )
    SELECT doc_id, pattern, CAST(cnt AS BIGINT) AS cnt
    FROM hits WHERE cnt > 0
    ORDER BY doc_id, pattern
    """,
)
def q337_multi_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aho-Corasick multi-pattern blocklist matching (operators/
    textmatch.py) under the driver hash gate: occurrence counts of 5
    literal patterns (incl. cross-token phrases) per document in ONE
    automaton pass per row. The oracle replays each pattern with the
    replace-length trick — valid because every pattern is BORDER-FREE
    (no proper prefix equals a suffix), so overlapping and
    non-overlapping counts coincide; a pytest asserts that property
    against re.findall on adversarial texts.

    Scale: mapInPandas, zero shuffle, per-row cost O(len(text))
    independent of pattern count — the plan that keeps a 10k-entry
    blocklist at ONE pass over 100 TB where per-pattern LIKE scans
    would be 10k passes."""
    from distcpplus_spark.operators.textmatch import multi_pattern_counts

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("text")
    )
    out = multi_pattern_counts(docs, "doc_id", "text", _AC_PATTERNS)
    return out.orderBy("doc_id", "pattern")


@query(
    "q338_bleu_ngram_overlap",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS toks
      FROM documents
    ),
    pairs AS (
      SELECT c.doc_id AS cand_id, c.toks AS ct, r.toks AS rt
      FROM d c JOIN d r ON r.doc_id = c.doc_id + 1
      WHERE c.doc_id % 2 = 0 AND len(c.toks) >= 2 AND len(r.toks) >= 2
    ),
    grams AS (
      SELECT cand_id, 1 AS n, unnest(ct) AS g, 'c' AS side FROM pairs
      UNION ALL
      SELECT cand_id, 1, unnest(rt), 'r' FROM pairs
      UNION ALL
      SELECT cand_id, 2,
             unnest(list_transform(range(1, len(ct)),
               i -> ct[CAST(i AS INTEGER)] || ' '
                    || ct[CAST(i AS INTEGER) + 1])), 'c'
      FROM pairs
      UNION ALL
      SELECT cand_id, 2,
             unnest(list_transform(range(1, len(rt)),
               i -> rt[CAST(i AS INTEGER)] || ' '
                    || rt[CAST(i AS INTEGER) + 1])), 'r'
      FROM pairs
    ),
    gc AS (
      SELECT cand_id, n, g,
             sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc,
             sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS rc
      FROM grams GROUP BY cand_id, n, g
    ),
    prec AS (
      SELECT cand_id, n,
             sum(least(cc, rc)) AS clipped,
             sum(cc) AS total
      FROM gc WHERE cc > 0 GROUP BY cand_id, n
    ),
    lens AS (
      SELECT cand_id, len(ct) AS clen, len(rt) AS rlen FROM pairs
    ),
    wide AS (
      SELECT l.cand_id, l.clen, l.rlen,
             max(CASE WHEN p.n = 1
                      THEN p.clipped / CAST(p.total AS DOUBLE) END) AS p1,
             max(CASE WHEN p.n = 2
                      THEN p.clipped / CAST(p.total AS DOUBLE) END) AS p2
      FROM lens l JOIN prec p USING (cand_id)
      GROUP BY l.cand_id, l.clen, l.rlen
    )
    SELECT cand_id,
           CAST(round(p1, 6) AS DOUBLE) AS p1_6,
           CAST(round(p2, 6) AS DOUBLE) AS p2_6,
           CAST(round(CASE WHEN clen >= rlen THEN 1.0
                           ELSE exp(1.0 - rlen / CAST(clen AS DOUBLE))
                      END, 6) AS DOUBLE) AS bp_6,
           CAST(round(CASE WHEN p1 > 0 AND p2 > 0
                           THEN CASE WHEN clen >= rlen THEN 1.0
                                     ELSE exp(1.0 - rlen
                                              / CAST(clen AS DOUBLE))
                                END * sqrt(p1 * p2)
                           ELSE 0.0 END, 6) AS DOUBLE) AS bleu2_6
    FROM wide
    ORDER BY cand_id
    """,
)
def q338_bleu_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 clipped n-gram precision between adjacent document
    pairs (even doc = candidate, odd = reference) under the driver
    hash gate — the n-gram overlap scorer used both for generation
    eval and as a near-duplicate containment measure (Papineni et
    al. 2002): p_n = Σ min(cnt_cand, cnt_ref)/Σ cnt_cand for n=1,2,
    brevity penalty exp(1−r/c), geometric mean via sqrt(p1·p2)
    (single-op float, no exp/ln chain to diverge).

    Scale: n-grams explode then hash-agg on (pair, n, gram) — one
    shuffle keyed by pair id; the clip (least) happens inside the
    agg row, never as a join of two exploded frames. Pairing is an
    equi-join on doc_id+1, SF-independent."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), " ", -1), lambda t: t != ""
        ).alias("toks"),
    )
    c = d.filter(
        (F.col("doc_id") % 2 == 0) & (F.size("toks") >= 2)
    ).select(F.col("doc_id").alias("cand_id"), F.col("toks").alias("ct"))
    r = d.filter(F.size("toks") >= 2).select(
        (F.col("doc_id") - 1).alias("cand_id"), F.col("toks").alias("rt")
    )
    pairs = c.join(r, "cand_id")

    def bigrams(col):
        return F.transform(
            F.sequence(F.lit(0), F.size(col) - 2),
            lambda i: F.concat(
                F.element_at(col, i + 1), F.lit(" "), F.element_at(col, i + 2)
            ),
        )

    grams = None
    for n, side, col in (
        (1, "c", F.col("ct")),
        (1, "r", F.col("rt")),
    ):
        g = pairs.select(
            "cand_id",
            F.lit(n).alias("n"),
            F.explode(col).alias("g"),
            F.lit(side).alias("side"),
        )
        grams = g if grams is None else grams.unionAll(g)
    for side, col in (("c", F.col("ct")), ("r", F.col("rt"))):
        g = pairs.select(
            "cand_id",
            F.lit(2).alias("n"),
            F.explode(bigrams(col)).alias("g"),
            F.lit(side).alias("side"),
        )
        grams = grams.unionAll(g)
    gc = grams.groupBy("cand_id", "n", "g").agg(
        F.sum(F.when(F.col("side") == "c", 1).otherwise(0)).alias("cc"),
        F.sum(F.when(F.col("side") == "r", 1).otherwise(0)).alias("rc"),
    )
    prec = (
        gc.filter(F.col("cc") > 0)
        .groupBy("cand_id", "n")
        .agg(
            F.sum(F.least(F.col("cc"), F.col("rc"))).alias("clipped"),
            F.sum("cc").alias("total"),
        )
    )
    lens = pairs.select(
        "cand_id", F.size("ct").alias("clen"), F.size("rt").alias("rlen")
    )
    wide = (
        lens.join(prec, "cand_id")
        .groupBy("cand_id", "clen", "rlen")
        .agg(
            F.max(
                F.when(
                    F.col("n") == 1,
                    F.col("clipped") / F.col("total").cast("double"),
                )
            ).alias("p1"),
            F.max(
                F.when(
                    F.col("n") == 2,
                    F.col("clipped") / F.col("total").cast("double"),
                )
            ).alias("p2"),
        )
    )
    bp = F.when(F.col("clen") >= F.col("rlen"), F.lit(1.0)).otherwise(
        F.exp(1.0 - F.col("rlen") / F.col("clen").cast("double"))
    )
    return wide.select(
        "cand_id",
        F.round("p1", 6).alias("p1_6"),
        F.round("p2", 6).alias("p2_6"),
        F.round(bp, 6).alias("bp_6"),
        F.round(
            F.when(
                (F.col("p1") > 0) & (F.col("p2") > 0),
                bp * F.sqrt(F.col("p1") * F.col("p2")),
            ).otherwise(0.0),
            6,
        ).alias("bleu2_6"),
    ).orderBy("cand_id")


@query(
    "q339_spearman_rank_corr",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             len(list_filter(string_split(lower(text), ' '),
                             x -> x <> '')) AS tok_cnt
      FROM documents
    ),
    rx AS (
      SELECT n_chars AS v,
             sum(count(*)) OVER (ORDER BY n_chars
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - count(*) + (count(*) + 1) / 2.0 AS avg_rank
      FROM d GROUP BY n_chars
    ),
    ry AS (
      SELECT tok_cnt AS v,
             sum(count(*)) OVER (ORDER BY tok_cnt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - count(*) + (count(*) + 1) / 2.0 AS avg_rank
      FROM d GROUP BY tok_cnt
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(round(corr(rx.avg_rank, ry.avg_rank), 6) AS DOUBLE)
               AS spearman_6,
           CAST(round(corr(d.n_chars, d.tok_cnt), 6) AS DOUBLE)
               AS pearson_6
    FROM d
    JOIN rx ON rx.v = d.n_chars
    JOIN ry ON ry.v = d.tok_cnt
    """,
)
def q339_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document length in chars and
    in tokens (with Pearson beside it) under the driver hash gate —
    the monotone-association check run before picking normalization
    strategies. Average ranks for ties are computed WITHOUT a
    partition-less ordered window: ranks per DISTINCT VALUE come from
    the two-phase distributed prefix sum (operators/scale.py::
    partitioned_running_agg over a monotone value bucket — the q293
    discipline), then join back to rows by value. avg_rank(v) =
    cnt_less(v) + (ties+1)/2.

    Scale: two (value, count) hash aggs (distinct-value cardinality,
    not row cardinality), prefix sums over value buckets, two hash
    joins back on value, one corr aggregate. No global window
    anywhere."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(
            F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
        ).alias("tok_cnt"),
    )

    def avg_ranks(col: str):
        g = d.groupBy(col).agg(F.count("*").alias("cnt"))
        g = partitioned_running_agg(
            g,
            order_cols=[col],
            value_col="cnt",
            out_col="cum",
            bucket=(F.col(col) / 64).cast("bigint"),
        )
        return g.select(
            F.col(col).alias("v"),
            (
                F.col("cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
            ).alias("avg_rank"),
        )

    rx = avg_ranks("n_chars")
    ry = avg_ranks("tok_cnt")
    joined = (
        d.join(rx, d["n_chars"] == rx["v"])
        .withColumnRenamed("avg_rank", "rk_x")
        .drop("v")
        .join(ry, d["tok_cnt"] == ry["v"])
        .withColumnRenamed("avg_rank", "rk_y")
        .drop("v")
    )
    return joined.agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.corr("rk_x", "rk_y"), 6).alias("spearman_6"),
        F.round(F.corr("n_chars", "tok_cnt"), 6).alias("pearson_6"),
    )


_JSD_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


@query(
    "q340_jsd_language_drift",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_JSD_TOKS}) AS token FROM documents
    ),
    tc AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2),
    tot AS (SELECT lang, sum(n) AS tot FROM tc GROUP BY lang),
    vocab AS (SELECT DISTINCT token FROM tok),
    vs AS (SELECT count(*) AS v FROM vocab),
    p AS (
      SELECT l.lang, vo.token,
             (COALESCE(tc.n, 0) + 1.0) / (l.tot + vs.v) AS p
      FROM tot l
      CROSS JOIN vocab vo
      CROSS JOIN vs
      LEFT JOIN tc ON tc.lang = l.lang AND tc.token = vo.token
    )
    SELECT a.lang AS lang_a, b.lang AS lang_b,
           CAST(round(sum(CAST(floor((
             0.5 * a.p * ln(a.p / ((a.p + b.p) / 2))
             + 0.5 * b.p * ln(b.p / ((a.p + b.p) / 2))
           ) * 1e15 + 0.5) AS BIGINT)) / 1e15, 6) AS DOUBLE) AS jsd_6
    FROM p a JOIN p b ON a.token = b.token AND a.lang < b.lang
    GROUP BY a.lang, b.lang
    ORDER BY lang_a, lang_b
    """,
)
def q340_jsd_language_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every pair of per-language
    unigram distributions (Laplace-smoothed over the union vocab)
    under the driver hash gate — the symmetric, bounded domain-drift
    measure a mixture controller watches when corpus composition
    shifts (companion to q239's PSI, which bins numeric columns).

    Scale: token counts hash-agg once on (lang, token); the smoothed
    distributions join pairwise ON TOKEN (hash join co-partitioned by
    token — never a vocab × vocab product), and the per-pair sum is
    an ordinary agg keyed by |langs|² pairs. The langs × vocab
    completion broadcasts only the |langs| totals row set.

    Exactness (round 12, de-allowlisted): the per-token JS term
    (pointwise non-negative by the log-sum inequality) is quantized
    to integer 1e-15 units with floor(x*1e15 + 0.5) — the same floor
    expression in both engines — so the BIGINT sum is
    order-independent and its magnitude is SELF-BOUNDED: term units
    sum to <= ln2 * 1e15 ~ 7e14 at ANY vocabulary size, so overflow
    is impossible by construction. Residual cross-engine risk is a
    possible 1-ulp ln() difference flipping a term by +-1 unit
    (1e-15 each); quantization bias <= V * 0.5e-15 stays under the
    round-6 boundary to V ~ 1e9 tokens — the same envelope the old
    allowlist entry claimed, now with a deterministic sum."""
    tok = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
        ).alias("token"),
    )
    tc = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    tot = tc.groupBy("lang").agg(F.sum("n").alias("tot"))
    vocab = tc.select("token").distinct()
    # vocab size folded INTO the plan as a broadcast one-row frame
    # (no eager .count() action) — same LONG arithmetic as the old
    # literal, so the smoothed p values are bit-identical. The dense
    # lang × vocab completion grid pins the |langs|-row side as the
    # BNLJ build side explicitly rather than trusting size estimates.
    vsz = vocab.agg(F.count("*").alias("_vsz"))
    p = (
        F.broadcast(tot)
        .crossJoin(vocab)
        .crossJoin(F.broadcast(vsz))
        .join(
            tc.withColumnRenamed("lang", "tl").withColumnRenamed(
                "token", "tt"
            ),
            (F.col("tl") == F.col("lang")) & (F.col("tt") == F.col("token")),
            "left",
        )
        .select(
            "lang",
            "token",
            (
                (F.coalesce(F.col("n"), F.lit(0)) + 1.0)
                / (F.col("tot") + F.col("_vsz"))
            ).alias("p"),
        )
    )
    a = p.select(
        F.col("lang").alias("lang_a"),
        F.col("token").alias("token"),
        F.col("p").alias("pa"),
    )
    b = p.select(
        F.col("lang").alias("lang_b"),
        F.col("token").alias("tb"),
        F.col("p").alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    return (
        a.join(
            b,
            (F.col("token") == F.col("tb"))
            & (F.col("lang_a") < F.col("lang_b")),
        )
        .groupBy("lang_a", "lang_b")
        .agg(
            F.round(
                F.sum(
                    F.floor(
                        (
                            0.5 * F.col("pa") * F.log(F.col("pa") / m)
                            + 0.5 * F.col("pb") * F.log(F.col("pb") / m)
                        )
                        * 1e15
                        + F.lit(0.5)
                    )
                )
                / 1e15,
                6,
            ).alias("jsd_6")
        )
        .transform(small_sort, "lang_a", "lang_b")
    )


@query(
    "q341_ridge_closed_form",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(hour(ts) AS DOUBLE) AS x, value AS y
      FROM events
    ),
    sums AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(round((sxy - sx * sy / n)
                      / ((sxx - sx * sx / n) + 10.0), 6) AS DOUBLE)
               AS slope_6,
           CAST(round(sy / n - (sxy - sx * sy / n)
                      / ((sxx - sx * sx / n) + 10.0) * (sx / n), 4)
                AS DOUBLE) AS intercept_4
    FROM sums
    ORDER BY event_type
    """,
)
def q341_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ridge regression (value ~ hour-of-day, L2 penalty
    λ=10) by closed-form normal equations under the driver hash gate:
    slope = Sxy/(Sxx+λ) from five distributed sums — the JVM-only,
    zero-Python twin of q74's applyInPandas OLS, and the shape that
    wins at 100 TB: ONE hash aggregate per group, no per-group pandas
    batch, no data movement beyond the agg shuffle.

    Determinism: both engines evaluate the IDENTICAL algebraic form
    on the same five sums (the centered-moment rewrite is done in the
    formula, not the aggregate), so the only divergence channel is
    sum reordering — ~1e-10 relative on these magnitudes, absorbed by
    round-6/round-4."""
    pts = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) + 10.0
    )
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope_6"),
        F.round(
            F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n")), 4
        ).alias("intercept_4"),
    ).transform(small_sort, "event_type")


@query(
    "q342_pivot_wide",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS view
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY day
    """,
)
def q342_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide PIVOT (the inverse of q307's UNPIVOT): daily event
    counts spread into one column per event type, via DataFrame
    .pivot() WITH an explicit value list — the explicit list matters
    twice: it makes the output schema static (no extra distinct-scan
    job to discover pivot values) and keeps the plan a single hash
    aggregate. Catalyst compiles this to exactly the CASE-sum form
    the oracle spells out.

    Scale: one shuffle on the groupBy key; the pivoted columns are
    map-side partial aggregates like any other agg column."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("day").pivot("event_type", types).count()
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)).cast("bigint"))
    return out.transform(small_sort, "day")


@query(
    "q343_linear_attribution",
    oracle="""
    WITH purch AS (
      SELECT event_id AS pid, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS tid, user_id, ts AS tts, event_type
      FROM events WHERE event_type IN ('click', 'view', 'signup')
    ),
    windowed AS (
      SELECT p.pid, t.tid, t.event_type
      FROM purch p
      JOIN touch t ON t.user_id = p.user_id
                  AND t.tts < p.pts
                  AND t.tts >= p.pts - INTERVAL 3 DAY
    ),
    credit AS (
      SELECT pid, tid, event_type,
             CAST(round(1000000.0 / count(*) OVER (PARTITION BY pid))
                  AS BIGINT) AS w_e6
      FROM windowed
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS touches,
           CAST(round(sum(w_e6) / 1000000.0, 4) AS DOUBLE) AS credit_4
    FROM credit
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q343_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution under the driver hash gate:
    every purchase splits one unit of conversion credit equally
    across the user's click/view/signup touches in the preceding
    3 days — the marketing-analytics cousin of the funnel (q143) and
    as-of (q113) operators.

    Scale: the purchase↔touch pairing is an equi-join on user_id
    with a time-range predicate pushed into the join condition (the
    bucketized interval-join machinery of q264 applies when user
    histories are long); per-purchase touch counts are a PARTITIONED
    window keyed by purchase id (bounded by one user's 3-day
    activity); credit totals are one final hash agg over |types|
    keys. Credit sums round to 4 (float sum of 1/n terms)."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puid"),
        F.col("ts").alias("pts"),
    )
    touch = ev.filter(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("tts"),
        "event_type",
    )
    windowed = purch.join(
        touch,
        (F.col("user_id") == F.col("puid"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 3 DAYS")),
    ).select("pid", "tid", "event_type")
    wp = W.partitionBy("pid")
    # micro-credit lattice (the q412 micro-weight device): each 1/k
    # share quantizes to integer 1e-6 units BEFORE the sum, so channel
    # credit is an associative BIGINT sum at any number of touches —
    # a raw double sum of 1/k shares loses order-independence once
    # channel totals grow past ~1e8 micro-boundaries. floor(x+0.5)
    # equals DuckDB's round() here because 1e6/k >= 0.
    credit = windowed.withColumn(
        "w_e6", F.floor(1000000.0 / F.count("*").over(wp) + F.lit(0.5))
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("touches"),
            F.round(F.sum("w_e6") / 1000000.0, 4).alias("credit_4"),
        )
        .transform(small_sort, "event_type")
    )


@query(
    "q344_rowgroup_pruning",
    oracle="""
    SELECT CAST(doc_id // 100 AS BIGINT) AS rg_id,
           CAST(count(*) AS BIGINT) AS num_rows,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(min(doc_id) <= 349 AND max(doc_id) >= 150 AS INTEGER)
               AS kept
    FROM documents
    GROUP BY doc_id // 100
    ORDER BY rg_id
    """,
)
def q344_rowgroup_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group zone-map pruning against REAL parquet footers under
    the driver hash gate: documents are rewritten DISTRIBUTED into
    fixed 100-row, doc_id-aligned row groups (hash-repartition on
    doc_id//100, sortWithinPartitions, maxRecordsPerFile=100 — one
    row group per output file, no driver materialization of data
    rows), the FOOTER statistics are read back through the same
    distributed manifest machinery q248/q410 use
    (operators/layout.py::zonemap_manifest — a mapInPandas metadata
    scan, KB per file, never data pages), and each group is marked
    kept/skipped for the predicate doc_id BETWEEN 150 AND 349. The
    oracle recomputes the same zone map logically (doc_id//100
    buckets) — a physical file whose footer min/max or row count
    disagreed with the logical layout (e.g. a 100-row run split
    across files) would break the hash, gating the layout assumption
    q248's file-level zone maps and the compaction advisor (q284)
    rely on.

    Alignment argument: doc_id is contiguous from 0 (fixture
    contract, itself hash-gated by this oracle), so every doc_id//100
    block has exactly 100 rows except the globally-last partial one.
    Hash-partitioning on the block id keeps each block whole inside
    one task; within a task blocks sort disjointly by doc_id, so the
    writer's 100-record file cuts land exactly on block boundaries
    (the partial block has the task-maximal block id, sorts last,
    and starts a fresh file because every block before it is a full
    100).

    Scale: this is the row-group granularity of predicate pushdown —
    the reason a sorted/Z-ordered table serves point-range queries
    reading 2 of 50 groups. The write is one hash exchange + local
    sort; the footer scan fans out per file; only the metadata-scale
    manifest result (n_docs/100 rows) is collected for tmp cleanup —
    the q248 pattern, never a data collect."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators.layout import zonemap_manifest

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    root = _tf.mkdtemp(prefix="q344_rg_")
    try:
        (
            docs.withColumn("_blk", F.floor(F.col("doc_id") / 100))
            .repartition(32, "_blk")
            .sortWithinPartitions("doc_id")
            .drop("_blk")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 100)
            .parquet(root)
        )
        rows = (
            zonemap_manifest(spark, root, ["doc_id"])
            .filter(F.col("vmin").isNotNull())
            .select(
                F.floor(F.col("vmin") / 100).cast("bigint").alias("rg_id"),
                F.col("n_rows").cast("bigint").alias("num_rows"),
                F.col("vmin").cast("bigint").alias("min_id"),
                F.col("vmax").cast("bigint").alias("max_id"),
                ((F.col("vmin") <= 349) & (F.col("vmax") >= 150))
                .cast("int")
                .alias("kept"),
            )
            .orderBy("rg_id")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows,
        "rg_id BIGINT, num_rows BIGINT, min_id BIGINT, max_id BIGINT, "
        "kept INT",
    ).orderBy("rg_id")


@query(
    "q345_jackknife_ratio_se",
    oracle="""
    WITH d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS y,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS x
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '),
                            x -> x <> '')) > 0
    ),
    s AS (SELECT count(*) AS n,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x) AS BIGINT) AS sx FROM d),
    loo AS (
      SELECT (CAST(s.sy - d.y AS DOUBLE) / CAST(s.sx - d.x AS DOUBLE))
             - CAST(s.sy AS DOUBLE) / CAST(s.sx AS DOUBLE) AS dd
      FROM d, s
    ),
    m AS (SELECT count(*) AS n,
                 CAST(sum(CAST(floor(dd * 1e11 + 0.5) AS BIGINT))
                      AS BIGINT) AS s1,
                 CAST(sum(CAST(floor(dd * dd * 1e15 + 0.5) AS BIGINT))
                      AS BIGINT) AS s2 FROM loo)
    SELECT CAST(m.n AS BIGINT) AS n,
           CAST(round(CAST(s.sy AS DOUBLE) / CAST(s.sx AS DOUBLE), 6)
                AS DOUBLE) AS ratio_6,
           CAST(round(sqrt(greatest(0.0, (m.n - 1.0) / m.n
                           * (CAST(s2 AS DOUBLE) / 1e15
                              - (CAST(s1 AS DOUBLE) / 1e11)
                                * (CAST(s1 AS DOUBLE) / 1e11) / m.n))),
                      6) AS DOUBLE)
               AS jk_se_6
    FROM m, s
    """,
)
def q345_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one jackknife standard error of the ratio estimator
    R = Σ chars / Σ tokens (mean chars-per-token) under the driver
    hash gate — the classic bias/variance tool for NONLINEAR
    estimators where a plain stddev is wrong (Efron 1982, companion
    to q336's Poisson bootstrap). Leave-one-out replicates need NO
    resampling pass: R_(i) = (S_y−y_i)/(S_x−x_i) from two broadcast
    scalar totals, so the whole estimate is two scans and three
    scalar aggregates.

    Determinism (round-14 fix): the raw-moment form srr − sr²/n is a
    catastrophic cancellation — two ~n·R² magnitudes whose difference
    is the tiny jackknife variance, so double partial-sum order noise
    (≈1e-12 relative, thread-schedule-dependent) amplified to ~0.4%
    of the SE at sf1 and flipped the round-6 hash against the oracle
    (found by the round-14 sf1 sweep after the fixture row-group
    re-layout changed Spark's summation order; deterministic, not a
    flap). The replicates are now centered on the EXACT ratio
    R = sy/sx first — every d_i = r_i − R is one IEEE division of
    exact BIGINT totals, bit-identical in both engines — and the two
    deviation moments are quantized PER TERM to integer lattices
    (floor(d·1e11 + 0.5), floor(d²·1e15 + 0.5), the q340/q371
    device) and summed as BIGINT: associative, order-free, same
    expression in the oracle. Shifting by a constant leaves the
    variance identity Σ(r−r̄)² = Σd² − (Σd)²/n unchanged, and the
    centered moments are small-magnitude (no cancellation).
    Self-normalizing bound: |d_i| ≈ (x_i/Σx)·|ratio_i − R| shrinks
    like 1/n, so n·max(d²·1e15) stays far under BIGINT at every SF
    (tightest at tiny n where d is O(1)); quantization error
    n·5e-16 is ~1e-9 of the SE, invisible at round-6."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.col("n_chars").cast("long").alias("y"),
            F.size(
                F.filter(
                    F.split(F.lower("text"), " ", -1), lambda t: t != ""
                )
            )
            .cast("long")
            .alias("x"),
        )
        .filter(F.col("x") > 0)
    )
    s = d.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("x").alias("sx"),
    )
    loo = d.crossJoin(F.broadcast(s)).select(
        (
            (F.col("sy") - F.col("y")).cast("double")
            / (F.col("sx") - F.col("x")).cast("double")
            - F.col("sy").cast("double") / F.col("sx").cast("double")
        ).alias("dd"),
        "sy",
        "sx",
    )
    m = loo.groupBy("sy", "sx").agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(F.col("dd") * 1e11 + F.lit(0.5)).cast("long")
        ).alias("s1"),
        F.sum(
            F.floor(
                F.col("dd") * F.col("dd") * 1e15 + F.lit(0.5)
            ).cast("long")
        ).alias("s2"),
    )
    sd = F.col("s1").cast("double") / 1e11
    sd2 = F.col("s2").cast("double") / 1e15
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("sy").cast("double") / F.col("sx").cast("double"), 6
        ).alias("ratio_6"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    (F.col("n") - 1.0)
                    / F.col("n")
                    * (sd2 - sd * sd / F.col("n")),
                )
            ),
            6,
        ).alias("jk_se_6"),
    )


@query(
    "q346_lexical_diversity",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
                 AS toks
      FROM documents WHERE doc_id < 200
    ),
    tok AS (
      SELECT doc_id, unnest(toks) AS token FROM t
    ),
    freq AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id,
             sum(c) AS n_tokens,
             count(*) AS n_types,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
             sum(c * length(token)) AS chars
      FROM freq GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(round(n_types / CAST(n_tokens AS DOUBLE), 6) AS DOUBLE)
               AS ttr_6,
           CAST(round(hapax / CAST(n_tokens AS DOUBLE), 6) AS DOUBLE)
               AS hapax_share_6,
           CAST(round(chars / CAST(n_tokens AS DOUBLE), 4) AS DOUBLE)
               AS avg_word_len_4
    FROM per_doc
    ORDER BY doc_id
    """,
)
def q346_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality features under the driver hash gate:
    type-token ratio, hapax-legomenon share and mean word length per
    document — the cheap statistical signals (beside q55's
    punct/stopword ratios and q291's Zipf fit) that separate natural
    prose from keyword stuffing and boilerplate in corpus triage.

    Scale: ONE shuffle — the (doc, token) count agg; everything else
    folds per doc from that frame with exact integer arithmetic
    (ratios are single divisions, no float sums anywhere)."""
    t = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower("text"), " ", -1), lambda t: t != ""
                )
            ).alias("token"),
        )
    )
    freq = t.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    per_doc = freq.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax"),
        F.sum(F.col("c") * F.length("token")).alias("chars"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.round(
            F.col("n_types") / F.col("n_tokens").cast("double"), 6
        ).alias("ttr_6"),
        F.round(
            F.col("hapax") / F.col("n_tokens").cast("double"), 6
        ).alias("hapax_share_6"),
        F.round(
            F.col("chars") / F.col("n_tokens").cast("double"), 4
        ).alias("avg_word_len_4"),
    ).orderBy("doc_id")


@query(
    "q347_gini_key_skew",
    oracle="""
    WITH uc AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    gv AS (
      SELECT cnt AS v, count(*) AS m FROM uc GROUP BY cnt
    ),
    pre AS (
      SELECT v, m,
             sum(m) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m
                 AS c
      FROM gv
    ),
    agg AS (
      SELECT sum(m) AS n, sum(v * m) AS t,
             sum(v * (m * c + m * (m + 1) / 2.0)) AS sr
      FROM pre
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(t AS BIGINT) AS total_events,
           CAST(round(2.0 * sr / (n * CAST(t AS DOUBLE))
                      - (n + 1.0) / n, 6) AS DOUBLE) AS gini_6
    FROM agg
    """,
)
def q347_gini_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-user event-count distribution under
    the driver hash gate — the single-number skew score the shuffle-
    skew advisor (q300) and salting chooser (q72) act on: 0 = uniform
    keys, →1 = one hot key owns the traffic.

    The rank-weighted sum Σ rank_i·x_i is computed WITHOUT sorting
    rows globally: counts collapse to (value, multiplicity), the
    exclusive prefix count per distinct value comes from the
    two-phase distributed prefix sum (q339 discipline), and a tie
    group's rank mass is the closed form m·c + m(m+1)/2. Exact
    integer arithmetic until the final division."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    uc = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    gv = uc.groupBy("cnt").agg(F.count("*").alias("m"))
    pre = partitioned_running_agg(
        gv,
        order_cols=["cnt"],
        value_col="m",
        out_col="cum",
        bucket=(F.col("cnt") / 16).cast("bigint"),
    ).withColumn("c", F.col("cum") - F.col("m"))
    agg = pre.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("cnt") * F.col("m")).alias("t"),
        F.sum(
            F.col("cnt")
            * (
                F.col("m") * F.col("c")
                + F.col("m") * (F.col("m") + 1) / 2.0
            )
        ).alias("sr"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("t").cast("bigint").alias("total_events"),
        F.round(
            2.0 * F.col("sr") / (F.col("n") * F.col("t").cast("double"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini_6"),
    )


@query(
    "q348_sliding_window_distinct",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS w FROM events)
    SELECT d.w AS window_end,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS distinct_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM days d
    JOIN events e ON CAST(e.ts AS DATE) BETWEEN d.w - 6 AND d.w
    GROUP BY d.w
    ORDER BY d.w
    """,
)
def q348_sliding_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 7-day distinct-user counts per day via PANE EXPLOSION
    under the driver hash gate: each event replicates to the ≤7
    window-ends it can serve (a map-side ×7, no shuffle
    amplification beyond the final (window, user) agg) — the
    standard decomposition that turns an unbounded sliding-window
    COUNT DISTINCT into one hash aggregate, instead of re-scanning a
    7-day range per day. Window ends are restricted to OBSERVED days
    by a broadcast semi-join, matching the oracle's range join.

    Scale: countDistinct shuffles (window, user) pairs once; the
    HLL-sketch variant (q308's mergeable registers) replaces the
    exact distinct when windows carry billions of users."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    days = ev.select(F.col("d").alias("w")).distinct()
    exploded = ev.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("w"),
    ).join(F.broadcast(days), "w", "left_semi")
    return (
        exploded.groupBy("w")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("distinct_users"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(F.col("w").alias("window_end"), "distinct_users", "n_events")
        .transform(small_sort, "window_end")
    )


@query(
    "q349_calibration_ece",
    oracle="""
    WITH scored AS (
      SELECT vec_id,
             CAST(label % 2 = 0 AS INTEGER) AS y,
             round(1.0 / (1.0 + exp(-(
               8.0 * CAST(embedding[1] AS DOUBLE)
               - 6.0 * CAST(embedding[2] AS DOUBLE)
               + 4.0 * CAST(embedding[3] AS DOUBLE)))), 6) AS p
      FROM embeddings
    ),
    binned AS (
      SELECT least(CAST(floor(p * 10) AS INTEGER), 9) AS bin, y, p
      FROM scored
    ),
    per_bin AS (
      SELECT bin, count(*) AS n,
             sum(y) AS pos,
             avg(p) AS mean_p
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n) AS nt FROM per_bin)
    SELECT bin, CAST(n AS BIGINT) AS n,
           CAST(round(mean_p, 4) AS DOUBLE) AS mean_pred_4,
           CAST(round(pos / CAST(n AS DOUBLE), 6) AS DOUBLE)
               AS obs_rate_6,
           CAST(round(sum(n * abs(pos / CAST(n AS DOUBLE) - mean_p))
                          OVER () / t.nt, 4) AS DOUBLE) AS ece_4
    FROM per_bin, tot t
    ORDER BY bin
    """,
)
def q349_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration reliability bins + Expected Calibration Error for a
    fixed-weight logistic scorer over the embeddings table (label
    parity as ground truth) under the driver hash gate — the
    post-training diagnostic beside AUC (q83 family) that q288's
    logistic classifier would feed: per decile-of-score bin, mean
    predicted probability vs observed positive rate; ECE is the
    n-weighted mean absolute gap.

    Determinism: scores round to 6 BEFORE decile binning so a 1-ulp
    exp() difference can't flip a bin edge. Scale: one hash agg on
    ≤10 bins; the ECE window runs over those 10 rows (bounded
    frame). The scorer is pure JVM column math — applying a trained
    model at 100 TB is exactly this map."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        (F.col("label") % 2 == 0).cast("int").alias("y"),
        F.round(
            1.0
            / (
                1.0
                + F.exp(
                    -(
                        8.0 * F.element_at("embedding", 1).cast("double")
                        - 6.0 * F.element_at("embedding", 2).cast("double")
                        + 4.0 * F.element_at("embedding", 3).cast("double")
                    )
                )
            ),
            6,
        ).alias("p"),
    )
    binned = emb.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "y",
        "p",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("pos"),
        F.avg("p").alias("mean_p"),
    )
    # ECE as a scalar aggregate broadcast back onto the bins — a
    # window over the ≤10 bin rows would be bounded too, but the
    # scalar-agg + broadcast form keeps the registry's no-global-
    # window gate clean without a whitelist entry
    ece = per_bin.agg(
        F.round(
            F.sum(
                F.col("n")
                * F.abs(
                    F.col("pos") / F.col("n").cast("double")
                    - F.col("mean_p")
                )
            )
            / F.sum("n"),
            4,
        ).alias("ece_4")
    )
    return (
        per_bin.crossJoin(F.broadcast(ece))
        .select(
            "bin",
            F.col("n").cast("bigint").alias("n"),
            F.round("mean_p", 4).alias("mean_pred_4"),
            F.round(F.col("pos") / F.col("n").cast("double"), 6).alias(
                "obs_rate_6"
            ),
            "ece_4",
        )
        .transform(small_sort, "bin")
    )


@query(
    "q350_stream_static_enrichment",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_nationkey
    ORDER BY nationkey
    """,
)
def q350_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static enrichment under the oracle hash gate: the
    events table replays as a JSON file stream (one file per
    micro-batch), each micro-batch joins the STATIC customer
    dimension — the broadcast-per-batch join Structured Streaming
    runs for dimension enrichment — and the exactly-once parquet sink
    (streaming/sinks.py) commits the enriched rows. The re-aggregated
    output must equal DuckDB's batch join: any dropped/duplicated
    batch or stale dim snapshot breaks the hash.

    Scale: the static side is a broadcast (dims fit executors); the
    stream side never shuffles before the sink. This is the third
    streaming join shape beside q167 (stream-stream) and q233's
    stateful ops."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.streaming.sinks import drain_to_parquet

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    base = _tf.mkdtemp(prefix="q350_stream_static_")
    src = _os.path.join(base, "src")
    out = _os.path.join(base, "out")
    ckpt = _os.path.join(base, "ckpt")
    try:
        ev.select("event_id", "user_id", "value").repartition(3).write.json(
            src
        )
        stream = (
            spark.readStream.schema(
                "event_id BIGINT, user_id BIGINT, value DOUBLE"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        enriched = stream.join(
            F.broadcast(cust), stream["user_id"] == cust["c_custkey"]
        ).select("event_id", "user_id", "value", "c_nationkey")
        drain_to_parquet(enriched, out, ckpt)
        agg = (
            spark.read.parquet(out)
            .groupBy("c_nationkey")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.countDistinct("user_id").cast("bigint").alias("n_users"),
                money_sum(F.col("value")).alias("total_value"),
            )
            .select(
                F.col("c_nationkey").alias("nationkey"),
                "n_events",
                "n_users",
                "total_value",
            )
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "nationkey"
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)


@query(
    "q351_asof_native_parity",
    oracle="""
    WITH purch AS (
      SELECT event_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, ts, max(value) AS vval
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts AS pts,
           v.ts AS view_ts,
           CAST(round(v.vval, 2) AS DOUBLE) AS view_value
    FROM purch p
    ASOF LEFT JOIN views v
      ON v.user_id = p.user_id AND v.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def q351_asof_native_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join cross-checked against an INDEPENDENT implementation:
    DuckDB's native ASOF LEFT JOIN (not a hand-written window oracle
    like q113's) must reproduce operators/asof.py::asof_join row for
    row — each purchase picks the user's most recent view at-or-
    before it, unmatched purchases keep NULLs. The right side is
    pre-deduplicated per (user, ts) so both engines face a unique
    match key and tie semantics can't differ.

    Scale: the union-tag single-shuffle as-of plan (one exchange on
    user_id, partitioned last-value window), vs the naive
    greatest-ts-per-pair join that shuffles the pair product."""
    from distcpplus_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("vval"))
    )
    out = asof_join(
        purch, views, on="user_id", left_ts="ts", right_ts="ts"
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("pts"),
        F.col("ts_asof").alias("view_ts"),
        F.round(F.col("vval_asof"), 2).alias("view_value"),
    ).orderBy("event_id")


@query(
    "q352_theil_sen_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0
                   / count(*), 4) AS m
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    slopes AS (
      SELECT a.event_type,
             (b.m - a.m) / CAST(b.d - a.d AS DOUBLE) AS slope
      FROM daily a
      JOIN daily b ON b.event_type = a.event_type AND b.d > a.d
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(median(slope), 6) AS DOUBLE) AS theil_sen_6
    FROM slopes
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q352_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per event type under the
    driver hash gate: the median of all pairwise slopes of the daily
    mean series — the outlier-resistant companion to q341's ridge
    (one corrupted day moves OLS, not the pairwise median; 29.3%
    breakdown point, Sen 1968).

    Scale: the pairwise self-join is over the CALENDAR-bounded daily
    aggregate (30 rows/type at any SF ⇒ ≤435 pairs/type), never over
    raw events — the reduction happens first, the O(k²) step runs on
    the reduced series. Daily means round to 4 before slopes; the
    median of identical double sets is engine-independent."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("d"), "value"
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.round(money_sum(F.col("value")) / F.count("*"), 4).alias("m")
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("bd"),
        F.col("m").alias("bm"),
    )
    slopes = daily.join(
        b,
        (F.col("bt") == F.col("event_type")) & (F.col("bd") > F.col("d")),
    ).select(
        "event_type",
        (
            (F.col("bm") - F.col("m"))
            / F.datediff(F.col("bd"), F.col("d")).cast("double")
        ).alias("slope"),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.expr("percentile(slope, 0.5)"), 6).alias(
                "theil_sen_6"
            ),
        )
        .transform(small_sort, "event_type")
    )


@query(
    "q353_mann_whitney_u",
    oracle="""
    WITH pool AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g
      FROM events WHERE event_type IN ('click', 'error')
    ),
    gv AS (
      SELECT v, count(*) AS m, sum(g) AS m1 FROM pool GROUP BY v
    ),
    pre AS (
      SELECT v, m, m1,
             sum(m) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - m
                 AS c
      FROM gv
    ),
    agg AS (
      SELECT sum(m1) AS n1, sum(m - m1) AS n2,
             sum(m1 * (c + (m + 1) / 2.0)) AS r1,
             sum(CAST(m AS DOUBLE) * m * m - m) AS tie_term
      FROM pre
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(round(r1 - n1 * (n1 + 1) / 2.0, 2) AS DOUBLE) AS u1_2,
           CAST(round(
             (r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / sqrt(n1 * n2 / 12.0
                    * ((n1 + n2 + 1.0)
                       - tie_term / ((n1 + n2)
                                     * (n1 + n2 - 1.0)))), 6)
             AS DOUBLE) AS z_6
    FROM agg
    """,
)
def q353_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (click vs error `value`
    distributions) with the tie-corrected normal approximation, under
    the driver hash gate — the nonparametric two-sample location test
    beside q323's exact KS. Average ranks for tied values come from
    the value-grouped closed form over an exclusive prefix count
    (avg_rank = c + (m+1)/2), so NO row-level global sort exists:
    ranks live on the distinct-value frame.

    Scale: one (value) hash agg carrying per-group counts, the q339
    two-phase prefix sum over distinct values, then three scalar
    aggregates — rank-sum statistics at 100 TB without ordering a
    single data row. Rank sums are exact dyadic doubles (halves);
    the only rounding is the final z."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    pool = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "error"))
        .select(
            F.col("value").alias("v"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("g"),
        )
    )
    gv = pool.groupBy("v").agg(
        F.count("*").alias("m"), F.sum("g").alias("m1")
    )
    pre = partitioned_running_agg(
        gv,
        order_cols=["v"],
        value_col="m",
        out_col="cum",
        bucket=F.floor(F.col("v")).cast("bigint"),
    ).withColumn("c", F.col("cum") - F.col("m"))
    agg = pre.agg(
        F.sum("m1").alias("n1"),
        F.sum(F.col("m") - F.col("m1")).alias("n2"),
        F.sum(F.col("m1") * (F.col("c") + (F.col("m") + 1) / 2.0)).alias(
            "r1"
        ),
        F.sum(
            F.col("m").cast("double") * F.col("m") * F.col("m") - F.col("m")
        ).alias("tie_term"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u1 = r1 - n1 * (n1 + 1) / 2.0
    sigma = F.sqrt(
        n1 * n2 / 12.0
        * (
            (n1 + n2 + 1.0)
            - F.col("tie_term") / ((n1 + n2) * (n1 + n2 - 1.0))
        )
    )
    return agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(u1, 2).alias("u1_2"),
        F.round((u1 - n1 * n2 / 2.0) / sigma, 6).alias("z_6"),
    )


@query(
    "q354_welch_t_test",
    oracle="""
    WITH s AS (
      SELECT event_type, count(*) AS n, sum(value) AS sv,
             sum(value * value) AS svv
      FROM events WHERE event_type IN ('click', 'error')
      GROUP BY event_type
    ),
    w AS (
      SELECT
        max(CASE WHEN event_type = 'click' THEN n END) AS n1,
        max(CASE WHEN event_type = 'click' THEN sv END) AS sv1,
        max(CASE WHEN event_type = 'click' THEN svv END) AS svv1,
        max(CASE WHEN event_type = 'error' THEN n END) AS n2,
        max(CASE WHEN event_type = 'error' THEN sv END) AS sv2,
        max(CASE WHEN event_type = 'error' THEN svv END) AS svv2
      FROM s
    ),
    m AS (
      SELECT n1, n2,
             sv1 / n1 - sv2 / n2 AS diff,
             (svv1 - sv1 * sv1 / n1) / (n1 - 1) / n1 AS a,
             (svv2 - sv2 * sv2 / n2) / (n2 - 1) / n2 AS b
      FROM w
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(round(diff, 4) AS DOUBLE) AS mean_diff_4,
           CAST(round(diff / sqrt(a + b), 4) AS DOUBLE) AS t_4,
           CAST(round((a + b) * (a + b)
                      / (a * a / (n1 - 1) + b * b / (n2 - 1)), 2)
                AS DOUBLE) AS df_2
    FROM m
    """,
)
def q354_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (click vs error `value`) with
    the Welch-Satterthwaite degrees of freedom, under the driver hash
    gate — the parametric member of the engine's two-sample family
    (q323 exact KS, q353 rank-sum). Everything reduces to per-group
    (n, Σx, Σx²): ONE hash aggregate over two groups, identical
    closed-form algebra on both engines afterwards.

    Scale: the canonical sufficient-statistics pattern — the test
    costs one map-side-combined agg regardless of row count."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "error"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sv"),
            F.sum(F.col("value") * F.col("value")).alias("svv"),
        )
    )
    w = s.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "click", F.col("sv"))).alias(
            "sv1"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("svv"))).alias(
            "svv1"
        ),
        F.max(F.when(F.col("event_type") == "error", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "error", F.col("sv"))).alias(
            "sv2"
        ),
        F.max(F.when(F.col("event_type") == "error", F.col("svv"))).alias(
            "svv2"
        ),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    diff = F.col("sv1") / n1 - F.col("sv2") / n2
    a = (F.col("svv1") - F.col("sv1") * F.col("sv1") / n1) / (n1 - 1) / n1
    b = (F.col("svv2") - F.col("sv2") * F.col("sv2") / n2) / (n2 - 1) / n2
    return w.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        F.round(diff, 4).alias("mean_diff_4"),
        F.round(diff / F.sqrt(a + b), 4).alias("t_4"),
        F.round(
            (a + b) * (a + b)
            / (a * a / (n1 - 1) + b * b / (n2 - 1)),
            2,
        ).alias("df_2"),
    )


@query(
    "q355_token_budget_knapsack",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                             x -> x <> '')) AS toks,
             n_chars
      FROM documents
    ),
    scored AS (
      SELECT doc_id, toks,
             round(n_chars / CAST(toks AS DOUBLE), 6) AS ratio
      FROM d WHERE toks > 0
    ),
    budget AS (
      SELECT CAST(floor(0.5 * sum(toks)) AS BIGINT) AS b FROM scored
    ),
    cum AS (
      SELECT doc_id, ratio, toks,
             sum(toks) OVER (ORDER BY ratio DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum_tokens
      FROM scored
    )
    SELECT doc_id,
           CAST(ratio AS DOUBLE) AS ratio_6,
           CAST(toks AS BIGINT) AS doc_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum, budget
    WHERE cum_tokens <= budget.b
    ORDER BY ratio_6 DESC, doc_id
    """,
)
def q355_token_budget_knapsack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained greedy corpus selection under the
    driver hash gate: rank documents by a quality-per-token score
    (chars/token here; any scorer plugs in) and keep the prefix whose
    cumulative token count fits a 50%-of-corpus budget — the greedy
    knapsack that turns 'train on the best N tokens' into a plan
    (companion to q80's mixture-to-token-budget, which allocates
    ACROSS sources; this selects WITHIN one pool).

    Scale: the cumulative token count over the quality ordering is
    the q339/q293 two-phase prefix sum bucketed by the (monotone)
    quantized score — no partition-less window ranks the corpus; the
    budget is one broadcast scalar."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(
            F.filter(F.split(F.lower("text"), " ", -1), lambda t: t != "")
        ).alias("toks"),
    )
    scored = d.filter(F.col("toks") > 0).select(
        "doc_id",
        "toks",
        F.round(F.col("n_chars") / F.col("toks").cast("double"), 6).alias(
            "ratio"
        ),
        (-F.round(F.col("n_chars") / F.col("toks").cast("double"), 6)).alias(
            "neg_ratio"
        ),
    )
    budget = int(
        scored.agg(
            F.floor(0.5 * F.sum("toks")).cast("bigint").alias("b")
        ).collect()[0]["b"]
    )
    cum = partitioned_running_agg(
        scored,
        order_cols=["neg_ratio", "doc_id"],
        value_col="toks",
        out_col="cum_tokens",
        bucket=F.floor(F.col("neg_ratio") * 10).cast("bigint"),
    )
    return (
        cum.filter(F.col("cum_tokens") <= budget)
        .select(
            "doc_id",
            F.col("ratio").alias("ratio_6"),
            F.col("toks").cast("bigint").alias("doc_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
        .orderBy(F.desc("ratio_6"), "doc_id")
    )


@query(
    "q356_csv_quoting_roundtrip",
    oracle="""
    SELECT doc_id,
           md5('v,' || chr(10) || substr(text, 1, 40) || '"q""x' ||
               chr(13) || 'tail') AS gnarly_md5,
           CAST(length('v,' || chr(10) || substr(text, 1, 40) || '"q""x'
                       || chr(13) || 'tail') AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q356_csv_quoting_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV quoting/escaping round-trip under the driver hash gate:
    strings stuffed with every CSV landmine — embedded commas, LF
    newlines inside fields, double quotes, CR — are WRITTEN to disk
    as CSV by Spark (RFC 4180 quoting, escape='\"') and read back
    with multiLine=true; the md5 of every recovered string must match
    the oracle's closed-form construction. A mis-escaped quote or a
    naive line-splitting reader shears rows apart and changes every
    hash downstream.

    Scale note (the honest caveat): multiLine CSV is NOT splittable —
    one file = one task — which is exactly why the engine's bulk
    paths prefer parquet/JSONL and this gate exists to keep the
    interchange path correct, not fast."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    # build 'v,' + LF + text[:40] + '"q""x' + CR + 'tail' exactly as
    # the oracle does (in a single-quoted SQL literal, "" is TWO
    # double-quote characters — no escaping happens there)
    gnarly = F.concat(
        F.lit("v,\n"),
        F.substring("text", 1, 40),
        F.lit('"q""x'),
        F.lit("\rtail"),
    )
    src = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", gnarly.alias("gnarly"))
    )
    base = _tf.mkdtemp(prefix="q356_csv_")
    out = _os.path.join(base, "csv")
    try:
        # escape='"' on BOTH sides: RFC 4180 doubles quotes; the
        # univocity default ('\') would write \" and the reader
        # expecting "" would shear the field
        src.coalesce(1).write.option("header", True).option(
            "quoteAll", True
        ).option("escape", '"').csv(out)
        back = (
            spark.read.option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .schema("doc_id BIGINT, gnarly STRING")
            .csv(out)
        )
        res = back.select(
            "doc_id",
            F.md5(F.col("gnarly").cast("binary")).alias("gnarly_md5"),
            F.length("gnarly").cast("bigint").alias("n_chars"),
        )
        rows = res.collect()
    finally:
        _sh.rmtree(base, ignore_errors=True)
    return local_rows(spark, rows, res.schema).orderBy("doc_id")


@query(
    "q357_systematic_resample",
    oracle="""
    WITH share AS (
      SELECT lang, count(*) AS n_l,
             (SELECT count(*) FROM documents) AS n
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang,
             CAST(round(1000000.0 * (0.2 * n) / n_l, 0) AS BIGINT) AS wi
      FROM share
    ),
    cum AS (
      SELECT d.doc_id, d.lang, w.wi,
             sum(w.wi) OVER (ORDER BY d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cw
      FROM documents d JOIN w USING (lang)
    ),
    tot AS (SELECT max(cw) AS tw FROM cum)
    SELECT doc_id, lang,
           CAST((cw * 100) // tw - ((cw - wi) * 100) // tw AS BIGINT)
               AS n_picks
    FROM cum, tot
    WHERE (cw * 100) // tw > ((cw - wi) * 100) // tw
    ORDER BY doc_id
    """,
)
def q357_systematic_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (stride) resampling to a TARGET language mixture
    under the driver hash gate:每 document gets an integer weight
    ∝ target_share/current_share (uniform 20% target across the 5
    langs), weights accumulate along doc_id order, and a pick lands
    wherever the cumulative weight crosses one of 100 evenly-spaced
    thresholds — the O(n) low-variance resampler from particle
    filtering, applied to corpus rebalancing (vs q114's independent
    weighted draws; systematic sampling has strictly lower variance).

    Determinism: weights are INTEGERS (scaled 1e6 and rounded), so
    cumulative sums and the threshold-crossing floor arithmetic are
    EXACT in both engines — no float boundary exists at all. Scale:
    the running weight is the q339 two-phase prefix sum bucketed by
    doc_id blocks; everything else is a broadcast join of |langs|
    weights and one scalar total."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n = docs.count()
    share = docs.groupBy("lang").agg(F.count("*").alias("n_l"))
    w = share.select(
        "lang",
        F.round(1000000.0 * (0.2 * F.lit(n)) / F.col("n_l"), 0)
        .cast("bigint")
        .alias("wi"),
    )
    cum = partitioned_running_agg(
        docs.join(F.broadcast(w), "lang"),
        order_cols=["doc_id"],
        value_col="wi",
        out_col="cw",
        bucket=F.floor(F.col("doc_id") / 512).cast("bigint"),
    )
    tw = int(cum.agg(F.max("cw").alias("t")).collect()[0]["t"])
    # integer floor-division semantics: (cw*100) // tw via cast after
    # floor — both sides are exact BIGINT products
    hi = F.floor((F.col("cw") * 100) / F.lit(tw)).cast("bigint")
    lo = F.floor(((F.col("cw") - F.col("wi")) * 100) / F.lit(tw)).cast(
        "bigint"
    )
    return (
        cum.withColumn("n_picks", (hi - lo))
        .filter(F.col("n_picks") > 0)
        .select("doc_id", "lang", F.col("n_picks").cast("bigint"))
        .orderBy("doc_id")
    )


@query(
    "q358_cohort_retention",
    oracle="""
    WITH firstday AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(ts AS DATE) - f.cohort AS offset_days
      FROM events e JOIN firstday f USING (user_id)
    ),
    cohort_size AS (
      SELECT cohort, count(DISTINCT user_id) AS n0 FROM firstday
      GROUP BY cohort
    )
    SELECT a.cohort, CAST(a.offset_days AS BIGINT) AS offset_days,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(round(count(*) / CAST(s.n0 AS DOUBLE), 6) AS DOUBLE)
               AS retention_6
    FROM activity a JOIN cohort_size s USING (cohort)
    WHERE a.offset_days IN (0, 1, 7, 14, 21)
    GROUP BY a.cohort, a.offset_days, s.n0
    ORDER BY a.cohort, offset_days
    """,
)
def q358_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix under the driver hash gate: users
    cohorted by first-seen day, retention = share of the cohort
    active again at day offsets 0/1/7/14/21 — the canonical product-
    analytics rollup (beside q143's funnel and q264's sessionization).

    Scale: first-seen is one min-agg on user_id; activity dedups to
    (user, day) before joining the cohort map back on user_id (hash
    join co-partitioned with the agg); the retention matrix is
    |cohorts|×|offsets| — tiny. No windows at all."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firstday = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    activity = (
        ev.join(firstday, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.col("d"), F.col("cohort")).alias("offset_days"),
        )
        .distinct()
    )
    cohort_size = firstday.groupBy("cohort").agg(
        F.countDistinct("user_id").alias("n0")
    )
    return (
        activity.filter(F.col("offset_days").isin(0, 1, 7, 14, 21))
        .groupBy("cohort", "offset_days")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(cohort_size), "cohort")
        .select(
            "cohort",
            F.col("offset_days").cast("bigint").alias("offset_days"),
            F.col("active_users").cast("bigint").alias("active_users"),
            F.round(
                F.col("active_users") / F.col("n0").cast("double"), 6
            ).alias("retention_6"),
        )
        .transform(small_sort, "cohort", "offset_days")
    )


@query(
    "q359_rfm_segmentation",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             max(CAST(ts AS DATE)) AS last_day,
             count(*) AS freq,
             sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS monetary
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    anchor AS (SELECT max(last_day) AS today FROM per_user),
    rfm AS (
      SELECT user_id,
             a.today - last_day AS recency,
             freq, monetary
      FROM per_user, anchor a
    ),
    cuts AS (
      SELECT round(median(recency), 4) AS r_cut,
             round(median(freq), 4) AS f_cut,
             round(median(monetary), 4) AS m_cut
      FROM rfm
    )
    SELECT (CASE WHEN recency <= r_cut THEN 'R+' ELSE 'R-' END ||
            CASE WHEN freq > f_cut THEN 'F+' ELSE 'F-' END ||
            CASE WHEN monetary > m_cut THEN 'M+' ELSE 'M-' END)
               AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(monetary * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total_monetary_2
    FROM rfm, cuts
    GROUP BY segment
    ORDER BY segment
    """,
)
def q359_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) median-split segmentation of
    purchasers under the driver hash gate — eight behavioral segments
    from three exact medians, the analytics sibling of q309's
    leakage-safe split (both turn per-entity aggregates into
    deterministic cohort labels).

    Determinism: split points are exact percentile(0.5) values
    rounded to 4 BEFORE the comparisons; recency/freq are integers,
    monetary is a rounded 2-decimal sum. Scale: one purchase agg per
    user, one broadcast of three scalars, one 8-key agg."""
    pu = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count("*").alias("freq"),
            money_sum(F.col("value")).alias("monetary"),
        )
    )
    anchor = pu.agg(F.max("last_day").alias("today"))
    rfm = pu.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff(F.col("today"), F.col("last_day")).alias("recency"),
        "freq",
        "monetary",
    )
    cuts = rfm.agg(
        F.round(F.expr("percentile(recency, 0.5)"), 4).alias("r_cut"),
        F.round(F.expr("percentile(freq, 0.5)"), 4).alias("f_cut"),
        F.round(F.expr("percentile(monetary, 0.5)"), 4).alias("m_cut"),
    )
    seg = F.concat(
        F.when(F.col("recency") <= F.col("r_cut"), "R+").otherwise("R-"),
        F.when(F.col("freq") > F.col("f_cut"), "F+").otherwise("F-"),
        F.when(F.col("monetary") > F.col("m_cut"), "M+").otherwise("M-"),
    )
    return (
        rfm.crossJoin(F.broadcast(cuts))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            # a SUM of 2-decimal values rounded back to 2 can never
            # land on a half-way boundary (the true sum is a multiple
            # of 0.01), unlike an avg at 4 decimals — which hit an
            # exact .xxxx5 here and split HALF_UP (Spark) vs
            # half-even (DuckDB)
            money_sum(F.col("monetary")).alias("total_monetary_2"),
        )
        .transform(small_sort, "segment")
    )


@query(
    "q360_url_canonicalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             'HTTP://Example.COM:80/Path' || doc_id ||
             '?utm_source=x&b=' || lang || '&a=1&utm_campaign=y' AS url
      FROM documents WHERE doc_id < 200
    ),
    parts AS (
      SELECT doc_id, url,
             lower(split_part(url, '://', 1)) AS scheme,
             split_part(url, '://', 2) AS rest
      FROM raw
    ),
    hp AS (
      SELECT doc_id, url, scheme,
             split_part(rest, '/', 1) AS hostport,
             substr(rest, length(split_part(rest, '/', 1)) + 2) AS pathq
      FROM parts
    ),
    comp AS (
      SELECT doc_id, url, scheme,
             lower(split_part(hostport, ':', 1)) AS host,
             split_part(hostport, ':', 2) AS port,
             split_part(pathq, '?', 1) AS path,
             list_aggregate(
               list_sort(list_filter(
                 string_split(split_part(pathq, '?', 2), '&'),
                 p -> NOT starts_with(p, 'utm_'))),
               'string_agg', '&') AS params
      FROM hp
    )
    SELECT doc_id,
           scheme || '://' || host ||
           CASE WHEN port <> '' AND port <> '80' THEN ':' || port
                ELSE '' END ||
           '/' || path ||
           CASE WHEN params IS NOT NULL AND params <> ''
                THEN '?' || params ELSE '' END AS canonical_url
    FROM comp
    ORDER BY doc_id
    """,
)
def q360_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL normalization under the driver hash gate — the
    dedup-key preprocessing every crawl pipeline runs before exact/
    near dedup (q50/q59): lowercase scheme+host, strip the default
    :80 port, drop utm_* tracking params, SORT the surviving query
    params so param order can't split identical pages. Fixture URLs
    are constructed deterministically from the documents table.

    Scale: pure JVM string/array built-ins (split_part, filter,
    array_sort, array_join) — whole-stage codegen, zero shuffle,
    exactly what normalizing 100 TB of crawl URLs requires."""
    raw = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.concat(
                F.lit("HTTP://Example.COM:80/Path"),
                F.col("doc_id").cast("string"),
                F.lit("?utm_source=x&b="),
                F.col("lang"),
                F.lit("&a=1&utm_campaign=y"),
            ).alias("url"),
        )
    )
    scheme = F.lower(F.split_part(F.col("url"), F.lit("://"), F.lit(1)))
    rest = F.split_part(F.col("url"), F.lit("://"), F.lit(2))
    hostport = F.split_part(rest, F.lit("/"), F.lit(1))
    pathq = F.substring(rest, F.length(hostport) + 2, 1 << 20)
    host = F.lower(F.split_part(hostport, F.lit(":"), F.lit(1)))
    port = F.split_part(hostport, F.lit(":"), F.lit(2))
    path = F.split_part(pathq, F.lit("?"), F.lit(1))
    qstr = F.split_part(pathq, F.lit("?"), F.lit(2))
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qstr, "&", -1),
                lambda p: ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(
            (port != "") & (port != "80"), F.concat(F.lit(":"), port)
        ).otherwise(""),
        F.lit("/"),
        path,
        F.when(
            params.isNotNull() & (params != ""),
            F.concat(F.lit("?"), params),
        ).otherwise(""),
    )
    return raw.select("doc_id", canonical.alias("canonical_url")).orderBy(
        "doc_id"
    )


@query(
    "q361_unicode_nfc_normalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             substr(text, 1, 20) || 'e' || chr(769) || 'o' || chr(776)
                 || 'n' || chr(771) AS s
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(length(s) AS BIGINT) AS pre_len,
           CAST(length(nfc_normalize(s)) AS BIGINT) AS post_len,
           md5(nfc_normalize(s)) AS post_md5
    FROM raw
    ORDER BY doc_id
    """,
)
def q361_unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization under the driver hash gate: strings
    carrying decomposed combining sequences (e+U+0301, o+U+0308,
    n+U+0303) are canonically composed (é, ö, ñ) before hashing —
    WITHOUT this, visually identical multilingual documents hash
    differently and exact dedup (q50) silently under-merges. Spark
    has no NFC built-in, so the engine runs Python's unicodedata
    through an Arrow-batched mapInPandas (the multimodal-tier
    pattern); DuckDB's native nfc_normalize is the independent
    cross-check — both implement UAX #15, so md5s must agree.

    Scale: embarrassingly parallel map, zero shuffle; normalization
    cost is linear in bytes, and only strings containing combining
    marks pay the compose path."""
    import pandas as pd  # noqa: F401

    raw = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.concat(
                F.substring("text", 1, 20),
                # DECOMPOSED combining marks, written as escapes so no
                # editor/normalizer can silently recompose them
                F.lit("e\u0301o\u0308n\u0303"),
            ).alias("s"),
        )
    )

    def normalize(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "pre_len": pdf["s"].map(len).astype("int64"),
                    "norm": pdf["s"].map(
                        lambda x: unicodedata.normalize("NFC", x)
                    ),
                }
            )

    out = raw.mapInPandas(
        normalize, "doc_id bigint, pre_len bigint, norm string"
    )
    return out.select(
        "doc_id",
        "pre_len",
        F.length("norm").cast("bigint").alias("post_len"),
        F.md5(F.col("norm").cast("binary")).alias("post_md5"),
    ).orderBy("doc_id")


@query(
    "q362_dq_constraint_suite",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS violations
    UNION ALL
    SELECT 'orders_dup_orderkey',
           CAST((SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
    UNION ALL
    SELECT 'orders_null_custkey',
           CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_ship_before_order',
           CAST((SELECT count(*) FROM lineitem l JOIN orders o
                 ON o.o_orderkey = l.l_orderkey
                 WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
    ORDER BY check_name
    """,
)
def q362_dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite under the driver hash
    gate — the dbt-test / Deequ-style validation pass a pipeline runs
    on every ingest: referential integrity (orphan lineitems),
    uniqueness (duplicate order keys), completeness (null custkeys),
    range checks (quantity, discount), and cross-table temporal
    sanity (shipped before ordered). One row per check with its
    violation count — zero IS the assertion, but the gate hashes
    whatever the data says.

    Scale: each check is an independent agg/anti-join Catalyst
    optimizes separately (the orphan check is a broadcast-able
    left-anti; the dup check reuses the orderkey agg); the union is
    6 single-row frames."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def one(name: str, cnt_df) -> DataFrame:
        return cnt_df.select(
            F.lit(name).alias("check_name"),
            F.col("c").cast("bigint").alias("violations"),
        )

    orphans = (
        li.join(
            orders.select("o_orderkey"),
            li["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        ).agg(F.count("*").alias("c"))
    )
    dups = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count("*").alias("c"))
    )
    nulls = orders.filter(F.col("o_custkey").isNull()).agg(
        F.count("*").alias("c")
    )
    qty = li.filter(F.col("l_quantity") <= 0).agg(F.count("*").alias("c"))
    disc = li.filter(
        (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
    ).agg(F.count("*").alias("c"))
    shiporder = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count("*").alias("c"))
    )
    out = (
        one("lineitem_orphan_orderkey", orphans)
        .unionAll(one("orders_dup_orderkey", dups))
        .unionAll(one("orders_null_custkey", nulls))
        .unionAll(one("lineitem_nonpositive_qty", qty))
        .unionAll(one("lineitem_discount_range", disc))
        .unionAll(one("lineitem_ship_before_order", shiporder))
    )
    return out.transform(small_sort, "check_name")


@query(
    "q363_train_fitted_scaling",
    oracle="""
    WITH feats AS (
      SELECT vec_id,
             CAST(embedding[1] AS DOUBLE) AS f1,
             CAST(embedding[2] AS DOUBLE) AS f2,
             vec_id % 5 = 0 AS is_test
      FROM embeddings
    ),
    fit AS (
      SELECT count(*) AS n,
             sum(f1) AS s1, sum(f1 * f1) AS ss1,
             sum(f2) AS s2, sum(f2 * f2) AS ss2
      FROM feats WHERE NOT is_test
    ),
    mu AS (
      SELECT s1 / n AS m1, sqrt((ss1 - s1 * s1 / n) / (n - 1)) AS sd1,
             s2 / n AS m2, sqrt((ss2 - s2 * s2 / n) / (n - 1)) AS sd2
      FROM fit
    )
    SELECT vec_id,
           CAST(round((f1 - m1) / sd1, 4) AS DOUBLE) AS z1_4,
           CAST(round((f2 - m2) / sd2, 4) AS DOUBLE) AS z2_4
    FROM feats, mu
    WHERE is_test
    ORDER BY vec_id
    """,
)
def q363_train_fitted_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe feature standardization under the driver hash
    gate: z-score scaling whose mean/std are fitted on the TRAIN
    split only (vec_id % 5 != 0) and applied to the held-out rows —
    the feature-store discipline that q309's group-aware splitter
    protects at the document level, enforced here at the statistic
    level (fitting on the full table is the classic leakage bug this
    query would catch as a hash mismatch).

    Determinism: both engines compute sample std from the identical
    (n, Σx, Σx²) closed form; z rounds to 4. Scale: one agg over the
    train split, two broadcast scalars per feature, a pure map over
    the test split."""
    feats = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("f1"),
        F.element_at("embedding", 2).cast("double").alias("f2"),
        (F.col("vec_id") % 5 == 0).alias("is_test"),
    )
    fit = feats.filter(~F.col("is_test")).agg(
        F.count("*").alias("n"),
        F.sum("f1").alias("s1"),
        F.sum(F.col("f1") * F.col("f1")).alias("ss1"),
        F.sum("f2").alias("s2"),
        F.sum(F.col("f2") * F.col("f2")).alias("ss2"),
    )
    n = F.col("n")
    mu = fit.select(
        (F.col("s1") / n).alias("m1"),
        F.sqrt((F.col("ss1") - F.col("s1") * F.col("s1") / n) / (n - 1)).alias(
            "sd1"
        ),
        (F.col("s2") / n).alias("m2"),
        F.sqrt((F.col("ss2") - F.col("s2") * F.col("s2") / n) / (n - 1)).alias(
            "sd2"
        ),
    )
    return (
        feats.filter(F.col("is_test"))
        .crossJoin(F.broadcast(mu))
        .select(
            "vec_id",
            F.round((F.col("f1") - F.col("m1")) / F.col("sd1"), 4).alias(
                "z1_4"
            ),
            F.round((F.col("f2") - F.col("m2")) / F.col("sd2"), 4).alias(
                "z2_4"
            ),
        )
        .orderBy("vec_id")
    )


@query(
    "q364_silhouette_centroid",
    oracle="""
    WITH pt AS (
      SELECT vec_id, label, i.i AS pos,
             CAST(embedding[CAST(i.i AS INTEGER)] AS DOUBLE) AS x
      FROM embeddings,
           (SELECT unnest(range(1, 65)) AS i) i
    ),
    cent AS (
      SELECT label AS clabel, pos, round(avg(x), 6) AS c
      FROM pt GROUP BY label, pos
    ),
    d2 AS (
      SELECT p.vec_id, p.label, c.clabel,
             round(sum((p.x - c.c) * (p.x - c.c)), 6) AS dd
      FROM pt p JOIN cent c USING (pos)
      GROUP BY p.vec_id, p.label, c.clabel
    ),
    ab AS (
      SELECT vec_id, label,
             max(CASE WHEN clabel = label THEN sqrt(dd) END) AS a,
             min(CASE WHEN clabel <> label THEN sqrt(dd) END) AS b
      FROM d2 GROUP BY vec_id, label
    ),
    s AS (
      SELECT vec_id, label,
             round((b - a) / greatest(a, b), 6) AS si
      FROM ab
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(si), 4) AS DOUBLE) AS mean_silhouette_4
    FROM s GROUP BY label
    ORDER BY label
    """,
)
def q364_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based (simplified) silhouette score per cluster label
    under the driver hash gate: a_i = distance to own centroid, b_i =
    distance to the nearest OTHER centroid, s_i = (b−a)/max(a,b) —
    the O(n·k) clustering-quality diagnostic (full silhouette is
    O(n²); the centroid form is the one that runs at corpus scale,
    and the one k-means/IVF tuning loops actually use).

    Determinism: centroids round to 6 per dimension BEFORE distances,
    squared distances round to 6 before sqrt, s to 6 before the mean.
    Scale: centroids are one (label, dim) agg (k·d cells); each point
    then scores against a BROADCAST k×d centroid set — point rows
    never shuffle. The oracle replays the same three-round chain."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    # centroids: one (label, dim) agg — k*d cells of driver state,
    # folded back into k BROADCAST arrays so points never explode
    # (the long-form join the oracle uses would shuffle n*d*k rows)
    pt = emb.select(
        "vec_id", "label", F.posexplode("v").alias("pos0", "x")
    )
    cent_rows = (
        pt.groupBy(F.col("label").alias("clabel"), "pos0")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .collect()
    )
    by_label: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        by_label.setdefault(int(r["clabel"]), {})[int(r["pos0"])] = float(
            r["c"]
        )
    cent_arrays = [
        (lbl, [vals[i] for i in range(len(vals))])
        for lbl, vals in sorted(by_label.items())
    ]
    cent = F.broadcast(
        local_rows(spark, cent_arrays, "clabel bigint, cv array<double>")
    )
    d2 = emb.crossJoin(cent).select(
        "vec_id",
        "label",
        "clabel",
        F.round(
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.col("cv"),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, t: acc + t,
            ),
            6,
        ).alias("dd"),
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.sqrt("dd"))
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.sqrt("dd"))
        ).alias("b"),
    )
    s = ab.select(
        "label",
        F.round(
            (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b")),
            6,
        ).alias("si"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.avg("si"), 4).alias("mean_silhouette_4"),
        )
        .select(F.col("label").cast("bigint").alias("label"), "n",
                "mean_silhouette_4")
        .transform(small_sort, "label")
    )


_NB_PRED_SQL = f"""
    WITH train AS (
      SELECT doc_id, lang, {_NB_TOKS} AS toks
      FROM documents WHERE doc_id % 5 <> 0
    ),
    tok AS (SELECT lang, unnest(toks) AS token FROM train),
    tc AS (
      SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token
    ),
    tot AS (SELECT lang, sum(n) AS tot FROM tc GROUP BY lang),
    vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
    prior AS (
      SELECT lang, ln(count(*) / CAST((SELECT count(*) FROM train)
                                       AS DOUBLE)) AS logprior
      FROM train GROUP BY lang
    ),
    test AS (
      SELECT doc_id, lang AS true_lang,
             unnest({_NB_TOKS}) AS token
      FROM documents WHERE doc_id % 5 = 0
    ),
    dt AS (
      SELECT doc_id, true_lang, token, count(*) AS cnt
      FROM test GROUP BY doc_id, true_lang, token
    ),
    scored AS (
      SELECT dt.doc_id, dt.true_lang, t.lang,
             sum(dt.cnt * ln(COALESCE(tc.n, 0) + 1.0)
                 - dt.cnt * ln(t.tot + v.v)) AS loglik
      FROM dt
      CROSS JOIN tot t
      CROSS JOIN vocab v
      LEFT JOIN tc ON tc.lang = t.lang AND tc.token = dt.token
      GROUP BY dt.doc_id, dt.true_lang, t.lang
    ),
    scf AS (
      SELECT s.doc_id, s.true_lang, s.lang,
             round(s.loglik + p.logprior, 4) AS score_4
      FROM scored s JOIN prior p ON p.lang = s.lang
    )
    SELECT doc_id, true_lang, lang AS pred_lang
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_4 DESC, lang) AS rk
      FROM scf
    ) WHERE rk = 1
"""


@query(
    "q365_nb_macro_f1",
    oracle=f"""
    WITH preds AS ({_NB_PRED_SQL}),
    classes AS (SELECT DISTINCT true_lang AS cls FROM preds),
    per_class AS (
      SELECT c.cls,
             (SELECT count(*) FROM preds
              WHERE true_lang = c.cls AND pred_lang = c.cls) AS tp,
             (SELECT count(*) FROM preds
              WHERE pred_lang = c.cls AND true_lang <> c.cls) AS fp,
             (SELECT count(*) FROM preds
              WHERE true_lang = c.cls AND pred_lang <> c.cls) AS fn
      FROM classes c
    ),
    scored AS (
      SELECT cls, tp, fp, fn,
             CASE WHEN tp + fp > 0
                  THEN round(tp / CAST(tp + fp AS DOUBLE), 6)
                  ELSE 0.0 END AS p_6,
             CASE WHEN tp + fn > 0
                  THEN round(tp / CAST(tp + fn AS DOUBLE), 6)
                  ELSE 0.0 END AS r_6
      FROM per_class
    ),
    f1s AS (
      SELECT cls, tp, fp, fn, p_6, r_6,
             CASE WHEN p_6 + r_6 > 0
                  THEN round(2 * p_6 * r_6 / (p_6 + r_6), 6)
                  ELSE 0.0 END AS f1_6
      FROM scored
    )
    SELECT cls, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(p_6 AS DOUBLE) AS p_6, CAST(r_6 AS DOUBLE) AS r_6,
           CAST(f1_6 AS DOUBLE) AS f1_6
    FROM f1s
    UNION ALL
    SELECT '__macro__', CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
           CAST(sum(fn) AS BIGINT),
           CAST(round(avg(p_6), 6) AS DOUBLE),
           CAST(round(avg(r_6), 6) AS DOUBLE),
           CAST(round(avg(f1_6), 6) AS DOUBLE)
    FROM f1s
    ORDER BY cls
    """,
)
def q365_nb_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 and the macro average for q329's
    Naive Bayes predictions, under the driver hash gate — the
    evaluation half of the classifier tier (confusion-derived
    metrics), rounding precision/recall to 6 BEFORE F1 so both
    engines chain identical rationals.

    Scale: predictions reduce to a |classes|² confusion matrix in one
    hash agg; per-class metrics and the macro row operate on ≤6
    rows."""
    preds = q329_naive_bayes_classify(spark, sf_dir).select(
        "true_lang", "pred_lang"
    )
    conf = preds.groupBy("true_lang", "pred_lang").agg(
        F.count("*").alias("n")
    )
    classes = conf.select(F.col("true_lang").alias("cls")).distinct()
    tp = conf.filter(F.col("true_lang") == F.col("pred_lang")).select(
        F.col("true_lang").alias("cls"), F.col("n").alias("tp")
    )
    fp = (
        conf.filter(F.col("true_lang") != F.col("pred_lang"))
        .groupBy(F.col("pred_lang").alias("cls"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = (
        conf.filter(F.col("true_lang") != F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("cls"))
        .agg(F.sum("n").alias("fn"))
    )
    base = (
        classes.join(tp, "cls", "left")
        .join(fp, "cls", "left")
        .join(fn, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    p6 = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 6),
    ).otherwise(0.0)
    r6 = F.when(
        (F.col("tp") + F.col("fn")) > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"), 6),
    ).otherwise(0.0)
    scored = base.select(
        "cls",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        p6.alias("p_6"),
        r6.alias("r_6"),
    ).withColumn(
        "f1_6",
        F.when(
            (F.col("p_6") + F.col("r_6")) > 0,
            F.round(
                2 * F.col("p_6") * F.col("r_6")
                / (F.col("p_6") + F.col("r_6")),
                6,
            ),
        ).otherwise(0.0),
    )
    macro = scored.agg(
        F.lit("__macro__").alias("cls"),
        F.sum("tp").cast("bigint").alias("tp"),
        F.sum("fp").cast("bigint").alias("fp"),
        F.sum("fn").cast("bigint").alias("fn"),
        F.round(F.avg("p_6"), 6).alias("p_6"),
        F.round(F.avg("r_6"), 6).alias("r_6"),
        F.round(F.avg("f1_6"), 6).alias("f1_6"),
    ).select("cls", "tp", "fp", "fn", "p_6", "r_6", "f1_6")
    return scored.unionAll(macro).transform(small_sort, "cls")


@query(
    "q366_token_pmi",
    oracle=f"""
    WITH pres AS (
      SELECT DISTINCT doc_id, unnest({_NB_TOKS}) AS token
      FROM documents
    ),
    df AS (
      SELECT token, count(*) AS n FROM pres GROUP BY token
      HAVING count(*) >= 5
    ),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM pres),
    pairs AS (
      SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS n_ab
      FROM pres a
      JOIN pres b ON b.doc_id = a.doc_id AND a.token < b.token
      JOIN df da ON da.token = a.token
      JOIN df db ON db.token = b.token
      GROUP BY a.token, b.token
      HAVING count(*) >= 5
    )
    SELECT p.tok_a, p.tok_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(round(ln(p.n_ab * CAST(n.nd AS DOUBLE)
                         / (da.n * CAST(db.n AS DOUBLE))), 6) AS DOUBLE)
               AS pmi_6
    FROM pairs p
    JOIN df da ON da.token = p.tok_a
    JOIN df db ON db.token = p.tok_b
    CROSS JOIN n
    ORDER BY tok_a, tok_b
    """,
)
def q366_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token co-occurrence at the
    document level under the driver hash gate: PMI(a,b) =
    ln(P(a,b)/(P(a)P(b))) over document presence, frequency-floored
    at df≥5 and pair-count≥5 — the collocation/phrase-mining signal
    (beside q322's transaction association rules) a tokenizer-
    curriculum or phrase-vocab builder consumes.

    Scale: the pair generation is a SELF-JOIN ON doc_id of the
    presence frame — candidate pairs per doc are (distinct tokens
    choose 2), and the df≥5 pre-filter is the frequency cap that
    keeps a power-law vocab from exploding the join (the q302
    prefix-filter argument). One (pair) hash agg follows; marginals
    broadcast."""
    pres = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower("text"), " ", -1),
                        lambda t: t != "",
                    )
                )
            ).alias("token"),
        )
    )
    df_ = pres.groupBy("token").agg(F.count("*").alias("n")).filter(
        F.col("n") >= 5
    )
    nd = pres.select("doc_id").distinct().count()
    kept = pres.join(F.broadcast(df_.select("token")), "token", "left_semi")
    b = kept.select(
        F.col("doc_id").alias("bdoc"), F.col("token").alias("tok_b")
    )
    pairs = (
        kept.select(F.col("doc_id"), F.col("token").alias("tok_a"))
        .join(
            b,
            (F.col("bdoc") == F.col("doc_id"))
            & (F.col("tok_a") < F.col("tok_b")),
        )
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    da = df_.select(F.col("token").alias("tok_a"), F.col("n").alias("na"))
    db = df_.select(F.col("token").alias("tok_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.lit(float(nd))
                    / (F.col("na") * F.col("nb").cast("double"))
                ),
                6,
            ).alias("pmi_6"),
        )
        .orderBy("tok_a", "tok_b")
    )
