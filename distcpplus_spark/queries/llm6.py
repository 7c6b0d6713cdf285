"""Round-7 continuation (session 3): statistical language modeling,
spectral analytics, catalog statistics, and blocking strategies for
the training-data pipeline.

All follow the repo's determinism contract: integer-mixer uniforms
instead of RNG, explicit rounding, every computed column aliased
identically in Spark and oracle SQL. Reference parity note: the
reference engine (turn/DistCPPlus) has no statistical surface — these
extend the north-star LLM-pipeline tier the way SURVEY.md §2b
declares, not a reference operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import query, small_sort

# Shared tokenizer fragment: trim + whitespace split + drop empties, so
# Spark's split() and DuckDB's string_split_regex agree on every edge
# (leading/trailing/repeated whitespace).
_TOKS_SQL = (
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
)


# Reusable KN CTE block (everything up to the per-type probability),
# shared verbatim by q286 (top trigrams) and q287 (per-doc scoring).
_KN_CTES = f"""
    toks AS MATERIALIZED (
      SELECT doc_id, lang, {_TOKS_SQL} AS a FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT doc_id, lang, a[i] AS w1, a[i+1] AS w2, a[i+2] AS w3
      FROM toks, unnest(range(1, greatest(len(a) - 1, 1))) r(i)
    ),
    c3 AS (
      SELECT w1, w2, w3, count(*) AS cnt
      FROM tri GROUP BY w1, w2, w3
    ),
    ctx AS (
      SELECT w1, w2, sum(cnt) AS c2, count(*) AS n1p_fwd
      FROM c3 GROUP BY w1, w2
    ),
    mid AS (
      SELECT w2, count(*) AS n1p_dot_w2_dot,
             count(DISTINCT w3) AS n1p_w2_fwd
      FROM c3 GROUP BY w2
    ),
    bigr AS (
      SELECT DISTINCT w2, w3 FROM c3
    ),
    contw AS (
      SELECT w3, count(*) AS n1p_dot_w3 FROM bigr GROUP BY w3
    ),
    contden AS (
      SELECT count(*) AS n_bigram_types FROM bigr
    ),
    prevmid AS (
      SELECT w2, w3, count(DISTINCT w1) AS n1p_dot_w2w3
      FROM c3 GROUP BY w2, w3
    ),
    scored AS (
      SELECT c3.w1, c3.w2, c3.w3, c3.cnt,
             (greatest(CAST(c3.cnt AS DOUBLE) - 0.75, 0)
                / CAST(ctx.c2 AS DOUBLE))
             + (0.75 * CAST(ctx.n1p_fwd AS DOUBLE)
                  / CAST(ctx.c2 AS DOUBLE))
               * (
                 (greatest(CAST(pm.n1p_dot_w2w3 AS DOUBLE) - 0.75, 0)
                    / CAST(mid.n1p_dot_w2_dot AS DOUBLE))
                 + (0.75 * CAST(mid.n1p_w2_fwd AS DOUBLE)
                      / CAST(mid.n1p_dot_w2_dot AS DOUBLE))
                   * (CAST(cw.n1p_dot_w3 AS DOUBLE)
                        / CAST(cd.n_bigram_types AS DOUBLE))
               ) AS p_kn
      FROM c3
      JOIN ctx ON c3.w1 = ctx.w1 AND c3.w2 = ctx.w2
      JOIN mid ON c3.w2 = mid.w2
      JOIN prevmid pm ON c3.w2 = pm.w2 AND c3.w3 = pm.w3
      JOIN contw cw ON c3.w3 = cw.w3
      CROSS JOIN contden cd
    )
"""


def _kn_scored_types(spark: SparkSession, sf_dir: str):
    """Build the interpolated-KN trigram model over `documents` and
    return (trigram-instances DF with doc_id/lang, per-type DF with
    columns w1 w2 w3 cnt p_kn). Shared by q286/q287."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
        ).alias("a"),
    )
    tri = (
        toks.filter(F.size("a") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(a)-3), i -> "
                    "struct(a[i] AS w1, a[i+1] AS w2, a[i+2] AS w3))"
                )
            ).alias("t"),
        )
        .select("doc_id", "lang", "t.w1", "t.w2", "t.w3")
    )
    c3 = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("cnt"))
    ctx = c3.groupBy("w1", "w2").agg(
        F.sum("cnt").alias("c2"), F.count("*").alias("n1p_fwd")
    )
    mid = c3.groupBy("w2").agg(
        F.count("*").alias("n1p_dot_w2_dot"),
        F.countDistinct("w3").alias("n1p_w2_fwd"),
    )
    bigr = c3.select("w2", "w3").distinct()
    contw = bigr.groupBy("w3").agg(F.count("*").alias("n1p_dot_w3"))
    contden = bigr.agg(F.count("*").alias("n_bigram_types"))
    prevmid = c3.groupBy("w2", "w3").agg(
        F.countDistinct("w1").alias("n1p_dot_w2w3")
    )
    D = F.lit(0.75)
    scored = (
        c3.join(ctx, ["w1", "w2"])
        .join(mid, "w2")
        .join(prevmid, ["w2", "w3"])
        .join(contw, "w3")
        .crossJoin(F.broadcast(contden))
        .withColumn(
            "p_kn",
            (
                F.greatest(F.col("cnt").cast("double") - D, F.lit(0.0))
                / F.col("c2").cast("double")
            )
            + (D * F.col("n1p_fwd").cast("double") / F.col("c2").cast("double"))
            * (
                (
                    F.greatest(
                        F.col("n1p_dot_w2w3").cast("double") - D, F.lit(0.0)
                    )
                    / F.col("n1p_dot_w2_dot").cast("double")
                )
                + (
                    D
                    * F.col("n1p_w2_fwd").cast("double")
                    / F.col("n1p_dot_w2_dot").cast("double")
                )
                * (
                    F.col("n1p_dot_w3").cast("double")
                    / F.col("n_bigram_types").cast("double")
                )
            ),
        )
    )
    return tri, scored


@query(
    "q286_kneser_ney_trigram",
    oracle=f"""
    WITH {_KN_CTES}
    SELECT w1, w2, w3, CAST(cnt AS BIGINT) AS tri_count,
           round(p_kn, 6) AS p_kn6
    FROM scored
    ORDER BY tri_count DESC, w1, w2, w3
    LIMIT 30
    """,
)
def q286_kneser_ney_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram LM estimation (Chen & Goodman
    1998, fixed discount D=0.75) — the classic smoothing used by
    corpus-quality perplexity filters. Every KN quantity is a type or
    token count over the trigram table: c(w1w2w3), the context total
    c(w1w2), the fertility counts N1+(w1w2.), N1+(.w2w3), N1+(.w2.),
    N1+(w2.), and the continuation-unigram N1+(.w3)/N1+(..). Scale:
    tokenize + trigram assembly are per-row array ops (no shuffle);
    the only shuffles are keyed aggregations over the TYPE table
    (vocabulary-sized, not corpus-sized), and the final top-30 is
    orderBy().limit() = TakeOrderedAndProject — no global window, no
    driver loop. The probability expression is the same IEEE-double
    tree on both sides, rounded to 6."""
    _tri, scored = _kn_scored_types(spark, sf_dir)
    return (
        scored.select(
            "w1",
            "w2",
            "w3",
            F.col("cnt").cast("bigint").alias("tri_count"),
            F.round("p_kn", 6).alias("p_kn6"),
        )
        .orderBy(F.desc("tri_count"), "w1", "w2", "w3")
        .limit(30)
    )


@query(
    "q287_kn_perplexity_filter",
    oracle=f"""
    WITH {_KN_CTES},
    doc_nll AS (
      SELECT tri.doc_id, tri.lang,
             avg(-log2(s.p_kn)) AS avg_nll,
             count(*) AS n_tri
      FROM tri
      JOIN scored s
        ON tri.w1 = s.w1 AND tri.w2 = s.w2 AND tri.w3 = s.w3
      GROUP BY tri.doc_id, tri.lang
    ),
    thr AS (
      SELECT avg(avg_nll) + 0.25 AS cutoff FROM doc_nll
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(round(avg(avg_nll), 4) AS DOUBLE) AS mean_bits4,
           CAST(round(min(avg_nll), 4) AS DOUBLE) AS min_bits4,
           CAST(round(max(avg_nll), 4) AS DOUBLE) AS max_bits4,
           CAST(sum(CASE WHEN avg_nll > thr.cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged
    FROM doc_nll CROSS JOIN thr
    GROUP BY lang
    ORDER BY lang
    """,
)
def q287_kn_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based corpus quality filtering — the CCNet /
    Gopher-style gate: self-score every document under the corpus KN
    trigram model (q286's estimator), average its trigram negative
    log2-likelihood (= log2 perplexity), and flag docs above a bits
    threshold, reported per language. Scale: the per-type model is
    vocabulary-sized; scoring joins trigram INSTANCES to trigram
    TYPES on the 3-word key (one keyed shuffle of the instance
    stream — exactly the shape a 100 TB corpus scorer needs, no
    broadcast of a corpus-sized model, no driver state). Per-doc avg
    is a hash aggregate keyed by doc_id. The flag cutoff is
    corpus-relative (mean + 0.25 bits) so it bites at every data
    scale instead of going dead like a fixed-bits constant; the
    scalar mean is broadcast, never collected per-row."""
    tri, scored = _kn_scored_types(spark, sf_dir)
    doc_nll = (
        tri.join(scored.select("w1", "w2", "w3", "p_kn"), ["w1", "w2", "w3"])
        .groupBy("doc_id", "lang")
        .agg(F.avg(-F.log2(F.col("p_kn"))).alias("avg_nll"))
    )
    thr = doc_nll.agg((F.avg("avg_nll") + F.lit(0.25)).alias("cutoff"))
    out = (
        doc_nll.crossJoin(F.broadcast(thr))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("avg_nll"), 4).alias("mean_bits4"),
            F.round(F.min("avg_nll"), 4).alias("min_bits4"),
            F.round(F.max("avg_nll"), 4).alias("max_bits4"),
            F.sum((F.col("avg_nll") > F.col("cutoff")).cast("long")).alias(
                "n_flagged"
            ),
        )
    )
    return small_sort(out, "lang")


@query(
    "q288_pca_embeddings",
    oracle="""
    WITH dims AS (
      SELECT i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, unnest(range(1, len(embedding) + 1)) r(i)
    ),
    axis AS (
      SELECT i, var_pop(x) AS s2 FROM dims GROUP BY i
    )
    SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n,
           CAST(64 AS INTEGER) AS dim,
           CAST(round(sum(s2), 4) AS DOUBLE) AS total_var4,
           CAST(round(max(s2), 4) AS DOUBLE) AS axis_max_var4,
           TRUE AS pc1_ge_axis,
           TRUE AS eigsum_eq_trace,
           TRUE AS components_orthonormal,
           TRUE AS proj_var_eq_eig1
    FROM axis
    """,
)
def q288_pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embedding corpus (operators/pca.py)
    under a bound-style gate (the q123/q124 pattern): the eigensolve
    itself is not SQL-expressible, but its defining invariants are —
    the top eigenvalue must dominate every coordinate-axis variance
    (PC1 is the variance-maximizing direction), the eigenvalue sum
    must equal the covariance trace (= sum of axis variances, which
    DuckDB computes EXACTLY as var_pop per dimension), components
    must be orthonormal, and the variance of the distributed
    projection onto PC1 must reproduce eigenvalue 1. The trace and
    axis-max columns are value-gated at round-4; the invariants are
    gated as booleans. Scale: one pass of Arrow-batch partial moments
    (O(partitions) driver rows), driver-side 64x64 eigh, JVM-side
    projection."""
    import numpy as np

    from distcpplus_spark.operators.pca import fit_pca, project

    emb = load_table(spark, sf_dir, "embeddings")
    n, mean, comps, eigs, cov = fit_pca(emb, "embedding", 4)
    dim = cov.shape[0]
    trace = float(np.trace(cov))
    axis_max = float(np.max(np.diag(cov)))
    gram = comps @ comps.T
    ortho = bool(np.max(np.abs(gram - np.eye(comps.shape[0]))) < 1e-8)
    # Distributed projection onto PC1 (center via broadcast mean).
    centered = emb.withColumn(
        "c",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.array(*[F.lit(float(m)) for m in mean]),
            lambda a, b: a - b,
        ),
    )
    pvar = (
        project(centered, "c", comps[:1])
        .agg(F.var_pop("proj_0").alias("v"))
        .collect()[0]["v"]
    )
    row = (
        int(n),
        int(dim),
        round(trace, 4),
        round(axis_max, 4),
        bool(eigs[0] >= axis_max - 1e-9),
        bool(abs(float(np.sum(eigs)) - trace) < 1e-6),
        ortho,
        bool(abs(pvar - float(eigs[0])) < 1e-6),
    )
    return spark.createDataFrame(
        [row],
        "n BIGINT, dim INT, total_var4 DOUBLE, axis_max_var4 DOUBLE, "
        "pc1_ge_axis BOOLEAN, eigsum_eq_trace BOOLEAN, "
        "components_orthonormal BOOLEAN, proj_var_eq_eig1 BOOLEAN",
    )


# ANALYZE-style stats spec: (column, kind) per table; kind decides the
# estimated serialized width (i32=4, i64/f64/ts=8, str=avg(len)+4).
# ONE literal spec feeds BOTH the Spark plan and the oracle SQL so the
# two sides can never drift.
_STATS_SPEC = {
    "region": [("r_regionkey", "i32"), ("r_name", "str")],
    "nation": [
        ("n_nationkey", "i32"),
        ("n_name", "str"),
        ("n_regionkey", "i32"),
    ],
    "supplier": [
        ("s_suppkey", "i64"),
        ("s_name", "str"),
        ("s_nationkey", "i32"),
        ("s_acctbal", "f64"),
    ],
    "customer": [
        ("c_custkey", "i64"),
        ("c_name", "str"),
        ("c_nationkey", "i32"),
        ("c_acctbal", "f64"),
        ("c_mktsegment", "str"),
    ],
    "part": [
        ("p_partkey", "i64"),
        ("p_name", "str"),
        ("p_brand", "str"),
        ("p_type", "str"),
        ("p_size", "i32"),
        ("p_retailprice", "f64"),
    ],
    "orders": [
        ("o_orderkey", "i64"),
        ("o_custkey", "i64"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "f64"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ],
    "lineitem": [
        ("l_orderkey", "i64"),
        ("l_partkey", "i64"),
        ("l_suppkey", "i64"),
        ("l_linenumber", "i32"),
        ("l_quantity", "f64"),
        ("l_extendedprice", "f64"),
        ("l_discount", "f64"),
        ("l_tax", "f64"),
        ("l_returnflag", "str"),
        ("l_linestatus", "str"),
        ("l_shipdate", "ts"),
    ],
}

_KIND_BYTES = {"i32": 4, "i64": 8, "f64": 8, "ts": 8}


def _stats_oracle_sql() -> str:
    parts = []
    for tbl, cols in _STATS_SPEC.items():
        fixed = sum(_KIND_BYTES[k] for _c, k in cols if k != "str")
        strcols = [c for c, k in cols if k == "str"]
        strexpr = " + ".join(
            [f"(avg(length({c})) + 4)" for c in strcols] or ["0"]
        )
        key = cols[0][0]
        parts.append(
            f"""SELECT '{tbl}' AS table_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT {key}) AS BIGINT) AS key_ndv,
               round({fixed} + {strexpr}, 4) AS est_row_bytes4,
               count(*) * ({fixed} + {strexpr}) AS _est_total
        FROM {tbl}"""
        )
    union = "\nUNION ALL\n".join(parts)
    return f"""
    WITH t AS ({union}),
    m AS (SELECT max(_est_total) AS biggest FROM t)
    SELECT table_name, n_rows, key_ndv, est_row_bytes4,
           CAST(round(_est_total / 1048576.0, 6) AS DOUBLE)
             AS est_total_mb6,
           CASE WHEN _est_total * 10 < m.biggest
                THEN 'broadcast' ELSE 'shuffle' END AS join_plan
    FROM t CROSS JOIN m
    ORDER BY table_name
    """


@query("q289_catalog_stats_advisor", oracle=_stats_oracle_sql())
def q289_catalog_stats_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style catalog statistics + join-strategy advisor — the
    CBO input surface (Spark's `ANALYZE TABLE ... COMPUTE STATISTICS
    FOR COLUMNS` shape): per table, row count, exact key NDV,
    estimated serialized row width (fixed-width kinds + avg string
    length + 4-byte length prefix) and total size, then the
    broadcast-vs-shuffle verdict. The broadcast cutoff is RELATIVE
    (10x smaller than the biggest table) so both branches fire at
    every scale factor — a fixed 10 MB constant is sf-dependent and
    goes dead at test scale (the scale-free-threshold lesson). Scale:
    each table contributes one scan + scalar aggregate; NDV is exact
    here (the sketch tier q123/q148 covers approximate NDV at the
    100 TB end). One spec literal generates Spark AND oracle."""
    frames = []
    for tbl, cols in _STATS_SPEC.items():
        fixed = sum(_KIND_BYTES[k] for _c, k in cols if k != "str")
        strcols = [c for c, k in cols if k == "str"]
        key = cols[0][0]
        width = F.lit(float(fixed))
        for c in strcols:
            width = width + (F.avg(F.length(c)) + F.lit(4.0))
        df = load_table(spark, sf_dir, tbl).agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(key).alias("key_ndv"),
            width.alias("_w"),
        )
        frames.append(
            df.select(
                F.lit(tbl).alias("table_name"),
                "n_rows",
                "key_ndv",
                F.round("_w", 4).alias("est_row_bytes4"),
                (F.col("n_rows") * F.col("_w")).alias("_est_total"),
            )
        )
    allt = frames[0]
    for f in frames[1:]:
        allt = allt.unionByName(f)
    m = allt.agg(F.max("_est_total").alias("biggest"))
    out = allt.crossJoin(F.broadcast(m)).select(
        "table_name",
        "n_rows",
        "key_ndv",
        "est_row_bytes4",
        F.round(F.col("_est_total") / F.lit(1048576.0), 6).alias(
            "est_total_mb6"
        ),
        F.when(F.col("_est_total") * 10 < F.col("biggest"), "broadcast")
        .otherwise("shuffle")
        .alias("join_plan"),
    )
    return small_sort(out, "table_name")


@query(
    "q290_sorted_neighborhood_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct({_TOKS_SQL}) AS s,
             substr(trim(text), 1, 16) AS k
      FROM documents
    ),
    ord AS (
      SELECT doc_id, s,
             row_number() OVER (ORDER BY k, doc_id) AS r
      FROM toks
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) AS jac
      FROM ord a JOIN ord b ON b.r BETWEEN a.r + 1 AND a.r + 3
    )
    SELECT doc_a, doc_b, CAST(round(jac, 6) AS DOUBLE) AS jac6
    FROM pairs
    WHERE jac >= 0.85
    ORDER BY doc_a, doc_b
    """,
)
def q290_sorted_neighborhood_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo's merge/purge
    strategy) — the third blocking family next to MinHash-LSH (q59)
    and attribute blocking (q249): sort the corpus by a cheap
    blocking key (16-char text prefix), then only records within a
    sliding window of w=4 positions become candidate pairs, verified
    by exact token-set Jaccard >= 0.85. Scale: the global sort rank
    runs as the repo's two-phase distributed prefix sum over a range
    repartition (q161/q285 discipline — NO partition-less window);
    the window-of-w candidate step is an EQUI-join on rank+d
    (d=1..3, exploded), so candidates are O(w n), never all-pairs,
    and the verify join carries the token sets with it — one shuffle
    keyed on rank."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("s"),
        F.substring(F.trim(F.col("text")), 1, 16).alias("k"),
    )
    ranked = (
        partitioned_running_agg(
            docs.repartitionByRange("k", "doc_id").withColumn(
                "_one", F.lit(1)
            ),
            ["k", "doc_id"],
            "_one",
            "r",
            F.spark_partition_id(),
            deterministic_bucket=False,
        )
        .select("doc_id", "s", "r")
    )
    left = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s").alias("sa"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("d"),
        F.col("r").alias("ra"),
    ).withColumn("rb", F.col("ra") + F.col("d"))
    right = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("sb"),
        F.col("r").alias("rb"),
    )
    pairs = left.join(right, "rb").withColumn(
        "jac",
        F.size(F.array_intersect("sa", "sb")).cast("double")
        / F.size(F.array_union("sa", "sb")),
    )
    out = pairs.filter(F.col("jac") >= 0.85).select(
        "doc_a", "doc_b", F.round("jac", 6).alias("jac6")
    )
    return out.orderBy("doc_a", "doc_b")


@query(
    "q291_zipf_slope_fit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_TOKS_SQL}) AS w FROM documents
    ),
    freq AS (
      SELECT w, count(*) AS n FROM toks GROUP BY w
    ),
    ranked AS (
      SELECT w, n,
             row_number() OVER (ORDER BY n DESC, w) AS rk
      FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(round(regr_slope(ln(CAST(n AS DOUBLE)),
                                 ln(CAST(rk AS DOUBLE))), 4)
                AS DOUBLE) AS zipf_slope4,
           CAST(round(regr_r2(ln(CAST(n AS DOUBLE)),
                              ln(CAST(rk AS DOUBLE))), 4)
                AS DOUBLE) AS fit_r2_4,
           CAST(round(max(n) * 1.0 / sum(n), 6) AS DOUBLE)
             AS top_word_share6
    FROM ranked
    """,
)
def q291_zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostics for the corpus — the slope of
    log-frequency vs log-rank (natural text sits near -1; synthetic
    or deduplicated corpora drift, making this a standard
    corpus-health gauge next to the Heaps-law vocab curve q112).
    Fit is least squares via the built-in regr_slope/regr_r2
    (JVM-side, single aggregate — identical estimator in DuckDB).
    Scale: word frequency is one hash aggregate over tokens; the
    rank over the vocabulary runs as the two-phase distributed
    prefix sum over a range repartition (the q161/q285/q293
    discipline) — web-corpus whitespace vocabularies reach 10^8-10^9
    distinct tokens (URLs, typos, code), far too large for a
    partition-less rank window. row_number() == prefix sum of 1s
    because the (-n, w) order key is unique (w is the group-by key),
    so no tie straddles a range boundary; the regression then
    consumes (n, rk) as one more scalar aggregate and the whole
    query emits one row."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("w")
    )
    freq = toks.groupBy("w").agg(F.count("*").alias("n"))
    ranked = partitioned_running_agg(
        freq.withColumn("neg_n", -F.col("n"))
        .repartitionByRange("neg_n", "w")
        .withColumn("_one", F.lit(1)),
        ["neg_n", "w"],
        "_one",
        "rk",
        F.spark_partition_id(),
        deterministic_bucket=False,
    )
    out = ranked.agg(
        F.count("*").alias("vocab_size"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.round(
            F.regr_slope(
                F.log(F.col("n").cast("double")),
                F.log(F.col("rk").cast("double")),
            ),
            4,
        ).alias("zipf_slope4"),
        F.round(
            F.regr_r2(
                F.log(F.col("n").cast("double")),
                F.log(F.col("rk").cast("double")),
            ),
            4,
        ).alias("fit_r2_4"),
        F.round(F.max("n") * F.lit(1.0) / F.sum("n"), 6).alias(
            "top_word_share6"
        ),
    )
    return out


@query(
    "q292_join_cardinality_estimator",
    oracle="""
    WITH lp AS (
      SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY k
    ),
    lo AS (
      SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY k
    ),
    oo AS (
      SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY k
    ),
    pp AS (
      SELECT p_partkey AS k, count(*) AS c FROM part GROUP BY k
    )
    SELECT 'lineitem_x_lineitem_partkey' AS join_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c * c) AS BIGINT) AS predicted_pairs,
           CAST((SELECT count(*) FROM lineitem a
                 JOIN lineitem b ON a.l_partkey = b.l_partkey)
                AS BIGINT) AS actual_pairs,
           sum(c * c) = (SELECT count(*) FROM lineitem a
                         JOIN lineitem b ON a.l_partkey = b.l_partkey)
             AS estimate_exact
    FROM lp
    UNION ALL
    SELECT 'orders_x_lineitem_orderkey',
           CAST((SELECT count(*) FROM oo) AS BIGINT),
           CAST(sum(lo.c * oo.c) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
                AS BIGINT),
           sum(lo.c * oo.c) = (SELECT count(*) FROM orders o
                               JOIN lineitem l
                               ON o.o_orderkey = l.l_orderkey)
    FROM lo JOIN oo ON lo.k = oo.k
    UNION ALL
    SELECT 'lineitem_x_part_partkey',
           CAST((SELECT count(*) FROM pp) AS BIGINT),
           CAST(sum(lp.c * pp.c) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 JOIN part p ON l.l_partkey = p.p_partkey)
                AS BIGINT),
           sum(lp.c * pp.c) = (SELECT count(*) FROM lineitem l
                               JOIN part p ON l.l_partkey = p.p_partkey)
    FROM lp JOIN pp ON lp.k = pp.k
    ORDER BY join_name
    """,
)
def q292_join_cardinality_estimator(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-size estimation by key-histogram inner product — the CBO
    identity |A JOIN B on k| = sum_k cA(k)*cB(k) (what a Count-Min
    inner product approximates; here the histograms are exact, so
    prediction == actual is a checkable invariant, and the same
    per-key histograms are what AQE's skew detection consumes).
    Each estimate is two hash aggregates + a key-joined product —
    the full join is EXECUTED only to verify the prediction. Scale:
    the histogram tables are keyed aggregates (vocabulary of join
    keys), radically smaller than the join result itself — the whole
    point of estimating before executing."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")

    def hist(df, col):
        return df.groupBy(F.col(col).alias("k")).agg(
            F.count("*").alias("c")
        )

    lp, lo = hist(li, "l_partkey"), hist(li, "l_orderkey")
    oo, pp = hist(orders, "o_orderkey"), hist(part, "p_partkey")

    def one(name, ha, hb, actual_df):
        pred = (
            ha.join(hb.withColumnRenamed("c", "cb"), "k")
            .agg(
                F.sum(F.col("c") * F.col("cb")).alias("predicted_pairs"),
            )
        )
        nk = hb.agg(F.count("*").alias("n_keys"))
        act = actual_df.agg(F.count("*").alias("actual_pairs"))
        return (
            nk.crossJoin(F.broadcast(pred))
            .crossJoin(F.broadcast(act))
            .select(
                F.lit(name).alias("join_name"),
                F.col("n_keys").cast("bigint").alias("n_keys"),
                F.col("predicted_pairs").cast("bigint").alias(
                    "predicted_pairs"
                ),
                F.col("actual_pairs").cast("bigint").alias("actual_pairs"),
                (F.col("predicted_pairs") == F.col("actual_pairs")).alias(
                    "estimate_exact"
                ),
            )
        )

    li_b = li.select(F.col("l_partkey").alias("pk"))
    self_join = li.select("l_partkey").join(
        li_b, F.col("l_partkey") == F.col("pk")
    )
    rows = [
        one("lineitem_x_lineitem_partkey", lp, lp, self_join),
        one(
            "orders_x_lineitem_orderkey",
            lo,
            oo,
            orders.join(li, orders.o_orderkey == li.l_orderkey),
        ),
        one(
            "lineitem_x_part_partkey",
            lp,
            pp,
            li.join(part, li.l_partkey == part.p_partkey),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return small_sort(out, "join_name")


@query(
    "q293_bitmap_index_intersection",
    oracle="""
    WITH pos AS (
      SELECT o_orderstatus AS st, o_orderpriority AS pri,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS p
      FROM orders
    ),
    words AS (
      SELECT p // 32 AS w,
             bit_or(CASE WHEN st = 'F'
                    THEN (1::BIGINT << CAST(p % 32 AS INTEGER))
                    ELSE 0 END) AS bm_st,
             bit_or(CASE WHEN pri = '1-URGENT'
                    THEN (1::BIGINT << CAST(p % 32 AS INTEGER))
                    ELSE 0 END) AS bm_pri
      FROM pos GROUP BY w
    ),
    via_bitmap AS (
      SELECT CAST(sum(bit_count(bm_st & bm_pri)) AS BIGINT) AS n_and,
             CAST(sum(bit_count(bm_st | bm_pri)) AS BIGINT) AS n_or,
             CAST(count(*) AS BIGINT) AS n_words
      FROM words
    ),
    direct AS (
      SELECT CAST(sum(CASE WHEN o_orderstatus = 'F'
                      AND o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS BIGINT) AS d_and,
             CAST(sum(CASE WHEN o_orderstatus = 'F'
                      OR o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS BIGINT) AS d_or
      FROM orders
    )
    SELECT n_words, n_and, n_or, d_and, d_or,
           n_and = d_and AND n_or = d_or AS bitmap_agrees
    FROM via_bitmap CROSS JOIN direct
    """,
)
def q293_bitmap_index_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Positional bitmap index build + multi-predicate evaluation —
    the columnar-engine fast path for low-cardinality predicates:
    assign every row a stable global position, pack predicate
    membership into 32-bit words (bit_or of shifted bits), and
    answer AND/OR predicate counts as word-wise bitwise ops +
    popcount, checked against direct predicate evaluation. BOTH
    engines build the actual bitmap (the oracle is not a
    restatement). Scale: position is the two-phase distributed
    prefix sum over a range repartition (q161/q285 discipline); the
    bitmap is corpus_size/32 words, grouped by word index — one
    keyed shuffle; 32-bit words keep the shifted value positive in
    engines that refuse 1<<63."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    ranked = partitioned_running_agg(
        orders.repartitionByRange("o_orderkey").withColumn(
            "_one", F.lit(1)
        ),
        ["o_orderkey"],
        "_one",
        "_rk",
        F.spark_partition_id(),
        deterministic_bucket=False,
    ).withColumn("p", F.col("_rk") - 1)
    onebit = F.expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))"
    )
    bits = ranked.select(
        (F.col("p") / 32).cast("bigint").alias("w"),
        F.when(F.col("o_orderstatus") == "F", onebit)
        .otherwise(F.lit(0).cast("bigint"))
        .alias("b_st"),
        F.when(F.col("o_orderpriority") == "1-URGENT", onebit)
        .otherwise(F.lit(0).cast("bigint"))
        .alias("b_pri"),
    )
    words = bits.groupBy("w").agg(
        F.bit_or("b_st").alias("bm_st"),
        F.bit_or("b_pri").alias("bm_pri"),
    )
    via = words.agg(
        F.sum(F.bit_count(F.col("bm_st").bitwiseAND(F.col("bm_pri"))))
        .cast("bigint")
        .alias("n_and"),
        F.sum(F.bit_count(F.col("bm_st").bitwiseOR(F.col("bm_pri"))))
        .cast("bigint")
        .alias("n_or"),
        F.count("*").cast("bigint").alias("n_words"),
    )
    direct = orders.agg(
        F.sum(
            (
                (F.col("o_orderstatus") == "F")
                & (F.col("o_orderpriority") == "1-URGENT")
            ).cast("long")
        )
        .cast("bigint")
        .alias("d_and"),
        F.sum(
            (
                (F.col("o_orderstatus") == "F")
                | (F.col("o_orderpriority") == "1-URGENT")
            ).cast("long")
        )
        .cast("bigint")
        .alias("d_or"),
    )
    return via.crossJoin(F.broadcast(direct)).select(
        "n_words",
        "n_and",
        "n_or",
        "d_and",
        "d_or",
        (
            (F.col("n_and") == F.col("d_and"))
            & (F.col("n_or") == F.col("d_or"))
        ).alias("bitmap_agrees"),
    )


@query(
    "q294_maxsim_late_interaction",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id < 8
    ),
    d AS (
      SELECT vec_id % 97 AS doc, vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE vec_id >= 8
    ),
    sims AS (
      SELECT d.doc, q.qid,
             max(list_inner_product(q.v, d.v)
                 / (sqrt(list_inner_product(q.v, q.v))
                    * sqrt(list_inner_product(d.v, d.v)))) AS best
      FROM q CROSS JOIN d
      GROUP BY d.doc, q.qid
    ),
    scores AS (
      SELECT doc, round(sum(best), 6) AS maxsim6,
             count(*) AS n_query_tokens
      FROM sims GROUP BY doc
    )
    SELECT CAST(doc AS BIGINT) AS doc,
           CAST(maxsim6 AS DOUBLE) AS maxsim6,
           CAST(n_query_tokens AS BIGINT) AS n_query_tokens
    FROM scores
    ORDER BY maxsim6 DESC, doc
    LIMIT 15
    """,
)
def q294_maxsim_late_interaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Late-interaction retrieval (ColBERT's MaxSim): a multi-vector
    query (8 token embeddings) scores each multi-vector document as
    sum over query tokens of the MAX cosine against any document
    token — the fourth retrieval family next to BM25 (q220), dense
    top-k (q61), and ANN (q75/q103). Docs are formed by bucketing
    the embedding corpus (vec_id % 97). Scale: the query side is 8
    vectors — broadcast; per (doc-token, query-token) similarity is
    JVM-side zip_with/aggregate arithmetic; MaxSim reduces via two
    keyed hash aggregates (max per (doc,qid), then sum per doc);
    top-15 is TakeOrderedAndProject. The ORDER BY ranks the ROUNDED
    score so last-bit float noise cannot reorder near-ties between
    engines."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d = emb.filter(F.col("vec_id") >= 8).select(
        (F.col("vec_id") % 97).alias("doc"), F.col("v").alias("dv")
    )
    sims = (
        d.crossJoin(F.broadcast(q))
        .withColumn(
            "cos",
            dot(F.col("qv"), F.col("dv"))
            / (
                F.sqrt(dot(F.col("qv"), F.col("qv")))
                * F.sqrt(dot(F.col("dv"), F.col("dv")))
            ),
        )
        .groupBy("doc", "qid")
        .agg(F.max("cos").alias("best"))
    )
    scores = sims.groupBy("doc").agg(
        F.round(F.sum("best"), 6).alias("maxsim6"),
        F.count("*").cast("bigint").alias("n_query_tokens"),
    )
    return (
        scores.select(
            F.col("doc").cast("bigint").alias("doc"),
            "maxsim6",
            "n_query_tokens",
        )
        .orderBy(F.desc("maxsim6"), "doc")
        .limit(15)
    )
