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

from pyspark.sql import DataFrame, SparkSession, Window
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
    toks AS (
      SELECT doc_id, lang, {_TOKS_SQL} AS a FROM documents
    ),
    tri AS (
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
