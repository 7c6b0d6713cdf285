"""Round-6 additions: inverted-index construction and int8 embedding
quantization — two more staples of a large-scale training-data /
retrieval pipeline, both expressed entirely in JVM-side built-ins
(higher-order array functions, hash aggregations; no Python in the
hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import query


@query(
    "q158_inverted_index",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             unnest(list_distinct(string_split(text, ' '))) AS term
      FROM documents WHERE doc_id < 200
    )
    SELECT term,
           count(*) AS df,
           list_sort(list(doc_id)) AS postings
    FROM t
    WHERE length(term) >= 4
    GROUP BY term
    HAVING count(*) >= 3
    ORDER BY term
    """,
)
def q158_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list construction (the core of distributed retrieval
    index builds): tokenize, dedupe terms within a document, group by
    term into sorted posting arrays with document frequencies.

    Scale shape: ONE shuffle keyed by term (the classic inverted-index
    MapReduce); per-term posting arrays are bounded here by the HAVING
    floor and at 100 TB would be emitted as delta-encoded blocks
    partitioned by term range rather than collect_set arrays — the
    term-keyed aggregation shape is identical."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    terms = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " ", -1))).alias("term"),
    ).filter(F.length("term") >= 4)
    return (
        terms.groupBy("term")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("postings"))
        .select(
            "term",
            F.size("postings").cast("bigint").alias("df"),
            "postings",
        )
        .filter(F.col("df") >= 3)
        .orderBy("term")
    )


@query(
    "q159_int8_embedding_quantization",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             greatest(
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))),
               1e-30) / 127.0 AS scale
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(v) AS INTEGER) AS n_dims,
           list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INTEGER))
               AS codes,
           CAST(floor(scale * 1000000000) AS BIGINT) AS scale_e9,
           list_max(list_transform(
             v, x -> abs(floor(x / scale + 0.5) * scale - x)))
             <= scale * 0.5 + 1e-12 AS recon_err_ok
    FROM s
    ORDER BY vec_id
    """,
)
def q159_int8_embedding_quantization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column
    — 4x memory cut for ANN scans (the scalar-quantization sibling of
    the PQ codes in operators/similarity.pq_build). Everything is
    higher-order array expressions inside codegen; the oracle
    reproduces the exact integer codes because both engines perform
    the identical double-precision ops (float→double widening is
    exact; floor(x/scale + 0.5) avoids round()'s half-even/half-away
    divergence), and the within-half-step reconstruction bound is
    checked as a column, not just asserted in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vc = F.col("_v")
    scale = (
        F.greatest(
            F.array_max(F.transform(vc, lambda x: F.abs(x))),
            F.lit(1e-30),
        )
        / 127.0
    )
    sc = F.col("_scale")
    codes = F.transform(vc, lambda x: F.floor(x / sc + 0.5).cast("int"))
    err_ok = (
        F.array_max(
            F.transform(vc, lambda x: F.abs(F.floor(x / sc + 0.5) * sc - x))
        )
        <= sc * 0.5 + 1e-12
    )
    return (
        emb.select("vec_id", v.alias("_v"))
        .withColumn("_scale", scale)
        .select(
            "vec_id",
            F.size("_v").alias("n_dims"),
            codes.alias("codes"),
            F.floor(sc * 1_000_000_000).cast("bigint").alias("scale_e9"),
            err_ok.alias("recon_err_ok"),
        )
        .orderBy("vec_id")
    )
