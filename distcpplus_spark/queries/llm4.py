"""Round-6 additions: inverted-index construction and int8 embedding
quantization — two more staples of a large-scale training-data /
retrieval pipeline, both expressed entirely in JVM-side built-ins
(higher-order array functions, hash aggregations; no Python in the
hot path).
"""

from __future__ import annotations

import pandas as pd  # module-top: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import local_rows, query


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


@query("x21_bpe_merge_training")
def x21_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge LOOP (operators/bpe.py), not just pair counts
    (q132): 8 iterations of count-pick-rewrite over the vocabulary
    frame learn the merge table, then the table is replayed over a
    sample of words. Deterministic (tie-break count DESC, pair ASC)
    so the driver's stability re-run hashes agree; rows-only because
    the iterative loop isn't single-statement SQL —
    tests/test_bpe.py pins equality with an independent reference
    implementation."""
    from distcpplus_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    merges = bpe_train(docs, "text", n_merges=8)
    return local_rows(spark,
        merges, "rank INT, left STRING, right STRING, pair_count BIGINT"
    ).orderBy("rank")


@query(
    "q160_triangle_count",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
        AND a.l_partkey < 120 AND b.l_partkey < 120
    )
    SELECT
      (SELECT count(*) FROM edges) AS n_edges,
      (SELECT count(*)
       FROM edges e1
       JOIN edges e2 ON e2.u = e1.v
       JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def q160_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the part co-purchase graph (parts
    sharing an order). The standard distributed formulation: orient
    every edge low-id → high-id so each triangle is enumerated
    exactly once as u<v<w, then two hash joins (wedge build + closing
    -edge probe). Scale: the orientation bounds the wedge explosion
    by out-degree; at 100 TB you'd additionally orient by degree
    (lowest-degree vertex first), which caps wedges at O(m^1.5) —
    the join shape is unchanged."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u"))
    tris = wedges.join(
        e3,
        (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
    )
    return edges.agg(F.count("*").alias("n_edges")).crossJoin(
        tris.agg(F.count("*").alias("n_triangles"))
    )


@query(
    "q161_equidepth_histogram",
    oracle="""
    WITH ranked AS (
      SELECT l_extendedprice AS price,
             ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey,
                            l_linenumber) AS bucket
      FROM lineitem
    )
    SELECT bucket,
           count(*) AS n,
           CAST(round(min(price), 2) AS DOUBLE) AS lo,
           CAST(round(max(price), 2) AS DOUBLE) AS hi
    FROM ranked GROUP BY bucket ORDER BY bucket
    """,
)
def q161_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile buckets, each with ~n/8 rows) —
    the optimizer-statistics / drift-monitoring primitive. A naive
    global ntile window funnels every row through one task; instead
    the global rank comes from a range repartition on the (price,
    orderkey, linenumber) total order plus the repo's two-phase
    distributed prefix sum (operators/scale), and the SQL-standard
    ntile bucket is then closed-form from (rank, n): the first
    n mod 8 buckets take ceil(n/8) rows, the rest floor(n/8) —
    identical to DuckDB's ntile over the same deterministic order.
    For continuous monitoring swap in approx_percentile (q17/x06) —
    this query IS the exact baseline those sketches are judged
    against."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    k = 8
    q, r = divmod(n, k)
    base = (
        li.select(
            F.col("l_extendedprice").alias("price"),
            "l_orderkey",
            "l_linenumber",
        )
        .repartitionByRange("price", "l_orderkey", "l_linenumber")
        .withColumn("_one", F.lit(1))
    )
    ranked = partitioned_running_agg(
        base,
        ["price", "l_orderkey", "l_linenumber"],
        "_one",
        "_rk1",
        F.spark_partition_id(),
        deterministic_bucket=False,
    ).withColumn("_rk", F.col("_rk1") - 1)
    big = q + 1  # first r buckets hold one extra row
    bucket = (
        F.when(F.col("_rk") < r * big, (F.col("_rk") / big).cast("int") + 1)
        .otherwise(((F.col("_rk") - r * big) / q).cast("int") + r + 1)
        if q > 0
        else (F.col("_rk") + 1).cast("int")
    )
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("price"), 2).alias("lo"),
            F.round(F.max("price"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q168_html_text_extract",
    oracle="""
    WITH html AS (
      SELECT doc_id,
             '<html><head><title>' || source || '</title></head><body>'
             || '<h1>Doc ' || doc_id || '</h1><p class="x">'
             || substr(text, 1, 120)
             || '</p><script>var x=1;</script>'
             || '<!-- c --><p>tail</p></body></html>' AS page
      FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(regexp_replace(
               page,
               '<script[^>]*>[^<]*</script>', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '[ \\t\\r\\n]+', ' ', 'g')) AS extracted,
           length(trim(regexp_replace(regexp_replace(regexp_replace(
               page,
               '<script[^>]*>[^<]*</script>', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '[ \\t\\r\\n]+', ' ', 'g'))) AS n_chars
    FROM html
    ORDER BY doc_id
    """,
)
def q168_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text extraction, the first stage of every web-scrape
    pipeline: drop script blocks, strip tags, collapse whitespace —
    all JVM-side regexp_replace (patterns chosen to mean the same in
    Java regex and RE2 so the oracle reproduces the bytes exactly).
    The page is synthesized deterministically from fixture columns on
    BOTH engines, so the hash checks the extraction logic itself."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    page = F.concat(
        F.lit("<html><head><title>"), F.col("source"),
        F.lit("</title></head><body>"),
        F.lit("<h1>Doc "), F.col("doc_id").cast("string"),
        F.lit('</h1><p class="x">'),
        F.substring("text", 1, 120),
        F.lit("</p><script>var x=1;</script>"),
        F.lit("<!-- c --><p>tail</p></body></html>"),
    )
    extracted = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    page, "<script[^>]*>[^<]*</script>", " "
                ),
                "<[^>]+>", " ",
            ),
            "[ \\t\\r\\n]+", " ",
        )
    )
    return (
        docs.select(
            "doc_id",
            extracted.alias("extracted"),
            F.length(extracted).cast("bigint").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "q169_url_normalize",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || lang || '.' || source
             || '.example.com/a/' || doc_id
             || '?utm_source=feed&id=' || doc_id
             || '&utm_campaign=x&q=spark#frag-' || doc_id AS url
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           regexp_extract(url, '^https?://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
           regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(url, '#[^#]*$', ''),
               'utm_[a-z]+=[^&]*&', '', 'g'),
               '[?&]utm_[a-z]+=[^&]*$', ''),
               '[?]&', '?', 'g') AS canonical
    FROM urls
    ORDER BY doc_id
    """,
)
def q169_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for crawl dedup: host/path extraction,
    fragment removal, tracking-parameter (utm_*) stripping — pure
    regexp column expressions with Java/RE2-compatible patterns, so
    DuckDB derives byte-identical canonical URLs from the same
    synthesized inputs. At 100 TB this runs inside the scan ahead of
    the URL-keyed dedup shuffle; no UDF, no extra pass."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), F.col("lang"), F.lit("."), F.col("source"),
        F.lit(".example.com/a/"), F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&id="), F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=x&q=spark#frag-"), F.col("doc_id").cast("string"),
    )
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(url, "#[^#]*$", ""),
                "utm_[a-z]+=[^&]*&", "",
            ),
            "[?&]utm_[a-z]+=[^&]*$", "",
        ),
        "[?]&", "?",
    )
    return (
        docs.select(
            "doc_id",
            F.regexp_extract(url, "^https?://([^/]+)/", 1).alias("host"),
            F.regexp_extract(url, "^https?://[^/]+(/[^?#]*)", 1).alias("path"),
            canonical.alias("canonical"),
        )
        .orderBy("doc_id")
    )


@query("x22_quality_classifier")
def x22_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable quality filter (operators/classifier.py): a logistic
    regression is fit DISTRIBUTED (one gradient aggregation per
    iteration, model as driver-held literals — the fasttext-style
    filter stage of public LLM data recipes) on the engine's own
    quality signals (stopword ratio, punctuation ratio, length) with
    a weak is-English label, then scored back over the corpus as
    pure column arithmetic. Rows-only: iterative float training is
    not single-statement SQL; tests/test_classifier.py pins exact
    (1e-8) agreement with an independent numpy reference. Outputs
    are rounded to 6 so machine-epsilon aggregation noise cannot
    flip the driver's stability hash."""
    from distcpplus_spark.functions.text import quality_score_cols
    from distcpplus_spark.operators.classifier import (
        logreg_score,
        logreg_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    ls, sr, pr = quality_score_cols(F.col("text"), F.col("n_chars"))
    feats = docs.select(
        "doc_id",
        ls.alias("len_score"),
        sr.alias("stopword_ratio"),
        pr.alias("punct_ratio"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    cols = ["len_score", "stopword_ratio", "punct_ratio"]
    model = logreg_train(feats, cols, "label", iters=20, lr=0.5)
    scored = logreg_score(feats, model, cols)
    agg = scored.agg(
        F.round(
            F.avg(
                ((F.col("quality_prob") > 0.5).cast("int") == F.col("label"))
                .cast("double")
            ),
            6,
        ).alias("train_accuracy"),
        F.round(F.avg("quality_prob"), 6).alias("mean_prob"),
    )
    weights = local_rows(
        spark,
        [
            (i, c, round(model["weights"][i], 6))
            for i, c in enumerate(cols)
        ]
        + [(len(cols), "_bias", round(model["bias"], 6))],
        "feature_idx INT, feature STRING, weight DOUBLE",
    )
    return (
        weights.crossJoin(F.broadcast(agg))
        .select(
            "feature_idx", "feature", "weight",
            "train_accuracy", "mean_prob",
        )
        .orderBy("feature_idx")
    )


@query(
    "q170_rag_retrieval",
    oracle="""
    WITH chunks AS (
      SELECT doc_id * 100 + w AS chunk_id,
             substr(text, CAST(w * 60 + 1 AS BIGINT), 80) AS chunk
      FROM documents,
           LATERAL unnest(range(0,
             CAST(floor((length(text) - 1) / 60) + 1 AS BIGINT))) t(w)
      WHERE doc_id < 120
    ),
    toks AS (
      SELECT chunk_id, tok FROM (
        SELECT chunk_id, unnest(string_split(chunk, ' ')) AS tok
        FROM chunks WHERE length(chunk) >= 20
      ) WHERE length(tok) > 0
    ),
    tokh AS (
      SELECT chunk_id,
             CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(tok) + 1),
                   i -> CAST(ord(substr(tok, CAST(i AS INTEGER), 1))
                             AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT) AS h
      FROM toks
    ),
    cemb AS (
      SELECT chunk_id, h % 8 AS j,
             sum(1 - 2 * ((h >> 3) & 1)) AS cv
      FROM tokh GROUP BY chunk_id, h % 8
    ),
    cnorm AS (
      SELECT chunk_id, sum(cv * cv) AS cn2 FROM cemb
      GROUP BY chunk_id HAVING sum(cv * cv) > 0
    ),
    qdef AS (
      SELECT * FROM (VALUES
        (1, 'spark table scan fast'),
        (2, 'hash join merge batch'),
        (3, 'stream window agg order')) q(query_id, qtext)
    ),
    qtoks AS (
      SELECT query_id, tok FROM (
        SELECT query_id, unnest(string_split(qtext, ' ')) AS tok FROM qdef
      ) WHERE length(tok) > 0
    ),
    qtokh AS (
      SELECT query_id,
             CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(tok) + 1),
                   i -> CAST(ord(substr(tok, CAST(i AS INTEGER), 1))
                             AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS BIGINT) AS h
      FROM qtoks
    ),
    qemb AS (
      SELECT query_id, h % 8 AS j,
             sum(1 - 2 * ((h >> 3) & 1)) AS qv
      FROM qtokh GROUP BY query_id, h % 8
    ),
    qnorm AS (
      SELECT query_id, sum(qv * qv) AS qn2 FROM qemb GROUP BY query_id
    ),
    dots AS (
      SELECT q.query_id, c.chunk_id, sum(q.qv * c.cv) AS dp
      FROM qemb q JOIN cemb c ON c.j = q.j
      GROUP BY q.query_id, c.chunk_id
    ),
    scored AS (
      SELECT d.query_id, d.chunk_id,
             CAST(round(d.dp / sqrt(qn.qn2 * cn.cn2), 6) AS DOUBLE)
                 AS cos_sim
      FROM dots d
      JOIN qnorm qn ON qn.query_id = d.query_id
      JOIN cnorm cn ON cn.chunk_id = d.chunk_id
    ),
    ranked AS (
      SELECT query_id, chunk_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, chunk_id) AS rank
      FROM scored
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, chunk_id, cos_sim
    FROM ranked WHERE rank <= 3
    ORDER BY query_id, rank
    """,
)
def q170_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG-style retrieval pipeline under the driver's
    hash gate: documents are chunked (80-char windows, stride 60),
    chunks are embedded with the HASHING TRICK (each token's portable
    polynomial hash picks one of 8 signed buckets — a real sparse
    feature-hashing embedder, no model weights), three literal
    queries embed the same way, and cosine top-3 per query is
    retrieved via a sparse dot-product join on bucket index. Every
    stage is engine-portable (the same rolling hash q56 pins), so
    DuckDB reproduces the entire pipeline — chunking, embedding,
    scoring, ranking — hash-exact. Rounding to 6 before ranking makes
    float ties break identically on chunk_id.

    Scale shape: embeddings stay SPARSE (chunk_id, bucket, weight)
    rows; the score is a bucket-keyed equi-join + sum — never a
    dense-vector crossJoin — and the per-query top-k is a
    WindowGroupLimit. Swap the hashing embedder for model vectors
    and the same plan is IVF/LSH-prefiltered (q75/q103)."""
    from distcpplus_spark.functions.text import rolling_hash

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    wins = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.length("text") - 1) / 60).cast("int"),
            )
        ).alias("w"),
    )
    chunks = wins.select(
        (F.col("doc_id") * 100 + F.col("w")).alias("chunk_id"),
        F.expr("substr(text, w * 60 + 1, 80)").alias("chunk"),
    ).filter(F.length("chunk") >= 20)

    def embed(df, id_col, text_col, out_val):
        toks = df.select(
            id_col, F.explode(F.split(text_col, " ", -1)).alias("tok")
        ).filter(F.length("tok") > 0)
        h = rolling_hash(F.col("tok"))
        return (
            toks.select(
                id_col,
                (h % 8).alias("j"),
                (1 - 2 * (F.shiftright(h, 3) % 2)).alias("s"),
            )
            .groupBy(id_col, "j")
            .agg(F.sum("s").alias(out_val))
        )

    cemb = embed(chunks, "chunk_id", "chunk", "cv")
    cnorm = (
        cemb.groupBy("chunk_id")
        .agg(F.sum(F.col("cv") * F.col("cv")).alias("cn2"))
        .filter(F.col("cn2") > 0)
    )
    qdef = spark.createDataFrame(
        [
            (1, "spark table scan fast"),
            (2, "hash join merge batch"),
            (3, "stream window agg order"),
        ],
        "query_id INT, qtext STRING",
    )
    qemb = embed(qdef, "query_id", "qtext", "qv")
    qnorm = qemb.groupBy("query_id").agg(
        F.sum(F.col("qv") * F.col("qv")).alias("qn2")
    )
    dots = (
        cemb.join(F.broadcast(qemb), "j")
        .groupBy("query_id", "chunk_id")
        .agg(F.sum(F.col("qv") * F.col("cv")).alias("dp"))
    )
    scored = (
        dots.join(F.broadcast(qnorm), "query_id")
        .join(cnorm, "chunk_id")
        .select(
            "query_id",
            "chunk_id",
            F.round(
                F.col("dp") / F.sqrt(F.col("qn2") * F.col("cn2")), 6
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("chunk_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", "chunk_id", "cos_sim")
        .orderBy("query_id", "rank")
    )


@query(
    "q173_table_profile",
    oracle="""
    SELECT * FROM (
      SELECT 'l_orderkey' AS col_name, count(*) AS n,
             count(*) - count(l_orderkey) AS n_nulls,
             count(DISTINCT l_orderkey) AS n_distinct,
             CAST(min(l_orderkey) AS VARCHAR) AS min_val,
             CAST(max(l_orderkey) AS VARCHAR) AS max_val,
             CAST(round(avg(l_orderkey), 4) AS DOUBLE) AS mean_val
      FROM lineitem
      UNION ALL
      SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
             count(DISTINCT l_quantity),
             CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR),
             CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR),
             CAST(round(avg(l_quantity), 4) AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', count(*), count(*) - count(l_discount),
             count(DISTINCT round(l_discount, 2)),
             CAST(round(min(l_discount), 2) AS VARCHAR),
             CAST(round(max(l_discount), 2) AS VARCHAR),
             CAST(round(avg(l_discount), 4) AS DOUBLE)
      FROM lineitem
      UNION ALL
      SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
             count(DISTINCT l_returnflag),
             min(l_returnflag), max(l_returnflag), NULL
      FROM lineitem
    ) ORDER BY col_name
    """,
)
def q173_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling (the optimizer-statistics /
    data-quality dashboard primitive): per-column row count, null
    count, exact distinct count, min/max, mean, pivoted to one row
    per column. String-typed min/max unify the output schema;
    doubles round so both engines agree. float l_discount is
    profiled on its round(2) grid (exact distinct-of-float across
    engines is not portable; the grid is)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Round-14 (guide §2.3, the q13/q221 distinct discipline): FOUR
    # different count_distinct columns mixed with plain aggregates
    # plan ONE Expand that multiplies every lineitem row x5 before the
    # partial aggregate (8.7 s at sf0.1). Each distinct count now runs
    # as its own two-phase partial-distinct aggregate over a single
    # pruned column (no Expand anywhere), and the four 1-row results
    # broadcast-cross-join onto the plain-aggregate row: same values,
    # five cheap pruned scans instead of one 5x-expanded pass
    # (~3x measured). At 100 TB the swap to approx_count_distinct
    # (x06/q130 sketches) still applies column by column.
    plain = li.agg(
        F.count("*").alias("n"),
        F.count("l_orderkey").alias("nn_ok"),
        F.min("l_orderkey").alias("mn_ok"),
        F.max("l_orderkey").alias("mx_ok"),
        F.round(F.avg("l_orderkey"), 4).alias("av_ok"),
        F.count("l_quantity").alias("nn_q"),
        F.min("l_quantity").alias("mn_q"),
        F.max("l_quantity").alias("mx_q"),
        F.round(F.avg("l_quantity"), 4).alias("av_q"),
        F.count("l_discount").alias("nn_d"),
        F.round(F.min("l_discount"), 2).alias("mn_d"),
        F.round(F.max("l_discount"), 2).alias("mx_d"),
        F.round(F.avg("l_discount"), 4).alias("av_d"),
        F.count("l_returnflag").alias("nn_r"),
        F.min("l_returnflag").alias("mn_r"),
        F.max("l_returnflag").alias("mx_r"),
    )
    row = plain
    for col, alias in [
        (F.col("l_orderkey"), "nd_ok"),
        (F.col("l_quantity"), "nd_q"),
        (F.round("l_discount", 2), "nd_d"),
        (F.col("l_returnflag"), "nd_r"),
    ]:
        row = row.crossJoin(
            F.broadcast(li.agg(F.countDistinct(col).alias(alias)))
        )
    profile = row.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_orderkey").alias("col_name"),
                    F.col("n").alias("n"),
                    (F.col("n") - F.col("nn_ok")).alias("n_nulls"),
                    F.col("nd_ok").alias("n_distinct"),
                    F.col("mn_ok").cast("string").alias("min_val"),
                    F.col("mx_ok").cast("string").alias("max_val"),
                    F.col("av_ok").alias("mean_val"),
                ),
                F.struct(
                    F.lit("l_quantity").alias("col_name"),
                    F.col("n").alias("n"),
                    (F.col("n") - F.col("nn_q")).alias("n_nulls"),
                    F.col("nd_q").alias("n_distinct"),
                    F.col("mn_q").cast("bigint").cast("string").alias("min_val"),
                    F.col("mx_q").cast("bigint").cast("string").alias("max_val"),
                    F.col("av_q").alias("mean_val"),
                ),
                F.struct(
                    F.lit("l_discount").alias("col_name"),
                    F.col("n").alias("n"),
                    (F.col("n") - F.col("nn_d")).alias("n_nulls"),
                    F.col("nd_d").alias("n_distinct"),
                    F.col("mn_d").cast("string").alias("min_val"),
                    F.col("mx_d").cast("string").alias("max_val"),
                    F.col("av_d").alias("mean_val"),
                ),
                F.struct(
                    F.lit("l_returnflag").alias("col_name"),
                    F.col("n").alias("n"),
                    (F.col("n") - F.col("nn_r")).alias("n_nulls"),
                    F.col("nd_r").alias("n_distinct"),
                    F.col("mn_r").alias("min_val"),
                    F.col("mx_r").alias("max_val"),
                    F.lit(None).cast("double").alias("mean_val"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return profile.orderBy("col_name")


def _pii_redaction_oracle() -> str:
    from distcpplus_spark.functions.text import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
    )

    synth = (
        "text || ' contact user' || doc_id || '@mail' || (doc_id % 7)"
        " || '.example.com or +1 555 ' || (1000 + doc_id)"
        " || ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)"
    )
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({synth}, "
        f"'{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE_RE}', '<PHONE>', 'g'), "
        f"'{PII_IPV4_RE}', '<IP>', 'g')"
    )
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(length(regexp_extract_all({synth}, '{PII_EMAIL_RE}'))
                AS BIGINT) AS n_emails,
           CAST(length(regexp_extract_all({synth}, '{PII_PHONE_RE}'))
                AS BIGINT) AS n_phones,
           md5({red}) AS redacted_md5
    FROM documents WHERE doc_id < 120
    ORDER BY doc_id
    """


@query("q187_pii_redaction", oracle=_pii_redaction_oracle())
def q187_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction transform (functions/text.py:redact_pii) under
    the driver's hash gate: each document is augmented with a
    synthesized email, phone, and IPv4 (guaranteeing the patterns
    fire), then scrubbed with three global regexp passes in a fixed
    order. The patterns live in the RE2 ∩ Java-regex common subset so
    the identical literals run in both engines; the md5 of the
    redacted text makes any single-character divergence a hash
    mismatch. Pure codegen'd string expressions — no UDF, no
    shuffle."""
    from distcpplus_spark.functions.text import redact_pii
    from distcpplus_spark.queries import small_sort

    from distcpplus_spark.functions.text import (
        PII_EMAIL_RE,
        PII_PHONE_RE,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 120
    )
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com or +1 555 "),
        (F.col("doc_id") + 1000).cast("string"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 100).cast("string"),
    )
    return (
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.size(F.regexp_extract_all(synth, F.lit(PII_EMAIL_RE), F.lit(0)))
            .cast("bigint").alias("n_emails"),
            F.size(F.regexp_extract_all(synth, F.lit(PII_PHONE_RE), F.lit(0)))
            .cast("bigint").alias("n_phones"),
            F.md5(redact_pii(synth).cast("binary")).alias("redacted_md5"),
        )
        .transform(small_sort, "doc_id")
    )


@query(
    "q195_warc_ingestion",
    oracle="""
    SELECT 'http://site' || f || '.example/page' || j AS target_uri,
           200 AS http_status,
           CAST(length('<html>doc ' || f || '-' || j || '</html>')
                AS BIGINT) AS n_bytes,
           md5('<html>doc ' || f || '-' || j || '</html>') AS body_md5
    FROM range(0, 4) t(f), LATERAL unnest(range(0, 5)) u(j)
    ORDER BY target_uri
    """,
)
def q195_warc_ingestion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion (sources/warc.py) under the driver's hash
    gate: four .warc.gz files in the Common Crawl layout (gzip
    member per record) carrying five HTTP response records each are
    assembled, read back through the distributed binaryFile →
    mapInPandas path, HTTP-split, and fingerprinted — URL, status,
    body length, and body md5 must match DuckDB's closed forms.
    Fresh temp dir per invocation."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.warc import build_warc, read_warc

    root = _tf.mkdtemp(prefix="q195_warc_")
    try:
        for fidx in range(4):
            recs = [
                (
                    "response",
                    f"http://site{fidx}.example/page{j}",
                    "2024-01-01T00:00:00Z",
                    f"<urn:uuid:{fidx}-{j}>",
                    "application/http;msgtype=response",
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + f"<html>doc {fidx}-{j}</html>".encode(),
                )
                for j in range(5)
            ]
            with open(_os.path.join(root, f"f{fidx}.warc.gz"), "wb") as fh:
                fh.write(build_warc(recs))
        rows = (
            read_warc(spark, root)
            .select(
                "target_uri",
                "http_status",
                F.length("payload").cast("bigint").alias("n_bytes"),
                F.md5("payload").alias("body_md5"),
            )
            .orderBy("target_uri")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows,
        "target_uri STRING, http_status INT, n_bytes BIGINT, "
        "body_md5 STRING",
    ).orderBy("target_uri")


@query(
    "q196_compressed_text_ingest",
    oracle="""
    WITH lines AS (
      SELECT 'gz' AS codec, f, j,
             'gzline-' || f || '-' || j AS line
      FROM range(0, 3) t(f), LATERAL unnest(range(0, 40)) u(j)
      UNION ALL
      SELECT 'bz2', f, j, 'bzline-' || f || '-' || j
      FROM range(0, 2) t(f), LATERAL unnest(range(0, 40)) u(j)
    )
    SELECT codec,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(length(line)) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT f) AS BIGINT) AS n_files
    FROM lines GROUP BY codec ORDER BY codec
    """,
)
def q196_compressed_text_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed text ingestion under the driver's hash gate: gzip
    and bzip2 line files written with the stdlib codecs are read
    back through Spark's transparent Hadoop codec layer
    (spark.read.text decompresses by extension — no configuration).
    Scale note: .gz is NOT splittable (one task per file — size your
    shards), while .bz2 IS block-splittable, which is exactly why
    Common Crawl's predecessors shipped bzip2; the counts prove both
    paths deliver every line. Fresh temp dirs per invocation."""
    import bz2 as _bz2
    import gzip as _gzip
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    root = _tf.mkdtemp(prefix="q196_codec_")
    gz_dir = _os.path.join(root, "gz")
    bz_dir = _os.path.join(root, "bz2")
    _os.makedirs(gz_dir)
    _os.makedirs(bz_dir)
    try:
        for f in range(3):
            data = "".join(
                f"gzline-{f}-{j}\n" for j in range(40)
            ).encode()
            with open(_os.path.join(gz_dir, f"part{f}.txt.gz"), "wb") as fh:
                fh.write(_gzip.compress(data, mtime=0))
        for f in range(2):
            data = "".join(
                f"bzline-{f}-{j}\n" for j in range(40)
            ).encode()
            with open(_os.path.join(bz_dir, f"part{f}.txt.bz2"), "wb") as fh:
                fh.write(_bz2.compress(data))
        out = []
        for codec, d in (("bz2", bz_dir), ("gz", gz_dir)):
            df = (
                spark.read.text(d)
                .select(
                    F.col("value").alias("line"),
                    F.input_file_name().alias("fname"),
                )
                .agg(
                    F.count("*").alias("n_lines"),
                    F.sum(F.length("line")).alias("n_chars"),
                    F.countDistinct("fname").alias("n_files"),
                )
                .collect()[0]
            )
            out.append(
                (codec, int(df["n_lines"]), int(df["n_chars"]),
                 int(df["n_files"]))
            )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        out, "codec STRING, n_lines BIGINT, n_chars BIGINT, n_files BIGINT"
    ).orderBy("codec")


@query(
    "q197_jsonl_shard_export",
    oracle="""
    WITH t AS (SELECT count(*) AS n FROM documents WHERE doc_id < 250)
    SELECT CAST(s AS INTEGER) AS shard,
           CAST(least(64, n - s * 64) AS BIGINT) AS n_rows,
           CAST(least(64, n - s * 64) AS BIGINT) AS n_reread
    FROM t, LATERAL unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT)))
         AS u(s)
    ORDER BY shard
    """,
)
def q197_jsonl_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic JSONL shard export under the driver's hash gate
    (sources/formats.py:write_jsonl_shards): docs <250 export as
    64-row rank-assigned shards plus a digest manifest; every shard
    is then RE-READ through spark.read.json and recounted — the
    manifest counts and the re-read counts must both match the
    closed-form shard arithmetic. Shard assembly is one task per
    shard (applyInPandas over the rank-bucketed frame); the driver
    handles only digests. Fresh temp dir per invocation."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.formats import write_jsonl_shards

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 250)
        .select("doc_id", "lang", "n_chars")
    )
    root = _tf.mkdtemp(prefix="q197_shards_")
    try:
        manifest = write_jsonl_shards(docs, root, 64, "doc_id").collect()
        out = []
        for r in sorted(manifest, key=lambda r: r["shard"]):
            path = _os.path.join(root, f"shard-{r['shard']:05d}.jsonl")
            reread = spark.read.json(path).count()
            out.append((r["shard"], r["n_rows"], reread))
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        out, "shard INT, n_rows BIGINT, n_reread BIGINT"
    ).orderBy("shard")


@query(
    "q198_next_event_training_examples",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2,
             lag(event_type, 3) OVER w AS p3,
             CAST(date_diff('microsecond', lag(ts, 1) OVER w, ts)
                  AS BIGINT) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           p3 || '>' || p2 || '>' || p1 AS context,
           gap_us,
           event_type AS label
    FROM ordered
    WHERE p3 IS NOT NULL AND user_id < 40
    ORDER BY user_id, event_id
    """,
)
def q198_next_event_training_examples(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supervised-example generation for sequence models under the
    driver's hash gate: per user, each event with three predecessors
    becomes one training row — context = the previous three event
    types in order, gap_us = microseconds since the previous event,
    label = the event that actually happened. Pure window lags over
    a (user, time) sort: ONE shuffle on user_id builds every example
    for that user's whole history, the standard next-token-style
    dataset shape. Deterministic ordering ties break on event_id."""
    from pyspark.sql.window import Window as W

    from distcpplus_spark.queries import small_sort

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    out = (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            F.lag("event_type", 1).over(w).alias("p1"),
            F.lag("event_type", 2).over(w).alias("p2"),
            F.lag("event_type", 3).over(w).alias("p3"),
            F.lag("ts", 1).over(w).alias("_prev_ts"),
        )
        .filter(F.col("p3").isNotNull())
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("event_id").cast("bigint").alias("event_id"),
            F.concat_ws(">", "p3", "p2", "p1").alias("context"),
            (
                F.unix_micros("ts") - F.unix_micros("_prev_ts")
            ).cast("bigint").alias("gap_us"),
            F.col("event_type").alias("label"),
        )
    )
    return out.transform(small_sort, "user_id", "event_id")


@query(
    "q199_negative_sampling",
    oracle="""
    WITH pool AS (SELECT doc_id, lang FROM documents WHERE doc_id < 200),
    n AS (SELECT count(*) AS cnt, min(doc_id) AS base FROM pool),
    anchors AS (SELECT doc_id AS anchor_id FROM pool WHERE doc_id < 60),
    cand AS (
      SELECT a.anchor_id, CAST(j AS INTEGER) AS neg_rank,
             (a.anchor_id * 2654435761 + j * 40503 + 17) % n.cnt AS slot
      FROM anchors a, n, LATERAL unnest(range(0, 4)) t(j)
    ),
    resolved AS (
      SELECT anchor_id, neg_rank,
             CASE WHEN slot + n.base = anchor_id
                  THEN (slot + 1) % n.cnt + n.base
                  ELSE slot + n.base END AS neg_id
      FROM cand, n
    )
    SELECT CAST(r.anchor_id AS BIGINT) AS anchor_id,
           r.neg_rank,
           CAST(r.neg_id AS BIGINT) AS neg_id,
           p.lang AS neg_lang
    FROM resolved r JOIN pool p ON p.doc_id = r.neg_id
    ORDER BY anchor_id, neg_rank
    """,
)
def q199_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training
    under the driver's hash gate: each anchor document draws 4
    negatives via an integer-mixer slot (Knuth multiplicative hash —
    no RNG, identical arithmetic in both engines, the q114/q115
    sampling discipline), with a +1 bump when the slot lands on the
    anchor itself. The draw is a computed-key equi-join back to the
    pool — at 100 TB that is one hash-partitioned join on doc_id,
    never a crossJoin; pool size enters as a broadcast scalar."""
    from distcpplus_spark.queries import small_sort

    pool = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "lang")
    )
    stats = pool.agg(
        F.count("*").alias("cnt"), F.min("doc_id").alias("base")
    ).collect()[0]
    cnt, base = int(stats["cnt"]), int(stats["base"])
    anchors = pool.filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("anchor_id")
    )
    cand = anchors.crossJoin(
        F.broadcast(
            spark.range(4).select(F.col("id").cast("int").alias("neg_rank"))
        )
    ).withColumn(
        "slot",
        (
            F.col("anchor_id") * F.lit(2654435761)
            + F.col("neg_rank") * F.lit(40503)
            + F.lit(17)
        )
        % F.lit(cnt),
    )
    resolved = cand.withColumn(
        "neg_id",
        F.when(
            F.col("slot") + F.lit(base) == F.col("anchor_id"),
            (F.col("slot") + 1) % F.lit(cnt) + F.lit(base),
        ).otherwise(F.col("slot") + F.lit(base)),
    )
    return (
        resolved.join(
            pool.select(
                F.col("doc_id").alias("neg_id"),
                F.col("lang").alias("neg_lang"),
            ),
            "neg_id",
        )
        .select(
            F.col("anchor_id").cast("bigint").alias("anchor_id"),
            "neg_rank",
            F.col("neg_id").cast("bigint").alias("neg_id"),
            "neg_lang",
        )
        .transform(small_sort, "anchor_id", "neg_rank")
    )


@query(
    "q200_timeseries_interpolation",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, value FROM events WHERE user_id < 12
    ),
    bounds AS (
      SELECT user_id,
             date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM ev GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id,
             h0 + to_hours(CAST(g AS BIGINT)) AS grid_ts
      FROM bounds b,
           LATERAL unnest(range(0,
             CAST(date_diff('hour', h0, h1) AS BIGINT) + 1)) t(g)
    ),
    joined AS (
      SELECT s.user_id, s.grid_ts,
             (SELECT max(e.ts) FROM ev e
              WHERE e.user_id = s.user_id AND e.ts <= s.grid_ts)
                 AS prev_ts,
             (SELECT min(e.ts) FROM ev e
              WHERE e.user_id = s.user_id AND e.ts > s.grid_ts)
                 AS next_ts
      FROM spine s
    ),
    vals AS (
      SELECT j.user_id, j.grid_ts, j.prev_ts, j.next_ts,
             (SELECT max(value) FROM ev e WHERE e.user_id = j.user_id
               AND e.ts = j.prev_ts) AS prev_v,
             (SELECT min(value) FROM ev e WHERE e.user_id = j.user_id
               AND e.ts = j.next_ts) AS next_v
      FROM joined j
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(grid_ts AS TIMESTAMP) AS grid_ts,
           CAST(round(CASE
             WHEN prev_ts IS NULL THEN next_v
             WHEN next_ts IS NULL OR prev_ts = grid_ts THEN prev_v
             ELSE prev_v + (next_v - prev_v)
                  * date_diff('microsecond', prev_ts, grid_ts)
                  / date_diff('microsecond', prev_ts, next_ts)
           END, 4) AS DOUBLE) AS value4
    FROM vals
    ORDER BY user_id, grid_ts
    """,
)
def q200_timeseries_interpolation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Irregular → regular time-series resampling with linear
    interpolation under the driver's hash gate: per user, an hourly
    spine spans their activity window; each grid point takes the
    linear blend of its two surrounding observations (boundary grid
    points clamp to the nearest one). Spark-first shape: the spine
    is sequence()+explode (no driver loop), surrounding points come
    from ONE union-tag window pass (running last/next over the
    merged spine+events stream — the as-of-join trick, not per-row
    point lookups), so the whole resample is two window passes over
    one user-keyed shuffle. The oracle uses correlated subqueries —
    O(n²) but fine at gate scale — to state the same semantics
    declaratively. Values compare at round-4 (one division is
    reassociated between engines)."""
    from pyspark.sql.window import Window as W

    from distcpplus_spark.queries import small_sort

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 12)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("grid_ts"),
    )
    # union-tag: real observations (tag 1) + grid points (tag 0);
    # running last non-null over (user, time, tag) gives the previous
    # observation, the reversed frame gives the next one
    obs = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_obs"),
        "value",
    )
    grid = spine.select(
        "user_id",
        F.col("grid_ts").alias("t"),
        F.lit(0).alias("is_obs"),
        F.lit(None).cast("double").alias("value"),
    )
    allr = obs.unionByName(grid)
    # value joins the ordering so same-timestamp observations
    # resolve deterministically: running-last picks the MAX value at
    # prev_ts, running-first the MIN at next_ts — mirrored by the
    # oracle's max()/min() correlated lookups
    wb = (
        W.partitionBy("user_id")
        .orderBy("t", "is_obs", "value")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("t", "is_obs", "value")
        .rowsBetween(0, W.unboundedFollowing)
    )
    obs_t = F.when(F.col("is_obs") == 1, F.col("t"))
    enriched = (
        allr.withColumn("prev_ts", F.last(obs_t, True).over(wb))
        .withColumn("prev_v", F.last(F.col("value"), True).over(wb))
        .withColumn("next_ts", F.first(obs_t, True).over(wf))
        .withColumn("next_v", F.first(F.col("value"), True).over(wf))
        .filter(F.col("is_obs") == 0)
    )
    us = F.unix_micros
    interp = (
        F.when(F.col("prev_ts").isNull(), F.col("next_v"))
        .when(
            F.col("next_ts").isNull()
            | (F.col("prev_ts") == F.col("t")),
            F.col("prev_v"),
        )
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (us(F.col("t")) - us(F.col("prev_ts")))
            / (us(F.col("next_ts")) - us(F.col("prev_ts")))
        )
    )
    return (
        enriched.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("t").alias("grid_ts"),
            F.round(interp, 4).alias("value4"),
        )
        .transform(small_sort, "user_id", "grid_ts")
    )


@query(
    "q201_arrow_ipc_roundtrip",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id < 300
    GROUP BY lang ORDER BY lang
    """,
)
def q201_arrow_ipc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow IPC (Feather v2) source+sink under the driver's hash
    gate: the documents slice is written as one .arrow file per
    partition straight from Spark's own RecordBatches (mapInArrow —
    no row conversion at all), read back through the
    binaryFile→mapInArrow source with a footer-sniffed schema, and
    re-aggregated; the result must equal DuckDB's aggregate over the
    original parquet. Arrow IPC is the zero-parse interchange lane
    to Python/Rust feature-store consumers. Fresh temp dir per
    invocation."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.formats import (
        read_arrow_ipc,
        write_arrow_ipc,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "lang", "n_chars")
    )
    root = _tf.mkdtemp(prefix="q201_ipc_")
    try:
        write_arrow_ipc(docs.repartition(6), root)
        rows = (
            read_arrow_ipc(spark, root)
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            )
            .orderBy("lang")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "lang STRING, n_docs BIGINT, total_chars BIGINT"
    ).orderBy("lang")


@query(
    "q202_classifier_eval_metrics",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             CASE WHEN n_chars % 3 = 0 THEN 1 ELSE 0 END AS label,
             (n_chars % 701) / 701.0 + doc_id / 1e9 AS score
      FROM documents WHERE doc_id < 400
    ),
    ranked AS (
      SELECT label, score,
             row_number() OVER (ORDER BY score, label) AS rk
      FROM scored
    ),
    counts AS (
      SELECT sum(label) AS p,
             count(*) - sum(label) AS n,
             sum(CASE WHEN label = 1 THEN rk ELSE 0 END) AS pos_rank_sum
      FROM ranked
    ),
    conf AS (
      SELECT sum(CASE WHEN score >= 0.5 AND label = 1 THEN 1 ELSE 0 END)
                 AS tp,
             sum(CASE WHEN score >= 0.5 AND label = 0 THEN 1 ELSE 0 END)
                 AS fp,
             sum(CASE WHEN score < 0.5 AND label = 0 THEN 1 ELSE 0 END)
                 AS tn,
             sum(CASE WHEN score < 0.5 AND label = 1 THEN 1 ELSE 0 END)
                 AS fn
      FROM scored
    )
    SELECT CAST(p AS BIGINT) AS n_pos,
           CAST(n AS BIGINT) AS n_neg,
           CAST(round((pos_rank_sum - p * (p + 1) / 2.0) / (p * n), 6)
                AS DOUBLE) AS auc,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(tn AS BIGINT) AS tn,
           CAST(fn AS BIGINT) AS fn,
           CAST(round(tp / CAST(tp + fp AS DOUBLE), 6) AS DOUBLE)
               AS precision6,
           CAST(round(tp / CAST(tp + fn AS DOUBLE), 6) AS DOUBLE)
               AS recall6
    FROM counts, conf
    """,
)
def q202_classifier_eval_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distributed classifier evaluation under the driver's hash
    gate: AUC by the Mann-Whitney rank formula (one global sort —
    the only way to get exact AUC without an O(n²) pair join),
    plus the 0.5-threshold confusion matrix, precision, and recall
    in a single conditional-sum pass. Scores are a deterministic
    synthetic (tie-free by construction: the doc_id/1e9 term
    separates equal base scores, so both engines rank identically).
    Scale: the eval set is corpus-sized, so the Mann-Whitney rank is
    NOT a partition-less window — it runs as the two-phase
    distributed prefix sum over a range repartition on the tie-free
    (score, label) key (the q161/q291 discipline); the standard
    approximation — bucketed AUC over ~1e4 score bins — would reuse
    the same rank algebra on the binned histogram."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 400
    )
    scored = docs.select(
        F.when(F.col("n_chars") % 3 == 0, 1).otherwise(0).alias("label"),
        (
            (F.col("n_chars") % 701) / 701.0 + F.col("doc_id") / 1e9
        ).alias("score"),
    )
    ranked = partitioned_running_agg(
        scored.repartitionByRange("score", "label").withColumn(
            "_one", F.lit(1)
        ),
        ["score", "label"],
        "_one",
        "rk",
        F.spark_partition_id(),
        deterministic_bucket=False,
    )
    agg = ranked.agg(
        F.sum("label").alias("p"),
        (F.count("*") - F.sum("label")).alias("n"),
        F.sum(F.when(F.col("label") == 1, F.col("rk")).otherwise(0)).alias(
            "prs"
        ),
        F.sum(
            F.when((F.col("score") >= 0.5) & (F.col("label") == 1), 1)
            .otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when((F.col("score") >= 0.5) & (F.col("label") == 0), 1)
            .otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("score") < 0.5) & (F.col("label") == 0), 1)
            .otherwise(0)
        ).alias("tn"),
        F.sum(
            F.when((F.col("score") < 0.5) & (F.col("label") == 1), 1)
            .otherwise(0)
        ).alias("fn"),
    )
    return agg.select(
        F.col("p").cast("bigint").alias("n_pos"),
        F.col("n").cast("bigint").alias("n_neg"),
        F.round(
            (F.col("prs") - F.col("p") * (F.col("p") + 1) / 2.0)
            / (F.col("p") * F.col("n")),
            6,
        ).alias("auc"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("tn").cast("bigint").alias("tn"),
        F.col("fn").cast("bigint").alias("fn"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias(
            "precision6"
        ),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6).alias(
            "recall6"
        ),
    )


@query(
    "q203_embedding_centroid_outliers",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    dims AS (
      SELECT label, i, avg(v[i]) AS c
      FROM e, LATERAL unnest(range(1, len(v) + 1)) t(i)
      GROUP BY label, i
    ),
    centroids AS (
      SELECT label, list(c ORDER BY i) AS centroid FROM dims
      GROUP BY label
    ),
    scored AS (
      SELECT e.vec_id, e.label,
             list_dot_product(e.v, c.centroid) /
               (sqrt(list_dot_product(e.v, e.v)) *
                sqrt(list_dot_product(c.centroid, c.centroid)))
                 AS cos_c
      FROM e JOIN centroids c USING (label)
    ),
    ranked AS (
      SELECT vec_id, label,
             CAST(round(cos_c, 6) AS DOUBLE) AS cos_centroid,
             row_number() OVER (PARTITION BY label
                                ORDER BY cos_c, vec_id) AS rk
      FROM scored
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(label AS INTEGER) AS label,
           cos_centroid
    FROM ranked WHERE rk <= 5
    ORDER BY label, vec_id
    """,
)
def q203_embedding_centroid_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding quality control under the driver's hash gate: per
    label group, the dimension-wise centroid (posexplode → one hash
    aggregation keyed (label, dim) → re-assembled array), then each
    vector's cosine to its group centroid; the 5 least-central
    vectors per group surface as outlier candidates (mislabeled or
    off-distribution rows — the embedding-space audit every
    training corpus needs). Spark side stays in higher-order array
    functions; ranking ties break on vec_id so both engines agree
    exactly. At 100 TB the centroid pass is one (label, dim)-keyed
    aggregation — dims are plan constants, never a wide shuffle."""
    from pyspark.sql.window import Window as W

    from distcpplus_spark.queries import small_sort

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dims = (
        emb.select(
            "label", F.posexplode("v").alias("i", "x")
        )
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
    )
    centroids = dims.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("i", "c"))
        ).alias("_sc")
    ).select(
        "label",
        F.transform("_sc", lambda s: s.getField("c")).alias("centroid"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = emb.join(F.broadcast(centroids), "label").select(
        "vec_id",
        "label",
        (
            dot(F.col("v"), F.col("centroid"))
            / (
                F.sqrt(dot(F.col("v"), F.col("v")))
                * F.sqrt(dot(F.col("centroid"), F.col("centroid")))
            )
        ).alias("cos_c"),
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("label").orderBy("cos_c", "vec_id")
        ),
    )
    return (
        ranked.filter(F.col("rk") <= 5)
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("label").cast("int").alias("label"),
            F.round("cos_c", 6).alias("cos_centroid"),
        )
        .transform(small_sort, "label", "vec_id")
    )


@query(
    "q204_c4_line_dedup",
    oracle="""
    WITH lines AS (
      SELECT doc_id, i, line
      FROM (SELECT doc_id,
                   generate_subscripts(string_split(text, '.'), 1) AS i,
                   unnest(string_split(text, '.')) AS line
            FROM documents WHERE doc_id < 200)
      WHERE trim(line) <> ''
    ),
    freq AS (
      SELECT line, count(*) AS n FROM lines GROUP BY line
    ),
    kept AS (
      SELECT l.doc_id, l.i, l.line
      FROM lines l JOIN freq f USING (line)
      WHERE f.n = 1
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST((SELECT count(*) FROM lines l
                 WHERE l.doc_id = d.doc_id) AS BIGINT) AS n_lines,
           CAST(coalesce((SELECT count(*) FROM kept k
                 WHERE k.doc_id = d.doc_id), 0) AS BIGINT) AS n_kept,
           md5(coalesce((SELECT string_agg(k.line, '.' ORDER BY k.i)
                 FROM kept k WHERE k.doc_id = d.doc_id), ''))
               AS cleaned_md5
    FROM documents d WHERE d.doc_id < 200
    ORDER BY doc_id
    """,
)
def q204_c4_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus line deduplication under the driver's hash
    gate (Raffel et al. 2020's cleaning rule, public arXiv
    1910.10683: drop every line that occurs more than once in the
    corpus): documents split on '.', line frequencies counted
    corpus-wide, only singleton lines survive, and each document is
    reassembled in original line order — the md5 of the cleaned
    text pins the reconstruction exactly. One line-keyed count
    shuffle + one join back + one per-doc ordered aggregation; at
    100 TB the frequency table is the same 16-byte-hash groupBy as
    exact dedup, and reassembly keys on doc_id."""
    from pyspark.sql.window import Window as W

    from distcpplus_spark.queries import small_sort

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    lines = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", "\\.", -1)).alias("i", "line"),
        )
        .filter(F.trim("line") != "")
    )
    freq = lines.groupBy("line").agg(F.count("*").alias("n"))
    kept = lines.join(freq, "line").filter(F.col("n") == 1)
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            ".",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "line"))),
                lambda s: s.getField("line"),
            ),
        ).alias("cleaned"),
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.md5(
                F.coalesce(F.col("cleaned"), F.lit("")).cast("binary")
            ).alias("cleaned_md5"),
        )
        .transform(small_sort, "doc_id")
    )


@query(
    "q205_packing_attention_boundaries",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_tokens
      FROM documents WHERE doc_id < 500
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED
                 PRECEDING) - n_tokens AS cum0
      FROM toks
    ),
    placed AS (
      SELECT doc_id, n_tokens,
             CAST(floor(cum0 / 2048) AS BIGINT) AS pack_id,
             cum0 - CAST(floor(cum0 / 2048) AS BIGINT) * 2048 AS start_off
      FROM packed
    )
    SELECT pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           list(doc_id || ':' || start_off || ':'
                || (start_off + n_tokens - 1) ORDER BY doc_id)
               AS boundaries
    FROM placed
    GROUP BY pack_id
    ORDER BY pack_id
    """,
)
def q205_packing_attention_boundaries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequence packing WITH the per-pack document boundary map —
    the piece causal-attention training actually needs beyond q95's
    pack assignment: inside each pack, every document's [start, end]
    token offsets, so the attention mask can block cross-document
    attention. Same distributed two-phase prefix sum as q95
    (operators/scale.py — no global window); the boundary strings
    make the nested structure hash-comparable across engines."""
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
    placed = (
        partitioned_running_agg(
            toks,
            ["doc_id"],
            "n_tokens",
            "_cum",
            bucket=F.floor(F.col("doc_id") / 128).cast("bigint"),
        )
        .withColumn("cum0", F.col("_cum") - F.col("n_tokens"))
        .withColumn(
            "pack_id", F.floor(F.col("cum0") / 2048).cast("bigint")
        )
        .withColumn(
            "start_off", F.col("cum0") - F.col("pack_id") * 2048
        )
    )
    return (
        placed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("doc_id", "start_off", "n_tokens")
                    )
                ),
                lambda s: F.concat_ws(
                    ":",
                    s.getField("doc_id"),
                    s.getField("start_off"),
                    s.getField("start_off")
                    + s.getField("n_tokens")
                    - 1,
                ),
            ).alias("boundaries"),
        )
        .transform(small_sort, "pack_id")
    )


@query(
    "q206_trending_per_window",
    oracle="""
    WITH w AS (
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT hour_start, event_type, n,
             dense_rank() OVER (PARTITION BY hour_start
                                ORDER BY n DESC, event_type) AS rnk
      FROM w
    )
    SELECT CAST(hour_start AS TIMESTAMP) AS hour_start,
           event_type,
           CAST(n AS BIGINT) AS n,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY hour_start, rnk, event_type
    """,
)
def q206_trending_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items per hourly window: windowed counts + top-3
    dense rank within each window (deterministic tie-break on the
    type name) — the batch form of the classic streaming leaderboard.
    One (hour, type) aggregation + one hour-partitioned window; at
    100 TB the rank partitions are single hours, never global."""
    from pyspark.sql.window import Window as W

    from distcpplus_spark.queries import small_sort

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(F.count("*").alias("n"))
    ranked = counts.withColumn(
        "rnk",
        F.dense_rank().over(
            W.partitionBy("hour_start").orderBy(
                F.desc("n"), F.asc("event_type")
            )
        ),
    )
    return (
        ranked.filter(F.col("rnk") <= 3)
        .select(
            "hour_start",
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .transform(small_sort, "hour_start", "rnk", "event_type")
    )


@query(
    "q209_dataset_datasheet",
    oracle="""
    WITH d AS (SELECT * FROM documents),
    lang_top AS (
      SELECT source, lang,
             row_number() OVER (PARTITION BY source
                                ORDER BY count(*) DESC, lang) AS rk
      FROM d GROUP BY source, lang
    ),
    dup AS (
      SELECT source, count(*) - count(DISTINCT text) AS n_exact_dups
      FROM d GROUP BY source
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
           (SELECT lang FROM lang_top t
            WHERE t.source = d.source AND t.rk = 1) AS top_lang,
           CAST(round(quantile_cont(d.n_chars, 0.5), 4) AS DOUBLE)
               AS p50_chars,
           CAST(round(quantile_cont(d.n_chars, 0.95), 4) AS DOUBLE)
               AS p95_chars,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
           CAST((SELECT n_exact_dups FROM dup
                 WHERE dup.source = d.source) AS BIGINT) AS n_exact_dups
    FROM d
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q209_dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset datasheet / corpus card under the driver's hash gate:
    per source — document count, language diversity, dominant
    language (deterministic ties), exact length percentiles, total
    volume, and the exact-duplicate count — the one-page summary a
    datasheet-for-datasets report starts from (Gebru et al. 2021,
    public arXiv 1803.09010). One grouped pass plus a per-source
    language window; the exact percentile is the only sort, and at
    100 TB it downgrades gracefully to the KLL sketch tier
    (queries/sketches.py) with a documented rank-error bound."""
    from pyspark.sql.window import Window as W

    from distcpplus_spark.queries import small_sort

    docs = load_table(spark, sf_dir, "documents")
    lang_counts = docs.groupBy("source", "lang").agg(
        F.count("*").alias("_n")
    )
    top_lang = (
        lang_counts.withColumn(
            "_rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.desc("_n"), F.asc("lang"))
            ),
        )
        .filter(F.col("_rk") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    base = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.95)), 4).alias("p95_chars"),
        F.sum("n_chars").alias("total_chars"),
        (F.count("*") - F.countDistinct("text")).alias("n_exact_dups"),
    )
    return (
        base.join(top_lang, "source")
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_langs").cast("bigint").alias("n_langs"),
            "top_lang",
            "p50_chars",
            "p95_chars",
            F.col("total_chars").cast("bigint").alias("total_chars"),
            F.col("n_exact_dups").cast("bigint").alias("n_exact_dups"),
        )
        .transform(small_sort, "source")
    )


@query(
    "q214_web_corpus_pipeline",
    oracle="""
    WITH pages AS (
      SELECT 'http://site' || f || '.example/p' || j AS url,
             'Article body-' || ((f * 40 + j) % 60) || ' '
             || repeat('w ', 3 + ((f * 40 + j) % 5)) AS raw
      FROM range(0, 3) t(f), LATERAL unnest(range(0, 40)) u(j)
    ),
    cleaned AS (
      SELECT url,
             trim(regexp_replace(raw, '[ \\t\\r\\n]+', ' ', 'g'))
                 AS extracted
      FROM pages
    ),
    ranked AS (
      SELECT url, extracted,
             row_number() OVER (PARTITION BY extracted ORDER BY url)
                 AS rk
      FROM cleaned
    )
    SELECT url,
           CAST(length(extracted)
                - length(replace(extracted, ' ', '')) + 1 AS BIGINT)
               AS n_tokens,
           rk = 1 AS is_kept
    FROM ranked
    ORDER BY url
    """,
)
def q214_web_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END web-corpus pipeline in one gated query — the
    composition a Common Crawl user actually runs: three .warc.gz
    archives of HTML pages (sources/warc.py writer, gzip member per
    record) are ingested through the distributed WARC reader, each
    response body is HTML-stripped with the q168 regexp recipe,
    whitespace-normalized, token-counted, and exact-deduped with a
    keep-first-URL rule (pages collide across sites by
    construction). The oracle recomputes every stage declaratively;
    URL, token count, and the kept/dropped verdict all hash-match.
    Scale shape: archive-per-task ingestion → codegen'd string
    expressions → one text-keyed window; nothing leaves the
    executors until the final summary."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from pyspark.sql.window import Window as W

    from distcpplus_spark.queries import small_sort
    from distcpplus_spark.sources.warc import build_warc, read_warc

    root = _tf.mkdtemp(prefix="q214_warc_")
    try:
        for f_idx in range(3):
            recs = []
            for j in range(40):
                m = (f_idx * 40 + j) % 60
                body = (
                    "<html><head><title></title></head><body>"
                    "<h1>Article</h1><p>body-" + str(m) + " "
                    + "w " * (3 + ((f_idx * 40 + j) % 5))
                    + "</p><script>var x=1;</script></body></html>"
                ).encode()
                recs.append(
                    (
                        "response",
                        f"http://site{f_idx}.example/p{j}",
                        "2024-01-01T00:00:00Z",
                        f"<urn:uuid:{f_idx}-{j}>",
                        "application/http;msgtype=response",
                        b"HTTP/1.1 200 OK\r\n\r\n" + body,
                    )
                )
            with open(_os.path.join(root, f"f{f_idx}.warc.gz"), "wb") as fh:
                fh.write(build_warc(recs))
        raw = read_warc(spark, root).select(
            "target_uri", F.col("payload").cast("string").alias("page")
        )
        extracted = F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("page"), "<script[^>]*>[^<]*</script>", " "
                    ),
                    "<[^>]+>", " ",
                ),
                "[ \\t\\r\\n]+", " ",
            )
        )
        cleaned = raw.select(
            F.col("target_uri").alias("url"), extracted.alias("extracted")
        )
        ranked = cleaned.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("extracted").orderBy("url")
            ),
        )
        rows = (
            ranked.select(
                "url",
                F.size(F.split("extracted", " ", -1))
                .cast("bigint")
                .alias("n_tokens"),
                (F.col("rk") == 1).alias("is_kept"),
            )
            .orderBy("url")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "url STRING, n_tokens BIGINT, is_kept BOOLEAN"
    ).orderBy("url")


@query(
    "q216_declarative_filter_pipeline",
    oracle="""
    WITH checked AS (
      SELECT doc_id,
             length(text) >= 50 AS r1,
             length(text) <= 100000 AS r2,
             lang IN ('en', 'de', 'fr') AS r3,
             length(regexp_replace(text, '[^0-9]', '', 'g'))
               <= 0.3 * length(text) AS r4,
             len(list_filter(string_split(text, ' '),
                             w -> length(w) > 0)) >= 5 AS r5
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN NOT r3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lang_dropped,
           CAST(sum(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_too_short
    FROM checked
    """,
)
def q216_declarative_filter_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Config-driven corpus filtering under the driver's hash gate
    (operators/dedup.py:build_filter_pipeline): five rules from a
    declarative spec — length bounds, language allowlist, digit
    ratio, minimum word count — compile into ONE fused codegen'd
    predicate (one scan, not five), the C4/FineWeb cleaning shape
    where the rule list is reviewable config. The oracle recomputes
    each rule independently and cross-checks the kept count plus
    per-rule drop attributions."""
    from distcpplus_spark.operators.dedup import build_filter_pipeline

    docs = load_table(spark, sf_dir, "documents")
    rules = [
        {"type": "min_len", "col": "text", "value": 50},
        {"type": "max_len", "col": "text", "value": 100_000},
        {"type": "lang_in", "col": "lang", "values": ["en", "de", "fr"]},
        {"type": "max_digit_ratio", "col": "text", "value": 0.3},
        {"type": "min_words", "col": "text", "value": 5},
    ]
    pred, _desc = build_filter_pipeline(rules)
    lang_ok = F.col("lang").isin(["en", "de", "fr"])
    too_short = F.length("text") < 50
    return docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum(F.when(~lang_ok, 1).otherwise(0))
        .cast("bigint")
        .alias("n_lang_dropped"),
        F.sum(F.when(too_short, 1).otherwise(0))
        .cast("bigint")
        .alias("n_too_short"),
    )


@query(
    "q219_xml_dump_ingestion",
    oracle="""
    SELECT 'Article_' || f || '_' || j AS title,
           CAST(1000 * f + j AS BIGINT) AS page_id,
           md5('Body of article ' || f || '-' || j || '.') AS text_md5
    FROM range(0, 3) t(f), LATERAL unnest(range(0, 25)) u(j)
    ORDER BY title
    """,
)
def q219_xml_dump_ingestion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MediaWiki-dump-style XML ingestion under the driver's hash
    gate (sources/xml_src.py): three bz2-compressed XML shards with
    namespaced <page> records stream through iterparse in executor
    tasks — title, nested revision/text, and id extracted per
    record, every value verified via closed forms / md5. The
    Wikipedia-dump shape: file-per-task parallelism, element-level
    streaming (elem.clear() bounds memory on multi-GB documents),
    namespace-agnostic matching. Fresh temp dir per invocation."""
    import bz2 as _bz2
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.xml_src import read_xml

    root = _tf.mkdtemp(prefix="q219_xml_")
    try:
        for fidx in range(3):
            pages = []
            for j in range(25):
                pages.append(
                    f"<page><title>Article_{fidx}_{j}</title>"
                    f"<id>{1000 * fidx + j}</id>"
                    f"<revision><text>Body of article {fidx}-{j}."
                    f"</text></revision></page>"
                )
            doc = (
                '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">'
                + "".join(pages)
                + "</mediawiki>"
            ).encode()
            with open(_os.path.join(root, f"dump{fidx}.xml.bz2"), "wb") as f:
                f.write(_bz2.compress(doc))
        rows = (
            read_xml(
                spark, root, "page",
                {"title": "title", "page_id": "id",
                 "text": "revision/text"},
            )
            .selectExpr(
                "title",
                "CAST(page_id AS BIGINT) AS page_id",
                "md5(CAST(text AS BINARY)) AS text_md5",
            )
            .orderBy("title")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "title STRING, page_id BIGINT, text_md5 STRING"
    ).orderBy("title")


@query(
    "q220_bm25_ranking",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks
      FROM documents WHERE doc_id < 300
    ),
    dl AS (
      SELECT doc_id,
             len(list_filter(toks, t -> t <> '')) AS dlen
      FROM docs
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(dlen) AS avgdl FROM dl
    ),
    terms AS (SELECT unnest(['the', 'data', 'model']) AS term),
    tf AS (
      SELECT d.doc_id, t.term,
             len(list_filter(d.toks, x -> x = t.term)) AS f
      FROM docs d, terms t
    ),
    df AS (
      SELECT term, sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS dfreq
      FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln((s.n_docs - df.dfreq + 0.5) / (df.dfreq + 0.5) + 1)
               * tf.f * 2.2
               / (tf.f + 1.2 * (0.25 + 0.75 * dl.dlen / s.avgdl))
             ) AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats s
      WHERE tf.f > 0
      GROUP BY tf.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(round(score, 4) AS DOUBLE) AS bm25_4
    FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
                 AS rk
      FROM scored
    )
    WHERE rk <= 20
    ORDER BY bm25_4 DESC, doc_id
    """,
)
def q220_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking under the driver's hash gate — the
    classic retrieval scorer beside q170's dense-cosine path:
    Robertson/Sparck-Jones idf with the k1=1.2, b=0.75 Okapi term
    saturation, corpus stats (N, avgdl) as broadcast scalars,
    term frequencies from one explode + filter pass. Rank ties
    break on rounded score THEN doc_id on both engines (the
    round-then-rank discipline), top-20 returned. At 100 TB the
    per-(doc, term) frame shuffles on doc_id only; query terms are
    plan constants."""
    from distcpplus_spark.queries import small_sort

    terms = ["the", "data", "model"]
    k1, b = 1.2, 0.75
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id", F.split(F.lower("text"), " ", -1).alias("toks")
        )
    )
    dl = docs.select(
        "doc_id",
        F.size(
            F.filter(F.col("toks"), lambda t: t != "")
        ).alias("dlen"),
        "toks",
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dlen").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    def _term_count(term):
        # single-arg lambda: a two-parameter lambda would be treated
        # as (element, index) by the higher-order filter
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    tf = dl.select(
        "doc_id",
        "dlen",
        *[
            _term_count(t).alias(f"_f_{i}")
            for i, t in enumerate(terms)
        ],
    )
    dfreqs = tf.agg(
        *[
            F.sum(F.when(F.col(f"_f_{i}") > 0, 1).otherwise(0)).alias(
                f"_df_{i}"
            )
            for i in range(len(terms))
        ]
    ).collect()[0]
    import math

    score = None
    for i in range(len(terms)):
        dfreq = int(dfreqs[f"_df_{i}"])
        idf = math.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1)
        fcol = F.col(f"_f_{i}")
        part = (
            F.lit(idf)
            * fcol
            * (k1 + 1.0)
            / (fcol + k1 * (1 - b + b * F.col("dlen") / F.lit(avgdl)))
        )
        part = F.when(fcol > 0, part).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    scored = tf.withColumn("score", score).filter(F.col("score") > 0)
    # top-k via orderBy().limit(): TakeOrderedAndProject keeps a
    # 20-row heap per partition and merges on the driver — the one
    # global ordering Spark does scale-safely, vs a partition-less
    # row_number window that funnels every scored row into one task
    return (
        scored.orderBy(F.desc(F.round("score", 4)), F.asc("doc_id"))
        .limit(20)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.round("score", 4).alias("bm25_4"),
        )
        .transform(small_sort, F.desc("bm25_4"), "doc_id")
    )


@query(
    "q224_warc_splittable_read",
    oracle="""
    SELECT 'http://shard.example/page' || j AS target_uri,
           CAST(length('<html>large doc ' || j || ' ' ||
                repeat('x', 20 + j % 7) || '</html>') AS BIGINT)
               AS n_bytes,
           md5('<html>large doc ' || j || ' ' ||
               repeat('x', 20 + j % 7) || '</html>') AS body_md5
    FROM range(0, 48) t(j)
    ORDER BY target_uri
    """,
)
def q224_warc_splittable_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splittable WARC under the driver's hash gate: ONE .warc.gz
    shard (48 gzip-member records — the shape where file-per-task
    parallelism collapses to a single task) is offset-indexed
    (index_warc, the cdx-style pass) and then read back as many
    whole-member byte-range splits (read_warc_indexed, split_bytes
    tiny here to force real splitting). Byte length + md5 of every
    body must match DuckDB's closed forms — any span mis-tile or
    mid-member split corrupts a record and breaks the hash."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.warc import (
        build_warc,
        index_warc,
        read_warc_indexed,
    )

    root = _tf.mkdtemp(prefix="q224_warc_")
    try:
        recs = [
            (
                "response",
                f"http://shard.example/page{j}",
                "2024-01-01T00:00:00Z",
                f"<urn:uuid:{j}>",
                "application/http;msgtype=response",
                b"HTTP/1.1 200 OK\r\n\r\n"
                + f"<html>large doc {j} {'x' * (20 + j % 7)}</html>".encode(),
            )
            for j in range(48)
        ]
        with open(_os.path.join(root, "shard.warc.gz"), "wb") as fh:
            fh.write(build_warc(recs))
        idx = index_warc(spark, root)
        rows = (
            read_warc_indexed(spark, idx, split_bytes=500)
            .select(
                "target_uri",
                F.length("payload").cast("bigint").alias("n_bytes"),
                F.md5("payload").alias("body_md5"),
            )
            .orderBy("target_uri")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "target_uri STRING, n_bytes BIGINT, body_md5 STRING"
    ).orderBy("target_uri")


@query(
    "q226_unicode_nfc_normalize",
    oracle="""
    WITH decomposed AS (
      SELECT doc_id,
             replace(substr(text, 1, 80), 'e',
                     'e' || chr(769)) AS messy
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(length(messy) AS BIGINT) AS len_messy,
           CAST(length(nfc_normalize(messy)) AS BIGINT) AS len_nfc,
           md5(nfc_normalize(messy)) AS nfc_md5
    FROM decomposed ORDER BY doc_id
    """,
)
def q226_unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the corpus-cleanup step that makes
    dedup hashing and tokenizer vocabularies stable across sources
    that encode the same glyph differently (decomposed e+U+0301 vs
    precomposed U+00E9). Decomposed text is synthesized
    deterministically on both engines; Spark normalizes via an
    Arrow-batched pandas UDF over Python's unicodedata (a declared
    slow-path — normalization tables aren't in Spark's built-ins;
    the UDF is vectorized per batch, not per row) and DuckDB's
    nfc_normalize must agree byte-for-byte (md5). Char counts before
    and after pin the combining-mark composition."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x)
            if x is not None
            else None
        )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.regexp_replace(
                F.substring("text", 1, 80), "e", "é"
            ).alias("messy"),
        )
    )
    return (
        docs.select(
            "doc_id",
            F.length("messy").cast("bigint").alias("len_messy"),
            F.length(nfc("messy")).cast("bigint").alias("len_nfc"),
            F.md5(nfc("messy").cast("binary")).alias("nfc_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "q227_per_domain_cap",
    oracle="""
    SELECT source, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= 25
    ORDER BY source, n_chars DESC, doc_id
    """,
)
def q227_per_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — web-corpus hygiene against domain
    dominance (a handful of boilerplate-heavy sites otherwise swamp
    the mixture): keep the top N docs per source by a deterministic
    quality proxy (n_chars, doc_id tiebreak). The window partitions
    by SOURCE, so Catalyst plans WindowGroupLimit — each partition's
    rank filter prunes to N rows BEFORE the shuffle completes; no
    global ordering anywhere, scale-safe at any domain count."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    w = W.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 25)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", F.desc("n_chars"), "doc_id")
    )


def _logreg_oracle(iters: int = 3) -> str:
    sig = "1.0 / (1.0 + exp(-(w.b + w.w1 * s.f1 + w.w2 * s.f2)))"
    parts = ["""
    WITH f AS (
      SELECT least(n_chars / 500.0, 1.0) AS x1,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2,
             CAST(lang = 'en' AS INT) AS y
      FROM documents
    ),
    st AS (
      SELECT avg(x1) AS mu1,
             CASE WHEN stddev_pop(x1) = 0 THEN 1.0
                  ELSE stddev_pop(x1) END AS sd1,
             avg(x2) AS mu2,
             CASE WHEN stddev_pop(x2) = 0 THEN 1.0
                  ELSE stddev_pop(x2) END AS sd2,
             count(*) AS n
      FROM f
    ),
    s AS MATERIALIZED (
      SELECT (x1 - mu1) / sd1 AS f1, (x2 - mu2) / sd2 AS f2,
             CAST(y AS DOUBLE) AS y, n
      FROM f, st
    ),
    w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS b)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    w{i} AS (
      SELECT w.w1 - 0.5 * (sum(({sig} - s.y) * s.f1) / max(s.n)) AS w1,
             w.w2 - 0.5 * (sum(({sig} - s.y) * s.f2) / max(s.n)) AS w2,
             w.b - 0.5 * (sum({sig} - s.y) / max(s.n)) AS b
      FROM s CROSS JOIN w{i - 1} w
      GROUP BY w.w1, w.w2, w.b
    )""")
    return "".join(parts) + f"""
    SELECT CAST(round(w1, 5) AS DOUBLE) AS w_len,
           CAST(round(w2, 5) AS DOUBLE) AS w_stopword,
           CAST(round(b, 5) AS DOUBLE) AS bias,
           (SELECT CAST(n AS BIGINT) FROM st) AS n_rows
    FROM w{iters}
    """


@query("q237_logreg_gd_training", oracle=_logreg_oracle())
def q237_logreg_gd_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression TRAINING under the driver's
    hash gate (x22 stays the longer rows-only run): 3 batch
    gradient-descent iterations on quality features with a weak
    is-English label (operators/classifier.py::logreg_train — one
    gradient aggregation per round, model as driver literals). The
    oracle unrolls the same 3 rounds as weight-threading CTEs — the
    q236 trick applied to FLOAT iteration; features are exact
    rational arithmetic on both engines and aggregation noise is
    ~1e-15, so round-5 weights hash-match."""
    from distcpplus_spark.functions.text import quality_score_cols
    from distcpplus_spark.operators.classifier import logreg_train

    docs = load_table(spark, sf_dir, "documents")
    ls, sr, _pr = quality_score_cols(F.col("text"), F.col("n_chars"))
    feats = docs.select(
        ls.alias("len_score"),
        sr.alias("stopword_ratio"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    model = logreg_train(
        feats, ["len_score", "stopword_ratio"], "label", iters=3, lr=0.5
    )
    return spark.createDataFrame(
        [(
            round(model["weights"][0], 5),
            round(model["weights"][1], 5),
            round(model["bias"], 5),
            model["n"],
        )],
        "w_len DOUBLE, w_stopword DOUBLE, bias DOUBLE, n_rows BIGINT",
    )


@query(
    "q242_weighted_reservoir_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             round(pow(
               ((doc_id * 2654435761 + 1013904223) % 1000000 + 1)
                 / 1000001.0,
               1.0 / n_chars), 9) AS k
      FROM documents
    )
    SELECT doc_id, n_chars
    FROM (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY k DESC, doc_id) AS rn
      FROM keyed
    )
    WHERE rn <= 50
    ORDER BY doc_id
    """,
)
def q242_weighted_reservoir_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis reservoir key u^(1/w) — q114 samples Bernoulli
    per-row (variable output size); this draws EXACTLY k=50 docs
    with probability proportional to length. Determinism and
    cross-engine parity come from the repo's integer-mixer uniform
    (no RNG) and a round-9 key so a last-ulp pow() divergence can't
    flip a rank; ties (if rounding makes any) break on doc_id. The
    engine-side top-k is orderBy().limit() — TakeOrderedAndProject's
    per-partition 50-row heap, the scale-safe global selection —
    while the window formulation stays in the ORACLE where
    single-node is fine."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223))
        % 1000000
        + 1
    ) / 1000001.0
    k = F.round(F.pow(u, 1.0 / F.col("n_chars")), 9)
    return (
        docs.select("doc_id", "n_chars", k.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "q245_python_datasource_warc",
    oracle="""
    SELECT 'http://pyds.example/page' || j AS target_uri,
           CAST(length('<html>pyds doc ' || j || '</html>') AS BIGINT)
               AS n_bytes,
           md5('<html>pyds doc ' || j || '</html>') AS body_md5
    FROM range(0, 30) t(j)
    ORDER BY target_uri
    """,
)
def q245_python_datasource_warc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Spark 4 Python DataSource API as a first-class engine
    surface (sources/pyds.py): WARC registered as
    ``spark.read.format("warc")`` with index-driven whole-member
    byte-range partitions (split_bytes option — a single shard plans
    as many InputPartitions), read under the driver's hash gate.
    Same closed-form fingerprints as q195/q224, different
    integration layer: this is the extension point SQL ``USING``
    clauses and option plumbing flow through."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.pyds import register_python_sources
    from distcpplus_spark.sources.warc import build_warc

    register_python_sources(spark)
    root = _tf.mkdtemp(prefix="q245_pyds_")
    try:
        recs = [
            (
                "response",
                f"http://pyds.example/page{j}",
                "2024-01-01T00:00:00Z",
                f"<urn:uuid:{j}>",
                "application/http;msgtype=response",
                b"HTTP/1.1 200 OK\r\n\r\n"
                + f"<html>pyds doc {j}</html>".encode(),
            )
            for j in range(30)
        ]
        with open(_os.path.join(root, "shard.warc.gz"), "wb") as fh:
            fh.write(build_warc(recs))
        rows = (
            spark.read.format("warc")
            .option("split_bytes", "400")
            .load(root)
            .select(
                "target_uri",
                F.length("payload").cast("bigint").alias("n_bytes"),
                F.md5("payload").alias("body_md5"),
            )
            .orderBy("target_uri")
            .collect()
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "target_uri STRING, n_bytes BIGINT, body_md5 STRING"
    ).orderBy("target_uri")


@query(
    "q246_column_encryption",
    oracle="""
    SELECT doc_id,
           md5(text) AS plain_md5,
           CAST(1 AS BOOLEAN) AS roundtrip_ok,
           CAST(1 AS BOOLEAN) AS ciphertext_differs
    FROM documents WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def q246_column_encryption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption at rest for PII/text columns —
    Spark's built-in aes_encrypt/aes_decrypt (AES-128-GCM, JVM-side,
    codegen) under a verification CONTRACT: GCM's random IV makes
    ciphertext non-deterministic (so it can't hash cross-engine —
    and MUST not: IV reuse is the classic GCM break), so the gate
    checks decrypt(encrypt(x)) == x per row plus
    ciphertext != plaintext, against the oracle's plaintext md5."""
    key = "0123456789abcdef"  # 16 bytes -> AES-128
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    enc = docs.withColumn(
        "ct",
        F.aes_encrypt(F.col("text").cast("binary"), F.lit(key), F.lit("GCM")),
    )
    out = enc.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("plain_md5"),
        (
            F.aes_decrypt("ct", F.lit(key), F.lit("GCM")).cast("string")
            == F.col("text")
        ).alias("roundtrip_ok"),
        (F.col("ct").cast("string") != F.col("text")).alias(
            "ciphertext_differs"
        ),
    )
    return out.orderBy("doc_id")
