"""Round-2 LLM-data-pipeline operators: the corpus-hygiene pass a
training-data pipeline runs between raw scrape and tokenization —
repetition filtering (Gopher-style), PII redaction, benchmark
contamination checks, domain mixing, and batch length-bucketing.

Everything is expressed with engine-portable primitives (string_split
/ list_transform ↔ split/transform, regexp on an RE2-compatible
subset) so the DuckDB oracle computes bit-identical results, and every
query is a real scale shape: per-doc work is a projection, corpus
aggregates are hash aggregations, the contamination check is an
explode → semi-join — never an all-pairs scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import query, small_sort


@query(
    "q106_repeated_ngram_filter",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             list_transform(
               range(1, len(string_split(text, ' '))),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i + 1]
             ) AS bigrams
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2 AND doc_id < 300
    )
    SELECT doc_id,
           CAST(len(bigrams) AS BIGINT) AS n_bigrams,
           CAST(round(1.0 - len(list_distinct(bigrams)) /
                CAST(len(bigrams) AS DOUBLE), 6) AS DOUBLE) AS dup_frac,
           CAST(1.0 - len(list_distinct(bigrams)) /
                CAST(len(bigrams) AS DOUBLE) > 0.2 AS BOOLEAN) AS flagged
    FROM grams
    ORDER BY doc_id
    """,
)
def q106_repeated_ngram_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: fraction of duplicated word
    bigrams per document; docs above 20% get flagged. Pure projection
    per doc (split → slide → distinct) — embarrassingly parallel, no
    shuffle before the final sort."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = F.split(F.col("text"), " ", -1)
    bigrams = F.expr(
        "transform(sequence(1, size(split(text, ' ', -1)) - 1), "
        "i -> concat(element_at(split(text, ' ', -1), i), ' ', "
        "element_at(split(text, ' ', -1), i + 1)))"
    )
    out = (
        docs.filter(F.size(toks) >= 2)
        .select("doc_id", bigrams.alias("bigrams"))
        .select(
            "doc_id",
            F.size("bigrams").cast("bigint").alias("n_bigrams"),
            F.round(
                1.0
                - F.size(F.array_distinct("bigrams"))
                / F.size("bigrams").cast("double"),
                6,
            ).alias("dup_frac"),
            (
                1.0
                - F.size(F.array_distinct("bigrams"))
                / F.size("bigrams").cast("double")
                > 0.2
            ).alias("flagged"),
        )
    )
    return out.orderBy("doc_id")


_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@query(
    "q107_pii_redaction",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
                          THEN ' contact: user' || doc_id || '@example.com'
                          ELSE '' END AS t
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RX}')) AS BIGINT)
               AS n_emails,
           CAST(length(regexp_replace(t, '{_EMAIL_RX}', '<EMAIL>', 'g'))
               AS BIGINT) AS redacted_len
    FROM synth
    ORDER BY doc_id
    """,
)
def q107_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email addresses (RE2-compatible
    pattern so Java regex and DuckDB agree byte-for-byte). Emails are
    planted deterministically on doc_id % 7 == 0 so the query has
    non-trivial hits on both engines. Pure per-row projection."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
    )
    return (
        docs.select(
            "doc_id",
            F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RX), 0))
            .cast("bigint")
            .alias("n_emails"),
            F.length(F.regexp_replace(t, _EMAIL_RX, "<EMAIL>"))
            .cast("bigint")
            .alias("redacted_len"),
        )
        .orderBy("doc_id")
    )


@query(
    "q108_contamination_check",
    oracle="""
    WITH bench AS (
      SELECT DISTINCT g.gram
      FROM documents d,
           unnest(list_transform(
             range(1, len(string_split(d.text, ' '))),
             i -> string_split(d.text, ' ')[i] || ' ' ||
                  string_split(d.text, ' ')[i + 1]
           )) AS g(gram)
      WHERE d.doc_id % 41 = 0 AND len(string_split(d.text, ' ')) >= 2
    ),
    corpus AS (
      SELECT d.doc_id, g.gram
      FROM documents d,
           unnest(list_transform(
             range(1, len(string_split(d.text, ' '))),
             i -> string_split(d.text, ' ')[i] || ' ' ||
                  string_split(d.text, ' ')[i + 1]
           )) AS g(gram)
      WHERE d.doc_id % 41 != 0 AND d.doc_id < 200
        AND len(string_split(d.text, ' ')) >= 2
    )
    SELECT c.doc_id,
           CAST(count(DISTINCT c.gram) FILTER (b.gram IS NOT NULL)
                AS BIGINT) AS n_contaminated
    FROM corpus c LEFT JOIN bench b ON c.gram = b.gram
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
)
def q108_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: per training doc, how many of
    its distinct word bigrams appear in a held-out benchmark set
    (doc_id % 41 == 0 stands in for the eval suite).

    Scale shape: explode to (doc, gram), hash-join against the
    DISTINCT benchmark gram set (small → broadcast), aggregate per
    doc. At 100 TB the gram sets would be 64-bit hashes, the join key
    stays narrow, and nothing is all-pairs.
    """
    docs = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(sequence(1, size(split(text, ' ', -1)) - 1), "
        "i -> concat(element_at(split(text, ' ', -1), i), ' ', "
        "element_at(split(text, ' ', -1), i + 1)))"
    )
    # guard: a 1-token doc makes sequence(1, 0) a DESCENDING [1, 0]
    # array and element_at(toks, 2) aborts the job — filter first,
    # matching the oracle's empty range() for such docs
    has_bigrams = F.size(F.split("text", " ", -1)) >= 2
    bench = (
        docs.filter((F.col("doc_id") % 41 == 0) & has_bigrams)
        .select(F.explode(bigrams).alias("gram"))
        .distinct()
    )
    corpus = (
        docs.filter(
            (F.col("doc_id") % 41 != 0) & (F.col("doc_id") < 200) & has_bigrams
        )
        .select("doc_id", F.explode(bigrams).alias("gram"))
    )
    hit = F.when(F.col("b_gram").isNotNull(), F.col("gram"))
    return (
        corpus.join(
            F.broadcast(bench.select(F.col("gram").alias("b_gram"))),
            corpus["gram"] == F.col("b_gram"),
            "left",
        )
        .groupBy("doc_id")
        .agg(F.countDistinct(hit).alias("n_contaminated"))
        .transform(small_sort, "doc_id")
    )


@query(
    "q109_domain_mix_weights",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_docs) AS total, count(*) AS n_sources FROM counts)
    SELECT source, n_docs, n_chars,
           CAST(round(n_docs / CAST(total AS DOUBLE), 6) AS DOUBLE)
               AS actual_share,
           CAST(round((1.0 / n_sources) /
                (n_docs / CAST(total AS DOUBLE)), 6) AS DOUBLE)
               AS sample_weight
    FROM counts, tot
    ORDER BY source
    """,
)
def q109_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-source share of the corpus and the
    sampling weight that rebalances to a uniform target mix — the
    planning step before weighted sampling in a data-mixture pipeline.
    One hash aggregate + a broadcast scalar; the per-doc weighted
    sample itself is q80's hash-split pattern."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    tot = counts.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_sources")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(F.col("n_docs") / F.col("total").cast("double"), 6).alias(
                "actual_share"
            ),
            F.round(
                (1.0 / F.col("n_sources"))
                / (F.col("n_docs") / F.col("total").cast("double")),
                6,
            ).alias("sample_weight"),
        )
        .transform(small_sort, "source")
    )


@query(
    "q110_length_bucket_batches",
    oracle="""
    WITH toks AS (
      SELECT doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT CAST(least(floor(n_tokens / 64), 16) AS BIGINT) AS len_bucket,
             n_tokens
      FROM toks
    )
    SELECT len_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(ceil(sum(n_tokens) / 2048.0) AS BIGINT) AS est_batches
    FROM bucketed
    GROUP BY len_bucket
    ORDER BY len_bucket
    """,
)
def q110_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing for batch assembly: group docs into token-
    length buckets (64-token steps, capped) and estimate 2048-token
    batches per bucket — the histogram that drives bucketed batching
    (minimizes padding waste vs random batching). Single hash
    aggregate; the bucket id is a projection."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.ceil(F.col("n_chars") / 4.0).cast("bigint")
    return (
        docs.select(
            F.least(F.floor(n_tokens / 64), F.lit(16))
            .cast("bigint")
            .alias("len_bucket"),
            n_tokens.alias("n_tokens"),
        )
        .groupBy("len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / 2048.0).cast("bigint").alias("est_batches"),
        )
        .transform(small_sort, "len_bucket")
    )


@query(
    "q111_vocab_coverage",
    oracle="""
    WITH tok AS (
      SELECT g.tok
      FROM documents d, unnest(string_split(d.text, ' ')) AS g(tok)
      WHERE d.doc_id < 300 AND g.tok != ''
    ),
    freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n
      FROM tok GROUP BY tok
    ),
    ranked AS (
      SELECT tok, n,
             CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rnk,
             CAST(sum(n) OVER (ORDER BY n DESC, tok
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM freq
    ),
    tot AS (SELECT sum(n) AS total FROM freq)
    SELECT rnk, tok, n,
           CAST(round(cum / CAST(total AS DOUBLE), 6) AS DOUBLE) AS coverage
    FROM ranked, tot
    WHERE rnk <= 100
    ORDER BY rnk
    """,
)
def q111_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: top-100 tokens by frequency with the
    cumulative corpus-coverage curve — the sizing step before training
    a tokenizer (how much of the corpus does a 32k vocab cover?).

    Scale shape: explode → hash aggregate per token; the coverage
    cumulative runs through partitioned_running_agg (rank-block
    buckets), so even a 10M-term vocabulary never serializes into one
    task; the final rank over the 100 surviving rows runs through
    distributed_ranks' prefix sums — zero partition-less Windows
    anywhere (the registry-wide window-audit whitelist is empty).
    """
    from distcpplus_spark.operators.scale import (
        distributed_ranks,
        partitioned_running_agg,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    freq = (
        docs.select(F.explode(F.split("text", " ", -1)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    # global rank: top-101 is tiny — TakeOrderedAndProject bound, then
    # a driver-bounded window is fine; the COVERAGE cumulative over the
    # full vocabulary is the part that must stay distributed.
    total = freq.agg(F.sum("n")).collect()[0][0]
    cum = partitioned_running_agg(
        freq.withColumn("_negn", -F.col("n")),
        ["_negn", "tok"],
        "n",
        "cum",
        bucket=F.least(
            F.floor(F.log2(F.greatest(F.col("n"), F.lit(1))) * -1)
            + F.lit(64),
            F.lit(127),
        ).cast("bigint"),
    )
    top = distributed_ranks(
        cum.orderBy("_negn", "tok").limit(100),
        order=[("_negn", True), ("tok", True)],
        row_number_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("bigint"))
    return (
        top.select(
            "rnk",
            "tok",
            "n",
            F.round(F.col("cum") / F.lit(float(total)), 6).alias("coverage"),
        )
        .orderBy("rnk")
    )


@query(
    "q112_char_entropy_filter",
    oracle="""
    WITH chars AS (
      SELECT d.doc_id, g.ch
      FROM documents d,
           unnest(string_split_regex(d.text, '')) AS g(ch)
      WHERE d.doc_id < 200 AND g.ch != ''
    ),
    freq AS (
      SELECT doc_id, ch, count(*) AS n
      FROM chars GROUP BY doc_id, ch
    ),
    tot AS (
      SELECT doc_id, sum(n) AS total FROM freq GROUP BY doc_id
    ),
    ent AS (
      SELECT f.doc_id,
             -sum((f.n / CAST(t.total AS DOUBLE)) *
                  log2(f.n / CAST(t.total AS DOUBLE))) AS h
      FROM freq f JOIN tot t USING (doc_id)
      GROUP BY f.doc_id
    )
    SELECT doc_id, CAST(round(h, 6) AS DOUBLE) AS char_entropy,
           CAST(h < 3.0 AS BOOLEAN) AS low_entropy_flag
    FROM ent
    ORDER BY doc_id
    """,
)
def q112_char_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality filter: Shannon entropy of the
    per-document character distribution; very low entropy marks
    boilerplate/repeated-char junk (the cheap perplexity proxy in
    corpus filtering). Explode → per-(doc,char) counts → per-doc
    entropy; at 100 TB the explode shuffles (doc_id, char) pairs —
    or moves into a pandas UDF per row with identical semantics."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).filter(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window as W

    tot = W.partitionBy("doc_id")
    p = F.col("n") / F.sum("n").over(tot).cast("double")
    ent = (
        freq.withColumn("_term", -p * F.log2(p))
        .groupBy("doc_id")
        .agg(F.sum("_term").alias("h"))
    )
    return (
        ent.select(
            "doc_id",
            F.round("h", 6).alias("char_entropy"),
            (F.col("h") < 3.0).alias("low_entropy_flag"),
        )
        .orderBy("doc_id")
    )


@query(
    "q113_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views_d AS (
      SELECT user_id, ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id, CAST(p.user_id AS BIGINT) AS user_id,
           v.view_event_id, v.ts AS view_ts
    FROM purchases p ASOF LEFT JOIN views_d v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def q113_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (operators.asof): each purchase matched to the
    user's most recent view at or before it — the point-in-time
    attribution/feature-store join. DuckDB checks it with its native
    ASOF LEFT JOIN; Spark runs the union-tag single-shuffle plan (no
    range-join explosion). The view side is pre-aggregated to one row
    per (user, ts) so duplicate match keys can't make the choice
    implementation-defined on either engine."""
    from distcpplus_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(purchases, views, on="user_id", left_ts="ts", right_ts="ts")
    return (
        out.select(
            "event_id",
            "user_id",
            "view_event_id_asof",
            F.col("ts_asof").alias("view_ts"),
        )
        .withColumnRenamed("view_event_id_asof", "view_event_id")
        .orderBy("event_id")
    )


@query(
    "q114_weighted_sample",
    oracle="""
    WITH counts AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n) AS total, count(*) AS n_sources FROM counts),
    w AS (
      SELECT source,
             (1.0 / n_sources) / (n / CAST(total AS DOUBLE)) AS weight
      FROM counts, tot
    )
    SELECT d.doc_id, d.source,
           CAST(round(least(1.0, 0.5 * w.weight), 6) AS DOUBLE) AS p_keep
    FROM documents d JOIN w USING (source)
    WHERE (d.doc_id * 2654435761) % 1000000 / 1000000.0
          < least(1.0, 0.5 * w.weight)
    ORDER BY d.doc_id
    """,
)
def q114_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling — q109's domain-mix weights
    actually applied: keep each doc with probability
    min(1, base_rate × source_weight), decided by a deterministic
    integer mixer on doc_id (identical modular arithmetic on both
    engines — no RNG, so reruns and engines agree row-for-row).
    Distribution shape: broadcast the per-source weight table, filter
    is a projection; no shuffle beyond the weight aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    tot = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_sources")
    )
    w = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            (1.0 / F.col("n_sources"))
            / (F.col("n") / F.col("total").cast("double"))
        ).alias("weight"),
    )
    p_keep = F.least(F.lit(1.0), 0.5 * F.col("weight"))
    u = (F.col("doc_id") * F.lit(2654435761)) % 1000000 / 1000000.0
    return (
        docs.join(F.broadcast(w), "source")
        .filter(u < p_keep)
        .select("doc_id", "source", F.round(p_keep, 6).alias("p_keep"))
        .orderBy("doc_id")
    )


@query(
    "q115_training_order_shuffle",
    oracle="""
    WITH mixed AS (
      SELECT doc_id,
             (doc_id * 2654435761 + 1013904223) % 100000000 AS mix
      FROM documents
    ),
    placed AS (
      SELECT doc_id, mix % 8 AS shard,
             row_number() OVER (PARTITION BY mix % 8
                                ORDER BY mix, doc_id) AS pos
      FROM mixed
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(pos) AS BIGINT) AS max_pos
    FROM placed
    GROUP BY shard
    ORDER BY shard
    """,
)
def q115_training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: an LCG mix of doc_id
    assigns every document a shard and an in-shard position — the
    reproducible 'random' order a training run reads, without any RNG
    state. Each shard orders independently (partitioned window), so
    the shuffle scales linearly in shards; summarized per shard for
    the oracle.

    Overflow note: the multiplier is chosen so doc_id * 2654435761
    stays far inside signed 64-bit at any realistic doc count — both
    engines run ANSI overflow-checked arithmetic, so wrapping LCG
    constants would abort, not wrap."""
    docs = load_table(spark, sf_dir, "documents")
    mix = (
        F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223)
    ) % 100000000
    from pyspark.sql.window import Window as W

    placed = docs.select(
        "doc_id", mix.alias("mix"), (mix % 8).alias("shard")
    ).withColumn(
        "pos",
        F.row_number().over(W.partitionBy("shard").orderBy("mix", "doc_id")),
    )
    return (
        placed.groupBy(F.col("shard").cast("bigint").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("pos").cast("bigint").alias("max_pos"),
        )
        .transform(small_sort, "shard")
    )


_BPE_RX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@query(
    "q119_bpe_regex_tokenizer",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RX}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len(list_filter(regexp_extract_all(text, '{_BPE_RX}'),
                t -> t ~ '^[A-Za-z]+$')) AS BIGINT) AS n_word_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_RX}')))
               AS BIGINT) AS n_unique
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def q119_bpe_regex_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenization (the GPT-2-style split: letter
    runs, single digits, punctuation runs-of-one) — the step before
    byte-pair merges, whose token counts drive packing and cost
    estimates. Same RE2-compatible pattern on both engines; pure
    projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RX), 0)
    words = F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))
    return (
        docs.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_bpe_tokens"),
            F.size(words).cast("bigint").alias("n_word_tokens"),
            F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
        )
        .orderBy("doc_id")
    )


@query(
    "q128_temperature_domain_mix",
    oracle="""
    WITH counts AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_docs) AS total FROM counts),
    scaled AS (
      SELECT source, n_docs,
             pow(n_docs / CAST(total AS DOUBLE), 1.0 / 2.0) AS raw_w
      FROM counts, tot
    ),
    norm AS (SELECT sum(raw_w) AS z FROM scaled)
    SELECT s.source,
           CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(round(s.n_docs / CAST(t.total AS DOUBLE), 6) AS DOUBLE)
               AS natural_share,
           CAST(round(s.raw_w / n.z, 6) AS DOUBLE) AS temp_share,
           CAST(round(least(1.0, (s.raw_w / n.z) * t.total * 0.5 / s.n_docs),
                      6) AS DOUBLE) AS sample_rate
    FROM scaled s, tot t, norm n
    ORDER BY s.source
    """,
)
def q128_temperature_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-LM sampling
    rule): domain share ∝ (natural share)^(1/T) with T=2 — upweights
    tail domains without flattening to uniform (T=∞ would be q109's
    uniform target; T=1 is the natural mix). Emits, per source, the
    natural and temperature shares plus the per-doc sampling rate that
    realizes the mix inside a 50%-of-corpus token budget. All driver
    math on a per-source aggregate — the only distributed work is one
    partial-aggregated count, so the planning step costs one scan at
    any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("total"))
    scaled = counts.crossJoin(F.broadcast(tot)).withColumn(
        "raw_w",
        F.pow(F.col("n_docs") / F.col("total").cast("double"), 1.0 / 2.0),
    )
    norm = scaled.agg(F.sum("raw_w").alias("z"))
    temp_share = F.col("raw_w") / F.col("z")
    return (
        scaled.crossJoin(F.broadcast(norm))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(
                F.col("n_docs") / F.col("total").cast("double"), 6
            ).alias("natural_share"),
            F.round(temp_share, 6).alias("temp_share"),
            F.round(
                F.least(
                    F.lit(1.0),
                    temp_share * F.col("total") * 0.5 / F.col("n_docs"),
                ),
                6,
            ).alias("sample_rate"),
        )
        .transform(small_sort, "source")
    )


@query(
    "q131_dedup_best_representative",
    oracle="""
    WITH scored AS (
      SELECT doc_id, md5(substr(text, 1, 40)) AS text_hash,
             len(text) - 2 * abs(len(text) - 500) AS quality,
             row_number() OVER (
               PARTITION BY md5(substr(text, 1, 40))
               ORDER BY len(text) - 2 * abs(len(text) - 500) DESC, doc_id
             ) AS rn,
             count(*) OVER (PARTITION BY md5(substr(text, 1, 40))) AS group_size
      FROM documents
    )
    SELECT text_hash, CAST(doc_id AS BIGINT) AS keeper_doc,
           CAST(quality AS BIGINT) AS keeper_quality,
           CAST(group_size AS BIGINT) AS group_size
    FROM scored WHERE rn = 1 AND group_size > 1
    ORDER BY text_hash
    """,
)
def q131_dedup_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection: cluster on a
    normalized key (md5 of the 40-char prefix — the boilerplate-dup
    heuristic; exact-text md5 slots in identically) and keep the
    HIGHEST-QUALITY copy per cluster (a length-target score here; any
    scalar score slots in), not the arbitrary min-id — the policy
    real corpus dedup wants, since near-identical crawls differ in
    trailing boilerplate. Same shuffle shape as q50 (16-byte hash
    keys, one window per cluster); ties break on doc_id so both
    engines agree row-for-row. Only multi-doc clusters are emitted."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    quality = F.length("text") - 2 * F.abs(F.length("text") - 500)
    scored = docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, 40).cast("binary")).alias("text_hash"),
        quality.alias("quality"),
    )
    win = W.partitionBy("text_hash")
    ranked = scored.withColumn(
        "rn",
        F.row_number().over(win.orderBy(F.desc("quality"), "doc_id")),
    ).withColumn("group_size", F.count("*").over(win))
    return (
        ranked.filter((F.col("rn") == 1) & (F.col("group_size") > 1))
        .select(
            "text_hash",
            F.col("doc_id").alias("keeper_doc"),
            F.col("quality").cast("bigint").alias("keeper_quality"),
            F.col("group_size").cast("bigint").alias("group_size"),
        )
        .orderBy("text_hash")
    )


_BPE_PAIR_RX = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@query(
    "q132_bpe_pair_counts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{_BPE_PAIR_RX}') AS t
      FROM documents WHERE doc_id < 300
    ),
    pairs AS (
      SELECT unnest(list_zip(t[1:-2], t[2:-1])) AS p
      FROM toks WHERE len(t) >= 2
    )
    SELECT p[1] AS left_tok, p[2] AS right_tok,
           CAST(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY 1, 2
    ORDER BY n DESC, left_tok, right_tok LIMIT 20
    """,
)
def q132_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE vocabulary induction: count adjacent
    token-pair frequencies across the corpus and rank the merge
    candidates — each merge round of a distributed BPE trainer is
    exactly this query over the re-tokenized corpus. Shape: tokenize
    (projection), zip each token array with its own tail (no
    self-join!), explode, partial-aggregated count, top-k via
    TakeOrderedAndProject. The pair domain is bounded by vocab², so
    the shuffle carries short strings with map-side combine."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    t = F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAIR_RX), 0)
    pairs = (
        docs.select(t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.slice("t", 1, F.size("t") - 1).alias("heads"),
            F.slice("t", 2, F.size("t") - 1).alias("tails"),
        )
        .select(F.explode(F.arrays_zip("heads", "tails")).alias("p"))
    )
    return (
        pairs.groupBy(
            F.col("p.heads").alias("left_tok"),
            F.col("p.tails").alias("right_tok"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "left_tok", "right_tok")
        .limit(20)
    )


@query(
    "q138_asof_join_forward",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views_d AS (
      SELECT user_id, ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT p.event_id, CAST(p.user_id AS BIGINT) AS user_id,
           v.view_event_id, v.ts AS view_ts
    FROM purchases p ASOF LEFT JOIN views_d v
      ON p.user_id = v.user_id AND p.ts <= v.ts
    ORDER BY p.event_id
    """,
)
def q138_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched to the user's
    EARLIEST view at or after it (next-touch attribution) — q113's
    mirror, checked against DuckDB's native ASOF with the comparison
    flipped. Same union-tag single-shuffle plan, frame flipped to
    (currentRow, unboundedFollowing)."""
    from distcpplus_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        direction="forward",
    )
    return (
        out.select(
            "event_id",
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("view_event_id_asof").alias("view_event_id"),
            F.col("ts_asof").alias("view_ts"),
        )
        .orderBy("event_id")
    )


@query(
    "q140_unigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents WHERE len(text) > 0
    ),
    vocab AS (
      SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ),
    tot AS (SELECT sum(n) AS total FROM vocab),
    scored AS (
      SELECT t.doc_id,
             avg(-log2(v.n / CAST(tt.total AS DOUBLE))) AS avg_nll,
             count(*) AS n_toks
      FROM toks t JOIN vocab v USING (tok), tot tt
      GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(round(avg_nll, 6) AS DOUBLE) AS avg_nll,
           CAST(n_toks AS BIGINT) AS n_toks
    FROM scored WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def q140_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the CCNet-style perplexity
    proxy): build token probabilities FROM the corpus itself, then
    score each document by its mean token negative-log-likelihood —
    the quality signal that separates fluent text from gibberish
    without a neural model. Shapes: one explode → hash-aggregate for
    the vocab, the corpus re-joined to it on the token (both sides
    hash-partition on the token; at web scale the vocab's heavy head
    could broadcast and the long tail join), per-doc aggregate. At
    100 TB the vocab is built once and REUSED across scoring runs —
    persist it, don't recompute."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ", -1)).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("n"))
    total = vocab.agg(F.sum("n").alias("total"))
    nll = -F.log2(F.col("n") / F.col("total").cast("double"))
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(nll), 6).alias("avg_nll"),
            F.count("*").alias("n_toks"),
        )
        .filter(F.col("doc_id") < 100)
        .orderBy("doc_id")
    )
