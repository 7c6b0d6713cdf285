"""Round-5 additions: sessionization, tf-idf ranking, skew
diagnostics, stratified sampling, and per-user rolling rates.

Every query keeps the scale shapes honest: windows are ALWAYS
partitioned (by user or document — never a global ordered window),
corpus statistics are hash aggregations, and the sampling operator is
the deterministic content-hash mixer (reproducible across engines,
runs, and cluster sizes), not partition-dependent RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import local_rows, query, small_sort


@query(
    "q143_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS start_ts,
           max(ts) AS end_ts,
           CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0)
                AS BIGINT) AS duration_s
    FROM sess
    GROUP BY user_id, session_idx
    HAVING count(*) >= 2
    ORDER BY user_id, session_idx
    """,
)
def q143_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into
    sessions at >30 min gaps (the classic lag + running-sum-of-flags
    rewrite of SESSION_WINDOW for batch data).

    Scale: both windows partition by user_id — per-user event streams
    are bounded, so this parallelizes to any cluster size with one
    shuffle on user_id. HAVING (>=2 events) keeps output bounded and non-trivial at the gate SF."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    us = F.unix_micros(F.col("ts"))
    lag_us = F.lag(us).over(w)
    # µs precision on BOTH engines (epoch_us ↔ unix_micros): a
    # seconds-truncated gap rule would classify borderline gaps
    # differently than the oracle's fractional epoch
    new_s = F.when(lag_us.isNull() | ((us - lag_us) > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("session_idx", F.sum(new_s).over(frame))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.floor(
                (F.max(F.unix_micros(F.col("ts")))
                 - F.min(F.unix_micros(F.col("ts")))) / 1_000_000.0
            ).cast("bigint").alias("duration_s"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("session_idx").cast("bigint").alias("session_idx"),
            "n_events", "start_ts", "end_ts", "duration_s",
        )
        .orderBy("user_id", "session_idx")
    )


@query(
    "q144_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.term
      FROM documents,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
      WHERE length(t.term) >= 4
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df
      FROM toks GROUP BY term
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term,
             CAST(round(score, 6) AS DOUBLE) AS tfidf,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rnk
      FROM scored
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tfidf,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked
    WHERE rnk <= 3 AND doc_id < 100
    ORDER BY doc_id, rnk
    """,
)
def q144_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf term ranking: top-3 highest-scoring terms per document
    with smoothed idf ln((N+1)/(df+1)).

    Scale: tokenize is a projection + explode (no shuffle); tf and df
    are hash aggregations; N is a scalar broadcast; ranking is a
    window partitioned by doc_id. The df side aggregates to vocabulary
    size — always broadcastable. No global window, no all-pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") >= 4)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 100))
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "term",
            F.round("score", 6).alias("tfidf"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("doc_id", "rnk")
    )


@query(
    "q145_key_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT l_suppkey AS key, count(*) AS cnt
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT sum(cnt) AS total, count(*) AS n_keys FROM counts)
    SELECT CAST(key AS BIGINT) AS key,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(round(cnt / CAST(total AS DOUBLE), 6) AS DOUBLE) AS share,
           CAST(round(cnt * n_keys / CAST(total AS DOUBLE), 6) AS DOUBLE)
             AS skew_ratio
    FROM counts CROSS JOIN tot
    ORDER BY cnt DESC, key
    LIMIT 10
    """,
)
def q145_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: the 10 hottest keys with their share
    of all rows and skew ratio (share × #keys — 1.0 means perfectly
    uniform). This is the profiling step that decides when to reach
    for salted_join / AQE skew handling (operators/scale.py).

    Scale: one hash aggregation (map-side combine), a two-row scalar
    broadcast, and a top-k — no sort of the full key set."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("key").cast("bigint").alias("key"),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
            F.round(
                F.col("cnt") * F.col("n_keys") / F.col("total").cast("double"), 6
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
    )


@query(
    "q146_stratified_sample",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS h
      FROM documents
    ),
    sampled AS (
      SELECT doc_id, lang FROM tagged
      WHERE h < CASE WHEN lang = 'en' THEN 50
                     WHEN lang = 'zh' THEN 25
                     ELSE 10 END
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM sampled
    GROUP BY lang
    ORDER BY lang
    """,
)
def q146_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum (language) sampling at different rates — the
    domain-rebalancing step of corpus construction — via the
    deterministic md5 mixer, NOT sampleBy: identical membership on any
    engine, any run, any partitioning (the oracle verifies membership
    through min/max/sum of the sampled ids, not just counts).

    Scale: pure projection + filter + hash aggregation; no shuffle
    before the final per-lang rollup."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = (
        F.when(F.col("lang") == "en", 50)
        .when(F.col("lang") == "zh", 25)
        .otherwise(10)
    )
    return (
        docs.filter(h < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum("doc_id").alias("id_sum"),
        )
        .transform(small_sort, "lang")
    )


@query(
    "q147_rolling_user_rate",
    oracle="""
    WITH rated AS (
      SELECT user_id, ts, event_id, value,
             count(*) OVER w AS n_prev_hour,
             CAST(round(avg(value) OVER w, 6) AS DOUBLE) AS avg_prev_hour
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           ts,
           CAST(n_prev_hour AS BIGINT) AS n_prev_hour,
           avg_prev_hour
    FROM rated
    WHERE n_prev_hour >= 2
    ORDER BY user_id, ts, event_id
    """,
)
def q147_rolling_user_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling one-hour event rate and mean value (rate
    limiting / anomaly features): a RANGE frame over event-time keyed
    seconds, partitioned by user.

    Scale: the window partitions by user_id — one shuffle, bounded
    per-user state; the range frame is evaluated per partition. The
    n>=2 filter keeps the gate's output bounded."""
    ev = load_table(spark, sf_dir, "events")
    # µs-keyed range frame ≡ the oracle's RANGE INTERVAL 1 HOUR on a
    # full-precision timestamp (a seconds-truncated key would admit
    # borderline rows the oracle excludes)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.withColumn("n_prev_hour", F.count("*").over(w))
        .withColumn("avg_prev_hour", F.round(F.avg("value").over(w), 6))
        .filter(F.col("n_prev_hour") >= 2)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("event_id").cast("bigint").alias("event_id"),
            "ts", "n_prev_hour", "avg_prev_hour",
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "q149_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS s
      FROM documents WHERE len(string_split(lower(text), ' ')) >= 2
    ),
    bigrams AS (
      SELECT doc_id, t.bg
      FROM toks, unnest(list_transform(range(1, len(s)),
                        i -> s[i] || ' ' || s[i + 1])) AS t(bg)
    ),
    bg_counts AS (SELECT bg, count(*) AS c_bg FROM bigrams GROUP BY bg),
    ctx_counts AS (
      SELECT split_part(bg, ' ', 1) AS w1, sum(c_bg) AS c_ctx
      FROM bg_counts GROUP BY w1
    ),
    vocab AS (
      SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(s) AS tok FROM toks)
    ),
    scored AS (
      SELECT b.doc_id,
             avg(-log2((bc.c_bg + 1.0) /
                       (cc.c_ctx + vv.v))) AS avg_nll,
             count(*) AS n_bigrams
      FROM bigrams b
      JOIN bg_counts bc USING (bg)
      JOIN ctx_counts cc ON split_part(b.bg, ' ', 1) = cc.w1
      CROSS JOIN vocab vv
      GROUP BY b.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(round(avg_nll, 6) AS DOUBLE) AS avg_nll,
           CAST(n_bigrams AS BIGINT) AS n_bigrams
    FROM scored WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def q149_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing:
    P(w2|w1) = (c(w1w2)+1) / (c_ctx(w1)+V), per-doc mean NLL — the
    next step up from q140's unigram proxy, sensitive to local word
    order (scrambled text scores worse even with a fluent unigram
    profile).

    Scale: bigram extraction is a higher-order transform over the
    token array (projection, no shuffle); bigram/context counts are
    hash aggregations. The model table (bigram → NLL) is enriched
    ONCE at vocabulary size — ctx join and smoothing happen on the
    aggregate, not on the corpus — so scoring is a SINGLE join of the
    corpus bigrams against the enriched model. Build-once/reuse: at
    100 TB persist the enriched model and never recompute it per
    scoring run."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ", -1).alias("s")
    ).filter(F.size("s") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(s) - 2),"
                " i -> concat(s[i], ' ', s[i + 1]))"
            )
        ).alias("bg"),
    )
    bg_counts = bigrams.groupBy("bg").agg(F.count("*").alias("c_bg"))
    ctx_counts = bg_counts.groupBy(
        F.substring_index("bg", " ", 1).alias("w1")
    ).agg(F.sum("c_bg").alias("c_ctx"))
    vocab = toks.select(F.explode("s").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    # vocabulary-sized model enrichment: every bigram with its ready
    # NLL; the corpus never joins more than once
    model = (
        bg_counts.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(ctx_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            (-F.log2(
                (F.col("c_bg") + 1.0) / (F.col("c_ctx") + F.col("v"))
            )).alias("nll"),
        )
    )
    return (
        bigrams.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.count("*").alias("n_bigrams"),
        )
        .filter(F.col("doc_id") < 100)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "avg_nll",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        )
        .orderBy("doc_id")
    )


@query(
    "q150_event_debounce",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           ts
    FROM d
    WHERE user_id < 20 AND (gap_us IS NULL OR gap_us > 60000000)
    ORDER BY user_id, ts, event_id
    """,
)
def q150_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event debounce/throttle: drop events arriving within 60 s of
    the user's previous event (lag rule — the stateless variant used
    for client-side event storms; the stateful kept-anchor variant is
    the sessionization shape, q143).

    Scale: one window partitioned by user_id, µs-exact gap math on
    both engines; the user_id<20 predicate is pushed to the scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (
        ev.withColumn("gap_us", gap)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > 60_000_000))
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("event_id").cast("bigint").alias("event_id"),
            "ts",
        )
        .orderBy("user_id", "ts", "event_id")
    )


@query(
    "q153_map_higher_order",
    oracle="""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events WHERE user_id < 30
      GROUP BY user_id, event_type
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(CASE WHEN c >= 2 THEN 1 END) AS BIGINT) AS n_types_ge2,
           CAST(sum(c) AS BIGINT) AS total_events,
           CAST(round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS DOUBLE)
             AS dominant_share
    FROM per
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q153_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order MAP functions: build a per-user event_type→count
    map (map_from_entries ∘ collect_list), then interrogate it with
    map lambdas — map_filter (types seen ≥2×), a fold over map_values
    (total events), array_max / total (dominant-type share). The
    oracle computes the same numbers relationally; the map machinery
    is ours (same contract as q76).

    Scale: two hash aggregations; every lambda runs JVM-side inside
    codegen — no Python in the loop. Map build order doesn't matter
    (map contents are order-insensitive), so collect_list's
    nondeterministic ordering is safe here."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    m = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "c"))
        ).alias("m")
    )
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return (
        m.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.size(F.map_filter("m", lambda k, v: v >= 2))
            .cast("bigint")
            .alias("n_types_ge2"),
            total.alias("total_events"),
            F.round(
                F.array_max(F.map_values("m")) / total.cast("double"), 6
            ).alias("dominant_share"),
        )
        .orderBy("user_id")
    )


@query(
    "q179_bloom_incremental_dedup",
    oracle="""
    SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
           b.lang AS lang,
           CAST(b.n_chars AS BIGINT) AS n_chars
    FROM documents b
    WHERE b.doc_id >= 150 AND b.doc_id < 450
      AND b.text NOT IN (
            SELECT text FROM documents WHERE doc_id < 300
          )
    ORDER BY doc_id
    """,
)
def q179_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup (operators/bloom.py) under
    the driver's hash gate: today's batch (docs 150-449) against the
    existing corpus (docs <300), keyed on full content. Semantically
    an exact anti join — which is precisely what DuckDB computes — but
    executed as bloom-negative ∪ (candidates ANTI JOIN corpus): the
    sharded filter is built distributed (one bitmap per hash shard via
    applyInPandas), broadcast, probed map-side, and only the
    bloom-positive sliver shuffles into the verify join. At 100 TB the
    batch's fresh rows (the vast majority) never shuffle at all; the
    reference's closest analogue is the -update change predicate
    (DistCPPlus.java), which always pays the full join."""
    from distcpplus_spark.operators.bloom import incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 300)
    batch = docs.filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 450)
    ).select("doc_id", "lang", "n_chars", "text")
    out = incremental_dedup(
        spark, corpus, batch, "text",
        num_shards=16, bits_per_shard=1 << 18,
    )
    return (
        out.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "q181_duplicated_span_coverage",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS len
               FROM documents WHERE doc_id < 150),
    pos AS (
      SELECT doc_id, len, CAST(p AS BIGINT) AS s, CAST(p + 19 AS BIGINT) AS e,
             substr(text, CAST(p AS INTEGER), 20) AS gram
      FROM d, LATERAL unnest(range(1, greatest(len - 19, 0) + 1)) AS t(p)
    ),
    dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(*) >= 2),
    cov AS (SELECT pos.doc_id, pos.s, pos.e FROM pos
            JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w + 1
                  THEN 1 ELSE 0 END AS ni
      FROM cov
      WINDOW w AS (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (
      SELECT doc_id, s, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY s
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS island
      FROM isl
    ),
    merged AS (
      SELECT doc_id, island, min(s) AS ms, max(e) AS me
      FROM isl2 GROUP BY doc_id, island
    ),
    per_doc AS (
      SELECT doc_id, sum(me - ms + 1) AS dup_chars
      FROM merged GROUP BY doc_id
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(p.dup_chars, 0) AS BIGINT) AS dup_chars,
           CAST(d.len AS BIGINT) AS total_chars
    FROM d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ORDER BY doc_id
    """,
)
def q181_duplicated_span_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact duplicated-substring coverage (Lee et al. 2021 measure,
    operators/dedup.py:duplicated_span_coverage) under the driver's
    hash gate: per document, the merged length of every 20-char span
    whose gram occurs >= 2 times in the corpus slice. The k-gram
    inverted index replaces the suffix array Spark-unfriendly global
    sort; the oracle recomputes occurrence counts on the RAW grams
    (the engine groups on xxhash64 — a collision would need ~2^32
    grams to matter) and mirrors the same gaps-and-islands merge.
    Integer outputs only, so the hash compare is rounding-free."""
    from distcpplus_spark.operators.dedup import duplicated_span_coverage

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return (
        duplicated_span_coverage(docs, "text", "doc_id", k=20)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "dup_chars",
            "total_chars",
        )
        .transform(small_sort, "doc_id")
    )


_BPE_FIXED_MERGES = [
    (0, "t", "h", 0), (1, "th", "e", 0), (2, "e", "r", 0),
    (3, "i", "n", 0), (4, "a", "n", 0), (5, "an", "d", 0),
    (6, "o", "n", 0), (7, "o", "r", 0),
]


def _bpe_tokenize_oracle() -> str:
    # replay the same merges as scan-after-replacement string
    # replaces over a chr(31)-joined char sequence — semantically
    # identical to the engine's left-to-right greedy fold
    expr = "array_to_string(string_split(word, ''), chr(31))"
    for _, left, right, _ in _BPE_FIXED_MERGES:
        expr = (
            f"replace({expr}, '{left}' || chr(31) || '{right}', "
            f"'{left}{right}')"
        )
    return f"""
    WITH w AS (
      SELECT doc_id, word
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
            FROM documents WHERE doc_id < 100)
      WHERE word <> ''
    ),
    tok AS (
      SELECT doc_id,
             length({expr}) - length(replace({expr}, chr(31), '')) + 1
               AS n_toks
      FROM w
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_toks) AS BIGINT) AS n_bpe_tokens
    FROM tok GROUP BY doc_id
    ORDER BY doc_id
    """


@query("q185_bpe_tokenize", oracle=_bpe_tokenize_oracle())
def q185_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BPE tokenization with a FIXED merge table
    (operators/bpe.py:bpe_apply — the same codegen'd fold x21 trains
    into, made oracle-able by pinning the merges instead of learning
    them): per document, word count and total BPE token count after
    replaying 8 merge rules in rank order. The oracle replays each
    merge as a scan-after-replacement string replace over a
    chr(31)-joined char sequence — provably the same greedy
    left-to-right non-overlapping semantics as the engine's
    ``aggregate`` fold. All outputs integers; tokenization is
    single-space split + lower on both sides."""
    from distcpplus_spark.operators.bpe import bpe_apply

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    words = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ", -1)).alias("word"),
        )
        .filter(F.length("word") > 0)
    )
    toks = bpe_apply(words, "word", _BPE_FIXED_MERGES)
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.size("bpe_tokens")).alias("n_bpe_tokens"),
        )
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        )
        .transform(small_sort, "doc_id")
    )


def _bpe_train_oracle(n_merges: int = 4) -> str:
    # Unrolled training iterations: each round computes weighted
    # adjacent-pair counts over the chr(31)-joined token strings,
    # takes the (count DESC, pair ASC) argmax as a 1-row CTE, and
    # applies it with a DYNAMIC replace (the pattern is a column
    # expression from the argmax row — SQL can thread query results
    # into the next round's rewrite; recursive CTEs can't, so
    # unrolling expresses the fixed-depth merge loop).
    parts = ["""
    WITH v0 AS (
      SELECT word, count(*) AS wn,
             array_to_string(string_split(word, ''), chr(31)) AS t
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents WHERE doc_id < 80)
      WHERE word <> ''
      GROUP BY word
    )"""]
    for i in range(1, n_merges + 1):
        parts.append(f""",
    p{i} AS (
      SELECT s.toks[CAST(u.i AS INTEGER)] || chr(0) ||
             s.toks[CAST(u.i AS INTEGER) + 1] AS pair,
             sum(s.wn) AS cnt
      FROM (SELECT wn, string_split(t, chr(31)) AS toks
            FROM v{i - 1}) s,
           LATERAL unnest(range(1, len(s.toks))) u(i)
      GROUP BY pair
    ),
    b{i} AS (
      SELECT pair, cnt FROM p{i}
      ORDER BY cnt DESC, pair ASC LIMIT 1
    ),
    v{i} AS (
      SELECT v.word, v.wn,
             replace(v.t, replace(b.pair, chr(0), chr(31)),
                     replace(b.pair, chr(0), '')) AS t
      FROM v{i - 1} v CROSS JOIN b{i} b
    )""")
    selects = [
        f"""SELECT CAST({i - 1} AS BIGINT) AS rank,
               string_split(pair, chr(0))[1] AS left,
               string_split(pair, chr(0))[2] AS right,
               CAST(cnt AS BIGINT) AS pair_count
        FROM b{i}"""
        for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY rank"


@query("q236_bpe_merge_training", oracle=_bpe_train_oracle())
def q236_bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE merge-TRAINING loop under the driver's hash gate (x21
    stays the longer rows-only run): 4 merge rounds over the
    documents word-vocabulary, each an adjacent-pair weighted count +
    deterministic (count DESC, pair ASC) argmax + greedy token
    rewrite (operators/bpe.py::bpe_train — the iterative driver-fold
    family). The oracle unrolls the same 4 rounds in SQL, threading
    each round's argmax into a dynamic scan-after-replace rewrite —
    the q185 replay trick generalized from fixed merges to LEARNED
    merges, so the hash checks the argmax sequence itself."""
    from distcpplus_spark.operators.bpe import bpe_train

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        .select(F.lower("text").alias("text"))
    )
    merges = bpe_train(docs, "text", n_merges=4, min_count=2)
    return local_rows(spark,
        [(r, l, rt, c) for r, l, rt, c in merges],
        "rank BIGINT, left STRING, right STRING, pair_count BIGINT",
    ).orderBy("rank")
