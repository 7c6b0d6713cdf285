"""Streaming-surface queries declared in batch semantics (SURVEY.md §2b-S).

The windowed aggregations (q33-q35 in relational.py) are the batch
twins of the streaming queries; here we add the stateful-dedup and
late-data semantics as deterministic batch queries. The actual
readStream/writeStream pipelines live in distcpplus_spark.streaming and
pytest asserts stream ≡ batch on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import local_rows, money_sum, query, small_sort


@query(
    "q70_stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def q70_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup semantics: first event per (user, type) by time.

    Streaming twin: dropDuplicatesWithinWatermark(['user_id',
    'event_type']) — but that keeps an *arbitrary* first-seen row, so
    the declared (deterministic, oracle-checkable) batch semantics pick
    the min-(ts, event_id) row via window.
    """
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "q71_stream_late_data",
    oracle="""
    WITH watermarked AS (
      SELECT *,
             max(ts) OVER (ORDER BY event_id
               ROWS UNBOUNDED PRECEDING) - INTERVAL 15 MINUTE AS wm
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_late
    FROM watermarked
    WHERE ts < wm
    """,
)
def q71_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data accounting: events older than the running max(ts)-15min
    watermark at their arrival position (arrival order = event_id).
    This is exactly what withWatermark('ts','15 minutes') would drop.

    Scale: the running max is a two-phase distributed prefix-max
    (per-bucket window + per-bucket carry-in), not a partition-less
    window — arrival order buckets by event_id blocks of 8192."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    ev = load_table(spark, sf_dir, "events")
    run = partitioned_running_agg(
        ev,
        ["event_id"],
        "ts",
        "_runmax",
        bucket=F.floor(F.col("event_id") / 8192).cast("bigint"),
        agg="max",
    )
    return (
        run.withColumn("wm", F.col("_runmax") - F.expr("INTERVAL 15 MINUTE"))
        .filter(F.col("ts") < F.col("wm"))
        .agg(F.count("*").alias("n_late"))
    )


@query(
    "q133_streaming_batch_parity",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q133_streaming_batch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming under the oracle hash gate: the
    events table is replayed as JSON files, drained through a
    readStream → exactly-once foreachBatch parquet sink
    (streaming/sinks.py) with trigger(availableNow) and one file per
    micro-batch, and the committed output re-aggregated — the result
    must equal the batch aggregate DuckDB computes, proving the
    stream path loses and duplicates nothing across micro-batches.
    Fresh temp dirs per invocation keep reruns deterministic."""
    import os as _os
    import tempfile as _tf

    from distcpplus_spark.streaming.sinks import drain_to_parquet

    ev = load_table(spark, sf_dir, "events")
    base = _tf.mkdtemp(prefix="q133_stream_parity_")
    src = _os.path.join(base, "src")
    out = _os.path.join(base, "out")
    ckpt = _os.path.join(base, "ckpt")
    try:
        ev.select("event_id", "event_type", "value").repartition(3).write.json(
            src
        )
        stream = (
            spark.readStream.schema(
                "event_id BIGINT, event_type STRING, value DOUBLE"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        drain_to_parquet(stream, out, ckpt)
        agg = (
            spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                money_sum(F.col("value")).alias("total"),
            )
            .transform(small_sort, "event_type")
        )
        # materialize the (tiny) result so the temp tree — a full JSON
        # + parquet copy of events per invocation — can be deleted
        # before returning; the caller gets a local-backed DataFrame
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "event_type"
        )
    finally:
        import shutil as _sh

        _sh.rmtree(base, ignore_errors=True)


@query(
    "q167_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT v.event_id) AS BIGINT) AS n_views
    FROM events c
    JOIN events v
      ON v.user_id = c.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 10 MINUTE
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
)
def q167_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join under the oracle hash gate:
    clicks and views are replayed as two independent JSON file
    streams, watermarked, inner-joined on user_id with a
    [click.ts, click.ts + 10 min] range condition, drained through
    the exactly-once sink, and the committed pairs re-aggregated —
    the result must equal DuckDB's batch interval join, proving the
    streaming state machine neither drops nor duplicates pairs
    across micro-batches.

    The watermarks are deliberately huge (3650 days): file replay
    order is arbitrary, and a tight watermark would legitimately
    drop late rows — the DETERMINISTIC contract is the no-drop join,
    so state cleanup is traded away. Production pipelines shrink the
    delay to bound state; the join plan is identical."""
    import os as _os
    import tempfile as _tf

    from distcpplus_spark.streaming.sinks import drain_to_parquet

    ev = load_table(spark, sf_dir, "events")
    base = _tf.mkdtemp(prefix="q167_ssjoin_")
    src_c = _os.path.join(base, "clicks")
    src_v = _os.path.join(base, "views")
    out = _os.path.join(base, "out")
    ckpt = _os.path.join(base, "ckpt")
    try:
        ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        ).repartition(3).write.json(src_c)
        ev.filter(F.col("event_type") == "view").select(
            "event_id", "user_id", "ts"
        ).repartition(3).write.json(src_v)
        schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP"
        clicks = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .json(src_c)
            .withWatermark("ts", "3650 days")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
        )
        views = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .json(src_v)
            .withWatermark("ts", "3650 days")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("v_ts"),
            )
        )
        joined = clicks.join(
            views,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("v_ts") >= F.col("c_ts"))
            & (F.col("v_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTE")),
        )
        drain_to_parquet(joined, out, ckpt)
        agg = (
            spark.read.parquet(out)
            .groupBy(F.col("c_user").alias("user_id"))
            .agg(
                F.count("*").alias("n_pairs"),
                F.countDistinct("view_id").alias("n_views"),
            )
            .transform(small_sort, "user_id")
        )
        rows = agg.collect()
        return local_rows(spark, rows, agg.schema).transform(
            small_sort, "user_id"
        )
    finally:
        import shutil as _sh

        _sh.rmtree(base, ignore_errors=True)


@query(
    "q190_streaming_bloom_ingest",
    oracle="""
    SELECT DISTINCT md5(text) AS text_md5
    FROM documents
    WHERE doc_id >= 100 AND doc_id < 300
      AND text NOT IN (SELECT text FROM documents WHERE doc_id < 200)
    ORDER BY text_md5
    """,
)
def q190_streaming_bloom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom-gated corpus ingestion under the driver's
    hash gate (streaming/pipelines.py:bloom_gated_ingest): docs
    100-299 are replayed as three JSON micro-batches against a
    corpus of docs <200; the sink must end with exactly the distinct
    new texts — bloom-negative rows skip the verify join, candidates
    anti-join, cross-batch replays dedup against what earlier
    batches already ingested. The final key set is order-independent
    (set difference), so the oracle is plain SQL despite the
    streaming execution. Fresh temp dirs per invocation."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.streaming.pipelines import bloom_gated_ingest

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 200).select("text")
    base = _tf.mkdtemp(prefix="q190_bloom_ingest_")
    src = _os.path.join(base, "src")
    out = _os.path.join(base, "out")
    ckpt = _os.path.join(base, "ckpt")
    try:
        docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 300)
        ).select("text").repartition(3).write.json(src)
        stream = (
            spark.readStream.schema("text STRING")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = bloom_gated_ingest(
            spark, stream, corpus, "text", out, ckpt
        )
        q.awaitTermination(300)
        rows = (
            spark.read.parquet(out)
            .select(F.md5(F.col("text").cast("binary")).alias("text_md5"))
            .distinct()
            .orderBy("text_md5")
            .collect()
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)
    return local_rows(spark, rows, "text_md5 STRING").orderBy(
        "text_md5"
    )


@query(
    "q233_streaming_cdc_mirror",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, c_name AS name, c_acctbal AS bal
      FROM customer
    ),
    changes AS (
      SELECT c_custkey AS k, 'U' AS op, c_custkey * 10 + 1 AS seq,
             c_name AS name, c_acctbal + 100 AS bal
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, 'U', c_custkey * 10 + 2, c_name, c_acctbal + 200
      FROM customer WHERE c_custkey % 14 = 0
      UNION ALL
      SELECT c_custkey, 'D', c_custkey * 10 + 3, NULL, NULL
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'I', c_custkey * 10 + 4,
             'new-' || c_custkey, 0.0
      FROM customer WHERE c_custkey % 11 = 0
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC)
            AS rn
        FROM changes
      ) WHERE rn = 1
    ),
    merged AS (
      SELECT k, name, bal FROM latest WHERE op <> 'D'
      UNION ALL
      SELECT k, name, bal FROM base
      WHERE k NOT IN (SELECT k FROM latest)
    )
    SELECT k, name, CAST(round(bal, 2) AS DOUBLE) AS bal
    FROM merged ORDER BY k
    """,
)
def q233_streaming_cdc_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming CDC ingestion under the oracle hash gate
    (streaming/cdc.py): q225's deterministic changelog is replayed
    as JSON files one micro-batch at a time into cdc_mirror —
    latest-SEQUENCE-wins folds with tombstones and atomic state
    swaps per batch — and the final mirror must equal the one-shot
    batch fold DuckDB computes. File arrival order is arbitrary and
    micro-batch boundaries slice the changelog arbitrarily, so the
    hash is checking exactly the out-of-order/idempotence contract
    the module documents. Fresh temp dirs per invocation."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.streaming.cdc import cdc_mirror, read_mirror

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    k = F.col("c_custkey")
    changes = (
        cust.filter(k % 7 == 0)
        .select(
            k.alias("k"), F.lit("U").alias("op"),
            (k * 10 + 1).alias("seq"), F.col("c_name").alias("name"),
            (F.col("c_acctbal") + 100).alias("bal"),
        )
        .unionByName(
            cust.filter(k % 14 == 0).select(
                k.alias("k"), F.lit("U").alias("op"),
                (k * 10 + 2).alias("seq"), F.col("c_name").alias("name"),
                (F.col("c_acctbal") + 200).alias("bal"),
            )
        )
        .unionByName(
            cust.filter(k % 5 == 0).select(
                k.alias("k"), F.lit("D").alias("op"),
                (k * 10 + 3).alias("seq"),
                F.lit(None).cast("string").alias("name"),
                F.lit(None).cast("double").alias("bal"),
            )
        )
        .unionByName(
            cust.filter(k % 11 == 0).select(
                (k + 1000000).alias("k"), F.lit("I").alias("op"),
                (k * 10 + 4).alias("seq"),
                F.concat(F.lit("new-"), k.cast("string")).alias("name"),
                F.lit(0.0).alias("bal"),
            )
        )
    )
    root = _tf.mkdtemp(prefix="q233_cdc_")
    src = _os.path.join(root, "changelog")
    state = _os.path.join(root, "state")
    ckpt = _os.path.join(root, "ckpt")
    try:
        changes.repartition(3).write.json(src)
        stream = (
            spark.readStream.schema(
                "k BIGINT, op STRING, seq BIGINT, name STRING, bal DOUBLE"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        cdc_mirror(
            spark, stream, state, ckpt, "k", ["name", "bal"],
            initial=base,
        )
        out = read_mirror(spark, state).select(
            "k", "name", F.round("bal", 2).alias("bal")
        )
        rows = out.orderBy("k").collect()
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "k BIGINT, name STRING, bal DOUBLE"
    ).orderBy("k")


@query(
    "q247_streaming_python_source",
    oracle="""
    SELECT 'http://stream' || f || '.example/p' || j AS target_uri,
           CAST(length('<html>sdoc ' || f || '-' || j || '</html>')
                AS BIGINT) AS n_bytes,
           md5('<html>sdoc ' || f || '-' || j || '</html>') AS body_md5
    FROM range(0, 3) t(f), LATERAL unnest(range(0, 6)) u(j)
    ORDER BY target_uri
    """,
)
def q247_streaming_python_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Spark 4 Python STREAMING DataSource API under the oracle
    hash gate (sources/pyds.py::WarcStreamDataSource): three
    .warc.gz shards tail through readStream.format("warc_stream")
    — offsets are the ingested-file set, so replays are
    deterministic — drain through the exactly-once sink, and every
    record's fingerprint must match the closed forms. Completes the
    custom-format story: one registration serves batch
    (format("warc"), q245) and streaming from the same parser."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.sources.pyds import register_python_sources
    from distcpplus_spark.sources.warc import build_warc
    from distcpplus_spark.streaming.sinks import drain_to_parquet

    register_python_sources(spark)
    base = _tf.mkdtemp(prefix="q247_pyds_")
    src = _os.path.join(base, "src")
    out = _os.path.join(base, "out")
    ckpt = _os.path.join(base, "ckpt")
    _os.makedirs(src)
    try:
        for f in range(3):
            recs = [
                (
                    "response",
                    f"http://stream{f}.example/p{j}",
                    "2024-01-01T00:00:00Z",
                    f"<urn:uuid:{f}-{j}>",
                    "application/http;msgtype=response",
                    b"HTTP/1.1 200 OK\r\n\r\n"
                    + f"<html>sdoc {f}-{j}</html>".encode(),
                )
                for j in range(6)
            ]
            with open(_os.path.join(src, f"s{f}.warc.gz"), "wb") as fh:
                fh.write(build_warc(recs))
        stream = spark.readStream.format("warc_stream").load(src)
        drain_to_parquet(stream, out, ckpt)
        rows = (
            spark.read.parquet(out)
            .select(
                "target_uri",
                F.length("payload").cast("bigint").alias("n_bytes"),
                F.md5("payload").alias("body_md5"),
            )
            .orderBy("target_uri")
            .collect()
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)
    return local_rows(spark,
        rows, "target_uri STRING, n_bytes BIGINT, body_md5 STRING"
    ).orderBy("target_uri")


@query(
    "q305_stream_dedup_within_watermark",
    oracle="""
    WITH dup AS (
      SELECT event_id, value FROM events WHERE event_id < 2000
      UNION ALL
      SELECT event_id, value FROM events
      WHERE event_id < 2000 AND event_id % 3 = 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total
    FROM (SELECT DISTINCT event_id, value FROM dup)
    """,
)
def q305_stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL streaming deduplication under the oracle hash gate:
    events are replayed with PLANTED duplicates (every 3rd id sent
    twice — at-least-once delivery simulated), streamed through
    withWatermark + dropDuplicatesWithinWatermark('event_id')
    (Spark 4's bounded-state dedup: unlike dropDuplicates it expires
    key state once the watermark passes), drained through the
    exactly-once sink, and re-aggregated — the committed output must
    equal the batch DISTINCT the oracle computes, proving each key
    survives exactly once across micro-batches. Duplicate rows are
    byte-identical, so which copy survives cannot affect the hash.
    The watermark is deliberately huge (the q167 trade): file-replay
    arrival order is arbitrary, and a tight delay would legitimately
    re-admit a duplicate after state expiry; production shrinks it
    to bound state, the plan is identical."""
    import os as _os
    import tempfile as _tf

    from distcpplus_spark.streaming.sinks import drain_to_parquet

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "ts", "value")
    )
    dup = ev.unionByName(ev.filter(F.col("event_id") % 3 == 0))
    base = _tf.mkdtemp(prefix="q305_dedup_")
    src = _os.path.join(base, "src")
    out = _os.path.join(base, "out")
    ckpt = _os.path.join(base, "ckpt")
    try:
        dup.repartition(4).write.json(src)
        stream = (
            spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP, value DOUBLE"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
            .withWatermark("ts", "3650 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        drain_to_parquet(stream, out, ckpt)
        agg = spark.read.parquet(out).agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("event_id").alias("n_ids"),
            money_sum(F.col("value")).alias("total"),
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        import shutil as _sh

        _sh.rmtree(base, ignore_errors=True)


@query(
    "q308_stream_hll_distinct_state",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           true AS stream_within_5pct,
           true AS batch_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q308_stream_hll_distinct_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming approximate-distinct per key via mergeable HLL state
    (streaming/hll_state.py): events replay as a file stream, every
    micro-batch folds into one sketch per event_type (KB-sized state
    no matter how many distinct users — the dropDuplicates state
    store would grow with id cardinality), committed with the
    cdc_mirror tmp+rename swap. Gate: (a) exact distinct counts from
    the oracle, (b) a 5% relative-error contract on BOTH the
    streamed-and-merged estimate and the single-pass batch estimate
    (lg_k=12 HLL => ~1.6% RSE, 3σ inside the bar).

    Why not gate stream == batch exactly: a single-pass Datasketches
    HLL keeps the HIP estimator, which is NOT mergeable — a union
    falls back to the composite estimator, so the merged estimate is
    path-dependent WITHIN the error bound (and only coincides with
    batch while sketches are still in exact sparse mode). The honest
    mergeability claim is the bound, plus true idempotence —
    re-folding identical data leaves the REGISTERS unchanged — which
    tests/test_streaming.py pins."""
    import os as _os
    import tempfile as _tf

    from distcpplus_spark.streaming.hll_state import (
        read_distinct_estimates,
        streaming_distinct_hll,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    )
    base = _tf.mkdtemp(prefix="q308_hll_")
    src = _os.path.join(base, "src")
    state = _os.path.join(base, "state")
    ckpt = _os.path.join(base, "ckpt")
    try:
        ev.repartition(5).write.json(src)
        stream = (
            spark.readStream.schema(
                "event_id BIGINT, event_type STRING, user_id BIGINT"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = streaming_distinct_hll(
            stream, "event_type", "user_id", state, ckpt
        )
        q.awaitTermination()
        est = {
            r["k"]: r["approx_distinct"]
            for r in read_distinct_estimates(spark, state).collect()
        }
        batch = {
            r["k"]: r["e"]
            for r in ev.groupBy(F.col("event_type").alias("k"))
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(12))
                )
                .cast("bigint")
                .alias("e")
            )
            .collect()
        }
        exact = {
            r["k"]: r["n"]
            for r in ev.groupBy(F.col("event_type").alias("k"))
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        rows = [
            (
                k,
                int(exact[k]),
                bool(abs(est[k] - exact[k]) <= 0.05 * exact[k]),
                bool(abs(batch[k] - exact[k]) <= 0.05 * exact[k]),
            )
            for k in sorted(exact)
        ]
        return spark.createDataFrame(
            rows,
            "event_type STRING, exact_distinct BIGINT, "
            "stream_within_5pct BOOLEAN, batch_within_5pct BOOLEAN",
        )
    finally:
        import shutil as _sh

        _sh.rmtree(base, ignore_errors=True)


@query(
    "q317_stream_session_windows",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, value FROM events WHERE user_id < 50
    ),
    m AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                  OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           + INTERVAL 240 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM m
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 240 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total
    FROM s GROUP BY user_id, sess
    ORDER BY user_id, session_start
    """,
)
def q317_stream_session_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL Structured Streaming session windows under the oracle
    hash gate: events replay through readStream →
    withWatermark + groupBy(session_window(ts, '4 hours')) in append
    mode, and every emitted session must equal the batch
    gaps-and-islands computation the oracle runs (break at gap >=
    240 min; session end = last event + gap — Spark's session_window
    end semantics, replayed as max(ts) + INTERVAL).

    Append-mode sessions only emit once the WATERMARK passes their
    end, so a naive availableNow drain would silently swallow every
    session near the stream's end — the classic watermark-tail loss.
    The fix is a deterministic three-batch flush protocol: batch 1
    is ALL real events in one file (watermark still at epoch, so
    arrival order inside the batch cannot drop anything), batch 2 a
    far-future sentinel that advances the watermark past every real
    session end, batch 3 a second sentinel whose processing emits
    the now-expired real sessions (emission happens in a DATA batch,
    so nothing relies on trailing no-data micro-batches). File order
    is pinned by explicit mtimes + maxFilesPerTrigger=1; sentinel
    sessions themselves stay above the final watermark and are
    additionally belt-and-braces filtered by user_id >= 0.

    Scale: session state is per-user and bounded by the watermark
    horizon; the shuffle keys on user_id (session merge is
    state-store-local); production shrinks the sentinel trick to a
    real event-time heartbeat per partition."""
    import glob as _gl
    import os as _os
    import tempfile as _tf
    from datetime import timedelta as _td

    from distcpplus_spark.streaming.sinks import drain_to_parquet

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "value")
    )
    max_ts = ev.agg(F.max("ts").alias("m")).first()["m"]
    base = _tf.mkdtemp(prefix="q317_sess_")
    src = _os.path.join(base, "src")
    out = _os.path.join(base, "out")
    ckpt = _os.path.join(base, "ckpt")
    try:
        tsfmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        ev.coalesce(1).write.option("timestampFormat", tsfmt).json(src)
        t0 = _os.path.getmtime(sorted(_gl.glob(f"{src}/part-*"))[0])
        for i, (uid, dt) in enumerate(
            [(-1, max_ts + _td(days=1)), (-2, max_ts + _td(days=2))]
        ):
            before = set(_gl.glob(f"{src}/part-*"))
            # repartition(1), not coalesce(1): coalescing a local
            # relation runs all parent slices serially in one task
            # (~150 ms Python round trip each — ~5 s per append)
            spark.createDataFrame(
                [(uid, dt, 0.0)], "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
            ).repartition(1).write.mode("append").option(
                "timestampFormat", tsfmt
            ).json(src)
            for p in set(_gl.glob(f"{src}/part-*")) - before:
                _os.utime(p, (t0 + 10 * (i + 1), t0 + 10 * (i + 1)))
        for p in _gl.glob(f"{src}/part-*"):
            if _os.path.getmtime(p) == t0:
                _os.utime(p, (t0, t0))
        stream = (
            spark.readStream.schema(
                "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
            )
            .option("maxFilesPerTrigger", 1)
            .option("timestampFormat", tsfmt)
            .json(src)
            .withWatermark("ts", "1 minute")
            .groupBy(
                "user_id",
                F.session_window("ts", "4 hours").alias("w"),
            )
            .agg(
                F.count("*").alias("n_events"),
                money_sum(F.col("value")).alias("total"),
            )
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
                "total",
            )
        )
        drain_to_parquet(stream, out, ckpt)
        res = (
            spark.read.parquet(out)
            .filter(F.col("user_id") >= 0)
            .select(
                "user_id", "session_start", "session_end",
                "n_events", "total",
            )
            .orderBy("user_id", "session_start")
        )
        rows = res.collect()
        return local_rows(spark, rows, res.schema).orderBy(
            "user_id", "session_start"
        )
    finally:
        import shutil as _sh

        _sh.rmtree(base, ignore_errors=True)


@query(
    "q393_stream_space_saving",
    oracle="""
    WITH toks AS (
      SELECT g.tok FROM documents d,
             unnest(string_split(d.text, ' ')) AS g(tok)
      WHERE g.tok != ''
    ),
    truth AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM truth)
    SELECT n,
           CAST(64 AS BIGINT) AS k,
           (SELECT CAST(count(*) AS BIGINT) FROM truth, tot
            WHERE c * 64 > 2 * n) AS n_guaranteed,
           true AS all_guaranteed_found,
           true AS errors_within_bound
    FROM tot
    """,
)
def q393_stream_space_saving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SpaceSaving heavy hitters: documents replay as a
    file stream, each micro-batch contributes a k-counter summary
    (functions/sketch_tools.py::space_saving_topk on the batch), and
    the driver folds summaries keywise — micro-batches play exactly
    the role partitions play in q303's mergeable-summaries analysis,
    so the SAME theorems gate the result: every key with true count
    > 2n/k is present in the final top-k, and every estimate is
    within n/k two-sided. Driver state between compactions is
    (batches seen) x k counters — metadata-sized; a production
    long-runner would Misra-Gries-compact the fold periodically
    without changing the bound.

    Scale: per batch one mapInPandas summary pass (<= k rows per
    partition reach the driver); the stream never stores per-key
    exact state (contrast dropDuplicates' id-cardinality store)."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.functions.sketch_tools import space_saving_topk

    K = 64
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = _tf.mkdtemp(prefix="q393_ss_")
    src = _os.path.join(base, "src")
    ckpt = _os.path.join(base, "ckpt")
    state: dict = {}
    try:
        docs.repartition(5).write.json(src)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        toks = stream.select(
            F.explode(
                F.filter(F.split(F.col("text"), " ", -1), lambda x: x != "")
            ).alias("tok")
        )

        def fold(bdf, _bid):
            for r in space_saving_topk(bdf, "tok", k=K).collect():
                state[r["key"]] = state.get(r["key"], 0) + int(r["est"])

        q = (
            toks.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        topk = dict(
            sorted(state.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
        )
        truth = {
            r["tok"]: r["c"]
            for r in docs.select(
                F.explode(
                    F.filter(
                        F.split(F.col("text"), " ", -1), lambda x: x != ""
                    )
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count("*").cast("bigint").alias("c"))
            .collect()
        }
        n = sum(truth.values())
        bound = n / K
        guaranteed = {t for t, c in truth.items() if c * K > 2 * n}
        all_found = guaranteed <= set(topk)
        errors_ok = all(
            abs(est - truth.get(key, 0)) <= bound
            for key, est in topk.items()
        )
        return spark.createDataFrame(
            [(n, K, len(guaranteed), bool(all_found), bool(errors_ok))],
            "n BIGINT, k BIGINT, n_guaranteed BIGINT, "
            "all_guaranteed_found BOOLEAN, errors_within_bound BOOLEAN",
        )
    finally:
        _sh.rmtree(base, ignore_errors=True)
