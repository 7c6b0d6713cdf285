"""Streaming pipelines over the events schema.

Each builder takes a *streaming* DataFrame (from readStream) and
returns the transformed streaming DataFrame; the same builder applied
to a batch DataFrame yields the batch-equivalent result — tests assert
stream ≡ batch on replay (SURVEY.md §2b-S), which is the whole
correctness story for these.

Watermark choices: 15 minutes tolerance on event time. At scale the
watermark bounds state: a 10-min window with 15-min watermark holds
~2.5 windows of partial aggregates per key — O(keys), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distcpplus_spark.queries import money_sum

EVENTS_JSON_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def tumbling_counts(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Tumbling window counts+sums per event_type with watermark."""
    return (
        events.withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), money_sum(F.col("value")).alias("total"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_totals(
    events: DataFrame, window: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count("*").alias("n"), money_sum(F.col("value")).alias("total"))
        .select(F.col("win.start").alias("win_start"), "n", "total")
    )


def session_totals(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (state pruned by watermark)."""
    return (
        events.withWatermark("ts", "15 minutes")
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count("*").alias("n_events"), money_sum(F.col("value")).alias("total"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "total",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """Stateful dedup on event_id within the watermark horizon —
    exactly-once per id under replay, state bounded by the watermark."""
    return events.withWatermark("ts", "15 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def signup_followup_join(
    signups: DataFrame, activity: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: for each signup, the same user's
    activity within ``horizon`` after it (the streaming twin of the
    batch range join, queries q11).

    Both sides are watermarked so Spark can bound the join state: a
    buffered signup can be dropped once the activity watermark passes
    signup.ts + horizon, and vice versa — without the time bound the
    state would grow forever. Output columns are join-keyed so the
    result is append-mode safe.
    """
    s = (
        signups.withWatermark("ts", "15 minutes")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
        )
    )
    a = (
        activity.withWatermark("ts", "15 minutes")
        .select(
            F.col("event_id").alias("activity_id"),
            F.col("user_id").alias("a_user"),
            F.col("ts").alias("activity_ts"),
        )
    )
    return s.join(
        a,
        (F.col("s_user") == F.col("a_user"))
        & (F.col("activity_ts") > F.col("signup_ts"))
        & (
            F.col("activity_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    ).select("signup_id", "activity_id", "s_user", "signup_ts", "activity_ts")


def enrich_with_dim(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch hash-joins against the
    static dimension — no state, no watermark needed (the static side
    is re-planned per batch, so dim updates between batches are
    picked up). Broadcast the dim: per-batch volumes are small and a
    shuffle per micro-batch would dominate latency."""
    return events.join(F.broadcast(dim), on, "left")


def bloom_gated_ingest(
    spark,
    batch_stream: DataFrame,
    corpus: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str,
    num_shards: int = 16,
    bits_per_shard: int = 1 << 18,
):
    """Streaming corpus ingestion with Bloom-prefiltered dedup
    (operators/bloom.py composed into foreachBatch): every micro-
    batch is reduced to its genuinely-new rows — bloom-negative rows
    skip the corpus join entirely, candidates are verified with an
    exact anti join — then appended to ``out_dir``. The filter is
    rebuilt lazily per batch from the CURRENT corpus + everything
    already ingested, so late replays of earlier batches dedup too.

    Scale shape: the per-batch cost is the batch scan (map-only
    probe) plus an anti join whose left side is only the candidate
    sliver; the shard bitmaps are the only broadcast state. On a
    real cluster the filter would be cached and merged
    incrementally (sharded bitmaps OR trivially) instead of rebuilt;
    the rebuild keeps this test-sized variant deterministic.

    Returns the StreamingQuery (caller awaits/ stops)."""
    from distcpplus_spark.operators.bloom import incremental_dedup

    def process(batch_df, batch_id):
        known = corpus.select(key_col)
        try:
            seen = batch_df.sparkSession.read.parquet(out_dir).select(
                key_col
            )
            known = known.unionByName(seen)
        except Exception:
            pass  # first batch: nothing ingested yet
        fresh = incremental_dedup(
            batch_df.sparkSession, known, batch_df, key_col,
            num_shards=num_shards, bits_per_shard=bits_per_shard,
        )
        # also drop duplicates WITHIN the batch (keep-any, exact)
        fresh.dropDuplicates([key_col]).write.mode("append").parquet(
            out_dir
        )

    return (
        batch_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
