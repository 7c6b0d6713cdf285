"""Exactly-once foreachBatch sink + availableNow drain + rate source.

The failure model under test: Structured Streaming replays the last
uncommitted micro-batch with the SAME batch_id after a restart, so the
sink must be idempotent per batch_id for output to be exactly-once.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from distcpplus_spark.streaming.pipelines import EVENTS_JSON_SCHEMA
from distcpplus_spark.streaming.sinks import (
    drain_to_parquet,
    exactly_once_parquet_sink,
)


def _write_chunk(root: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(root, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _event(i: int) -> dict:
    return {
        "event_id": i,
        "ts": f"2024-01-01 00:{i % 60:02d}:00",
        "user_id": i % 7,
        "event_type": "view",
        "value": float(i),
        "props": "{}",
    }


def test_foreachbatch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = exactly_once_parquet_sink(out)
    df = spark.range(100).select(F.col("id").alias("event_id"))

    sink(df, 0)
    sink(df, 0)  # replay of a committed batch: must be a no-op
    got = spark.read.parquet(out)
    assert got.count() == 100

    # crash-after-rename-before-marker: the batch dir exists but the
    # commit marker does not — the replay must rewrite (not append)
    os.remove(os.path.join(out, "_commits", "0"))
    sink(df, 0)
    assert spark.read.parquet(out).count() == 100

    sink(df.filter("event_id < 10"), 1)
    final = spark.read.parquet(out)
    assert final.count() == 110
    # batch_id is readable as a hive partition column
    assert final.filter("batch_id = 1").count() == 10


def test_available_now_drain_is_incremental(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunk(str(src), "a.json", [_event(i) for i in range(50)])

    def stream():
        return spark.readStream.schema(EVENTS_JSON_SCHEMA).json(str(src))

    # first drain: everything currently available, then terminate
    drain_to_parquet(stream(), out, ckpt)
    assert spark.read.parquet(out).count() == 50

    # second drain with the SAME checkpoint: only the new file's rows
    _write_chunk(str(src), "b.json", [_event(i) for i in range(50, 80)])
    drain_to_parquet(stream(), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 80
    assert got.select("event_id").distinct().count() == 80

    # third drain with nothing new: no output growth, still terminates
    drain_to_parquet(stream(), out, ckpt)
    assert spark.read.parquet(out).count() == 80


def test_rate_source_flows(spark, tmp_path):
    """The rate source (built-in load generator): rows stream in with
    (timestamp, value) schema; a projection on top flows through a
    memory sink. Used as the zero-dependency smoke path for latency
    testing on a real cluster."""
    name = f"rate_sink_{int(time.time() * 1000) % 10 ** 9}"
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .option("numPartitions", 2)
        .load()
        .select("timestamp", "value", (F.col("value") % 10).alias("bucket"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= 100:
                break
            time.sleep(0.5)
        got = spark.table(name)
        assert got.count() >= 100
        assert set(got.columns) == {"timestamp", "value", "bucket"}
        assert got.agg(F.max("bucket")).collect()[0][0] <= 9
    finally:
        q.stop()


def test_sink_arbitrary_replay_interleavings(spark, tmp_path):
    """Exactly-once holds under ANY replay pattern Structured
    Streaming can produce (each batch id re-delivered any number of
    times, interleaved, including crash-simulations that strip the
    commit marker after a completed rename): the final dataset holds
    exactly one copy of each batch."""
    import os
    import random

    out = str(tmp_path / "out")
    sink = exactly_once_parquet_sink(out)
    batches = {
        bid: spark.range(bid * 100, bid * 100 + 10 + bid).selectExpr(
            "id AS event_id"
        )
        for bid in range(4)
    }
    rng = random.Random(11)
    deliveries = [bid for bid in batches for _ in range(3)]
    rng.shuffle(deliveries)
    crashed = set()
    for i, bid in enumerate(deliveries):
        sink(batches[bid], bid)
        # once per batch, simulate crash-after-rename-before-marker
        if bid not in crashed and i % 2 == 0:
            marker = os.path.join(out, "_commits", str(bid))
            if os.path.exists(marker):
                os.remove(marker)
                crashed.add(bid)
    # every batch re-delivered once more after its possible crash
    for bid in batches:
        sink(batches[bid], bid)

    got = spark.read.parquet(out)
    expected = sum(10 + bid for bid in batches)
    assert got.count() == expected
    assert got.select("event_id").distinct().count() == expected


def test_crashed_replay_leaves_no_aside_and_recommits(spark, tmp_path):
    """Crash window repro: batch dir renamed in but the commit marker
    never written. Replay must re-commit via the rename-aside path and
    clean the aside dir up afterwards."""
    import os

    from distcpplus_spark.streaming.sinks import exactly_once_parquet_sink

    out = tmp_path / "out"
    out.mkdir()
    sink = exactly_once_parquet_sink(str(out))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    sink(df, 0)
    # simulate the crash-after-replace-before-marker state
    os.remove(out / "_commits" / "0")
    sink(df, 0)  # replay
    assert (out / "_commits" / "0").exists()
    assert not any(d.name.startswith("_aside_") for d in out.iterdir())
    got = spark.read.parquet(str(out)).count()
    assert got == 10


def test_crash_between_aside_and_replace_does_not_leak(spark, tmp_path):
    """Deeper crash window: the process died AFTER final was renamed
    aside but BEFORE tmp replaced it — replay finds final missing and
    (pre-fix) would take the no-aside branch, leaking the data-sized
    _aside_<id> dir forever. The sink must clear stale asides on every
    batch entry and still commit correct bytes."""
    import os
    import shutil

    from distcpplus_spark.streaming.sinks import exactly_once_parquet_sink

    out = tmp_path / "out"
    out.mkdir()
    sink = exactly_once_parquet_sink(str(out))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    sink(df, 0)
    # simulate: marker gone, final renamed aside, replace never ran
    os.remove(out / "_commits" / "0")
    os.rename(out / "batch_id=0", out / "_aside_0")
    sink(df, 0)  # replay
    assert (out / "_commits" / "0").exists()
    assert not any(d.name.startswith("_aside_") for d in out.iterdir())
    assert not any(d.name.startswith("_tmp_") for d in out.iterdir())
    assert spark.read.parquet(str(out)).count() == 10
