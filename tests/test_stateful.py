"""applyInPandasWithState: state persists across micro-batches."""

from __future__ import annotations

import json
import time

from distcpplus_spark.streaming.pipelines import EVENTS_JSON_SCHEMA
from distcpplus_spark.streaming.stateful import running_user_stats


def write_chunk(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


COLLECTED: list = []


def drain(spark, stream_df, checkpoint, name):
    """foreachBatch sink (supports checkpoint recovery, unlike the
    memory sink) collecting rows into COLLECTED."""
    COLLECTED.clear()

    def collect_batch(batch_df, batch_id):
        COLLECTED.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(collect_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return list(COLLECTED)


def test_state_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    ck = str(tmp_path / "ck")

    write_chunk(
        src / "b0.json",
        [
            {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 7,
             "event_type": "a", "value": 10.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01 00:00:30", "user_id": 7,
             "event_type": "a", "value": 5.0, "props": "{}"},
        ],
    )
    stream = spark.readStream.schema(EVENTS_JSON_SCHEMA).json(str(src))
    rows = drain(spark, running_user_stats(stream), ck, "s1")
    row1 = max((r for r in rows if r["user_id"] == 7), key=lambda r: r["n_events"])
    assert row1["n_events"] == 2
    assert row1["total_value"] == 15.0
    assert row1["max_gap_s"] == 30.0

    # second batch, new file: state must carry over (n=3, not 1)
    write_chunk(
        src / "b1.json",
        [
            {"event_id": 3, "ts": "2024-01-01 00:02:30", "user_id": 7,
             "event_type": "a", "value": 1.0, "props": "{}"},
        ],
    )
    stream2 = spark.readStream.schema(EVENTS_JSON_SCHEMA).json(str(src))
    rows2 = drain(spark, running_user_stats(stream2), ck, "s2")
    row2 = max((r for r in rows2 if r["user_id"] == 7), key=lambda r: r["n_events"])
    assert row2["n_events"] == 3
    assert row2["total_value"] == 16.0
    assert row2["max_gap_s"] == 120.0  # gap from 00:00:30 → 00:02:30


def test_event_time_timeout_closes_idle_sessions(spark, tmp_path):
    from distcpplus_spark.streaming.stateful import user_sessions_with_timeout

    src = tmp_path / "ev_to"
    src.mkdir()
    ck = str(tmp_path / "ck_to")

    write_chunk(src / "b0.json", [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 7,
         "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01 00:01:00", "user_id": 7,
         "event_type": "a", "value": 1.0, "props": "{}"},
    ])
    stream = spark.readStream.schema(EVENTS_JSON_SCHEMA).json(str(src))
    rows = drain(spark, user_sessions_with_timeout(stream), ck, "t1")
    assert {(r["user_id"], r["closed"]) for r in rows} == {(7, False)}

    # a far-future event from ANOTHER user advances the watermark past
    # user 7's idle horizon (00:01 + 10min) → 7's state times out
    write_chunk(src / "b1.json", [
        {"event_id": 3, "ts": "2024-01-01 01:00:00", "user_id": 9,
         "event_type": "a", "value": 1.0, "props": "{}"},
    ])
    stream2 = spark.readStream.schema(EVENTS_JSON_SCHEMA).json(str(src))
    rows2 = drain(spark, user_sessions_with_timeout(stream2), ck, "t2")
    closed = [r for r in rows2 if r["closed"]]
    assert len(closed) == 1
    assert closed[0]["user_id"] == 7
    assert closed[0]["n_events"] == 2
