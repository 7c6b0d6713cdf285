"""Watermark semantics in append mode: a window only emits once the
watermark passes it, and data arriving after that is dropped — the
late-data contract (SURVEY.md §2b-S)."""

from __future__ import annotations

import json

from distcpplus_spark.streaming.pipelines import (
    EVENTS_JSON_SCHEMA,
    tumbling_counts,
)

COLLECTED: list = []


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain_append(spark, src, checkpoint):
    COLLECTED.clear()

    def sink(batch_df, batch_id):
        COLLECTED.extend(batch_df.collect())

    stream = spark.readStream.schema(EVENTS_JSON_SCHEMA).json(str(src))
    q = (
        tumbling_counts(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return list(COLLECTED)


def _ev(i, ts, v=1.0):
    return {
        "event_id": i, "ts": ts, "user_id": 1,
        "event_type": "a", "value": v, "props": "{}",
    }


def test_append_mode_emits_closed_windows_and_drops_late(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    ck = str(tmp_path / "ck")

    # Batch 0: two events in the 00:00 window + one far ahead that
    # advances the watermark past it (03:00 - 15min >> 00:10).
    _write(src / "b0.json", [
        _ev(1, "2024-01-01 00:01:00", 10.0),
        _ev(2, "2024-01-01 00:04:00", 5.0),
        _ev(3, "2024-01-01 03:00:00", 1.0),
    ])
    rows0 = _drain_append(spark, src, ck)

    # Batch 1: a LATE event for the already-closed 00:00 window — must
    # be dropped, the window must not re-emit with a new total.
    _write(src / "b1.json", [
        _ev(4, "2024-01-01 00:02:00", 100.0),
        _ev(5, "2024-01-01 05:00:00", 1.0),
    ])
    rows1 = _drain_append(spark, src, ck)

    emitted = {
        (str(r["win_start"]), r["n"], r["total"]) for r in rows0 + rows1
    }
    zero_window = [e for e in emitted if e[0].startswith("2024-01-01 00:00")]
    # the 00:00 window closed with exactly the two on-time events
    assert zero_window == [("2024-01-01 00:00:00", 2, 15.0)]
    # and it was emitted exactly once across both drains
    all_rows = [r for r in rows0 + rows1
                if str(r["win_start"]).startswith("2024-01-01 00:00")]
    assert len(all_rows) == 1
