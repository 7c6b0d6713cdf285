"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running statistics (count, sum, max-gap anomaly flag) that
survive across micro-batches — the operator Spark's built-in windows
can't express because the state is an arbitrary reduction, not a
windowed aggregate.

Scale: state is one small tuple per user_id, partitioned by the
grouping key across executors; the watermark bounds how long idle
users' state is retained (GroupStateTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n BIGINT, total DOUBLE, last_ts_micros BIGINT"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("max_gap_s", T.DoubleType(), True),
    ]
)


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, None

    max_gap = None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()  # ns → µs
        for t in ts_us:
            if last_us is not None:
                gap = (t - last_us) / 1e6
                max_gap = gap if max_gap is None else max(max_gap, gap)
            last_us = t
        n += len(pdf)
        total += float(pdf["value"].sum())

    state.update((n, total, last_us))
    yield pd.DataFrame(
        [(user_id, n, round(total, 2), max_gap)],
        columns=["user_id", "n_events", "total_value", "max_gap_s"],
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Apply the stateful per-user reduction. Works on a streaming
    DataFrame (update mode); each micro-batch emits the cumulative
    stats for every user seen in that batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("closed", T.BooleanType(), False),
    ]
)


def _session_close_fn(key, pdfs, state: GroupState):
    """Emit running per-user counts; when the watermark passes the
    user's idle horizon the state times out, a final closed=True row
    is emitted, and the state is removed — bounded memory no matter
    how many users ever appeared."""
    (user_id,) = key
    if state.hasTimedOut:
        n, _total, _last = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, n, True)], columns=["user_id", "n_events", "closed"]
        )
        return

    n, total, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = int((pdf["ts"].astype("int64") // 1000).max())
        last_us = mx if last_us is None else max(last_us, mx)
    state.update((n, total, last_us))
    # close the session 10 event-time minutes after the last event
    state.setTimeoutTimestamp(last_us // 1000 + 10 * 60 * 1000)
    yield pd.DataFrame(
        [(user_id, n, False)], columns=["user_id", "n_events", "closed"]
    )


def user_sessions_with_timeout(events: DataFrame) -> DataFrame:
    """Stateful sessionization with EventTimeTimeout: state for idle
    users is expired by the watermark, not by memory pressure."""
    return (
        events.withWatermark("ts", "5 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_close_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
