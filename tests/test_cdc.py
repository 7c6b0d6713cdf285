"""Streaming CDC mirror (streaming/cdc.py): latest-sequence-wins
fold, tombstone retention, idempotent replay, out-of-order batches."""

import os

from pyspark.sql import functions as F


def _mk_changelog(spark, rows):
    return spark.createDataFrame(
        rows, "k BIGINT, op STRING, seq BIGINT, v STRING"
    )


def _write_files(df, path, n):
    df.repartition(n).write.json(path)


def test_mirror_latest_wins_and_tombstones(spark, tmp_path):
    from distcpplus_spark.streaming.cdc import cdc_mirror, read_mirror

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k BIGINT, v STRING"
    )
    changes = _mk_changelog(
        spark,
        [
            (1, "U", 10, "a1"), (1, "U", 20, "a2"),
            (2, "D", 10, None),
            (4, "I", 10, "d"),
        ],
    )
    src = str(tmp_path / "src")
    _write_files(changes, src, 2)
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("k BIGINT, op STRING, seq BIGINT, v STRING")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    cdc_mirror(
        spark, stream, state, str(tmp_path / "ck"), "k", ["v"], initial=base
    )
    got = sorted(
        (r["k"], r["v"]) for r in read_mirror(spark, state).collect()
    )
    assert got == [(1, "a2"), (3, "c"), (4, "d")]
    # tombstone for key 2 is RETAINED in the raw state
    raw = spark.read.parquet(os.path.join(state, "current"))
    dels = [r["k"] for r in raw.filter("_del").collect()]
    assert dels == [2]


def test_mirror_rerun_is_idempotent(spark, tmp_path):
    """Re-running the drained stream with the SAME checkpoint must
    leave the state unchanged (no batches re-fire); re-running with
    a FRESH checkpoint re-applies everything and — latest-wins — the
    state is still identical."""
    from distcpplus_spark.streaming.cdc import cdc_mirror, read_mirror

    base = spark.createDataFrame([(1, "a")], "k BIGINT, v STRING")
    changes = _mk_changelog(spark, [(1, "U", 5, "a5"), (2, "I", 1, "b")])
    src = str(tmp_path / "src")
    _write_files(changes, src, 2)
    state = str(tmp_path / "state")

    def stream():
        return (
            spark.readStream.schema(
                "k BIGINT, op STRING, seq BIGINT, v STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )

    cdc_mirror(spark, stream(), state, str(tmp_path / "ck"), "k", ["v"],
               initial=base)
    first = sorted(map(tuple, read_mirror(spark, state).collect()))
    cdc_mirror(spark, stream(), state, str(tmp_path / "ck"), "k", ["v"],
               initial=base)
    assert sorted(map(tuple, read_mirror(spark, state).collect())) == first
    cdc_mirror(spark, stream(), state, str(tmp_path / "ck2"), "k", ["v"],
               initial=base)
    assert sorted(map(tuple, read_mirror(spark, state).collect())) == first


def test_mirror_out_of_order_batches_converge(spark, tmp_path):
    """The same changelog split into batches in two different orders
    must converge to the same snapshot — latest-SEQUENCE-wins, not
    latest-arrival-wins."""
    from distcpplus_spark.streaming.cdc import cdc_mirror, read_mirror

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k BIGINT, v STRING")
    early = [(1, "U", 10, "a-early"), (2, "U", 10, "b-early")]
    late = [(1, "U", 99, "a-final"), (2, "D", 99, None)]
    finals = {}
    for tag, order in (("fwd", [early, late]), ("rev", [late, early])):
        root = tmp_path / tag
        src = str(root / "src")
        # one file per sub-batch, named to force arrival order
        for i, batch in enumerate(order):
            _mk_changelog(spark, batch).coalesce(1).write.mode(
                "append"
            ).json(src)
        stream = (
            spark.readStream.schema(
                "k BIGINT, op STRING, seq BIGINT, v STRING"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        state = str(root / "state")
        cdc_mirror(spark, stream, state, str(root / "ck"), "k", ["v"],
                   initial=base)
        finals[tag] = sorted(map(tuple, read_mirror(spark, state).collect()))
    assert finals["fwd"] == finals["rev"] == [(1, "a-final")]


def test_compact_mirror_drops_old_tombstones_only(spark, tmp_path):
    from distcpplus_spark.streaming.cdc import (
        cdc_mirror,
        compact_mirror,
        read_mirror,
    )

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                 "k BIGINT, v STRING")
    changes = _mk_changelog(
        spark, [(1, "D", 10, None), (2, "D", 50, None)]
    )
    src = str(tmp_path / "src")
    _write_files(changes, src, 1)
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("k BIGINT, op STRING, seq BIGINT, v STRING")
        .json(src)
    )
    cdc_mirror(spark, stream, state, str(tmp_path / "ck"), "k", ["v"],
               initial=base)
    before, after = compact_mirror(spark, state, tombstone_horizon_seq=20)
    assert (before, after) == (2, 1)  # seq-10 dropped, seq-50 kept
    got = sorted(r["k"] for r in read_mirror(spark, state).collect())
    assert got == [3]
