"""Streaming CDC mirror: fold a changelog stream (I/U/D + sequence)
into a latest-wins parquet snapshot — the continuous counterpart of
``operators/upsert.py::apply_changelog`` and the standard
binlog/Debezium ingestion shape.

Design for correctness under streaming's delivery contract:

- **Idempotent by construction.** foreachBatch is at-least-once; a
  replayed batch re-unions the same rows and the max-sequence fold
  produces the identical snapshot, so replays commit the same bytes.
- **Out-of-order tolerant.** Batches need not arrive in sequence
  order: every merge is latest-SEQUENCE-wins, never
  latest-ARRIVAL-wins, so an early-arriving late change cannot be
  overwritten by a late-arriving earlier one.
- **Tombstones retained.** Deletes persist as flagged rows instead of
  disappearing: if a delete vanished, an older update arriving later
  would resurrect the key. ``read_mirror`` filters them; compaction
  can drop tombstones older than the out-of-order horizon.
- **Atomic state swap.** Each batch writes the next snapshot to a tmp
  dir while the current one is still readable, then swaps with the
  rename-aside dance (streaming/sinks.py); readers never see a
  partial state.

Scale shape: the fold is one window partitioned BY KEY over
state ∪ batch — at 100 TB pair with hidden partitioning / bucketing
on the key so the nightly state rewrite is partition-local (see
upsert_partitioned), and compact tombstones on a schedule.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, "current")


def cdc_mirror(
    spark: SparkSession,
    changelog: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str,
    payload_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    initial: DataFrame | None = None,
    timeout_s: int = 120,
) -> None:
    """Drain a (streaming) changelog into the mirror at
    ``state_dir/current`` with trigger(availableNow). ``initial``
    seeds the snapshot (sequence below every change)."""
    os.makedirs(state_dir, exist_ok=True)
    cur_path = _state_path(state_dir)
    if initial is not None and not os.path.exists(cur_path):
        seeded = initial.select(
            key,
            *payload_cols,
            F.lit(-1).cast("long").alias("_seq"),
            F.lit(False).alias("_del"),
        )
        tmp = os.path.join(state_dir, "_seed_tmp")
        seeded.write.mode("overwrite").parquet(tmp)
        os.replace(tmp, cur_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tagged = batch_df.select(
            key,
            *payload_cols,
            F.col(seq_col).cast("long").alias("_seq"),
            (F.col(op_col) == "D").alias("_del"),
        )
        cur = spark.read.parquet(cur_path)
        merged = cur.unionByName(tagged)
        w = W.partitionBy(key).orderBy(F.desc("_seq"))
        nxt = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        tmp = os.path.join(state_dir, f"_tmp_{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        nxt.write.mode("overwrite").parquet(tmp)  # reads cur; cur intact
        aside = os.path.join(state_dir, f"_aside_{batch_id}")
        shutil.rmtree(aside, ignore_errors=True)
        os.rename(cur_path, aside)
        os.replace(tmp, cur_path)
        shutil.rmtree(aside, ignore_errors=True)

    q = (
        changelog.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def read_mirror(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current snapshot without tombstones or bookkeeping columns."""
    cur = spark.read.parquet(_state_path(state_dir))
    return cur.filter(~F.col("_del")).drop("_seq", "_del")


def compact_mirror(
    spark: SparkSession, state_dir: str, tombstone_horizon_seq: int
) -> tuple[int, int]:
    """Drop tombstones whose sequence is at or below the out-of-order
    horizon (no change with a lower sequence can still arrive, so the
    tombstone has nothing left to suppress) and rewrite the state
    atomically. Returns (tombstones_before, tombstones_after). Run on
    a schedule; at scale pair with partition-local rewrites."""
    cur_path = _state_path(state_dir)
    cur = spark.read.parquet(cur_path)
    before = cur.filter(F.col("_del")).count()
    kept = cur.filter(
        ~F.col("_del") | (F.col("_seq") > tombstone_horizon_seq)
    )
    tmp = os.path.join(state_dir, "_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    kept.write.mode("overwrite").parquet(tmp)
    aside = os.path.join(state_dir, "_compact_aside")
    shutil.rmtree(aside, ignore_errors=True)
    os.rename(cur_path, aside)
    os.replace(tmp, cur_path)
    shutil.rmtree(aside, ignore_errors=True)
    after = spark.read.parquet(cur_path).filter(F.col("_del")).count()
    return before, after
