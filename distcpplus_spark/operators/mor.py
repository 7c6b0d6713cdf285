"""Merge-on-read deletes: Iceberg-v2-style positional and equality
delete files, resolved at scan time.

The copy-on-write upsert (operators/upsert.py) rewrites every data
file a change touches — correct, but at 100 TB a single deleted row
costs a full-file rewrite. The merge-on-read alternative (the public
Iceberg v2 / Delta deletion-vector design) appends tiny DELETE files
instead and makes the READER subtract them:

* positional deletes name (row_id) — "kill the row at this stable
  position" — written by jobs that already know the row's identity;
* equality deletes name key values — "kill every row where k = v" —
  written by jobs that only know the business key (GDPR erasure, CDC
  tombstones).

Both resolve as ANTI-JOINS against the base scan: deletes are
metadata-sized, so Spark broadcasts them and the read stays one scan
+ broadcast anti-joins — no base rewrite until a compaction folds
them in (compact_mor, the maintenance twin — same plan/execute
split as O19).

Row ids here are explicit (assigned once at write with the
distributed prefix-sum discipline, q161/q285), not file offsets:
parquet row positions are not stable across Spark's task layout, so
an honest positional delete must reference a persisted id column.

Reference parity: the reference has no table format (it copies
files, DistCPPlus.java); this is north-star scope alongside
upsert/time-travel/CDC.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_DIR = "base"
POS_DIR = "_pos_deletes"
EQ_DIR = "_eq_deletes"


def write_mor_base(df: DataFrame, root: str, order_col: str) -> int:
    """Write the base table with a persisted stable ``_row_id``
    (dense 0..n-1 in ``order_col`` order, assigned via the two-phase
    distributed prefix sum — no global window). Returns row count."""
    from distcpplus_spark.operators.scale import partitioned_running_agg

    ranked = partitioned_running_agg(
        df.repartitionByRange(order_col).withColumn("_one", F.lit(1)),
        [order_col],
        "_one",
        "_rk",
        F.spark_partition_id(),
        deterministic_bucket=False,
    )
    base = ranked.withColumn(
        "_row_id", (F.col("_rk") - 1).cast("bigint")
    ).drop("_one", "_rk")
    out_path = os.path.join(root, BASE_DIR)
    base.write.mode("overwrite").parquet(out_path)
    # count from the written files' footers — counting `base` itself
    # would re-execute the whole prefix-sum lineage a second time
    return df.sparkSession.read.parquet(out_path).count()


def append_positional_deletes(
    spark: SparkSession, root: str, row_ids: list[int]
) -> None:
    """Append one positional-delete file (tiny: row ids only).

    repartition(1), NOT coalesce(1): a parallelized local relation
    coalesced without a shuffle evaluates every parent slice
    sequentially in one task, each paying a Python-worker round trip
    (~150 ms x defaultParallelism ≈ 5 s measured); the one-row
    shuffle is ~0.5 s."""
    path = os.path.join(root, POS_DIR)
    spark.createDataFrame(
        [(int(r),) for r in row_ids], "_row_id BIGINT"
    ).repartition(1).write.mode("append").parquet(path)


def append_equality_deletes(
    spark: SparkSession, root: str, keys: DataFrame
) -> None:
    """Append one equality-delete file carrying the key columns to
    kill (every base row matching ALL key columns of any delete row
    is dead). repartition(1) for the same local-relation reason as
    append_positional_deletes."""
    keys.repartition(1).write.mode("append").parquet(
        os.path.join(root, EQ_DIR)
    )


def read_mor(spark: SparkSession, root: str) -> DataFrame:
    """Scan-time resolution: base ANTI-JOIN positional deletes on
    _row_id, then ANTI-JOIN equality deletes on their key columns.
    Delete sides are metadata-sized → broadcast; the base scan's
    pushdown/pruning is untouched (anti-join sits above the scan)."""
    base = spark.read.parquet(os.path.join(root, BASE_DIR))
    pos_path = os.path.join(root, POS_DIR)
    if os.path.isdir(pos_path):
        pos = spark.read.parquet(pos_path).select("_row_id").distinct()
        base = base.join(F.broadcast(pos), "_row_id", "left_anti")
    eq_path = os.path.join(root, EQ_DIR)
    if os.path.isdir(eq_path):
        eq = spark.read.parquet(eq_path).distinct()
        base = base.join(F.broadcast(eq), eq.columns, "left_anti")
    return base


def compact_mor(spark: SparkSession, root: str) -> int:
    """Fold the delete files into the base (rewrite once, then drop
    them) — the read-amplification/write-amplification trade turned
    back: run when delete files accumulate. tmp+rename via a
    versioned swap; returns surviving row count."""
    import shutil

    resolved = read_mor(spark, root)
    tmp = os.path.join(root, BASE_DIR + "._tmp_compact")
    resolved.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    final = os.path.join(root, BASE_DIR)
    shutil.rmtree(final)
    os.rename(tmp, final)
    for d in (POS_DIR, EQ_DIR):
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return n
