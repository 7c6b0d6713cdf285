"""Incremental file sync: the streaming twin of the copy engine (M4).

Watches a source directory and incrementally syncs it to dst using
the SAME planning anti-join and copy executor as the batch engine —
foreachBatch turns each micro-batch into a plan+execute run. The
reference has no streaming story; its closest analogue is re-running
`-update` on a cron, which rescans the world every time. Here the
file-source tracks processed files in the checkpoint, so each batch
plans only against the delta.

Design note: the stream carries file *paths* (cheap), not contents —
the copy executor reads bytes inside mapPartitions exactly as in
batch mode. At 100 TB, maxFilesPerTrigger bounds batch size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from distcpplus_spark.engine import CopyOptions, DistCpPlusEngine


def incremental_sync(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    checkpoint_dir: str,
    opts: CopyOptions | None = None,
    max_files_per_trigger: int = 1000,
    glob: str = "*",
) -> StreamingQuery:
    """Start a stream that mirrors new/changed files under src_root
    into dst_root. Returns the StreamingQuery (caller manages
    lifecycle: processAllAvailable / stop)."""
    opts = opts or CopyOptions(update=True, skip_ts_check=True)
    engine = DistCpPlusEngine(spark)

    paths = (
        spark.readStream.format("binaryFile")
        .schema(
            "path STRING, modificationTime TIMESTAMP, "
            "length BIGINT, content BINARY"
        )
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(src_root)
        # drop content immediately: the plan needs metadata only; the
        # copier re-reads bytes (binaryFile has no metadata-only mode)
        .select("path", "length", "modificationTime")
    )

    def sync_batch(batch_df: DataFrame, batch_id: int) -> None:
        changed = [
            r["path"].removeprefix("file:")
            for r in batch_df.select("path").collect()
        ]
        if not changed:
            return
        # Plan over just the delta: list only the changed files'
        # parent set, filter to the exact paths, then reuse the batch
        # planner + executor end-to-end.
        plan = engine.plan([src_root], dst_root, opts)
        delta = plan.copies.filter(F.col("path").isin(changed) | F.col("is_dir"))
        from distcpplus_spark.engine import CopyPlan

        engine.execute(
            CopyPlan(
                copies=delta,
                deletes=None,
                opts=opts,
                dst_root=dst_root,
                run_id=f"stream{batch_id}",
            )
        )

    return (
        paths.writeStream.foreachBatch(sync_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "sync"))
        .trigger(availableNow=True)
        .start()
    )
