"""Sink-side streaming utilities: exactly-once foreachBatch output.

Structured Streaming's foreachBatch contract is AT-LEAST-once: after a
failure, the last in-flight micro-batch is REPLAYED with the same
``batch_id`` (the checkpoint only records batches whose foreachBatch
call returned). Exactly-once output therefore needs an idempotent
sink: same (batch_id, data) in, same committed bytes out, no matter
how many times the call runs.

The pattern here is the same tmp+rename+marker protocol the copy
executor uses (operators/copier.py): write the batch to a tmp dir,
atomically rename into place, then touch a commit marker named by the
batch id. A replay sees the marker and returns without writing. On a
cluster the rename maps to the output committer / multipart-complete;
the marker dir is the streaming twin of the reference's job-commit
semantics (DistCPPlus.java:485-533 tmp-dir lifecycle).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame


def exactly_once_parquet_sink(
    output_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function writing each micro-batch to
    ``output_dir/batch_id=<id>/`` exactly once.

    Layout::

        output_dir/
          batch_id=0/part-*.parquet   ← committed batches (a valid
          batch_id=1/...                 hive-partitioned dataset:
          _commits/0, _commits/1      ← spark.read.parquet(output_dir)
          _tmp_2/                     ← in-flight / crashed attempt
                                         (ignored by readers, replaced
                                         on replay)

    Readers see only renamed-in batch dirs; ``_tmp_*`` and ``_commits``
    are underscore-prefixed so Spark/DuckDB parquet readers skip them.
    """
    commits = os.path.join(output_dir, "_commits")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(commits, str(batch_id))
        if os.path.exists(marker):
            return  # replayed batch: already committed, do nothing
        final = os.path.join(output_dir, f"batch_id={batch_id}")
        tmp = os.path.join(output_dir, f"_tmp_{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        # a crash between rename(final→aside) and replace(tmp→final)
        # leaves final missing and a stale aside dir the
        # aside-only-if-final-exists branch below would never touch —
        # clear any leftover aside unconditionally on entry so no
        # replay path can leak a data-sized orphan
        shutil.rmtree(
            os.path.join(output_dir, f"_aside_{batch_id}"), ignore_errors=True
        )
        batch_df.write.mode("overwrite").parquet(tmp)
        # Replay after a crash between replace and marker-write finds
        # `final` already populated. Rename it ASIDE (one atomic rename,
        # underscore-prefixed so readers skip it) instead of rmtree'ing
        # it in place — rmtree would leave concurrent readers a
        # data-sized window with the batch missing; two renames leave
        # only a nanosecond-scale one (POSIX can't atomically swap a
        # non-empty dir). The aside copy is deleted only after `final`
        # is back.
        aside = None
        if os.path.exists(final):
            aside = os.path.join(output_dir, f"_aside_{batch_id}")
            shutil.rmtree(aside, ignore_errors=True)
            os.rename(final, aside)
        os.replace(tmp, final)
        if aside is not None:
            shutil.rmtree(aside, ignore_errors=True)
        os.makedirs(commits, exist_ok=True)
        with open(marker, "w") as f:
            f.write("")

    return write_batch


def drain_to_parquet(
    stream_df: DataFrame, output_dir: str, checkpoint: str, timeout: int = 120
) -> None:
    """Drain everything currently available in ``stream_df`` into the
    exactly-once parquet sink and stop (trigger availableNow). Re-runs
    with the same checkpoint resume from the recorded offsets — the
    batch-scheduled incremental-ingest pattern (run from cron, each run
    picks up exactly the new input)."""
    q = (
        stream_df.writeStream.foreachBatch(exactly_once_parquet_sink(output_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout)
    if not finished:
        # never return with the stream still writing: a caller reading
        # output_dir would see a partial batch set and a leaked query
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout}s "
            f"(checkpoint: {checkpoint})"
        )
