"""The copy executor: the engine's one genuinely imperative operator.

Per plan row (inside mapPartitions — distributed, no driver loop):
mkdir for dirs; re-check skip condition at exec time (plan may be
stale, DefaultCopyFilesMapper.java:129-136); stream bytes to
``<dst>/_distcp_tmp_<runid>/<relative>`` in 128 KB chunks; verify
copied length; atomic publish via delete-then-rename; verify again
post-rename; preserve attributes. Failures are caught per-row and
emitted as result rows (DefaultCopyFilesMapper.java:248-287) — the
job-level failure gate is relational (count FAIL rows).

Mirrors the protocol of DefaultCopyFilesMapper.java:105-206 and
DistCpUtils.rename (DistCpUtils.java:44-57), re-expressed for a
POSIX filesystem. Speculative execution must stay off for copy jobs
(two writers, one dst — DistCPPlus.java:459-461); Spark's default is
off, and the tmp-file name includes the task attempt to be safe.
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

COPY_BUFFER_BYTES = 128 * 1024  # copy.buf.size, DefaultCopyFilesMapper.java:33
CLEANUP_RETRIES = 3  # DefaultCopyFilesMapper.java:267-279
CLEANUP_RETRY_SLEEP_S = 3.0

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("relative_dst", T.StringType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("status", T.StringType(), False),  # COPY|SKIP|MKDIR|FAIL
        T.StructField("bytes_copied", T.LongType(), False),
        T.StructField("bytes_expected", T.LongType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("elapsed_ms", T.LongType(), False),
    ]
)


class CopyFailedError(Exception):
    """Raised by the job-level gate when FAIL rows exist and
    ignore_failures is off (DefaultCopyFilesMapper.java:289-295)."""


def _copy_one(
    src: str,
    tmp_path: str,
    final_path: str,
    expected_len: int,
    preserve: frozenset[str],
    src_stat: os.stat_result,
) -> int:
    os.makedirs(os.path.dirname(tmp_path), exist_ok=True)
    copied = 0
    with open(src, "rb") as fin, open(tmp_path, "wb") as fout:
        while True:
            buf = fin.read(COPY_BUFFER_BYTES)
            if not buf:
                break
            fout.write(buf)
            copied += len(buf)
    # verify tmp length (DefaultCopyFilesMapper.java:166-171)
    actual = os.stat(tmp_path).st_size
    if actual != expected_len:
        raise OSError(
            f"length mismatch after copy: expected {expected_len}, got {actual}"
        )
    # atomic publish: delete-then-rename (DistCpUtils.java:44-57)
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    if os.path.exists(final_path):
        os.remove(final_path)
    os.replace(tmp_path, final_path)
    # verify post-rename (DefaultCopyFilesMapper.java:191-198)
    actual = os.stat(final_path).st_size
    if actual != expected_len:
        raise OSError(
            f"length mismatch after rename: expected {expected_len}, got {actual}"
        )
    _apply_attrs(final_path, src_stat, preserve)
    return copied


def _apply_attrs(path: str, src_stat: os.stat_result, preserve: frozenset[str]) -> None:
    """-p attribute preservation for files, applied in-task
    (DistCPPlus.java:234-262; dirs are finalized post-job)."""
    import stat as statmod

    if "p" in preserve:
        os.chmod(path, statmod.S_IMODE(src_stat.st_mode))
    if "t" in preserve:
        os.utime(path, (src_stat.st_atime, src_stat.st_mtime))


def default_copy_fn(
    rows: Iterator, dst_root: str, tmp_root: str, preserve: frozenset[str]
) -> Iterator[tuple]:
    """Copy a partition of plan rows; yields result tuples.

    This is the default "mapper"; the engine accepts a user-supplied
    replacement (the -mapper pluggable surface, DistCPPlus.java:467-480).
    """
    import stat as statmod

    for row in rows:
        t0 = time.time()
        rel = row["relative_dst"]
        final_path = os.path.join(dst_root, rel)
        try:
            if row["is_dir"]:
                os.makedirs(final_path, exist_ok=True)
                yield (
                    row["path"], rel, row["action"], "MKDIR", 0, 0, None,
                    int((time.time() - t0) * 1000),
                )
                continue
            src_stat = os.stat(row["path"])
            expected = src_stat.st_size
            # exec-time re-check (P12): plan may be stale by now
            if (
                row["action"] == "copy_changed"
                and os.path.exists(final_path)
                and os.stat(final_path).st_size == expected
                and int(os.stat(final_path).st_mtime) == int(src_stat.st_mtime)
            ):
                yield (
                    row["path"], rel, row["action"], "SKIP", 0, expected, None,
                    int((time.time() - t0) * 1000),
                )
                continue
            tmp_path = os.path.join(tmp_root, rel)
            copied = 0
            try:
                copied = _copy_one(
                    row["path"], tmp_path, final_path, expected,
                    preserve, src_stat,
                )
            except Exception:
                # tmp cleanup with retries (DefaultCopyFilesMapper.java:267-279)
                for attempt in range(CLEANUP_RETRIES):
                    try:
                        if os.path.exists(tmp_path):
                            os.remove(tmp_path)
                        break
                    except OSError:
                        time.sleep(CLEANUP_RETRY_SLEEP_S)
                raise
            yield (
                row["path"], rel, row["action"], "COPY", copied, expected, None,
                int((time.time() - t0) * 1000),
            )
        except Exception as e:  # per-row failure isolation (O14)
            yield (
                row["path"], rel, row.asDict().get("action"), "FAIL", 0,
                row["length"], f"{type(e).__name__}: {e}",
                int((time.time() - t0) * 1000),
            )


def execute_copy(
    plan: DataFrame,
    dst_root: str,
    run_id: str,
    preserve: frozenset[str] = frozenset(),
    copy_fn: Callable | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Run the copy: repartition by cost bucket → mapPartitions(copy).

    Returns the result DataFrame (one row per plan row) — the engine's
    counters (O15) are aggregations over it. ``copy_fn`` swaps the
    copy implementation (pluggable-mapper surface, O18).
    """
    spark = plan.sparkSession
    tmp_root = os.path.join(dst_root, f"_distcp_tmp_{run_id}")
    fn = copy_fn or default_copy_fn

    if "bucket" in plan.columns:
        n = num_buckets or (plan.agg(F.max("bucket")).collect()[0][0] or 0) + 1
        # mkdir rows must run before file rows within a partition;
        # sortWithinPartitions puts dirs first (paths sort parent<child)
        work = plan.repartition(n, "bucket").sortWithinPartitions(
            F.desc("is_dir"), F.asc("path")
        )
    else:
        work = plan

    def run_partition(rows: Iterator) -> Iterator[tuple]:
        return fn(rows, dst_root, tmp_root, preserve)

    result = spark.createDataFrame(
        work.rdd.mapPartitions(run_partition), RESULT_SCHEMA
    )
    return result


def counters(result: DataFrame) -> dict[str, int]:
    """Counter aggregation (O15): {COPY, SKIP, FAIL, MKDIR} counts +
    byte totals, one pass."""
    rows = (
        result.groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.sum("bytes_copied").alias("bytes"),
            F.sum("bytes_expected").alias("expected"),
        )
        .collect()
    )
    out = {"COPY": 0, "SKIP": 0, "FAIL": 0, "MKDIR": 0,
           "BYTESCOPIED": 0, "BYTESEXPECTED": 0}
    for r in rows:
        out[r["status"]] = r["n"]
        out["BYTESCOPIED"] += r["bytes"] or 0
        out["BYTESEXPECTED"] += r["expected"] or 0
    return out


def cleanup_tmp(dst_root: str, run_id: str) -> None:
    """Remove the run's tmp dir (cleanupJob, DistCPPlus.java:389-403)."""
    tmp_root = os.path.join(dst_root, f"_distcp_tmp_{run_id}")
    shutil.rmtree(tmp_root, ignore_errors=True)
