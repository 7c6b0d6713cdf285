"""Partitioned upsert: merge correctness + untouched partitions stay
byte-identical on disk (the whole point at 100 TB)."""

from __future__ import annotations

import glob
import os

from distcpplus_spark.operators.upsert import upsert_partitioned


def _files_with_mtime(path, part):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, f"day={part}", "*.parquet"))
    }


def test_upsert_merges_and_leaves_other_partitions_untouched(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3")],
        "id long, v string, day string",
    )
    path = str(tmp_path / "tbl")
    base.write.partitionBy("day").parquet(path)
    untouched_before = _files_with_mtime(path, "d3")

    updates = spark.createDataFrame(
        [(2, "B2", "d1"), (9, "NEW", "d2")], "id long, v string, day string"
    )
    n = upsert_partitioned(spark, path, updates, key="id", partition_col="day")
    assert n == 2  # d1 and d2 rewritten, d3 not

    got = {
        (r["id"], r["v"], r["day"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "a", "d1"), (2, "B2", "d1"),  # update applied
        (3, "c", "d2"), (9, "NEW", "d2"),  # insert applied
        (4, "d", "d3"),  # untouched
    }
    assert _files_with_mtime(path, "d3") == untouched_before


def test_upsert_latest_version_wins(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "old", "d1", 0)], "id long, v string, day string, ver long"
    )
    path = str(tmp_path / "tbl2")
    base.write.partitionBy("day").parquet(path)

    updates = spark.createDataFrame(
        [(1, "mid", "d1", 5), (1, "new", "d1", 9)],
        "id long, v string, day string, ver long",
    )
    upsert_partitioned(
        spark, path, updates, key="id", partition_col="day", version_col="ver"
    )
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 1
    assert rows[0]["v"] == "new"
