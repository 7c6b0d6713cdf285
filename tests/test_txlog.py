"""OCC transaction log (operators/txlog.py): multi-writer commits,
conflict detection, time travel over the log fold, orphan vacuum."""

from __future__ import annotations

import os
import tempfile
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from distcpplus_spark.operators import txlog


@pytest.fixture()
def root():
    with tempfile.TemporaryDirectory() as d:
        yield os.path.join(d, "tbl")


def _df(spark, lo, hi, part):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(part).alias("part")
    )


def test_sequential_appends_fold(spark, root):
    v1 = txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    v2 = txlog.append_df(_df(spark, 10, 30, "b"), root, ["b"])
    assert (v1, v2) == (1, 2)
    assert txlog.read_table(spark, root).count() == 30
    # time travel: v1 sees only the first append
    assert txlog.read_table(spark, root, version=1).count() == 10


def test_concurrent_appends_all_commit(spark, root):
    txlog.append_df(_df(spark, 0, 1, "seed"), root, ["seed"])

    def work(i):
        return txlog.append_df(
            _df(spark, 100 * i, 100 * i + 10, f"p{i}"), root, [f"p{i}"]
        )

    with ThreadPoolExecutor(max_workers=8) as ex:
        versions = list(ex.map(work, range(8)))
    # every writer committed, versions are distinct and dense
    assert sorted(versions) == list(range(2, 10))
    assert txlog.read_table(spark, root).count() == 1 + 80


def test_rewrite_replaces_partition(spark, root):
    txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    txlog.append_df(_df(spark, 10, 20, "b"), root, ["b"])
    txlog.rewrite_partition(_df(spark, 1000, 1003, "a"), root, "a")
    rows = txlog.read_table(spark, root)
    assert rows.filter(F.col("part") == "a").count() == 3
    assert rows.filter(F.col("part") == "b").count() == 10


def test_append_vs_rewrite_conflict(spark, root):
    txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    v0 = txlog.current_version(root)
    # a rewrite of 'a' lands after our snapshot...
    txlog.rewrite_partition(_df(spark, 50, 55, "a"), root, "a")
    # ...so an append to 'a' staged against the stale snapshot must abort
    txn = "deadbeef0001"
    adds = txlog._stage(_df(spark, 90, 95, "a"), root, txn)
    with pytest.raises(txlog.CommitConflict):
        txlog.commit(
            root,
            op_type="append",
            partitions=["a"],
            adds=adds,
            removes=[],
            read_version=v0,
            txn_id=txn,
        )
    # aborted writer's staged files were cleaned up and are not live
    assert txlog.read_table(spark, root).filter(
        (F.col("id") >= 90) & (F.col("id") < 95)
    ).count() == 0
    # append to a DIFFERENT partition with the same stale snapshot commutes
    v = txlog.append_df(_df(spark, 200, 205, "c"), root, ["c"])
    assert v == txlog.current_version(root)


def test_rewrite_vs_concurrent_append_conflict(spark, root):
    txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    v0 = txlog.current_version(root)
    txlog.append_df(_df(spark, 10, 20, "a"), root, ["a"])  # intervening
    txn = "deadbeef0002"
    adds = txlog._stage(_df(spark, 1000, 1001, "a"), root, txn)
    with pytest.raises(txlog.CommitConflict):
        txlog.commit(
            root,
            op_type="rewrite",
            partitions=["a"],
            adds=adds,
            removes=[],
            read_version=v0,
            txn_id=txn,
        )


def test_orphan_vacuum(spark, root):
    txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    # stage without committing = crash debris
    txlog._stage(_df(spark, 50, 60, "x"), root, "crashedtxn0")
    doomed = txlog.orphan_files(root)
    assert doomed and all("crashedtxn0" in p for p in doomed)
    # retention window: a default vacuum must NOT touch fresh debris
    # (a live writer's mid-commit state looks exactly like this)
    assert txlog.vacuum_orphans(root) == []
    assert sorted(txlog.orphan_files(root)) == sorted(doomed)
    # post-crash cleanup (no concurrent writers): age window waived
    removed = txlog.vacuum_orphans(root, min_age_seconds=0)
    assert sorted(removed) == sorted(doomed)
    assert txlog.orphan_files(root) == []
    # committed data untouched
    assert txlog.read_table(spark, root).count() == 10
