"""Versioned publish + vacuum: atomicity protocol and orphan cleanup."""

from __future__ import annotations

import os

import pytest

from distcpplus_spark.operators.maintenance import (
    current_version,
    plan_vacuum,
    publish_dataset,
    read_current,
    vacuum,
)


def test_publish_and_read_current(spark, tmp_path):
    root = str(tmp_path / "ds")
    df1 = spark.range(10).selectExpr("id", "id * 2 AS v")
    assert publish_dataset(df1, root) == 1
    df2 = spark.range(5).selectExpr("id", "id * 3 AS v")
    assert publish_dataset(df2, root) == 2
    assert current_version(root) == 2
    got = read_current(spark, root)
    assert got.count() == 5
    assert {r["v"] for r in got.collect()} == {0, 3, 6, 9, 12}
    # old version still fully readable (time-travel by path)
    old = spark.read.parquet(os.path.join(root, "v=1"))
    assert old.count() == 10


def test_read_current_without_publish_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_current(spark, str(tmp_path / "nothing"))


def test_vacuum_removes_old_versions_and_debris(spark, tmp_path):
    root = str(tmp_path / "ds")
    for i in range(4):
        publish_dataset(spark.range(i + 1), root)
    # crashed-publish debris + a stray file
    os.makedirs(os.path.join(root, "_tmp_v9"))
    with open(os.path.join(root, "_tmp_v9", "part-junk"), "w") as f:
        f.write("junk")
    with open(os.path.join(root, "stray.txt"), "w") as f:
        f.write("stray")

    # dry run deletes nothing
    n_planned = vacuum(spark, root, keep_last=2, dry_run=True)
    assert n_planned > 0
    assert os.path.isdir(os.path.join(root, "v=1"))

    n = vacuum(spark, root, keep_last=2)
    assert n == n_planned
    # v=3, v=4 retained; v=1, v=2, debris, stray gone
    assert sorted(os.listdir(root)) == ["_CURRENT", "v=3", "v=4"]
    assert read_current(spark, root).count() == 4


def test_vacuum_plan_has_ancestor_suppression(spark, tmp_path):
    root = str(tmp_path / "ds")
    for i in range(3):
        publish_dataset(spark.range(3), root)
    plan = plan_vacuum(spark, root, keep_last=1)
    rels = [r["relative_dst"] for r in plan.collect()]
    # only the topmost doomed entries appear (v=1, v=2), never their
    # children
    assert all("/" not in r for r in rels)
    assert set(rels) == {"v=1", "v=2"}


def test_failed_publish_leaves_previous_version(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "ds")
    publish_dataset(spark.range(7), root)

    # simulate a verify failure on the next publish
    import distcpplus_spark.operators.maintenance as m

    real_rename = os.rename

    def boom(*a, **k):
        raise OSError("disk gone")

    monkeypatch.setattr(os, "rename", boom)
    with pytest.raises(OSError):
        publish_dataset(spark.range(2), root)
    monkeypatch.setattr(os, "rename", real_rename)

    # previous version intact and current
    assert current_version(root) == 1
    assert read_current(spark, root).count() == 7


def test_publish_recovers_from_orphaned_version_dir(spark, tmp_path):
    """Crash window between version-dir rename and pointer swap: an
    orphan v=N+1 with a stale pointer must not wedge publishing."""
    root = str(tmp_path / "ds")
    publish_dataset(spark.range(3), root)  # v=1, pointer=1
    # simulate the crash: v=2 exists but pointer still says 1
    spark.range(9).write.parquet(os.path.join(root, "v=2"))
    assert current_version(root) == 1

    v = publish_dataset(spark.range(5), root)
    assert v == 3  # skips the orphan instead of colliding
    assert read_current(spark, root).count() == 5


def test_compact_dataset_shrinks_files_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from distcpplus_spark.operators.maintenance import compact_dataset

    path = str(tmp_path / "smallfiles")
    df = spark.range(0, 5000).withColumn("v", F.col("id") * 3)
    # simulate a pathological small-file layout: 64 tiny files
    df.repartition(64).write.parquet(path)
    before = spark.read.parquet(path)
    expect = sorted((r["id"], r["v"]) for r in before.collect())
    report = compact_dataset(spark, path, target_bytes=1 << 30)
    assert report["files_before"] == 64
    assert report["files_after"] == 1  # everything fits one target
    assert report["rows"] == 5000
    got = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert got == expect


def test_mor_deletes_and_compaction(spark, tmp_path):
    """Merge-on-read: positional + equality deletes resolve at read
    time; compaction folds them into the base and removes the delete
    files; reads before/after compaction agree."""
    import os

    from distcpplus_spark.operators.mor import (
        POS_DIR,
        EQ_DIR,
        append_equality_deletes,
        append_positional_deletes,
        compact_mor,
        read_mor,
        write_mor_base,
    )

    root = str(tmp_path / "mor")
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(40)],
        "k BIGINT, parity STRING, v DOUBLE",
    )
    n = write_mor_base(df, root, "k")
    assert n == 40
    # row ids are dense in k order: delete positions 0..4
    append_positional_deletes(spark, root, [0, 1, 2, 3, 4])
    append_equality_deletes(
        spark, root, spark.createDataFrame([("odd",)], "parity STRING")
    )
    got = {r["k"] for r in read_mor(spark, root).collect()}
    expect = {i for i in range(5, 40) if i % 2 == 0}
    assert got == expect
    # second positional delete file appends (k=6 is rid 6)
    append_positional_deletes(spark, root, [6])
    expect -= {6}
    assert {r["k"] for r in read_mor(spark, root).collect()} == expect

    n2 = compact_mor(spark, root)
    assert n2 == len(expect)
    assert not os.path.isdir(os.path.join(root, POS_DIR))
    assert not os.path.isdir(os.path.join(root, EQ_DIR))
    assert {r["k"] for r in read_mor(spark, root).collect()} == expect


def test_mor_delete_sides_are_broadcast(spark, tmp_path):
    from distcpplus_spark.operators.mor import (
        append_equality_deletes,
        append_positional_deletes,
        read_mor,
        write_mor_base,
    )

    root = str(tmp_path / "mor2")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k BIGINT, v DOUBLE"
    )
    write_mor_base(df, root, "k")
    append_positional_deletes(spark, root, [1, 2])
    append_equality_deletes(
        spark, root, spark.createDataFrame([(50.0,)], "v DOUBLE")
    )
    plan = (
        read_mor(spark, root)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
