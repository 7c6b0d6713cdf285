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


def test_scd2_apply_closes_and_inserts(spark):
    import datetime as dt

    from distcpplus_spark.operators.upsert import scd2_apply

    t0 = dt.datetime(2024, 1, 1)
    hi = dt.datetime(9999, 12, 31)
    history = spark.createDataFrame(
        [
            (1, "addr_v1", t0, hi, 1),     # open row, will be changed
            (2, "addr_b", t0, hi, 1),      # open row, untouched
            (1, "addr_v0", dt.datetime(2023, 1, 1), t0, 0),  # closed row
        ],
        "id long, addr string, valid_from timestamp, valid_to timestamp,"
        " is_current int",
    )
    t1 = dt.datetime(2024, 6, 1)
    changes = spark.createDataFrame(
        [(1, "addr_v2", t1), (3, "addr_new", t1)],
        "id long, addr string, change_ts timestamp",
    )
    out = scd2_apply(history, changes, "id")
    rows = {(r["id"], r["addr"]): r for r in out.collect()}
    assert len(rows) == 5
    # old open row for key 1 closed at t1
    assert rows[(1, "addr_v1")]["valid_to"] == t1
    assert rows[(1, "addr_v1")]["is_current"] == 0
    # new open row for key 1
    assert rows[(1, "addr_v2")]["valid_from"] == t1
    assert rows[(1, "addr_v2")]["is_current"] == 1
    # untouched key 2 still open
    assert rows[(2, "addr_b")]["is_current"] == 1
    assert rows[(2, "addr_b")]["valid_to"] == hi
    # brand-new key 3 open
    assert rows[(3, "addr_new")]["is_current"] == 1
    # historical closed row untouched
    assert rows[(1, "addr_v0")]["valid_to"] == t0
    # exactly one current row per key
    cur = out.filter("is_current = 1").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_upsert_moved_key_removes_old_partition_row(spark, tmp_path):
    """A key whose partition value changes must vanish from its OLD
    partition (otherwise the merge leaves a duplicate key)."""
    from distcpplus_spark.operators.upsert import upsert_partitioned

    path = str(tmp_path / "moved_tbl")
    base = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2")],
        "id INT, v STRING, part STRING",
    )
    base.write.partitionBy("part").parquet(path)

    # key 3 moves p2 -> p1
    updates = spark.createDataFrame(
        [(3, "c2", "p1")], "id INT, v STRING, part STRING"
    )
    n = upsert_partitioned(spark, path, updates, key="id", partition_col="part")
    assert n == 2  # p1 (target) + p2 (vacated)

    out = spark.read.parquet(path)
    rows = {(r["id"], r["v"], r["part"]) for r in out.collect()}
    assert rows == {(1, "a", "p1"), (2, "b", "p1"), (3, "c2", "p1")}
    # key 3 appears exactly once
    assert out.filter("id = 3").count() == 1


def test_upsert_moved_key_emptied_partition_dir_removed(spark, tmp_path):
    """If the vacated partition ends up empty, its stale directory is
    dropped (dynamic overwrite alone would leave it)."""
    import os

    from distcpplus_spark.operators.upsert import upsert_partitioned

    path = str(tmp_path / "empty_tbl")
    spark.createDataFrame(
        [(1, "a", "p1"), (9, "z", "lonely")], "id INT, v STRING, part STRING"
    ).write.partitionBy("part").parquet(path)

    updates = spark.createDataFrame(
        [(9, "z2", "p1")], "id INT, v STRING, part STRING"
    )
    upsert_partitioned(spark, path, updates, key="id", partition_col="part")
    assert not os.path.isdir(os.path.join(path, "part=lonely"))
    out = spark.read.parquet(path)
    assert {(r["id"], r["part"]) for r in out.collect()} == {(1, "p1"), (9, "p1")}


def test_upsert_emptied_partition_with_escaped_name_removed(spark, tmp_path):
    """Partition values that Spark hive-escapes in directory names
    ('a b' -> 'part=a%20b') must still be cleaned when vacated."""
    import os

    from distcpplus_spark.operators.upsert import upsert_partitioned

    path = str(tmp_path / "esc_tbl")
    spark.createDataFrame(
        [(1, "x", "p1"), (9, "z", "x:y")], "id INT, v STRING, part STRING"
    ).write.partitionBy("part").parquet(path)
    # ':' is in Spark's hive-escape set -> literal dir name differs
    # from str(value)
    assert os.path.isdir(os.path.join(path, "part=x%3Ay"))

    updates = spark.createDataFrame(
        [(9, "z2", "p1")], "id INT, v STRING, part STRING"
    )
    upsert_partitioned(spark, path, updates, key="id", partition_col="part")
    assert not any(d.startswith("part=x") for d in os.listdir(path))
    out = spark.read.parquet(path)
    assert {(r["id"], r["part"]) for r in out.collect()} == {(1, "p1"), (9, "p1")}


def test_snapshot_diff_classes_and_null_safety(spark):
    from distcpplus_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10, "a"), (2, None, "b"), (3, 30, None), (4, 40, "d")],
        "k BIGINT, x BIGINT, s STRING",
    )
    new = spark.createDataFrame(
        [(2, None, "b"),        # identical incl. NULL -> no row
         (3, 30, "CHANGED"),    # NULL -> value: update [s]
         (4, None, "d"),        # value -> NULL: update [x]
         (5, 50, "e")],         # insert
        "k BIGINT, x BIGINT, s STRING",
    )
    rows = {
        r["k"]: (r["change_type"], list(r["changed_columns"]))
        for r in snapshot_diff(old, new, "k", ["x", "s"]).collect()
    }
    assert rows[1] == ("delete", ["x", "s"])
    assert 2 not in rows  # NULL == NULL under eqNullSafe
    assert rows[3] == ("update", ["s"])
    assert rows[4] == ("update", ["x"])
    assert rows[5] == ("insert", ["x", "s"])


def test_incremental_merge_equals_full_recompute(spark):
    from distcpplus_spark.operators.incremental import (
        agg_state,
        merge_states,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 7, i, float(i) * 1.5 if i % 5 else None) for i in range(200)],
        "g BIGINT, v BIGINT, w DOUBLE",
    )
    specs = [("count", "w"), ("sum", "v"), ("min", "v"), ("max", "w")]
    full = {
        r["g"]: (r["count_w"], r["sum_v"], r["min_v"], r["max_w"])
        for r in agg_state(df, ["g"], specs).collect()
    }
    parts = [df.filter(F.col("v") % 3 == i) for i in range(3)]
    state = agg_state(parts[0], ["g"], specs)
    for p in parts[1:]:
        state = merge_states(state, agg_state(p, ["g"], specs), ["g"], specs)
    merged = {
        r["g"]: (r["count_w"], r["sum_v"], r["min_v"], r["max_w"])
        for r in state.collect()
    }
    assert merged == full


def test_apply_changelog_sequence_fold(spark):
    """I/U/D fold: latest seq wins per key; delete-then-reinsert
    resurrects; delete of an unknown key is a no-op; untouched base
    rows pass through."""
    from distcpplus_spark.operators.upsert import apply_changelog

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING"
    )
    changes = spark.createDataFrame(
        [
            # key 1: two updates, last wins
            (1, "U", 10, "a1"),
            (1, "U", 20, "a2"),
            # key 2: update then delete -> gone
            (2, "U", 10, "b1"),
            (2, "D", 20, None),
            # key 4: delete then insert -> resurrects as new row
            (4, "D", 10, None),
            (4, "I", 20, "d-new"),
            # key 9: delete of a key not in base -> no-op
            (9, "D", 10, None),
        ],
        "k INT, op STRING, seq INT, v STRING",
    )
    got = sorted(
        (r["k"], r["v"]) for r in apply_changelog(base, changes, "k").collect()
    )
    assert got == [(1, "a2"), (3, "c"), (4, "d-new")]


def test_merkle_diff_finds_exact_changes_and_prunes_buckets(spark):
    """merkle_diff must return exactly snapshot_diff's rows while
    fine-diffing only the buckets the changed keys hash into —
    the anti-entropy I/O claim."""
    from pyspark.sql import functions as F

    from distcpplus_spark.operators.upsert import merkle_diff, snapshot_diff

    base = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 100).cast("double").alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
    )
    changed = base.withColumn(
        "v", F.when(F.col("k") % 400 == 0, F.col("v") + 1).otherwise(F.col("v"))
    ).filter(F.col("k") != 1777)  # one delete
    extra = spark.createDataFrame(
        [(99999, 1.0, "new")], "k BIGINT, v DOUBLE, s STRING"
    )
    new = changed.unionByName(extra)

    diff, n_total, n_bad = merkle_diff(base, new, "k", ["v", "s"], buckets=256)
    want = sorted(
        map(tuple, snapshot_diff(base, new, "k", ["v", "s"]).collect())
    )
    got = sorted(map(tuple, diff.collect()))
    assert got == want
    assert len(want) == 7  # 5 updates + 1 delete + 1 insert
    # 7 changed keys can touch at most 7 of 256 buckets
    assert 0 < n_bad <= 7
    assert n_total == 256


def test_merkle_diff_identical_mirrors_zero_buckets(spark):
    from pyspark.sql import functions as F

    from distcpplus_spark.operators.upsert import merkle_diff

    base = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 9).cast("double").alias("v")
    )
    diff, n_total, n_bad = merkle_diff(base, base, "k", ["v"], buckets=64)
    assert n_bad == 0
    assert diff.count() == 0
