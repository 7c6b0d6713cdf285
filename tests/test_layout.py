"""Zone-map layout: manifest correctness and real file pruning."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from distcpplus_spark.operators.layout import (
    read_with_zonemap,
    write_zonemapped,
    zonemap_manifest,
)


def _write(spark, tmp_path, n_files=8):
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 1.5).alias("v"),
    )
    root = str(tmp_path / "zm")
    write_zonemapped(df, root, "k", n_files)
    return df, root


def test_manifest_covers_every_file_and_row(spark, tmp_path):
    df, root = _write(spark, tmp_path)
    man = zonemap_manifest(spark, root, ["k", "v"]).collect()
    files = {r["path"] for r in man}
    on_disk = {
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".parquet")
    }
    assert files == on_disk
    # per-column row totals both equal the table size
    for col in ("k", "v"):
        assert sum(r["n_rows"] for r in man if r["col"] == col) == 4000
    # disjoint ranges: k-stats sorted by vmin must not overlap
    ks = sorted(
        (r["vmin"], r["vmax"]) for r in man if r["col"] == "k"
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ks, ks[1:]):
        assert hi1 < lo2


def test_range_read_prunes_files_and_matches_full_scan(spark, tmp_path):
    df, root = _write(spark, tmp_path)
    man = zonemap_manifest(spark, root, ["k"]).collect()
    got, kept, total = read_with_zonemap(spark, root, man, "k", 100.0, 399.0)
    assert total == 8
    assert kept < total  # real pruning happened
    expect = df.filter((F.col("k") >= 100) & (F.col("k") <= 399))
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in expect.collect()
    )


def test_unprunable_column_keeps_all_files(spark, tmp_path):
    # grp isn't clustered: every file holds every grp value, so a
    # grp range prunes nothing but results stay exact (residual
    # filter carries correctness).
    df, root = _write(spark, tmp_path)
    man = zonemap_manifest(spark, root, ["grp"]).collect()
    got, kept, total = read_with_zonemap(spark, root, man, "grp", 2.0, 2.0)
    assert kept == total
    assert got.count() == df.filter(F.col("grp") == 2).count()


def test_open_ended_bounds(spark, tmp_path):
    df, root = _write(spark, tmp_path)
    man = zonemap_manifest(spark, root, ["k"]).collect()
    got, kept, total = read_with_zonemap(spark, root, man, "k", 3500.0, None)
    assert kept < total
    assert got.count() == 500


def test_bloom_index_prunes_and_is_exact(spark, tmp_path):
    from distcpplus_spark.operators.layout import (
        bloom_index_candidates,
        read_bloom_pruned,
        write_bloom_indexed,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "bloomtbl")
    n_files = write_bloom_indexed(df, path, "k", num_files=8)
    assert n_files == 8
    # single-key lookup prunes to (almost always) 1 candidate file;
    # bloom FPs can only ADD candidates, never lose the true one
    cands, total = bloom_index_candidates(spark, path, [1234])
    assert total == 8 and 1 <= len(cands) < 8
    rows = read_bloom_pruned(spark, path, "k", [1234]).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1234, 3702)]
    # multi-key incl. absent keys: exact result, no phantom rows
    got = sorted(
        r["k"]
        for r in read_bloom_pruned(
            spark, path, "k", [10, 999999, 4999, 777777]
        ).collect()
    )
    assert got == [10, 4999]
    # absent-only lookup may prune to zero files and must return empty
    assert read_bloom_pruned(spark, path, "k", [888888]).count() == 0


def test_bloom_index_string_keys(spark, tmp_path):
    """The index must work for non-long key columns — the probe frame
    is built with the key type RECORDED at write time (a hardcoded
    'long' made string-keyed indexes write-only)."""
    from distcpplus_spark.operators.layout import (
        bloom_index_candidates,
        read_bloom_pruned,
        write_bloom_indexed,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 3000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("k"),
        (F.col("id") * 7).alias("v"),
    )
    path = str(tmp_path / "bloomtbl_str")
    assert write_bloom_indexed(df, path, "k", num_files=8) == 8
    cands, total = bloom_index_candidates(spark, path, ["user-42"])
    assert total == 8 and 1 <= len(cands) < 8
    rows = read_bloom_pruned(spark, path, "k", ["user-42"]).collect()
    assert [(r["k"], r["v"]) for r in rows] == [("user-42", 294)]
    got = sorted(
        r["k"]
        for r in read_bloom_pruned(
            spark, path, "k", ["user-1", "nope", "user-2999"]
        ).collect()
    )
    assert got == ["user-1", "user-2999"]
    assert read_bloom_pruned(spark, path, "k", ["absent"]).count() == 0


def test_bloom_sidecars_written_executor_side(spark, tmp_path):
    """Round-10 scale fix: sidecar bitmaps are written by the task
    that built them; the driver collects only (file, sidecar, n_keys)
    manifest rows. Observable invariant: index.json carries NO bitmap
    payload, so its size is independent of num_bits while the on-disk
    sidecar files scale with num_bits."""
    import json
    import os

    from distcpplus_spark.operators.layout import write_bloom_indexed
    from pyspark.sql import functions as F

    sizes = {}
    for nb in (1 << 13, 1 << 16):
        df = spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        path = str(tmp_path / f"tbl{nb}")
        assert write_bloom_indexed(df, path, "k", num_bits=nb,
                                   num_files=4) == 4
        idx = os.path.join(path, "_bloomidx")
        meta = json.load(open(os.path.join(idx, "index.json")))
        assert meta["version"] == 2
        scs = [v["sidecar"] for v in meta["files"].values()]
        assert len(scs) == 4
        for s in scs:
            assert os.path.getsize(os.path.join(idx, s)) == nb // 8
        assert sum(v["n_keys"] for v in meta["files"].values()) == 2000
        sizes[nb] = os.path.getsize(os.path.join(idx, "index.json"))
        # no leftover tmp debris from the executor-side writes
        assert not [f for f in os.listdir(idx) if ".tmp-" in f]
    # manifest size must NOT scale with the bitmap size (8x bits)
    assert abs(sizes[1 << 16] - sizes[1 << 13]) < 64


def test_bloom_index_batch_probe(spark, tmp_path):
    """bloom_index_mark: executor-side batch probe — empty
    _candidate_files is a provable miss, present keys always list
    their true file, and the pruned batch read equals the exact
    semi-join."""
    from distcpplus_spark.operators.layout import (
        bloom_index_mark,
        read_bloom_pruned_batch,
        write_bloom_indexed,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "batchtbl")
    write_bloom_indexed(df, path, "k", num_files=8)
    probes = spark.range(0, 12000, 7).select(F.col("id").alias("k"))
    marked = bloom_index_mark(spark, path, probes).collect()
    for r in marked:
        if r["k"] < 5000:  # present: bloom may not lose it
            assert len(r["_candidate_files"]) >= 1, r["k"]
    # absent keys are overwhelmingly provable misses (FPR ~ small);
    # at least SOME must prune to the empty array
    absent = [r for r in marked if r["k"] >= 5000]
    assert absent and sum(
        1 for r in absent if not r["_candidate_files"]
    ) > len(absent) * 0.5
    got = sorted(
        r["k"] for r in read_bloom_pruned_batch(spark, path, probes)
        .select("k").collect()
    )
    want = sorted(k for k in range(0, 12000, 7) if k < 5000)
    assert got == want


def test_bloom_index_refresh_incremental(spark, tmp_path):
    """Incremental maintenance: refresh indexes ONLY files that
    appeared since the build (cost ∝ new data), merges the manifest
    atomically, and drops manifest entries for deleted files."""
    import json
    import os
    import shutil

    from distcpplus_spark.operators.layout import (
        bloom_index_candidates,
        bloom_index_refresh,
        write_bloom_indexed,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "incrtbl")
    assert write_bloom_indexed(df, path, "k", num_files=4) == 4
    # no-op refresh: nothing new
    assert bloom_index_refresh(spark, path) == (0, 4)

    # append: new rows land as fresh parquet files in the table dir
    extra = spark.range(100000, 102000).selectExpr(
        "id as k", "id * 3 as v"
    )
    side = str(tmp_path / "side")
    extra.repartition(2).write.parquet(side)
    n_new = 0
    for f in os.listdir(side):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(side, f), os.path.join(path, f))
            n_new += 1
    assert n_new == 2
    assert bloom_index_refresh(spark, path) == (2, 6)
    meta = json.load(
        open(os.path.join(path, "_bloomidx", "index.json"))
    )
    assert len(meta["files"]) == 6
    assert sum(v["n_keys"] for v in meta["files"].values()) == 6000
    # appended keys are now findable; pre-existing keys unaffected
    for key in (100123, 42):
        cands, total = bloom_index_candidates(spark, path, [key])
        assert total == 6 and 1 <= len(cands) < 6, key
    # deletion: a removed file leaves the manifest on next refresh
    victim = sorted(meta["files"])[0]
    os.remove(os.path.join(path, victim))
    assert bloom_index_refresh(spark, path)[1] == 5
    meta2 = json.load(
        open(os.path.join(path, "_bloomidx", "index.json"))
    )
    assert victim not in meta2["files"]


def test_bloom_index_vacuum_reclaims_stale_sidecars(spark, tmp_path):
    import os

    from distcpplus_spark.operators.layout import (
        bloom_index_candidates,
        bloom_index_refresh,
        bloom_index_vacuum,
        write_bloom_indexed,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "vactbl")
    write_bloom_indexed(df, path, "k", num_files=4)
    idx = os.path.join(path, "_bloomidx")
    # plant crash debris + delete a table file, refresh drops it
    open(os.path.join(idx, "ghost.bloom.tmp-dead"), "wb").write(b"x")
    victim = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )[0]
    os.remove(os.path.join(path, victim))
    bloom_index_refresh(spark, path)
    deleted = bloom_index_vacuum(path)
    assert f"{victim}.bloom" in deleted
    assert "ghost.bloom.tmp-dead" in deleted
    # live sidecars untouched; probes still work
    assert bloom_index_vacuum(path) == []  # idempotent
    cands, total = bloom_index_candidates(spark, path, [1999])
    assert total == 3 and len(cands) >= 1
