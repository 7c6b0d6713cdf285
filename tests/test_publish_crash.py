"""Crash-injection tests for the single-writer versioned-publish
protocol (operators/maintenance.py::publish_dataset) — the round-8
verdict asked for the mechanical fault sweep across BOTH commit
protocols; tests/test_txlog_crash.py covers the multi-writer OCC log,
this file covers tmp+verify+rename+pointer-swap.

Fault points:
  mid-write   — crash while parquet lands in _tmp_v<N> (simulated by
                a pre-created junk tmp dir: the writer died before
                verify);
  pre-rename  — crash after verify, before os.rename claims v=<N>;
  post-rename — crash after the version dir renamed, before the
                _CURRENT pointer swap (the orphan-dir case the
                version-derivation comment documents);
  mid-swap    — crash after the pointer tmp is written, before
                os.replace.

Invariants after every fault: readers (read_current) still see the
previous version completely; a subsequent publish succeeds and does
NOT collide with orphan version dirs; vacuum's version-window
reclaims the debris without touching live versions.
"""

from __future__ import annotations

import os

import pytest

from distcpplus_spark.operators import maintenance as mt


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "ds")


def _df(spark, n):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


class _Boom(RuntimeError):
    pass


def test_crash_mid_write_leaves_reader_intact(spark, root):
    v1 = mt.publish_dataset(_df(spark, 10), root)
    assert v1 == 1
    # dead writer's half-written tmp (never verified, never renamed)
    os.makedirs(os.path.join(root, "_tmp_v2"))
    open(os.path.join(root, "_tmp_v2", "part-junk.parquet"), "wb").write(
        b"\x00" * 64
    )
    assert mt.read_current(spark, root).count() == 10
    # next publish is unaffected (fresh writer overwrites the tmp)
    v2 = mt.publish_dataset(_df(spark, 20), root)
    assert v2 == 2
    assert mt.read_current(spark, root).count() == 20


def test_crash_pre_rename(spark, root, monkeypatch):
    mt.publish_dataset(_df(spark, 10), root)
    real_rename = os.rename

    def boom_rename(src, dst):
        if "v=" in str(dst):
            raise _Boom()
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", boom_rename)
    with pytest.raises(_Boom):
        mt.publish_dataset(_df(spark, 20), root)
    monkeypatch.undo()
    # reader untouched; tmp debris present but invisible
    assert mt.current_version(root) == 1
    assert mt.read_current(spark, root).count() == 10
    assert any(d.startswith("_tmp_") for d in os.listdir(root))
    # recovery: a fresh publish lands as v2
    assert mt.publish_dataset(_df(spark, 30), root) == 2
    assert mt.read_current(spark, root).count() == 30


def test_crash_post_rename_orphan_version_dir(spark, root, monkeypatch):
    """The documented orphan case: v=N+1 exists but the pointer still
    names N. Readers stay on N; the NEXT publish must skip past the
    orphan (version derivation from max(pointer, dirs)), never
    collide."""
    mt.publish_dataset(_df(spark, 10), root)
    real_replace = os.replace

    def boom_replace(src, dst):
        if dst.endswith(mt.CURRENT_FILE):
            raise _Boom()
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", boom_replace)
    with pytest.raises(_Boom):
        mt.publish_dataset(_df(spark, 20), root)
    monkeypatch.undo()
    # pointer still 1; orphan v=2 on disk
    assert mt.current_version(root) == 1
    assert mt.read_current(spark, root).count() == 10
    assert os.path.isdir(os.path.join(root, "v=2"))
    # recovery publish becomes v3 (not a v=2 collision)
    v3 = mt.publish_dataset(_df(spark, 30), root)
    assert v3 == 3
    assert mt.read_current(spark, root).count() == 30
    # time travel to the intact old version still works
    assert mt.read_version(spark, root, 1).count() == 10


def test_crash_mid_pointer_swap(spark, root, monkeypatch):
    """Pointer tmp written, os.replace never ran: readers see the old
    pointer; the stale pointer tmp must not shadow the real one."""
    mt.publish_dataset(_df(spark, 10), root)
    import builtins

    real_open = builtins.open

    def boom_open(path, mode="r", *a, **kw):
        if str(path).endswith(mt.CURRENT_FILE + ".tmp") and "w" in mode:
            raise _Boom()
        return real_open(path, mode, *a, **kw)

    monkeypatch.setattr(builtins, "open", boom_open)
    with pytest.raises(_Boom):
        mt.publish_dataset(_df(spark, 20), root)
    monkeypatch.undo()
    assert mt.current_version(root) == 1
    assert mt.read_current(spark, root).count() == 10
    v3 = mt.publish_dataset(_df(spark, 30), root)
    assert mt.read_current(spark, root).count() == 30
    assert v3 == 3  # v=2 orphan dir skipped


def test_vacuum_reclaims_crash_debris(spark, root, monkeypatch):
    """After a post-rename crash + recovery, vacuum's version window
    deletes the orphan and tmp debris, never a live kept version."""
    mt.publish_dataset(_df(spark, 10), root)
    real_replace = os.replace

    def boom_replace(src, dst):
        if dst.endswith(mt.CURRENT_FILE):
            raise _Boom()
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", boom_replace)
    with pytest.raises(_Boom):
        mt.publish_dataset(_df(spark, 20), root)
    monkeypatch.undo()
    os.makedirs(os.path.join(root, "_tmp_v9"), exist_ok=True)
    open(os.path.join(root, "_tmp_v9", "junk.parquet"), "wb").write(b"x")
    mt.publish_dataset(_df(spark, 30), root)  # v3
    mt.publish_dataset(_df(spark, 40), root)  # v4
    doomed = {
        os.path.relpath(r["path"], root)
        for r in mt.plan_vacuum(spark, root, keep_last=2).collect()
    }
    # orphan v=2 and tmp junk are doomed; kept versions are not
    assert any(p.startswith("v=2") for p in doomed)
    assert any(p.startswith("_tmp_v9") for p in doomed)
    assert not any(p.startswith("v=3") or p.startswith("v=4") for p in doomed)
    mt.vacuum(spark, root, keep_last=2)
    assert not os.path.exists(os.path.join(root, "v=2"))
    assert not os.path.exists(os.path.join(root, "_tmp_v9"))
    assert mt.read_current(spark, root).count() == 40
    assert mt.read_version(spark, root, 3).count() == 30
