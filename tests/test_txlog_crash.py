"""Crash-injection tests for the OCC transaction log
(operators/txlog.py) and its vacuum: kill a writer at every fault
point of the commit protocol and assert the two invariants the
protocol promises:

  R (reader safety): readers NEVER observe a partial commit — the
    table content is exactly the fold of fully-linked log entries,
    before and after the crash;
  V (vacuum exactness): a post-crash vacuum (retention waived)
    collects exactly the dead debris — every staged-but-uncommitted
    data file and stale entry tmp, and NOTHING referenced by a
    committed entry.

Fault points (the round-8 claim-before-content race was found by
eyeball; this makes the class mechanical):
  stage      — crash after staging data files, before the entry tmp
               is written;
  pre-link   — crash after the entry tmp is fully written, before
               os.link claims the version name;
  post-link  — crash after os.link succeeds, before the tmp unlink
               (commit IS durable; only a tmp leaks);
  mid-vacuum — crash after vacuum removed some but not all orphans.
"""

from __future__ import annotations

import os

import pytest

from distcpplus_spark.operators import txlog


@pytest.fixture
def root(tmp_path):
    return str(tmp_path / "table")


def _df(spark, lo, hi, part):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.lit(part).alias("part"),
        )
        .coalesce(1)
    )


class _Boom(RuntimeError):
    """Stands in for the process dying at the fault point."""


def _crashing_commit(root, adds, fault, monkeypatch, read_version, txn):
    """Run commit() with the process 'dying' at ``fault``."""
    real_link = os.link

    if fault == "pre-link":
        def link(src, dst):
            raise _Boom()
        monkeypatch.setattr(os, "link", link)
    elif fault == "post-link":
        def link(src, dst):
            real_link(src, dst)
            raise _Boom()
        monkeypatch.setattr(os, "link", link)
    elif fault == "stage":
        # die before the entry tmp is even written
        import builtins

        real_open = builtins.open

        def boom_open(path, mode="r", *a, **kw):
            if str(path).endswith(".tmp") and "w" in mode:
                raise _Boom()
            return real_open(path, mode, *a, **kw)

        monkeypatch.setattr(builtins, "open", boom_open)
    else:
        raise AssertionError(fault)

    with pytest.raises(_Boom):
        txlog.commit(
            root,
            op_type="append",
            partitions=["b"],
            adds=adds,
            removes=[],
            read_version=read_version,
            txn_id=txn,
        )
    monkeypatch.undo()


@pytest.mark.parametrize("fault", ["stage", "pre-link", "post-link"])
def test_writer_crash_at_every_fault_point(spark, root, fault, monkeypatch):
    # healthy first commit = the pre-crash table state
    v1 = txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    assert v1 == 1
    base_files = sorted(txlog.table_files(root))

    # second writer stages, then dies at the fault point
    txn = f"crash_{fault.replace('-', '_')}"
    adds = txlog._stage(_df(spark, 100, 105, "b"), root, txn)
    _crashing_commit(root, adds, fault, monkeypatch, read_version=v1, txn=txn)

    committed = fault == "post-link"  # link landed => commit durable

    # R: reader sees exactly the committed fold — never a partial
    if committed:
        assert txlog.current_version(root) == 2
        assert txlog.read_table(spark, root).count() == 15
        # every referenced file exists and is complete (readable)
        for f in txlog.table_files(root):
            assert os.path.exists(f)
    else:
        assert txlog.current_version(root) == 1
        assert sorted(txlog.table_files(root)) == base_files
        assert txlog.read_table(spark, root).count() == 10
        # the dead writer's log tmp (if any) is invisible to readers
        assert all(
            e["txn_id"] != txn for e in txlog.log_entries(root)
        )

    # V: vacuum collects exactly the debris, nothing committed
    orphans_before = txlog.orphan_files(root)
    if committed:
        assert orphans_before == []
    else:
        assert sorted(orphans_before) == sorted(adds)
    removed = txlog.vacuum_orphans(root, min_age_seconds=0)
    assert sorted(removed) == sorted(orphans_before)
    assert txlog.orphan_files(root) == []
    # stale entry tmps are gone; committed entries untouched
    log_d = os.path.join(root, txlog.LOG_DIR)
    assert not [n for n in os.listdir(log_d) if n.endswith(".tmp")]
    assert txlog.current_version(root) == (2 if committed else 1)

    # the table stays writable after the crash + vacuum
    v_next = txlog.append_df(_df(spark, 200, 203, "c"), root, ["c"])
    assert v_next == txlog.current_version(root)
    expected = (15 if committed else 10) + 3
    assert txlog.read_table(spark, root).count() == expected


def test_mid_vacuum_crash_is_resumable(spark, root, monkeypatch):
    txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    # two dead writers' debris
    adds1 = txlog._stage(_df(spark, 50, 55, "x"), root, "dead1")
    adds2 = txlog._stage(_df(spark, 60, 65, "y"), root, "dead2")
    debris = sorted(adds1 + adds2)
    assert sorted(txlog.orphan_files(root)) == debris

    # vacuum dies after its first successful unlink
    real_remove = os.remove
    state = {"n": 0}

    def remove(path):
        if state["n"] >= 1:
            raise _Boom()
        real_remove(path)
        state["n"] += 1

    monkeypatch.setattr(os, "remove", remove)
    with pytest.raises(_Boom):
        txlog.vacuum_orphans(root, min_age_seconds=0)
    monkeypatch.undo()

    # R: committed table unaffected by the half-finished vacuum
    assert txlog.read_table(spark, root).count() == 10
    # V: a re-run collects exactly what's left; nothing double-counted
    left = txlog.orphan_files(root)
    assert len(left) == len(debris) - 1
    removed = txlog.vacuum_orphans(root, min_age_seconds=0)
    assert sorted(removed) == sorted(left)
    assert txlog.orphan_files(root) == []


def test_vacuum_retention_protects_live_writer(spark, root):
    """The ADVICE scenario end-to-end: writer A stages; a concurrent
    default vacuum runs BEFORE A links its entry; A's commit must
    still succeed and its files must exist."""
    txlog.append_df(_df(spark, 0, 10, "a"), root, ["a"])
    txn = "livewriter"
    adds = txlog._stage(_df(spark, 100, 104, "b"), root, txn)
    # concurrent maintenance vacuum (default retention) — must skip
    # the fresh staged files
    assert txlog.vacuum_orphans(root) == []
    v = txlog.commit(
        root,
        op_type="append",
        partitions=["b"],
        adds=adds,
        removes=[],
        read_version=1,
        txn_id=txn,
    )
    assert v == 2
    df = txlog.read_table(spark, root)
    assert df.count() == 14
    for f in txlog.table_files(root):
        assert os.path.exists(f)
