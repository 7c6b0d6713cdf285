"""Crash-injection sweep for the CHUNKED copier
(operators/copier.py::execute_copy_chunked) — the round-11 verdict
asked for the same mechanical fault discipline the two commit
protocols already have (tests/test_txlog_crash.py for the OCC log,
tests/test_publish_crash.py for versioned publish).

A killed process is simulated by its DISK STATE (the
test_publish_crash mid-write precedent): we reconstruct exactly what
a run killed at each fault point leaves behind — using the
production chunk arithmetic (split_into_chunks) and the production
range copier (_copy_range) so the debris is byte-faithful — then
assert the invariants and re-run.

Fault points:
  mid-phase1     — killed while chunks transfer: some parts present,
                   one truncated;
  between-phases — killed after ALL chunks landed, before assembly;
  mid-assemble   — killed while concatenating: parts + a truncated
                   ``.assembled``;
  pre-rename     — killed after assembly verified, before os.replace
                   published the file;
  update-rerun   — any of the above over a dst that already holds the
                   PREVIOUS version of the file (the P12 -update
                   case);
  drift-in-flight— not a kill: the source grows between planning and
                   execution, exercising the real executor-side
                   drift guard end-to-end.

Invariants after every fault (P10/P12 parity —
DefaultCopyFilesMapper.java's tmp+rename contract, re-expressed for
the chunked path):
  N (no partials): nothing chunk- or assembly-shaped is EVER visible
    under dst outside ``_distcp_tmp_*`` dirs; the destination file
    either does not exist or is the complete previous version;
  C (convergence): a rerun (fresh run_id, -update semantics)
    publishes the full correct bytes and leaves no debris of its own;
  I (isolation): the dead run's tmp dir never poisons the rerun —
    run_ids namespace the tmp trees.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from distcpplus_spark.engine import CopyOptions, DistCpPlusEngine
from distcpplus_spark.operators.copier import (
    CopyFailedError,
    _copy_range,
    split_into_chunks,
)

CHUNK = 256 * 1024
BIG = bytes(range(256)) * 8192  # 2 MiB position-dependent → 8 chunks
DEAD_RUN = "deadrun0"


@pytest.fixture
def src(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "big.bin").write_bytes(BIG)
    return d


@pytest.fixture
def dst(tmp_path):
    return str(tmp_path / "dst")


def _opts():
    # -update: stable layout across reruns (special-root rule) AND the
    # P12 incremental-rerun semantics under test
    return CopyOptions(chunk_bytes=CHUNK, update=True)


def _chunk_rows(spark, src, dst):
    """The production chunk arithmetic for the fixture file."""
    plan = DistCpPlusEngine(spark).plan([str(src)], dst, _opts())
    return (
        split_into_chunks(plan.copies.filter("NOT is_dir"), CHUNK)
        .orderBy("chunk_idx")
        .collect()
    )


def _dead_tmp(dst):
    return os.path.join(dst, f"_distcp_tmp_{DEAD_RUN}")


def _plant_parts(rows, dst, upto=None, truncate_last=False):
    """Write the dead run's part files with the production range
    copier — byte-faithful debris, not hand-rolled approximations."""
    tmp = _dead_tmp(dst)
    rows = rows if upto is None else rows[:upto]
    for r in rows:
        part = os.path.join(tmp, f"{r['relative_dst']}.part{r['chunk_idx']:06d}")
        _copy_range(r["path"], part, r["offset"], r["chunk_len"])
    if truncate_last and rows:
        last = rows[-1]
        part = os.path.join(
            tmp, f"{last['relative_dst']}.part{last['chunk_idx']:06d}"
        )
        with open(part, "r+b") as f:
            f.truncate(last["chunk_len"] // 2)
    return tmp


def assert_no_partials(dst):
    """Invariant N: chunk/assembly intermediates live ONLY under
    ``_distcp_tmp_*`` — a reader walking dst never sees one."""
    for dirpath, dirs, files in os.walk(dst):
        if "_distcp_tmp_" in dirpath:
            continue
        dirs[:] = [d for d in dirs if not d.startswith("_distcp_tmp_")]
        leaked = [
            f for f in files if ".part" in f or f.endswith(".assembled")
        ]
        assert not leaked, f"partials visible at dst: {dirpath}: {leaked}"


def _sha(path):
    return hashlib.sha256(open(path, "rb").read()).hexdigest()


def _rerun_and_check(spark, src, dst, expect=BIG):
    stats = DistCpPlusEngine(spark).copy([str(src)], dst, _opts())
    assert stats["FAIL"] == 0 and stats["COPY"] >= 1
    got = os.path.join(dst, "big.bin")
    assert _sha(got) == hashlib.sha256(expect).hexdigest()
    assert_no_partials(dst)


# ---------------------------------------------------------------------------
# kill-state sweep: one test per fault point, shared invariants
# ---------------------------------------------------------------------------


def test_killed_mid_phase1(spark, src, dst):
    rows = _chunk_rows(spark, src, dst)
    assert len(rows) == 8
    os.makedirs(dst, exist_ok=True)
    _plant_parts(rows, dst, upto=5, truncate_last=True)
    # N: nothing published by the dead run
    assert not os.path.exists(os.path.join(dst, "big.bin"))
    assert_no_partials(dst)
    # C + I: rerun converges; the dead tmp neither helps nor hurts
    _rerun_and_check(spark, src, dst)


def test_killed_between_phases(spark, src, dst):
    """The verdict's named fault: ALL chunks written, assemble never
    ran. No partial is visible at dst and the rerun converges."""
    rows = _chunk_rows(spark, src, dst)
    os.makedirs(dst, exist_ok=True)
    _plant_parts(rows, dst)
    assert not os.path.exists(os.path.join(dst, "big.bin"))
    assert_no_partials(dst)
    _rerun_and_check(spark, src, dst)


def test_killed_mid_assemble(spark, src, dst):
    rows = _chunk_rows(spark, src, dst)
    os.makedirs(dst, exist_ok=True)
    tmp = _plant_parts(rows, dst)
    # half-concatenated output the dying assembler left behind
    with open(os.path.join(tmp, "big.bin.assembled"), "wb") as f:
        f.write(BIG[: len(BIG) // 2])
    assert not os.path.exists(os.path.join(dst, "big.bin"))
    assert_no_partials(dst)
    _rerun_and_check(spark, src, dst)


def test_killed_pre_rename(spark, src, dst):
    """Assembly complete and verified, os.replace never ran: the
    fully-correct bytes exist ONLY under tmp — still not published."""
    rows = _chunk_rows(spark, src, dst)
    os.makedirs(dst, exist_ok=True)
    tmp = _plant_parts(rows, dst)
    with open(os.path.join(tmp, "big.bin.assembled"), "wb") as f:
        f.write(BIG)
    assert not os.path.exists(os.path.join(dst, "big.bin"))
    assert_no_partials(dst)
    _rerun_and_check(spark, src, dst)


def test_killed_update_rerun_preserves_previous_version(spark, src, dst):
    """P12 parity: dst already holds the PREVIOUS version; an update
    run dies between phases. Readers keep the old bytes intact until
    the rerun atomically publishes the new ones."""
    old = b"previous-version" * 1024
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "big.bin"), "wb") as f:
        f.write(old)
    rows = _chunk_rows(spark, src, dst)
    _plant_parts(rows, dst, upto=6)
    # reader sees the complete old version, not a mix
    assert _sha(os.path.join(dst, "big.bin")) == hashlib.sha256(
        old
    ).hexdigest()
    assert_no_partials(dst)
    _rerun_and_check(spark, src, dst)


def test_dead_tmp_debris_survives_rerun_untouched(spark, src, dst):
    """I: cleanup is namespaced by run_id — a rerun must not delete
    another run's tmp (it could be a concurrent LIVE run, not a dead
    one; reclaiming foreign tmp is an operator decision, not an
    automatic side effect)."""
    rows = _chunk_rows(spark, src, dst)
    os.makedirs(dst, exist_ok=True)
    tmp = _plant_parts(rows, dst, upto=3)
    before = sorted(os.listdir(tmp))
    _rerun_and_check(spark, src, dst)
    assert os.path.isdir(tmp) and sorted(os.listdir(tmp)) == before


# ---------------------------------------------------------------------------
# live in-flight fault through the real executor-side guard
# ---------------------------------------------------------------------------


def test_source_drift_between_plan_and_execute(spark, src, dst):
    """Not a kill: the source GROWS after planning. The assemble-phase
    re-stat guard must fail the file (a silent reassembly of stale
    ranges would truncate it), publish nothing, and the job gate must
    raise; a fresh plan then copies the grown bytes."""
    engine = DistCpPlusEngine(spark)
    plan = engine.plan([str(src)], dst, _opts())
    grown = BIG + b"late-appended-bytes" * 100
    (src / "big.bin").write_bytes(grown)
    with pytest.raises(CopyFailedError):
        engine.execute(plan)
    assert not os.path.exists(os.path.join(dst, "big.bin"))
    assert_no_partials(dst)
    _rerun_and_check(spark, src, dst, expect=grown)
