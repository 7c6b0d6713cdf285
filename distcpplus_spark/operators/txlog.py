"""Optimistic-concurrency transaction log: multi-writer atomic
commits over a shared table directory — the minimal Delta/Iceberg-
style protocol, built on one atomic filesystem primitive: linking a
FULLY-WRITTEN entry file into the version name (``os.link`` fails on
EEXIST; an object store uses a conditional PUT of the complete body).

This generalizes operators/maintenance.py's single-writer versioned
publish to CONCURRENT writers: instead of a full new version
directory per publish, the table is a fold of immutable log entries

    <root>/_txlog/<version, zero-padded>.json
    {"version": N, "txn_id": ..., "op_type": "append"|"rewrite",
     "read_version": V, "partitions": [...],
     "actions": [{"op": "add"|"remove", "path": ...,
                  "partition": ...}, ...]}

and the live file set is (all adds) minus (all removes) in version
order. Data files are immutable and staged under unique txn-prefixed
names BEFORE the commit, so a reader can never observe a half commit:
either the log entry exists (all its files are complete) or it
doesn't.

Commit protocol (optimistic):
  1. stage data files (unique names — never overwritten);
  2. note the snapshot version V the writer READ;
  3. write the full entry to a txn-private tmp, then atomically
     link it to ``_txlog/V+1.json`` (claim-with-content — a bare
     O_EXCL create would expose an empty entry to lock-free readers);
  4. lost the race (EEXIST): reload entries V+1..W, run CONFLICT
     DETECTION against them, and either abort (clean up staged
     files) or adopt W and retry step 3.

Conflict rules (the commutativity argument, same as Delta's):
  * append vs append — always commute (disjoint immutable files);
  * rewrite conflicts with ANY intervening commit touching one of
    its partitions (its removes were computed against a stale file
    set);
  * append conflicts with an intervening REWRITE of its partition
    (the rewrite claimed the partition's full contents).

At 100 TB the protocol is unchanged: actions carry file-level
metadata (kilobytes per commit), the log is tiny next to the data,
and only the single log-entry create needs atomicity.

Reference parity: the reference's atomicity unit is one file
(tmp+rename, DefaultCopyFilesMapper.java:140-198); this is the
table-level generalization the north star needs for concurrent
pipeline stages writing one catalog table.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_txlog"
DATA_DIR = "data"


class CommitConflict(Exception):
    """A concurrent commit does not commute with this transaction."""


def _log_path(root: str, version: int) -> str:
    return os.path.join(root, LOG_DIR, f"{version:020d}.json")


def log_entries(root: str, upto: int | None = None) -> list[dict]:
    """All committed entries in version order (optionally <= upto)."""
    d = os.path.join(root, LOG_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            e = json.load(f)
        if upto is None or e["version"] <= upto:
            out.append(e)
    return out


def current_version(root: str) -> int:
    entries = log_entries(root)
    return entries[-1]["version"] if entries else 0


def table_files(root: str, version: int | None = None) -> list[str]:
    """Live file set at ``version`` (default: latest): adds - removes,
    folded in version order — time travel is just an earlier upto."""
    live: dict[str, bool] = {}
    for e in log_entries(root, upto=version):
        for a in e["actions"]:
            if a["op"] == "add":
                live[a["path"]] = True
            else:
                live.pop(a["path"], None)
    return [os.path.join(root, p) for p in live]


def read_table(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    files = table_files(root, version)
    if not files:
        raise FileNotFoundError(f"empty table at {root} v{version}")
    return spark.read.parquet(*files)


def _stage(df: DataFrame, root: str, txn_id: str) -> list[str]:
    """Write df's rows under a txn-unique staging prefix; returns
    root-relative paths of the data files (immutable once written)."""
    stage_dir = os.path.join(root, DATA_DIR, txn_id)
    df.write.mode("error").parquet(stage_dir)
    rel = []
    for name in sorted(os.listdir(stage_dir)):
        if name.endswith(".parquet"):
            rel.append(os.path.join(DATA_DIR, txn_id, name))
    return rel


def _conflicts(op_type: str, partitions: set, intervening: list[dict]) -> str | None:
    for e in intervening:
        other_parts = set(e.get("partitions", []))
        touched = other_parts & partitions
        if not touched:
            continue
        if op_type == "rewrite":
            return (
                f"rewrite of {sorted(touched)} vs concurrent v{e['version']}"
            )
        if e.get("op_type") == "rewrite":
            return (
                f"append to {sorted(touched)} vs concurrent rewrite "
                f"v{e['version']}"
            )
    return None


def commit(
    root: str,
    *,
    op_type: str,
    partitions: list,
    adds: list[str],
    removes: list[str],
    read_version: int,
    txn_id: str,
    max_retries: int = 50,
) -> int:
    """Attempt the optimistic commit; returns the committed version.

    Raises CommitConflict after cleaning up staged files if a
    non-commuting concurrent commit landed first. Retries transparently
    on commuting races (the normal multi-writer case).
    """
    os.makedirs(os.path.join(root, LOG_DIR), exist_ok=True)
    parts = set(partitions)
    v = read_version
    for _ in range(max_retries):
        nxt = v + 1
        entry = {
            "version": nxt,
            "txn_id": txn_id,
            "op_type": op_type,
            "read_version": read_version,
            "partitions": sorted(parts),
            "actions": (
                [{"op": "add", "path": p, "partition": None} for p in adds]
                + [
                    {"op": "remove", "path": p, "partition": None}
                    for p in removes
                ]
            ),
        }
        blob = json.dumps(entry, sort_keys=True)
        # write the FULL entry to a txn-private tmp first, then claim
        # the version name with os.link — atomic WITH content. A bare
        # O_EXCL create would claim the name before the bytes land,
        # letting a concurrent log reader observe an empty/partial
        # entry (a real race: readers fold the log lock-free).
        tmp_entry = _log_path(root, nxt) + f".{txn_id}.tmp"
        with open(tmp_entry, "w") as f:
            f.write(blob)
        try:
            os.link(tmp_entry, _log_path(root, nxt))
            os.remove(tmp_entry)
        except FileExistsError:
            os.remove(tmp_entry)
            intervening = [
                e
                for e in log_entries(root)
                if read_version < e["version"] <= nxt
                and e["txn_id"] != txn_id
            ]
            why = _conflicts(op_type, parts, intervening)
            if why is not None:
                for p in adds:
                    try:
                        os.remove(os.path.join(root, p))
                    except OSError:
                        pass
                raise CommitConflict(why)
            v = max((e["version"] for e in intervening), default=nxt)
            continue
        return nxt
    # retries exhausted: same abort contract as the conflict path —
    # staged files must not leak as orphans-until-vacuum
    for p in adds:
        try:
            os.remove(os.path.join(root, p))
        except OSError:
            pass
    raise CommitConflict(f"gave up after {max_retries} retries")


def append_df(df: DataFrame, root: str, partitions: list) -> int:
    """Stage + commit an append of df labelled with the logical
    partitions it touches."""
    txn = uuid.uuid4().hex[:12]
    v0 = current_version(root)
    adds = _stage(df, root, txn)
    return commit(
        root,
        op_type="append",
        partitions=partitions,
        adds=adds,
        removes=[],
        read_version=v0,
        txn_id=txn,
    )


def rewrite_partition(
    df: DataFrame, root: str, partition, read_version: int | None = None
) -> int:
    """Replace a logical partition's full contents with df (staged
    first; the removes are the partition's files AS OF the snapshot
    this writer read — a concurrent touch of the partition is a
    conflict).

    Contract: data files must be PARTITION-HOMOGENEOUS — every commit
    labels exactly the partitions its files contain rows for, one
    partition per append when rewrites are in play (the Hive-layout
    invariant; a mixed file would lose other partitions' rows when
    removed here)."""
    txn = uuid.uuid4().hex[:12]
    v0 = current_version(root) if read_version is None else read_version
    # removes: files added (and still live at v0) by commits that
    # touched this partition
    live = {
        a["path"]
        for e in log_entries(root, upto=v0)
        for a in e["actions"]
        if a["op"] == "add" and partition in set(e.get("partitions", []))
    }
    removed = {
        a["path"]
        for e in log_entries(root, upto=v0)
        for a in e["actions"]
        if a["op"] == "remove"
    }
    removes = sorted(live - removed)
    adds = _stage(df, root, txn)
    return commit(
        root,
        op_type="rewrite",
        partitions=[partition],
        adds=adds,
        removes=removes,
        read_version=v0,
        txn_id=txn,
    )


def orphan_files(root: str) -> list[str]:
    """Staged-but-never-committed debris (crash leftovers): data files
    not referenced by ANY log action — the vacuum input."""
    referenced = {
        a["path"]
        for e in log_entries(root)
        for a in e["actions"]
    }
    out = []
    data = os.path.join(root, DATA_DIR)
    for dirpath, _dirs, files in os.walk(data):
        for name in files:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, root)
            if name.endswith(".parquet") and rel not in referenced:
                out.append(rel)
    return sorted(out)


def vacuum_orphans(
    root: str, min_age_seconds: float = 24 * 3600
) -> list[str]:
    """Delete staged-but-uncommitted debris OLDER than the retention
    window. The window is load-bearing, not cosmetic: a LIVE writer's
    normal mid-commit state is exactly "staged files, no log entry
    yet" — an ageless vacuum would delete its data and the commit
    would then succeed pointing at nothing (the Delta-style vacuum
    gates on file age for the same reason). Pass min_age_seconds=0
    only when no writer can be concurrent (e.g. post-crash cleanup)."""
    import time

    cutoff = time.time() - min_age_seconds
    doomed = []
    for rel in orphan_files(root):
        full = os.path.join(root, rel)
        try:
            if os.path.getmtime(full) > cutoff:
                continue  # possibly a live writer mid-commit
            os.remove(full)
            doomed.append(rel)
        except OSError:
            pass
    # stale commit-entry tmps (crash between tmp write and link) age
    # out under the same window; .json names are never touched
    log_d = os.path.join(root, LOG_DIR)
    if os.path.isdir(log_d):
        for name in os.listdir(log_d):
            if name.endswith(".tmp"):
                full = os.path.join(log_d, name)
                try:
                    if os.path.getmtime(full) <= cutoff:
                        os.remove(full)
                except OSError:
                    pass
    # drop empty txn staging dirs (only ones already past retention —
    # an empty dir younger than the window may be a writer about to
    # stage into it)
    data = os.path.join(root, DATA_DIR)
    if os.path.isdir(data):
        for d in os.listdir(data):
            full = os.path.join(data, d)
            try:
                if (
                    os.path.isdir(full)
                    and not os.listdir(full)
                    and os.path.getmtime(full) <= cutoff
                ):
                    shutil.rmtree(full, ignore_errors=True)
            except OSError:
                pass
    return sorted(doomed)
