"""MERGE-style upsert into hive-partitioned parquet — stock Spark only.

Without a table format (Delta/Iceberg/Hudi), an upsert is a partition
compaction: rewrite ONLY the partitions the updates touch, leaving the
rest of a 100 TB table byte-identical on disk. The three pieces that
make that safe and cheap are all stock:

1. partition pruning — the base read lists only affected partitions;
2. the merge itself is an anti-join (old versions of updated keys drop
   out) plus a union (new versions in) — one shuffle on the key;
3. ``spark.sql.sources.partitionOverwriteMode=dynamic`` — the write
   replaces exactly the partitions present in the output, atomically
   per partition via the staging-commit protocol.

Latest-wins semantics within the update batch use a deterministic
version column, mirroring CDC compaction (q67's DISTINCT ON pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
    version_col: str | None = None,
    detect_moved_keys: bool = True,
) -> int:
    """Apply ``updates`` to the parquet table at ``table_path``.

    Returns the number of partitions rewritten. Rows in ``updates``
    replace base rows with the same ``key``; unmatched keys insert.
    With ``version_col``, the highest version per key within the batch
    wins (ties broken arbitrarily-but-deterministically by all-column
    order); without it the batch must hold one row per key.

    A key whose ``partition_col`` value CHANGED lives in a partition
    outside the update batch's — missing it would leave a duplicate
    key behind. With ``detect_moved_keys`` (default) a column-pruned
    scan of the base's (key, partition) pairs joined against the batch
    finds those old partitions and adds them to the rewrite set; the
    scan reads two columns (one of them free from the partition path),
    broadcast-joined against the batch — no full-width read. Set
    ``detect_moved_keys=False`` ONLY when the partition column is
    immutable per key (e.g. an event date); that keeps the read
    strictly pruned to the batch's partitions.
    """
    if version_col is not None:
        w = W.partitionBy(key).orderBy(F.desc(version_col))
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    affected = {
        r[0] for r in updates.select(partition_col).distinct().collect()
    }
    if detect_moved_keys:
        moved_old_parts = (
            spark.read.parquet(table_path)
            .select(key, F.col(partition_col).alias("_old_part"))
            .join(
                F.broadcast(updates.select(key, partition_col)), key
            )
            .filter(F.col("_old_part") != F.col(partition_col))
            .select("_old_part")
            .distinct()
            .collect()
        )
        affected |= {r[0] for r in moved_old_parts}

    affected = sorted(affected)
    base = spark.read.parquet(table_path).filter(
        F.col(partition_col).isin(affected)
    )
    kept = base.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates)
    # partitions that will appear in the output — MUST be computed
    # before the overwrite mutates the files the plan reads from
    out_parts = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # dynamic overwrite only replaces partitions PRESENT in the output;
    # a partition emptied by a moved key has no output rows and would
    # keep its stale files — drop those directories explicitly.
    emptied = set(affected) - out_parts
    if emptied:
        import os
        import shutil
        from urllib.parse import unquote

        # match against the ACTUAL directory names: Spark hive-escapes
        # partition values in paths ('a b' → 'a%20b'), so building the
        # name from str(value) would silently miss those dirs
        doomed_vals = {str(p) for p in emptied}
        prefix = f"{partition_col}="
        for d in os.listdir(table_path):
            if not d.startswith(prefix):
                continue
            if unquote(d[len(prefix):]) in doomed_vals:
                shutil.rmtree(
                    os.path.join(table_path, d), ignore_errors=True
                )
    return len(affected)


HIGH_TS = "9999-12-31 00:00:00"


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts_col: str = "change_ts",
) -> DataFrame:
    """Apply a change batch to an SCD-type-2 history table.

    ``history`` carries (key, payload..., valid_from, valid_to,
    is_current); ``changes`` carries (key, payload..., change_ts).
    Current rows of changed keys close at the change timestamp; each
    change inserts as the new open row. Unchanged keys' rows pass
    through untouched. Returns the new history DataFrame — pair with
    upsert_partitioned to persist only affected partitions.

    One shuffle: the close-out is a broadcast-or-hash semi/left join
    on the key; the union is free. No windows — the batch is assumed
    deduplicated to one row per key (use q67's DISTINCT ON pattern
    upstream for multi-change batches).
    """
    payload = [
        c for c in changes.columns if c not in (key, change_ts_col)
    ]
    closing_keys = changes.select(
        F.col(key), F.col(change_ts_col).alias("_close_ts")
    )
    joined = history.join(closing_keys, key, "left")
    closed_or_kept = joined.select(
        key,
        *payload,
        "valid_from",
        F.when(
            (F.col("is_current") == 1) & F.col("_close_ts").isNotNull(),
            F.col("_close_ts"),
        )
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
        F.when(
            (F.col("is_current") == 1) & F.col("_close_ts").isNotNull(),
            F.lit(0),
        )
        .otherwise(F.col("is_current"))
        .alias("is_current"),
    )
    new_rows = changes.select(
        key,
        *payload,
        F.col(change_ts_col).alias("valid_from"),
        F.lit(HIGH_TS).cast("timestamp").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return closed_or_kept.unionByName(new_rows)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """CDC-style diff of two table snapshots on a key: one row per
    changed key with change_type in (insert, delete, update) and the
    list of columns whose value differs (NULL-safe comparison).

    Execution is a single full-outer join on the key — at scale one
    co-partitioned shuffle per side (or none, if both snapshots are
    bucketed on the key) — plus codegen'd column comparisons; no
    row-by-row driver logic. Unchanged keys are filtered before
    anything leaves the join."""
    # presence flags: marker literals survive the outer join even
    # when every compare column is legitimately NULL on one side
    o = old.select(
        F.col(key).alias("_k"), F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("_k"), F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, "_k", "full_outer")
    diff_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                    F.lit(c),
                ).otherwise(F.lit(None))
                for c in compare_cols
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return (
        j.select(
            F.col("_k").alias(key),
            F.when(F.col("_in_old").isNull(), F.lit("insert"))
            .when(F.col("_in_new").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            diff_cols.alias("changed_columns"),
        )
        .filter(
            (F.col("change_type") != "update")
            | (F.size("changed_columns") > 0)
        )
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Fold an ordered CDC changelog into a snapshot — the inverse of
    :func:`snapshot_diff` and the batch half of every
    Debezium/binlog-style ingestion: ``changes`` carries (key,
    payload..., op in I/U/D, seq), possibly MANY rows per key; the
    result applies them in sequence order.

    Distributed shape: per-key latest-wins is a window partitioned
    by the KEY (never global), the delete filter and the pass-through
    of untouched base keys are one anti-join — altogether one shuffle
    of the changelog plus one of the base on the same key, both
    co-partitioned (bucket both on the key and neither exchanges).
    Sequence-order fold collapses to latest-state-per-key because
    I/U/D are all last-writer-wins state operations; only the FINAL
    op per key matters for the snapshot.
    """
    payload = [c for c in base.columns if c != key]
    w = W.partitionBy(key).orderBy(F.desc(seq_col))
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    surviving = latest.filter(F.col(op_col) != "D").select(key, *payload)
    untouched = base.join(latest.select(key), key, "left_anti")
    return untouched.unionByName(surviving)


def merkle_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_cols: list[str],
    buckets: int = 1024,
) -> tuple[DataFrame, int, int]:
    """Anti-entropy reconciliation of two table mirrors: find the
    differing keys WITHOUT a full-table diff, the way replicated
    stores (Dynamo/Cassandra) compare Merkle trees.

    Phase 1 — summaries: every row hashes (key + compare columns) to
    64 bits; rows bucket by a hash of the key; each bucket folds its
    row hashes with XOR (order-insensitive, so the fold needs no
    sort and partial aggregation combines freely). Two 100 TB
    mirrors exchange ``buckets`` x 16 bytes — KBs — instead of rows.
    Phase 2 — fine diff: only the buckets whose summaries disagree
    (or exist on one side) re-join row-level, via
    :func:`snapshot_diff` restricted to those buckets; identical
    buckets are never rescanned past the summary aggregation.

    Returns (diff_rows, n_buckets_total, n_buckets_differing) — the
    ratio is the I/O saving; pytest pins that a small change set
    touches a small bucket fraction. Collisions: a bucket would be
    wrongly declared equal only if its XOR of 64-bit row hashes
    collides across versions (~2^-64 per bucket); use sha2-based
    row hashes if that bound isn't enough."""
    def summarize(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)).alias("bkt"),
                F.xxhash64(F.col(key), *[F.col(c) for c in compare_cols])
                .alias("rh"),
            )
            .groupBy("bkt")
            .agg(
                F.expr("bit_xor(rh)").alias("h"),
                F.count("*").alias("n"),
            )
        )

    sa = summarize(a).alias("sa")
    sb = summarize(b).alias("sb")
    joined = sa.join(sb, F.col("sa.bkt") == F.col("sb.bkt"), "full_outer")
    differing = joined.filter(
        F.col("sa.bkt").isNull()
        | F.col("sb.bkt").isNull()
        | (F.col("sa.h") != F.col("sb.h"))
        | (F.col("sa.n") != F.col("sb.n"))
    ).select(F.coalesce(F.col("sa.bkt"), F.col("sb.bkt")).alias("bkt"))
    n_total = buckets
    bad = [r["bkt"] for r in differing.collect()]
    if not bad:
        empty = snapshot_diff(a.limit(0), b.limit(0), key, compare_cols)
        return empty, n_total, 0
    bkt_of = F.pmod(F.xxhash64(F.col(key)), F.lit(buckets))
    a_fine = a.filter(bkt_of.isin(bad))
    b_fine = b.filter(bkt_of.isin(bad))
    return snapshot_diff(a_fine, b_fine, key, compare_cols), n_total, len(bad)
