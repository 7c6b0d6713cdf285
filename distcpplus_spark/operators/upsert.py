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
) -> int:
    """Apply ``updates`` to the parquet table at ``table_path``.

    Returns the number of partitions rewritten. Rows in ``updates``
    replace base rows with the same ``key``; unmatched keys insert.
    With ``version_col``, the highest version per key within the batch
    wins (ties broken arbitrarily-but-deterministically by all-column
    order); without it the batch must hold one row per key.
    """
    if version_col is not None:
        w = W.partitionBy(key).orderBy(F.desc(version_col))
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    affected = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    base = spark.read.parquet(table_path).filter(
        F.col(partition_col).isin(affected)
    )
    kept = base.join(updates.select(key), key, "left_anti")
    merged = kept.unionByName(updates)

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
    return len(affected)
