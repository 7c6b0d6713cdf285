"""Streaming approximate-distinct state: mergeable HLL sketches
folded across micro-batches.

The exact-distinct streaming alternatives both fail at scale: a
dropDuplicates state store grows with the KEY-CARDINALITY of ids
seen (unbounded), and a per-batch exact count can't merge across
batches. The sketch path is the production answer: each micro-batch
reduces to one HLL sketch per group (KBs), the state table is
(group, sketch), and merging batches is hll_union_agg — the
mergeable-summaries property again (same family as the repo's
count-min/SpaceSaving/KLL tiers, here via Spark's built-in
Datasketches HLL, JVM-side).

State commits use the cdc_mirror discipline: write the merged state
to a tmp dir, os.replace into place — readers never see a partial
state, and replays converge because HLL union is idempotent
(re-adding the same ids cannot change the sketch's registers).

Determinism note: an HLL sketch's estimate depends only on the SET
of hashed ids (register maxima are order- and partition-independent),
so the streamed estimate equals the batch estimate over the same
rows — which is what the q308 gate checks, alongside a relative-
error contract against the exact count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_FILE = "state"


def streaming_distinct_hll(
    stream_df: DataFrame,
    key_col: str,
    id_col: str,
    state_dir: str,
    checkpoint_dir: str,
    lg_k: int = 12,
):
    """Start the stream: per micro-batch, reduce to one HLL sketch
    per key, merge into the persisted state table (tmp+rename swap).
    Returns the StreamingQuery; read results with
    read_distinct_estimates."""
    os.makedirs(state_dir, exist_ok=True)
    cur = os.path.join(state_dir, STATE_FILE)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        b = batch_df.groupBy(F.col(key_col).alias("k")).agg(
            F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("sk")
        )
        if os.path.isdir(cur):
            prev = spark.read.parquet(cur)
            merged = (
                prev.unionByName(b)
                .groupBy("k")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        else:
            merged = b
        tmp = os.path.join(state_dir, f"_tmp_{batch_id}")
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(cur):
            import shutil

            old = os.path.join(state_dir, f"_old_{batch_id}")
            os.rename(cur, old)
            os.rename(tmp, cur)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, cur)

    return (
        stream_df.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct_estimates(spark: SparkSession, state_dir: str) -> DataFrame:
    """(key, approx_distinct) from the committed sketch state."""
    sk = spark.read.parquet(os.path.join(state_dir, STATE_FILE))
    return sk.select(
        F.col("k"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_distinct"),
    )
