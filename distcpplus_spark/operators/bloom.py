"""Sharded Bloom filter + Bloom-prefiltered incremental dedup.

The engine already exposes the JVM `DataFrameStatFunctions.bloomFilter`
sketch (functions/sketch_tools.py), but that object lives on the
driver and cannot be used as a COLUMN predicate from PySpark without
a per-row py4j round trip. This module implements the operator the
training-data pipeline actually needs — "which rows of today's batch
are genuinely new vs a huge existing corpus?" — as a pure
DataFrame/Arrow plan:

1. build: hash the corpus key twice JVM-side (``xxhash64`` with two
   salts), shard by hash, and build one bitmap per shard with a
   vectorized numpy ``applyInPandas`` (double hashing, k probes).
   Shards bound per-task memory AND let the filter scale
   horizontally: a 10^10-key corpus at ~1% FPR needs ~12 GB of bits,
   which no single driver/task should hold — but 4096 shards of
   ~3 MB each build in parallel and broadcast (or persist) fine.
2. probe: broadcast the shard bitmaps; an Arrow-batched pandas UDF
   marks each batch row bloom-positive/negative. No false negatives
   by construction.
3. verify: ONLY bloom-positive rows (true dups + the small FPR slice)
   join the corpus for exact confirmation. Bloom-negative rows —
   the vast majority of a mostly-new batch — never shuffle at all.

100 TB shape: the corpus-side build is one shuffle of (shard, h1,
h2) triples — 24 bytes/row, not content; the probe is map-only; the
verify join's left side is |dups| + fpp*|new|, tiny by design. The
reference has no analogue (its dedup is the -update mtime/checksum
predicate, DistCPPlus.java); this extends the exact-dedup tier in
operators/dedup.py with the streaming/incremental case.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SALT1 = "bloom-h1"
_SALT2 = "bloom-h2"


def _with_hashes(df: DataFrame, key_col: str) -> DataFrame:
    """Two independent 64-bit key hashes, computed JVM-side."""
    return df.withColumn(
        "_h1", F.xxhash64(F.lit(_SALT1), F.col(key_col))
    ).withColumn("_h2", F.xxhash64(F.lit(_SALT2), F.col(key_col)))


def _positions(h1, h2, num_hashes: int, num_bits: int):
    """Double-hashing probe positions, vectorized over numpy uint64
    arrays: pos_i = (h1 + i*(h2|1)) mod num_bits. Forcing h2 odd
    keeps the stride a unit mod the power-of-two bit count."""
    import numpy as np

    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64) | np.uint64(1)
    out = []
    for i in range(num_hashes):
        out.append((h1u + np.uint64(i) * h2u) % np.uint64(num_bits))
    return out


def bloom_build_sharded(
    corpus: DataFrame,
    key_col: str,
    num_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 5,
) -> dict[int, bytes]:
    """Build the sharded filter distributed; returns {shard: bitmap}.

    Each shard's bitmap is built by ONE task over only that shard's
    hashes (groupBy shard → applyInPandas), so the driver only ever
    holds the finished num_shards * bits_per_shard/8 bytes.

    Both counts must be powers of two: the build shards with JVM
    ``pmod`` on the SIGNED hash while the probe uses numpy uint64
    modulo — these agree exactly when 2^64 ≡ 0 (mod num_shards), and
    the double-hash stride is only guaranteed coprime to a
    power-of-two bit count."""
    if num_shards & (num_shards - 1) or bits_per_shard & (bits_per_shard - 1):
        raise ValueError("num_shards and bits_per_shard must be powers of 2")

    hashed = _with_hashes(corpus, key_col).select(
        F.pmod(F.col("_h1"), F.lit(num_shards)).cast("int").alias("_shard"),
        "_h1",
        "_h2",
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bitmap = np.zeros(bits_per_shard // 8, dtype=np.uint8)
        h1 = pdf["_h1"].to_numpy()
        h2 = pdf["_h2"].to_numpy()
        for pos in _positions(h1, h2, num_hashes, bits_per_shard):
            np.bitwise_or.at(
                bitmap, (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
        return pd.DataFrame(
            {"shard": [int(pdf["_shard"].iloc[0])],
             "bitmap": [bitmap.tobytes()]}
        )

    schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("bitmap", T.BinaryType(), False),
        ]
    )
    rows = hashed.groupBy("_shard").applyInPandas(build, schema).collect()
    return {int(r["shard"]): bytes(r["bitmap"]) for r in rows}


def bloom_mark(
    spark: SparkSession,
    batch: DataFrame,
    key_col: str,
    shards: dict[int, bytes],
    num_shards: int,
    bits_per_shard: int,
    num_hashes: int = 5,
) -> DataFrame:
    """Add a boolean ``_bloom_hit`` column to the batch: False means
    PROVABLY absent from the corpus (no shuffle needed for these
    rows); True means candidate — a true duplicate or a false
    positive. Map-only: the bitmaps ride a broadcast variable into an
    Arrow-batched pandas UDF."""
    bc = spark.sparkContext.broadcast(shards)

    @F.pandas_udf(T.BooleanType())
    def hit(h1: pd.Series, h2: pd.Series) -> pd.Series:
        import numpy as np

        maps = bc.value
        h1v = h1.to_numpy()
        h2v = h2.to_numpy()
        shard = (
            h1v.astype(np.uint64) % np.uint64(num_shards)
        ).astype(np.int64)
        out = np.zeros(len(h1v), dtype=bool)
        for s in np.unique(shard):
            bm = maps.get(int(s))
            if bm is None:
                continue  # shard never built => nothing in corpus
            arr = np.frombuffer(bm, dtype=np.uint8)
            m = shard == s
            ok = np.ones(int(m.sum()), dtype=bool)
            for pos in _positions(
                h1v[m], h2v[m], num_hashes, bits_per_shard
            ):
                byte = arr[(pos >> np.uint64(3)).astype(np.int64)]
                bit = (pos & np.uint64(7)).astype(np.uint8)
                ok &= (byte >> bit) & np.uint8(1) == 1
            out[m] = ok
        return pd.Series(out)

    return _with_hashes(batch, key_col).withColumn(
        "_bloom_hit", hit(F.col("_h1"), F.col("_h2"))
    )


def incremental_dedup(
    spark: SparkSession,
    corpus: DataFrame,
    batch: DataFrame,
    key_col: str,
    num_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Rows of ``batch`` whose key does not appear in ``corpus`` —
    exactly an anti join, executed as bloom-negative ∪ (candidates
    ANTI JOIN corpus). Only candidates shuffle; the filter guarantees
    no false negatives, and the anti join removes false positives, so
    the result is EXACT."""
    marked = bloom_mark(
        spark, batch, key_col,
        bloom_build_sharded(
            corpus, key_col, num_shards, bits_per_shard, num_hashes
        ),
        num_shards, bits_per_shard, num_hashes,
    )
    # no cache(): the two branches re-run the map-only probe rather
    # than pinning storage that repeated gate/bench invocations would
    # accumulate; on a long-lived cluster job, persist()+unpersist()
    # around the consuming action is the explicit alternative
    cols = batch.columns
    fresh = marked.filter(~F.col("_bloom_hit")).select(cols)
    survivors = (
        marked.filter(F.col("_bloom_hit"))
        .join(
            corpus.select(F.col(key_col).alias("_k")).distinct(),
            F.col(key_col) == F.col("_k"),
            "left_anti",
        )
        .select(cols)
    )
    return fresh.unionByName(survivors)


def bloom_prefilter_join(
    spark: SparkSession,
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_shards: int = 64,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Semi-join reduction: drop fact rows that PROVABLY have no dim
    match before the join — the runtime-filter pattern (Spark's own
    InjectRuntimeFilter, Trino's dynamic filtering) exposed as an
    explicit operator for when the planner's heuristics won't fire
    (e.g. the dim side is itself a subquery the optimizer can't
    size, or the join is written through an API boundary).

    Exactness: a Bloom negative is definitive, so dropped rows could
    never join; false positives survive the prefilter but the exact
    equi-join still eliminates them — the result is identical to the
    plain join, only the shuffle is smaller. At 100 TB the win is
    proportional to dim selectivity: a 1%-selective dim turns a
    full-fact shuffle into a ~1%+FPR one for the cost of one
    broadcast bitmap (num_shards * bits_per_shard/8 bytes,
    corpus-size-independent).
    """
    shards = bloom_build_sharded(
        dim.select(F.col(dim_key).alias("_k")),
        "_k",
        num_shards,
        bits_per_shard,
        num_hashes,
    )
    marked = bloom_mark(
        spark, fact, fact_key, shards, num_shards, bits_per_shard, num_hashes
    )
    reduced = marked.filter(F.col("_bloom_hit")).drop(
        "_h1", "_h2", "_bloom_hit"
    )
    return reduced.join(dim, reduced[fact_key] == dim[dim_key])
