"""Sharded Bloom filter + incremental dedup (operators/bloom.py):
exactness vs a plain anti join, the no-false-negative guarantee,
false-positive-rate sanity, and the shard agreement between the JVM
build hash and the numpy probe hash."""

import pytest
from pyspark.sql import functions as F

from distcpplus_spark.operators.bloom import (
    bloom_build_sharded,
    bloom_mark,
    incremental_dedup,
)


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(
        [(i, f"key-{i % 700}") for i in range(2000)], "id BIGINT, k STRING"
    )
    # batch: half overlapping keys, half fresh
    batch = spark.createDataFrame(
        [(i, f"key-{i}" if i % 2 else f"fresh-{i}") for i in range(400, 1400)],
        "id BIGINT, k STRING",
    )
    return corpus, batch


def test_incremental_dedup_equals_anti_join(spark, frames):
    corpus, batch = frames
    got = incremental_dedup(spark, corpus, batch, "k", num_shards=16,
                            bits_per_shard=1 << 16)
    expect = batch.join(corpus.select("k").distinct(), "k", "left_anti")
    g = sorted((r["id"], r["k"]) for r in got.collect())
    e = sorted((r["id"], r["k"]) for r in expect.collect())
    assert g == e
    assert len(g) > 0  # the fixture actually exercises both paths


def test_no_false_negatives(spark, frames):
    """Every corpus key must probe positive — the Bloom guarantee the
    exactness argument rests on."""
    corpus, _ = frames
    shards = bloom_build_sharded(corpus, "k", num_shards=8,
                                 bits_per_shard=1 << 16)
    marked = bloom_mark(spark, corpus, "k", shards, 8, 1 << 16)
    assert marked.filter(~F.col("_bloom_hit")).count() == 0


def test_false_positive_rate_bounded(spark):
    """10k fresh keys against a 5k-key corpus in 2^20-bit shards:
    the theoretical FPR at this load is ~1e-9; allow a generous 1%
    so the test is insensitive to hash quirks."""
    corpus = spark.createDataFrame(
        [(i, f"c-{i}") for i in range(5000)], "id BIGINT, k STRING"
    )
    probe = spark.createDataFrame(
        [(i, f"p-{i}") for i in range(10000)], "id BIGINT, k STRING"
    )
    shards = bloom_build_sharded(corpus, "k", num_shards=4,
                                 bits_per_shard=1 << 20)
    marked = bloom_mark(spark, probe, "k", shards, 4, 1 << 20)
    fp = marked.filter(F.col("_bloom_hit")).count()
    assert fp <= 100


def test_candidate_set_is_small(spark, frames):
    """The scale property: only true dups + FPR-rate rows are marked
    candidates, so the verify join's input is a sliver of the batch."""
    corpus, batch = frames
    shards = bloom_build_sharded(corpus, "k", num_shards=16,
                                 bits_per_shard=1 << 16)
    marked = bloom_mark(spark, batch, "k", shards, 16, 1 << 16)
    n_batch = batch.count()
    n_candidates = marked.filter(F.col("_bloom_hit")).count()
    n_true_dups = batch.join(
        corpus.select("k").distinct(), "k", "left_semi"
    ).count()
    assert n_candidates >= n_true_dups  # no false negatives
    assert n_candidates <= n_true_dups + 0.02 * n_batch + 5


def test_rejects_non_power_of_two(spark, frames):
    corpus, _ = frames
    with pytest.raises(ValueError, match="powers of 2"):
        bloom_build_sharded(corpus, "k", num_shards=12)


def test_bloom_prefilter_join_reduces_and_matches_plain_join(spark):
    from distcpplus_spark.operators.bloom import (
        bloom_build_sharded,
        bloom_mark,
        bloom_prefilter_join,
    )
    from pyspark.sql import functions as F

    fact = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dim = spark.range(0, 5000).filter(F.col("id") % 100 == 0).select(
        F.col("id").alias("dk"), F.lit("d").alias("tag")
    )
    got = bloom_prefilter_join(
        spark, fact, dim, "k", "dk", num_shards=4, bits_per_shard=1 << 12
    )
    plain = fact.join(dim, fact["k"] == dim["dk"])
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in plain.collect()
    )
    # the prefilter genuinely dropped most of the fact side
    shards = bloom_build_sharded(
        dim.select(F.col("dk").alias("_k")), "_k", 4, 1 << 12
    )
    marked = bloom_mark(spark, fact, "k", shards, 4, 1 << 12)
    n_pass = marked.filter(F.col("_bloom_hit")).count()
    assert 50 <= n_pass < 500  # 50 true keys + small FP slice of 5000
