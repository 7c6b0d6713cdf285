"""Sketch-family semantics: HLL/theta/KLL error bounds at real
cardinality, mergeability (the rollup property), count-min and Bloom
filter guarantees, and the runtime Bloom-filter join lever.

The oracle queries (q130, q123, q124) check bounds at fixture
cardinality (150 users); these tests push cardinality to 200k so the
bounds are exercised where approximation actually approximates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 200_000


@pytest.fixture(scope="module")
def ids(spark):
    # deterministic, high-cardinality, non-sequential values
    return spark.range(N).select(
        (F.col("id") * 2654435761 % 1_000_000_007).alias("v"),
        (F.col("id") % 16).alias("g"),
    )


def test_hll_error_bound_and_mergeability(spark, ids):
    """lgConfigK=12 → ~1.6% standard error; 4% ≈ 2.5σ. Merging the 16
    per-group sketches must estimate the UNION as well as one sketch
    built over everything — the property that makes per-partition
    rollups exact-in-distribution, not a second approximation."""
    whole = ids.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0]["est"]
    assert abs(whole - N) <= 0.04 * N

    merged = (
        ids.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert abs(merged - N) <= 0.04 * N


def test_theta_intersection_estimate(spark):
    """Two overlapping sets: A = [0, 120k), B = [60k, 180k). Theta
    intersection must estimate |A∩B| = 60k within 5% — the one-pass
    answer to 'how many users did both' that HLL cannot give."""
    a = F.when(F.col("id") < 120_000, F.col("id"))
    b = F.when(F.col("id") >= 60_000, F.col("id"))
    row = (
        spark.range(180_000)
        .agg(
            F.theta_sketch_agg(a).alias("ta"),
            F.theta_sketch_agg(b).alias("tb"),
        )
        .select(
            F.theta_sketch_estimate(
                F.theta_intersection("ta", "tb")
            ).alias("est_int"),
            F.theta_sketch_estimate(F.theta_difference("ta", "tb")).alias(
                "est_diff"
            ),
        )
        .collect()[0]
    )
    assert abs(row["est_int"] - 60_000) <= 0.05 * 60_000
    assert abs(row["est_diff"] - 60_000) <= 0.05 * 60_000


def test_kll_rank_error_bound(spark, ids):
    """KLL k=200 guarantees ±1.65% rank error at 99% confidence: the
    estimated p50/p90 values must sit at true ranks within ±3%."""
    sk = ids.agg(F.kll_sketch_agg_bigint("v").alias("kll"))
    est = sk.select(
        F.kll_sketch_get_quantile_bigint("kll", F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_bigint("kll", F.lit(0.9)).alias("q90"),
    ).collect()[0]
    for target, val in ((0.5, est["q50"]), (0.9, est["q90"])):
        true_rank = (
            ids.agg(
                (
                    F.sum(F.when(F.col("v") <= val, 1).otherwise(0))
                    / F.count("*")
                ).alias("r")
            ).collect()[0]["r"]
        )
        assert abs(true_rank - target) <= 0.03


def test_count_min_sketch_guarantees(spark):
    """CMS never underestimates, and overestimates by at most eps·N
    with the configured confidence. Built distributed via the stat
    API (two-phase agg under the hood), queried on the driver."""
    # skewed frequencies: value k appears k+1 times, k in [0, 200)
    from distcpplus_spark.functions.sketch_tools import count_min

    df = spark.range(200).select(
        F.explode(F.sequence(F.lit(0), F.col("id"))).alias("dummy"),
        F.col("id").alias("k"),
    ).select("k")
    total = df.count()
    eps = 0.001
    cms = count_min(df, "k", eps=eps, confidence=0.99, seed=42)
    for k in (0, 50, 199):
        est = cms.estimateCount(k)
        true = k + 1
        assert est >= true
        assert est <= true + eps * total


def test_bloom_filter_guarantees(spark, ids):
    """No false negatives ever; false-positive rate near the
    configured fpp. The distributed build (stat.bloomFilter) is the
    broadcast-side of a semi-join prefilter at scale."""
    from distcpplus_spark.functions.sketch_tools import bloom

    members = ids.filter("g < 4").select("v")
    bf = bloom(members, "v", 60_000, 0.01)
    sample = [r["v"] for r in members.limit(500).collect()]
    assert all(bf.mightContain(v) for v in sample)
    # non-members: v-space is disjoint from small negative probes
    fp = sum(bf.mightContain(-i - 1) for i in range(1, 2001))
    assert fp / 2000 <= 0.03  # 3× slack on the 1% target


def test_runtime_bloom_filter_join(spark, tmp_path):
    """Spark's runtime row-level filtering: a selective dim-side
    predicate injects a bloom_filter_agg + BloomFilterMightContain
    onto the fact scan of a shuffle join, cutting shuffled fact rows
    before the exchange — the optimizer-managed version of the manual
    prefilter above, and a lever 100 TB joins need ON."""
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(500_000).select(
        F.col("id").alias("fk"), (F.col("id") % 97).alias("payload")
    ).write.parquet(fact_p)
    spark.range(50_000).select(
        F.col("id").alias("pk"), (F.col("id") % 11).alias("attr")
    ).write.parquet(dim_p)
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("attr") == 3)
        joined = fact.join(dim, fact.fk == dim.pk)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "BloomFilter" in plan
        assert joined.count() > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_freq_items_finds_heavy_hitters(spark):
    """stat.freqItems (Karp/Misra-Gries style single-pass): every item
    with frequency above the support threshold must be in the result
    (false positives allowed, false negatives not)."""
    df = spark.range(10_000).selectExpr(
        "CASE WHEN id % 10 < 3 THEN 777 "
        "     WHEN id % 10 < 5 THEN 888 "
        "     ELSE id END AS v"
    )
    found = set(df.stat.freqItems(["v"], 0.25).collect()[0][0])
    assert {777, 888} <= found


def test_sketch_builders_fail_clearly_without_jvm_handle():
    """Spark Connect DataFrames have no _jdf; the builders must raise
    a clear NotImplementedError, not an AttributeError from py4j."""
    import pytest as _pt

    from distcpplus_spark.functions.sketch_tools import bloom, count_min

    class FakeConnectDF:
        _jdf = None

    with _pt.raises(NotImplementedError, match="Spark Connect"):
        count_min(FakeConnectDF(), "c")
    with _pt.raises(NotImplementedError, match="Spark Connect"):
        bloom(FakeConnectDF(), "c", 100)


def test_space_saving_single_partition_guarantees(spark):
    """One partition: SpaceSaving never under-counts, every item with
    count > n/k is present, over-count <= n/k."""
    from distcpplus_spark.functions.sketch_tools import space_saving_topk

    # planted: token i appears (i+1)*10 times, i in 0..39 -> n = 8200
    rows = [(f"t{i:02d}",) for i in range(40) for _ in range((i + 1) * 10)]
    df = spark.createDataFrame(rows, "tok STRING").coalesce(1)
    k = 16
    got = {r["key"]: r["est"] for r in space_saving_topk(df, "tok", k).collect()}
    n = len(rows)
    truth = {f"t{i:02d}": (i + 1) * 10 for i in range(40)}
    for key, est in got.items():
        assert est >= truth[key], (key, est, truth[key])
        assert est - truth[key] <= n / k
    for key, c in truth.items():
        if c > n / k:
            assert key in got, (key, c, n / k)


def test_space_saving_merged_contract(spark):
    """Many partitions: the two-sided n/k bound and 2n/k top-k
    presence (the provable merged guarantees) hold."""
    from distcpplus_spark.functions.sketch_tools import space_saving_topk

    rows = [("hot",)] * 3000 + [("warm",)] * 800 + [
        (f"cold{i}",) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "tok STRING").repartition(8)
    k = 32
    n = len(rows)
    got = {r["key"]: r["est"] for r in space_saving_topk(df, "tok", k).collect()}
    truth = {"hot": 3000, "warm": 800}
    for key, c in truth.items():
        if c * k > 2 * n:
            assert key in got
    for key, est in got.items():
        assert abs(est - truth.get(key, 1)) <= n / k, (key, est)
    assert len(got) <= k
