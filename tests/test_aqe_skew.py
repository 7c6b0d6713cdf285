"""AQE skew-join split: the runtime re-plan lever for skewed shuffle
joins (SURVEY.md §2b scale levers, beside the explicit salting in
operators/scale.py). Asserts that with skew thresholds scaled down to
fixture size, AQE actually SPLITS the hot partition of a sort-merge
join — i.e. the final adaptive plan marks the join's skew handling —
and that results are identical with the lever on and off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # fixture-sized thresholds: the DEFAULTS (256 MB) never trigger on
    # kilobyte test frames; the mechanics, not the heuristic, is under test
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    # force the sort-merge path: broadcast would bypass skew handling
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_frames(spark):
    # one hot key (0) carrying ~90% of rows, padded so its shuffle
    # partition crosses the scaled-down skew threshold
    left = spark.range(0, 30000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(0, 3000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("rid"),
    )
    return left, right


def test_aqe_splits_skewed_join(spark, skew_confs):
    left, right = _skewed_frames(spark)
    # NOTE: a groupBy on the JOIN KEY directly above the join would
    # legally SUPPRESS the skew split (splitting the partition breaks
    # the agg's required hash distribution) — aggregate globally so
    # the optimizer is free to split.
    joined = left.join(right, "k")
    agg = joined.agg(
        F.count("*").alias("n"), F.sum(F.length("pad")).alias("bytes")
    )
    n = agg.collect()[0]["n"]
    lcnt = {r["k"]: r["c"] for r in
            left.groupBy("k").agg(F.count("*").alias("c")).collect()}
    rcnt = {r["k"]: r["c"] for r in
            right.groupBy("k").agg(F.count("*").alias("c")).collect()}
    expect = sum(c * rcnt.get(k, 0) for k, c in lcnt.items())
    assert n == expect
    # the FINAL adaptive plan (of the query that actually ran) must
    # mark the skew split on the sort-merge join
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:500]
    assert "isSkew=true" in plan or "skew=true" in plan, plan[:3000]


def test_skew_split_preserves_results(spark, skew_confs):
    left, right = _skewed_frames(spark)
    with_skew = (
        left.join(right, "k").groupBy("k").agg(F.count("*").alias("n"))
    ).collect()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        without = (
            left.join(right, "k").groupBy("k").agg(F.count("*").alias("n"))
        ).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert sorted(map(tuple, with_skew)) == sorted(map(tuple, without))
