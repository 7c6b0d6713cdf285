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


# --- measured split: Zipf-skewed sf0.1 headline-shaped join ---------

def _walk_plan(node, out):
    out.append(node)
    ch = node.children()
    for i in range(ch.size()):
        _walk_plan(ch.apply(i), out)
    if "QueryStage" in node.nodeName():
        _walk_plan(node.plan(), out)
    return out


def _final_plan_nodes(df):
    root = df._jdf.queryExecution().executedPlan()
    return _walk_plan(root.executedPlan(), [])


def _zipf_join(spark, sf_dir):
    """Headline-shaped fact-dim join (lineitem x supplier at sf0.1)
    with a DETERMINISTIC Zipf-skewed key derived from xxhash64 of the
    row key: u = uniform(0,1], k = min(floor(u^-0.8), 1000) puts ~58%
    of the 600k fact rows on k=1 — the hot-vendor shape a real corpus
    join hits."""
    from distcpplus_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    u = (
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(1000000))
         + F.lit(0.5)) / F.lit(1000000.0)
    )
    fact = li.select(
        F.least(F.floor(F.pow(u, F.lit(-0.8))), F.lit(1000))
        .cast("long").alias("k"),
        F.concat_ws("|", "l_returnflag", "l_linestatus",
                    F.col("l_extendedprice").cast("string"),
                    F.col("l_shipdate").cast("string")).alias("pad"),
    )
    # AQE splits a skewed REDUCE partition by mapper ranges; the
    # fixture parquet is ONE row group = one map task, which makes
    # every reduce partition unsplittable. Round-robin repartition
    # reproduces the multi-mapper shape any real cluster job has
    # (thousands of map tasks at 100 TB).
    fact = fact.repartition(16)
    dim = load_table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") + 1).alias("k"), "s_name", "s_acctbal"
    )
    return fact, dim


def test_zipf_skew_split_measured(spark, skew_confs):
    """Beyond the plan-marker assert: measure the hot partition's
    PRE-split shuffle bytes (MapOutputStatistics) and the POST-split
    task sizes (PartialReducerPartitionSpec.dataSize) and assert the
    split actually flattened the task-size distribution."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # thresholds sized to the fixture's MEASURED shuffle bytes: the
    # hot partition lands ~150 KB compressed at sf0.1 (lz4 eats the
    # repetitive pad strings), so the production 256 MB default is
    # stood down to 96 KB — the mechanics under test are the split
    # decision + resulting task sizes, not the default heuristic
    threshold = 96 * 1024
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        str(threshold),
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
    )
    _run_measured_skew(spark, sf_dir, threshold)


def _run_measured_skew(spark, sf_dir, threshold):
    fact, dim = _zipf_join(spark, sf_dir)
    agg = fact.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum(F.length("pad")).alias("b")
    )
    n = agg.collect()[0]["n"]
    assert n > 0

    nodes = _final_plan_nodes(agg)
    reads = [x for x in nodes if x.nodeName() == "AQEShuffleRead"]
    assert reads, "no AQEShuffleRead in final plan"

    # the skewed read is the one whose metrics mark splits
    skewed = None
    pre_sizes = post_sizes = None
    for r in reads:
        m = r.metrics()
        if not m.contains("numSkewedSplits"):
            continue
        n_skew = m.apply("numSkewedPartitions").value()
        n_splits = m.apply("numSkewedSplits").value()
        if n_skew >= 1 and n_splits >= 2:
            skewed = r
            # PRE: per-reduce-partition shuffle bytes from the map
            # output stats of the child shuffle stage
            stage = r.children().apply(0)
            stats = stage.mapStats().get()
            pre_sizes = list(stats.bytesByPartitionId())
            # POST: the split pieces of the hot partition(s) — the
            # PartialReducerPartitionSpec entries (Coalesced specs
            # carry dataSize as a Scala Option; Partial is a plain
            # long and is the thing under test)
            specs = r.partitionSpecs()
            post_sizes = []
            for i in range(specs.size()):
                s = specs.apply(i)
                if (
                    s.getClass().getSimpleName()
                    == "PartialReducerPartitionSpec"
                ):
                    post_sizes.append(int(s.dataSize()))
            break
    assert skewed is not None, "no skew split fired in the final plan"

    pre_max = max(pre_sizes)
    post_max = max(post_sizes)
    # the hot partition really was skewed...
    assert pre_max > threshold, (pre_max, pre_sizes)
    med = sorted(pre_sizes)[len(pre_sizes) // 2]
    assert pre_max >= 2 * max(med, 1), (pre_max, med)
    # ...and the split genuinely flattened it: every post-split task
    # reads a fraction of the hot partition
    assert post_max < pre_max / 2, (pre_max, post_max)
    # record the measurement for the round notes (pytest -s shows it)
    print(
        f"\nAQE skew split measured: pre max/median task bytes "
        f"{pre_max}/{med}; post-split max {post_max} over "
        f"{len(post_sizes)} split tasks"
    )


# --- round 14: SHJ skew guards for preferSortMergeJoin=false -------


def test_q422_plan_is_shj(spark):
    """The registered guard query (q422, sf10 spot set) must keep its
    shuffled-hash shape under the TUNED session — a lost hint or a
    silent fallback to broadcast/SMJ would make the standing skew
    guard test nothing."""
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    df = queries["q422_skewed_shj_guard"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan[:3000]
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]


def test_shj_skew_split_fires_and_preserves_results(spark, skew_confs):
    """AQE's skew split must cover the SHUFFLED-HASH path the session
    default (spark.sql.join.preferSortMergeJoin=false, session.py)
    steers big joins onto — the split-covers-SHJ claim that justified
    the global flip, asserted rather than assumed. Forces the SHJ
    with the same hint q422 uses, then checks (a) the final adaptive
    plan marks the skew split on a ShuffledHashJoin and (b) results
    are identical with the lever on and off."""
    left, right = _skewed_frames(spark)
    joined = left.join(right.hint("shuffle_hash"), "k")
    agg = joined.agg(
        F.count("*").alias("n"), F.sum(F.length("pad")).alias("bytes")
    )
    n = agg.collect()[0]["n"]
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:500]
    assert "ShuffledHashJoin" in plan, plan[:3000]
    assert "isSkew=true" in plan or "skew=true" in plan, plan[:3000]

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        n2 = (
            left.join(right.hint("shuffle_hash"), "k")
            .agg(F.count("*").alias("n"))
            .collect()[0]["n"]
        )
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert n == n2
