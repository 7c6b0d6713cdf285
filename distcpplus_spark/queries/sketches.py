"""Mergeable-sketch surface: HLL distinct counts, KLL quantiles,
theta set algebra (round-3 additions).

Why sketches are first-class at 100 TB: exact DISTINCT/percentile over
a petabyte shuffles every value; a sketch shuffles a few KB per
partition and MERGES associatively — per-day/per-partition sketches
roll up to any coarser grain without rescanning (the hypertable-rollup
pattern). Spark 4's DataSketches functions (hll_sketch_agg, kll_*,
theta_*) run entirely JVM-side as two-phase aggregates: partial
sketches map-side, one small merge reduce-side.

Oracle strategy: a cross-engine hash can't compare estimates (DuckDB's
approx functions use different sketch implementations), so the
hash-checked queries emit the APPROXIMATION CONTRACT instead — the
exact value (DuckDB-computable) next to a boolean "estimate within the
documented error bound", which the oracle asserts is TRUE for every
group. The raw estimates are exposed by the rows-only x16 entry and
bounded tightly in tests/test_sketches.py on wider-cardinality data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import query, small_sort


@query(
    "q130_hll_mergeable_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BOOLEAN) AS hll_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q130_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HLL sketch next to the exact
    count, asserting the estimate lands within 5% (lgConfigK=12 →
    ~1.6% standard error; 5% is > 3σ). At scale the exact column is
    dropped and per-partition sketches merge via hll_union_agg —
    a rollup re-aggregates sketches, never raw IDs.

    Round-14: the sketch and the exact count are SEPARATE aggs joined
    on the group key — mixed into one agg, the distinct aggregate's
    Expand keys the partial agg on (event_type, user_id), building one
    HLL buffer per distinct PAIR instead of per type (the q221
    pathology, measured 26 s there at sf0.1)."""
    ev = load_table(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    per_type = sketches.join(F.broadcast(exact), "event_type")
    est = F.hll_sketch_estimate("sk")
    return (
        per_type.select(
            "event_type",
            F.col("exact_users").cast("bigint").alias("exact_users"),
            (
                F.abs(est - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("hll_within_5pct"),
        )
        .transform(small_sort, "event_type")
    )


@query(
    "q123_kll_quantile_rank_bound",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(1 AS BOOLEAN) AS median_rank_within_3pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q123_kll_quantile_rank_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median order price per priority from a KLL quantile sketch,
    verified by its own contract: KLL guarantees RANK error (default
    k=200 → ±1.65% at 99% confidence), so the check computes the true
    rank of the sketch's median estimate and asserts it sits within
    0.5 ± 0.03. Sketches per priority are tiny (KBs) and mergeable —
    per-day sketches roll up to per-month medians without re-reading."""
    o = load_table(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double("o_totalprice").alias("kll"),
        F.count("*").alias("n_orders"),
    )
    est = sk.select(
        "o_orderpriority",
        "n_orders",
        F.kll_sketch_get_quantile_double("kll", F.lit(0.5)).alias("med_est"),
    )
    # true rank of the estimate: fraction of rows <= est, per priority
    ranked = (
        o.join(F.broadcast(est), "o_orderpriority")
        .groupBy("o_orderpriority", "n_orders")
        .agg(
            (
                F.sum(
                    F.when(F.col("o_totalprice") <= F.col("med_est"), 1).otherwise(0)
                )
                / F.count("*")
            ).alias("true_rank")
        )
    )
    return (
        ranked.select(
            "o_orderpriority",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            (F.abs(F.col("true_rank") - 0.5) <= 0.03).alias(
                "median_rank_within_3pct"
            ),
        )
        .transform(small_sort, "o_orderpriority")
    )


@query(
    "q124_theta_set_algebra",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT
      CAST((SELECT count(*) FROM v) AS BIGINT) AS exact_view,
      CAST((SELECT count(*) FROM (SELECT * FROM v INTERSECT SELECT * FROM p))
           AS BIGINT) AS exact_both,
      CAST((SELECT count(*) FROM (SELECT * FROM v EXCEPT SELECT * FROM p))
           AS BIGINT) AS exact_view_only,
      CAST(1 AS BOOLEAN) AS theta_within_5pct
    """,
)
def q124_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches carry SET ALGEBRA that HLL cannot: intersection
    and difference of distinct-user sets (viewers ∩ purchasers,
    viewers ∖ purchasers) estimated from two sketches built in ONE
    pass over events — no self-join of the raw table. The oracle pins
    the exact set sizes; the boolean asserts every theta estimate is
    within 5% (absolute slack of 1 covers tiny-set jitter)."""
    ev = load_table(spark, sf_dir, "events")
    # Round-14: the exact view count no longer rides in the sketch agg
    # (a distinct aggregate mixed with non-distinct ones Expands the
    # partial agg to one theta buffer per distinct user — the q221
    # pathology); it reuses the distinct view-user set below instead.
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("th_view"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("th_purch"),
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact_view = v.count()
    exact_both = v.intersect(p).count()
    exact_view_only = v.exceptAll(p).distinct().count()
    est_view = F.theta_sketch_estimate("th_view")
    est_both = F.theta_sketch_estimate(
        F.theta_intersection("th_view", "th_purch")
    )
    est_only = F.theta_sketch_estimate(
        F.theta_difference("th_view", "th_purch")
    )
    tol = lambda est, exact: F.abs(est - exact) <= F.greatest(  # noqa: E731
        F.lit(1.0), 0.05 * exact
    )
    return sk.select(
        F.lit(exact_view).cast("bigint").alias("exact_view"),
        F.lit(exact_both).cast("bigint").alias("exact_both"),
        F.lit(exact_view_only).cast("bigint").alias("exact_view_only"),
        (
            tol(est_view, F.lit(exact_view))
            & tol(est_both, F.lit(exact_both))
            & tol(est_only, F.lit(exact_view_only))
        ).alias("theta_within_5pct"),
    )


@query("x16_sketch_estimates")
def x16_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch estimates (rows-only: cross-engine hashes can't
    cover approximate values): per-type HLL + theta distinct-user
    estimates, plus the MERGED all-types row built by unioning the
    per-type sketches — the rollup operation that makes sketches the
    scale path. Estimates are deterministic for fixed input, so the
    driver's stability check still holds."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("hll"),
        F.theta_sketch_agg("user_id").alias("th"),
    )
    rows = per_type.select(
        "event_type",
        F.hll_sketch_estimate("hll").cast("bigint").alias("hll_users"),
        F.theta_sketch_estimate("th").cast("bigint").alias("theta_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll"))
        .cast("bigint")
        .alias("hll_users"),
        F.theta_sketch_estimate(F.theta_union_agg("th"))
        .cast("bigint")
        .alias("theta_users"),
    ).select(F.lit("ALL_MERGED").alias("event_type"), "hll_users", "theta_users")
    return small_sort(rows.unionByName(merged), "event_type")


@query(
    "q148_cms_heavy_hitters",
    oracle="""
    SELECT CAST(l_suppkey AS BIGINT) AS key,
           CAST(count(*) AS BIGINT) AS exact_cnt,
           CAST(1 AS BOOLEAN) AS cms_within_eps
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY exact_cnt DESC, key
    LIMIT 10
    """,
)
def q148_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with a count-min sketch next to the exact counts,
    per the approx-operator CONTRACT (oracle checks the exact value
    and the estimate-within-bound boolean): CMS guarantees
    ``true <= est <= true + eps*N`` at the given confidence.

    At scale the exact column is dropped; CMS is mergeable
    (per-partition/per-day sketches mergeInPlace into the corpus
    sketch), so the stream never re-aggregates raw keys. The top-10
    here collects 10 rows to probe the driver-side JVM sketch — the
    sketch itself was built distributed."""
    from distcpplus_spark.functions.sketch_tools import count_min

    li = load_table(spark, sf_dir, "lineitem")
    eps = 0.0005
    n_rows = li.count()
    cms = count_min(li.select("l_suppkey"), "l_suppkey", eps=eps)
    top = (
        li.groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("key"))
        .limit(10)
        .collect()
    )
    bound = eps * n_rows
    rows = [
        (
            int(r["key"]),
            int(r["exact_cnt"]),
            bool(
                r["exact_cnt"]
                <= cms.estimateCount(int(r["key"]))
                <= r["exact_cnt"] + bound
            ),
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows, "key BIGINT, exact_cnt BIGINT, cms_within_eps BOOLEAN"
    )


@query(
    "q221_approx_aggregates_bound",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(1 AS BOOLEAN) AS acd_within_5pct,
           CAST(1 AS BOOLEAN) AS p50_rank_within_3pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q221_approx_aggregates_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x06's approximate aggregates under the approximation CONTRACT
    (hash-checkable where the raw estimates are not): per return
    flag, approx_count_distinct must sit within 5% of the exact
    distinct order count, and percentile_approx(0.5)'s estimate must
    have a TRUE rank within 0.5 +/- 0.03 (percentile_approx's default
    accuracy of 1/10000 makes that bound generous; the rank check is
    the same sketch-contract trick as q123). The oracle pins the
    exact values and asserts both booleans.

    Round-14 optimization (guide §2.3): the sketches and the exact
    distinct count were ONE agg — mixing a distinct aggregate with
    non-distinct ones plans an Expand whose first partial-agg keys on
    (l_returnflag, l_orderkey), so the HLL and percentile buffers
    were built once per distinct PAIR (~150k sketch buffers; measured
    26 s for the combined agg at sf0.1 vs ~1 s for each aggregate
    alone). Split into two single-purpose aggregations joined on the
    3-row flag key: 33 → ~4 s, bit-identical output."""
    li = load_table(spark, sf_dir, "lineitem")
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("acd"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_est"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders")
    )
    est = sketches.join(F.broadcast(exact), "l_returnflag")
    ranked = (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag", "acd", "exact_orders")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("l_extendedprice") <= F.col("p50_est"), 1
                    ).otherwise(0)
                )
                / F.count("*")
            ).alias("true_rank")
        )
    )
    return (
        ranked.select(
            "l_returnflag",
            F.col("exact_orders").cast("bigint").alias("exact_orders"),
            (
                F.abs(F.col("acd") - F.col("exact_orders"))
                <= F.greatest(F.lit(2.0), 0.05 * F.col("exact_orders"))
            ).alias("acd_within_5pct"),
            (F.abs(F.col("true_rank") - 0.5) <= 0.03).alias(
                "p50_rank_within_3pct"
            ),
        )
        .transform(small_sort, "l_returnflag")
    )


@query(
    "q222_sketch_estimates_bound",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BOOLEAN) AS hll_within_5pct,
           CAST(1 AS BOOLEAN) AS theta_within_5pct
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL_MERGED',
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(1 AS BOOLEAN), CAST(1 AS BOOLEAN)
    FROM events
    ORDER BY event_type
    """,
)
def q222_sketch_estimates_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x16's HLL + theta estimates under the approximation CONTRACT:
    per event type AND for the merged all-types rollup (the union of
    the per-type sketches — the operation that makes sketches the
    100 TB path), each estimate must sit within 5% of the exact
    distinct-user count the oracle pins. One pass builds all
    sketches; the exact counts come from a SEPARATE aggregation
    joined on event_type (round-14: mixed distinct + sketch aggs
    Expand to one sketch buffer per distinct (type, user) pair — the
    q221 pathology)."""
    ev = load_table(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("hll"),
        F.theta_sketch_agg("user_id").alias("th"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    per_type = sketches.join(F.broadcast(exact), "event_type")
    tol = lambda est, exact: F.abs(est - exact) <= F.greatest(  # noqa: E731
        F.lit(2.0), 0.05 * exact
    )
    rows = per_type.select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        tol(F.hll_sketch_estimate("hll"), F.col("exact_users")).alias(
            "hll_within_5pct"
        ),
        tol(F.theta_sketch_estimate("th"), F.col("exact_users")).alias(
            "theta_within_5pct"
        ),
    )
    total_exact = ev.select("user_id").distinct().count()
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("hll_est"),
        F.theta_sketch_estimate(F.theta_union_agg("th")).alias("th_est"),
    ).select(
        F.lit("ALL_MERGED").alias("event_type"),
        F.lit(total_exact).cast("bigint").alias("exact_users"),
        tol(F.col("hll_est"), F.lit(total_exact)).alias("hll_within_5pct"),
        tol(F.col("th_est"), F.lit(total_exact)).alias("theta_within_5pct"),
    )
    return small_sort(rows.unionByName(merged), "event_type")
