"""Second wave of relational coverage: pivot, exceptAll, more
aggregates (min_by/max_by, first/last, corr/covar, mode), EXISTS
subqueries, CASE aggregation, scalar subquery, qualify-style dedup,
string padding/translate, least/greatest, bit ops, and interval
arithmetic. Every query oracle-checked (SURVEY.md §2b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.operators.scale import distributed_ranks
from distcpplus_spark.queries import money_sum, money_sum_2dec, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q36_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(round(coalesce(sum(CASE WHEN l_linestatus = 'O'
                THEN l_quantity END), 0), 2) AS DOUBLE) AS qty_O,
           CAST(round(coalesce(sum(CASE WHEN l_linestatus = 'F'
                THEN l_quantity END), 0), 2) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q36_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on linestatus (DataFrame .pivot with explicit values so
    no extra distinct-discovery job runs)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.round(F.coalesce("O", F.lit(0.0)), 2).alias("qty_O"),
            F.round(F.coalesce("F", F.lit(0.0)), 2).alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q37_except_all",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
      EXCEPT ALL
      SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
    )
    ORDER BY nationkey
    """,
)
def q37_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference — keeps multiplicity)."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.exceptAll(b).orderBy("nationkey")


@query(
    "q38_minby_maxby",
    oracle="""
    SELECT o_orderpriority,
           CAST(min_by(o_orderkey, o_totalprice) AS BIGINT) AS cheapest_order,
           CAST(max_by(o_orderkey, o_totalprice) AS BIGINT) AS priciest_order,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_price,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q38_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by argmin-style aggregates (totalprice values are
    distinct doubles in practice, so the argmin is unique)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q39_corr_covar",
    oracle="""
    SELECT CAST(round(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS qp_corr,
           CAST(round(covar_samp(l_quantity, l_extendedprice), 4) AS DOUBLE)
               AS qp_covar,
           CAST(round(regr_slope(l_extendedprice, l_quantity), 6) AS DOUBLE)
               AS qp_slope
    FROM lineitem
    """,
)
def q39_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics: corr, covar_samp, regression slope."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qp_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qp_covar"),
        F.round(
            F.regr_slope("l_extendedprice", "l_quantity"), 6
        ).alias("qp_slope"),
    )


@query(
    "q45_exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_suppkey = s_suppkey AND l_quantity > 45
    )
    ORDER BY s_suppkey
    """,
)
def q45_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via Spark SQL (Catalyst rewrites to semi join)."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        ORDER BY s_suppkey
        """
    )


@query(
    "q46_scalar_subquery",
    oracle="""
    SELECT o_orderkey, CAST(round(o_totalprice, 2) AS DOUBLE) AS price
    FROM orders
    WHERE o_totalprice > 1.75 * (SELECT avg(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
)
def q46_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders > 1.75x average price)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(round(o_totalprice, 2) AS DOUBLE) AS price
        FROM orders
        WHERE o_totalprice > 1.75 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@query(
    "q47_string_pad_translate",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
           translate(p_brand, '#', '-') AS brand_dash,
           reverse(p_name) AS name_rev,
           CAST(strpos(p_type, 'BRASS') AS BIGINT) AS brass_pos,
           repeat(p_brand, 2) AS brand_twice,
           left(p_name, 3) AS name3,
           right(p_name, 3) AS name_last3
    FROM part
    WHERE p_partkey < 60
    ORDER BY p_partkey
    """,
)
def q47_string_pad_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family 2: pad, translate, reverse, position, repeat,
    left/right."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 60)
        .select(
            "p_partkey",
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
            F.translate("p_brand", "#", "-").alias("brand_dash"),
            F.reverse("p_name").alias("name_rev"),
            F.instr(F.col("p_type"), "BRASS").cast("bigint").alias("brass_pos"),
            F.repeat("p_brand", 2).alias("brand_twice"),
            F.substring("p_name", 1, 3).alias("name3"),
            F.substring(F.col("p_name"), -3, 3).alias("name_last3"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q48_least_greatest_sign",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(least(l_discount, l_tax), 6) AS DOUBLE) AS min_rate,
           CAST(round(greatest(l_discount, l_tax), 6) AS DOUBLE) AS max_rate,
           CAST(sign(l_discount - l_tax) AS BIGINT) AS rate_sign,
           CAST(round(l_extendedprice % 100, 6) AS DOUBLE) AS price_mod
    FROM lineitem
    WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q48_least_greatest_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.least("l_discount", "l_tax"), 6).alias("min_rate"),
            F.round(F.greatest("l_discount", "l_tax"), 6).alias("max_rate"),
            F.signum(F.col("l_discount") - F.col("l_tax"))
            .cast("bigint")
            .alias("rate_sign"),
            F.round(F.col("l_extendedprice") % 100, 6).alias("price_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q49_window_frames_range",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_last_30m,
           CAST(round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS DOUBLE)
             AS avg_3,
           CAST(round(first_value(value) OVER (PARTITION BY user_id
             ORDER BY ts, event_id), 6) AS DOUBLE) AS first_val,
           CAST(round(last_value(value) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6)
             AS DOUBLE) AS last_val
    FROM events
    WHERE user_id < 5
    ORDER BY user_id, event_id
    """,
)
def q49_window_frames_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames over event time + ROWS frames + first/last_value.

    The 30-minute RANGE frame is the sliding-window-per-row pattern —
    state stays bounded by the frame, the standard trick for
    rate-limiting / rolling-metric features at scale.
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    by_ts = W.partitionBy("user_id").orderBy(F.col("ts").cast("long"))
    range_30m = by_ts.rangeBetween(-1800, 0)
    ordered = W.partitionBy("user_id").orderBy("ts", "event_id")
    rows3 = ordered.rowsBetween(-2, 0)
    full = ordered.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.count("*").over(range_30m).alias("n_last_30m"),
            F.round(F.avg("value").over(rows3), 6).alias("avg_3"),
            F.round(F.first("value").over(ordered), 6).alias("first_val"),
            F.round(F.last("value").over(full), 6).alias("last_val"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q63_mode_countif",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) FILTER (WHERE c_acctbal > 5000) AS BIGINT) AS n_rich,
           CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT) AS n_neg,
           CAST(round(avg(c_acctbal) FILTER (WHERE c_acctbal > 0), 4)
                AS DOUBLE) AS avg_pos_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q63_mode_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (FILTER clause / count_if)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count_if(F.col("c_acctbal") > 5000).alias("n_rich"),
            F.count_if(F.col("c_acctbal") < 0).alias("n_neg"),
            F.round(
                F.avg(F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))), 4
            ).alias("avg_pos_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q64_collect_list_sorted",
    oracle="""
    SELECT n_regionkey AS regionkey,
           list_sort(list(n_name)) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY regionkey
    """,
)
def q64_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect + canonical sort (collect_list order
    is nondeterministic under parallelism — always sort before use)."""
    return (
        _t(spark, sf_dir, "nation")
        .groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.sort_array(F.collect_list("n_name")).alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("regionkey")
    )


@query(
    "q65_interval_arith",
    oracle="""
    SELECT event_id, ts,
           ts + INTERVAL 90 MINUTE AS ts_plus90m,
           ts - INTERVAL 1 DAY AS ts_minus1d,
           CAST(date_part('hour', ts) AS BIGINT) AS hr,
           CAST(date_part('minute', ts) AS BIGINT) AS mins,
           CAST(epoch_ms(ts) AS BIGINT) AS epoch_millis
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
)
def q65_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + timestamp part extraction + epoch."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 100)
        .select(
            "event_id",
            "ts",
            (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("ts_plus90m"),
            (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("ts_minus1d"),
            F.hour("ts").cast("bigint").alias("hr"),
            F.minute("ts").cast("bigint").alias("mins"),
            (F.unix_micros("ts") / 1000).cast("bigint").alias("epoch_millis"),
        )
        .orderBy("event_id")
    )


@query(
    "q66_anti_join_nonempty",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    ORDER BY c_custkey
    LIMIT 200
    """,
)
def q66_anti_join_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join with a selective probe side (customers with no
    pending orders) — non-trivial result at every sf, unlike q10."""
    cust = _t(spark, sf_dir, "customer")
    pend = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pend, cust.c_custkey == pend.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
        .limit(200)
    )


@query(
    "q67_distinct_on_pattern",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_order, o_orderdate AS latest_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    WHERE rn = 1 AND o_custkey < 300
    ORDER BY o_custkey
    """,
)
def q67_distinct_on_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON / latest-row-per-key — the workhorse of CDC
    compaction and snapshot queries."""
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("o_custkey") < 300))
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_order"),
            F.col("o_orderdate").alias("latest_date"),
        )
        .orderBy("o_custkey")
    )


@query(
    "q72_salted_skew_join",
    oracle="""
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                AS DOUBLE) AS total
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def q72_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join (operators.scale.salted_join).

    The salt rewrite must be result-identical to the plain join — the
    oracle checks exactly that. At 100 TB with a hot supplier key, the
    plain join hot-spots one reducer; the salted plan spreads each key
    over 8 (key, salt) reducers at the cost of an 8x dim explode.
    """
    from distcpplus_spark.operators.scale import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    from distcpplus_spark.queries import small_sort

    return (
        salted_join(li, supp, "l_suppkey", salt_buckets=8)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_items"),
            money_sum(F.col("l_extendedprice")).alias("total"),
        )
        .transform(small_sort, "s_nationkey")
    )


@query(
    "q73_salted_group_count",
    oracle="""
    SELECT event_type AS k, CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY k
    """,
)
def q73_salted_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators.scale.salted_group_count)
    for hot-key groupBys: partial counts on (key, salt) then combine.
    Oracle: must equal the plain GROUP BY count."""
    from distcpplus_spark.operators.scale import salted_group_count
    from distcpplus_spark.queries import small_sort

    ev = _t(spark, sf_dir, "events").select(F.col("event_type").alias("k"))
    return salted_group_count(ev, "k", salt_buckets=8).transform(
        small_sort, "k"
    )


@query(
    "q74_applyinpandas_ols",
    oracle="""
    SELECT CAST(l_returnflag AS VARCHAR) AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(regr_slope(l_extendedprice, l_quantity), 6) AS DOUBLE)
               AS slope,
           CAST(round(regr_intercept(l_extendedprice, l_quantity), 6) AS DOUBLE)
               AS intercept
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY grp
    """,
)
def q74_applyinpandas_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF (functions.udfs.ols_per_group): per-group OLS
    fit computed in Arrow-batched pandas, hash-checked against DuckDB's
    regr_slope/regr_intercept — the UDF slow path held to the same
    correctness bar as the SQL surface."""
    from distcpplus_spark.functions.udfs import ols_per_group
    from distcpplus_spark.queries import small_sort

    li = _t(spark, sf_dir, "lineitem")
    fit = ols_per_group(li, "l_returnflag", "l_quantity", "l_extendedprice")
    return fit.select(
        "grp",
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
    ).transform(small_sort, "grp")


@query(
    "q76_map_functions",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderpriority
             WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
             WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
             ELSE 5 END AS prio_rank,
           CAST(5 AS INTEGER) AS n_prios
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def q76_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a literal map, look up with
    element_at, measure with size. The oracle computes the same values
    with CASE — the check is on results, the map machinery is ours."""
    prio_map = F.create_map(
        F.lit("1-URGENT"), F.lit(1),
        F.lit("2-HIGH"), F.lit(2),
        F.lit("3-MEDIUM"), F.lit(3),
        F.lit("4-NOT SPECIFIED"), F.lit(4),
        F.lit("5-LOW"), F.lit(5),
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.coalesce(
                F.element_at(prio_map, F.col("o_orderpriority")), F.lit(5)
            ).alias("prio_rank"),
            F.size(prio_map).alias("n_prios"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q77_fuzzy_match_levenshtein",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 120 AND b.p_partkey < 120
      AND levenshtein(a.p_name, b.p_name) <= 12
    ORDER BY id_a, id_b
    """,
)
def q77_fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: edit-distance pairs within a blocking key.

    Scale: the p_brand equi-join is the blocking strategy — candidate
    pairs are generated per brand bucket, never across the full n²
    space; levenshtein runs only on the blocked pairs.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 120)
        .select("p_partkey", "p_name", "p_brand")
    )
    a, b = part.alias("a"), part.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("bigint")
            .alias("dist"),
        )
        .filter(F.col("dist") <= 12)
        .orderBy("id_a", "id_b")
    )


@query(
    "q78_time_spine_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL 1 HOUR, min(ts)) AS lo,
             time_bucket(INTERVAL 1 HOUR, max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds
    ),
    actual AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hour_start,
             count(*) AS n, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
      FROM events GROUP BY 1
    )
    SELECT s.hour_start,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n,
           CAST(coalesce(a.total, 0.0) AS DOUBLE) AS total
    FROM spine s LEFT JOIN actual a USING (hour_start)
    ORDER BY s.hour_start
    """,
)
def q78_time_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: generate the complete hour spine with
    sequence()+explode, left-join actual aggregates, zero-fill gaps —
    the standard dashboard/feature-engineering shape.

    Scale: the spine is tiny (hours in range); the agg side partial-
    aggregates before its shuffle. Broadcast the spine, not the facts.
    """
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    actual = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("n"), money_sum(F.col("value")).alias("total"))
    return (
        spine.join(actual, "hour_start", "left")
        .select(
            "hour_start",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
        .orderBy("hour_start")
    )


@query(
    "q81_order_count_histogram",
    oracle="""
    SELECT n_orders,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_orders
    """,
)
def q81_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count —
    two-level aggregation over a left join (zero-order customers kept).

    Scale: first agg shuffles on c_custkey (|customers| rows), second
    on the tiny n_orders domain; both partial-aggregate map-side.
    """
    from distcpplus_spark.queries import small_sort

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .transform(small_sort, "n_orders")
    )


@query(
    "q82_correlated_min_subquery",
    oracle="""
    WITH partsupp_like AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             CAST(round(min(l_extendedprice), 2) AS DOUBLE) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, p_name, ps_supplycost
    FROM part
    JOIN partsupp_like ON p_partkey = ps_partkey
    WHERE ps_supplycost = (
      SELECT min(ps2.ps_supplycost) FROM partsupp_like ps2
      WHERE ps2.ps_partkey = p_partkey
    ) AND p_partkey < 200
    ORDER BY p_partkey, ps_supplycost
    """,
)
def q82_correlated_min_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: row matching the per-group minimum via a
    correlated subquery. No partsupp fixture exists, so both sides
    derive the same partsupp-like table from lineitem (cheapest
    observed price per (part, supplier)).

    Spark side decorrelates explicitly — min-per-key aggregate joined
    back (what Catalyst does to the SQL form under the hood).
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    ps = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.round(F.min("l_extendedprice"), 2).alias("ps_supplycost"))
    )
    mins = ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("_min_cost")
    )
    return (
        part.join(ps, part.p_partkey == ps.ps_partkey)
        .join(F.broadcast(mins), "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .select("p_partkey", "p_name", "ps_supplycost")
        .orderBy("p_partkey", "ps_supplycost")
    )


@query(
    "q83_percent_rank_cume_dist",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             ntile(4) OVER w AS quartile
      FROM orders
      WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    )
    SELECT o_orderkey,
           CAST(round(pr, 6) AS DOUBLE) AS pr,
           CAST(round(cd, 6) AS DOUBLE) AS cd,
           CAST(quartile AS BIGINT) AS quartile
    FROM ranked WHERE o_orderkey < 400
    ORDER BY o_orderkey
    """,
)
def q83_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions — percent_rank, cume_dist,
    ntile over the FULL orders price ordering, computed DISTRIBUTED
    (operators.scale.distributed_ranks: the (price, orderkey) order
    is unique, so all three fall out of one range-repartitioned
    row-level prefix sum plus a scalar count — no partition-less
    Window node; this query used to carry a fixed-400-key whitelist
    entry in the global-window audit). The ranking frame is the whole
    SF-scaled table; only the OUTPUT is sliced to a fixed key range
    so the oracle compare stays cheap at any SF."""
    ranked = distributed_ranks(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        order=[("o_totalprice", True), ("o_orderkey", True)],
        unique_order=True,
        percent_rank_col="_pr",
        cume_dist_col="_cd",
        ntile=(4, "_q4"),
    )
    return (
        ranked.filter(F.col("o_orderkey") < 400)
        .select(
            "o_orderkey",
            F.round(F.col("_pr"), 6).alias("pr"),
            F.round(F.col("_cd"), 6).alias("cd"),
            F.col("_q4").cast("bigint").alias("quartile"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q84_lag_lead_defaults",
    oracle="""
    SELECT user_id, event_id,
           CAST(coalesce(lag(value, 1) OVER w, -1.0) AS DOUBLE) AS prev_value,
           CAST(coalesce(lead(value, 2) OVER w, -1.0) AS DOUBLE) AS next2_value
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def q84_lag_lead_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offsets and defaults per user-session ordering —
    the event-sequence feature-engineering staple."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            F.coalesce(F.lag("value", 1).over(w), F.lit(-1.0)).alias(
                "prev_value"
            ),
            F.coalesce(F.lead("value", 2).over(w), F.lit(-1.0)).alias(
                "next2_value"
            ),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q85_not_in_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey < 300
      AND c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      )
    ORDER BY c_custkey
    """,
)
def q85_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — the null-semantics trap: one NULL in the
    subquery empties the result, so NOT IN compiles to a null-aware
    anti join, not a plain left_anti. Expressed through Spark SQL so
    Catalyst plans exactly that."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey < 300
          AND c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        ORDER BY c_custkey
        """
    )


@query(
    "q86_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.source') AS VARCHAR) AS src,
           CAST(json_extract(props, '$.retries') AS BIGINT) AS retries
    FROM events
    WHERE event_id < 300
    ORDER BY event_id
    """,
)
def q86_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured JSON parsing: from_json into a typed struct (vs
    q32's per-key get_json_object) — one parse, many fields, and the
    struct prunes into the scan."""
    parsed = F.from_json(
        "props", "source STRING, retries BIGINT, flag BOOLEAN"
    ).alias("p")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 300)
        .select("event_id", parsed)
        .select(
            "event_id",
            F.col("p.source").alias("src"),
            F.col("p.retries").alias("retries"),
        )
        .orderBy("event_id")
    )


@query(
    "q87_null_ordering",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.retries') AS BIGINT) AS retries
    FROM events
    WHERE event_id < 120
    ORDER BY retries DESC NULLS LAST, event_id
    """,
)
def q87_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null-ordering control (desc_nulls_last) — engines
    disagree on default null placement, so portable queries say it."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 120)
        .select(
            "event_id",
            F.get_json_object("props", "$.retries").cast("bigint").alias(
                "retries"
            ),
        )
        .orderBy(F.desc_nulls_last("retries"), F.asc("event_id"))
    )


@query(
    "q88_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def q88_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: Spark has no ORDER BY inside
    collect_list (it's nondeterministic), so the deterministic form is
    array_sort → array_join — same result as SQL string_agg ORDER BY."""
    from distcpplus_spark.queries import small_sort

    return (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations")
        )
        .transform(small_sort, "n_regionkey")
    )


@query(
    "q89_date_format_epoch",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(date_part('dow', o_orderdate) AS BIGINT) AS dow,
           CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR)
               AS quarter_start
    FROM orders
    WHERE o_orderkey < 400
    ORDER BY o_orderkey
    """,
)
def q89_date_format_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date formatting + epoch conversion + day-of-week + quarter
    truncation (session pinned UTC so epoch math is engine-portable).
    DuckDB dow: Sunday=0 — Spark's dayofweek is Sunday=1, shifted."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 400)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
            F.date_trunc("quarter", "o_orderdate")
            .cast("date")
            .cast("string")
            .alias("quarter_start"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q90_array_set_ops",
    oracle="""
    SELECT e1.user_id,
           len(list_intersect(e1.types_a, e1.types_b)) AS n_common,
           len(list_distinct(list_concat(e1.types_a, e1.types_b))) AS n_union
    FROM (
      SELECT user_id,
             coalesce(list_distinct(list(event_type)
                FILTER (WHERE event_id % 2 = 0)), []) AS types_a,
             coalesce(list_distinct(list(event_type)
                FILTER (WHERE event_id % 2 = 1)), []) AS types_b
      FROM events WHERE user_id < 30
      GROUP BY user_id
    ) e1
    ORDER BY e1.user_id
    """,
)
def q90_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: intersect/union cardinalities of two
    per-user event-type sets (size comparisons, order-independent).

    EMPTY-SET SEMANTICS (sf3 sweep catch, round 10): a user with no
    events of one parity gives Spark's collect_list an EMPTY ARRAY
    but DuckDB's list(...) FILTER a NULL — len(list_intersect(NULL,
    x)) is NULL, not 0. The oracle coalesces to [] so both engines
    compute set algebra over the empty set. Latent at every SF; only
    sf3's data happened to include a single-parity user."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    sets = ev.groupBy("user_id").agg(
        F.array_distinct(
            F.collect_list(
                F.when(F.col("event_id") % 2 == 0, F.col("event_type"))
            )
        ).alias("types_a"),
        F.array_distinct(
            F.collect_list(
                F.when(F.col("event_id") % 2 == 1, F.col("event_type"))
            )
        ).alias("types_b"),
    )
    return sets.select(
        "user_id",
        F.size(F.array_intersect("types_a", "types_b")).alias("n_common"),
        F.size(F.array_distinct(F.concat("types_a", "types_b"))).alias(
            "n_union"
        ),
    ).orderBy("user_id")


@query(
    "q91_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
           len(regexp_extract_all(text, '[0-9]+')) AS n_numbers
    FROM documents
    WHERE doc_id < 150
    ORDER BY doc_id
    """,
)
def q91_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: pull every match out of a document —
    tokenizer-building-block coverage."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all("text", F.lit("[A-Za-z]+"), 0)
            ).alias("n_words"),
            F.size(
                F.regexp_extract_all("text", F.lit("[0-9]+"), 0)
            ).alias("n_numbers"),
        )
        .orderBy("doc_id")
    )


@query(
    "q92_scd2_validity_ranges",
    oracle="""
    SELECT user_id, event_id,
           ts AS valid_from,
           coalesce(lead(ts) OVER w,
                    TIMESTAMP '9999-12-31 00:00:00') AS valid_to,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE user_id < 15
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, event_id
    """,
)
def q92_scd2_validity_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history building: each state change's validity
    interval is [its ts, next change's ts), open-ended for the current
    row — the standard dimension-history pattern, one window pass."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 15)
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            F.coalesce(
                nxt, F.lit("9999-12-31 00:00:00").cast("timestamp")
            ).alias("valid_to"),
            F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


@query(
    "q93_gap_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WHERE user_id < 15
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    )
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS sess_start,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS total
    FROM sessioned
    GROUP BY user_id, sess_id
    ORDER BY user_id, sess_id
    """,
)
def q93_gap_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, window formulation: flag gaps > 30min
    with lag(), running-sum the flags into session ids, aggregate per
    session. The batch twin of session_window (q35) expressed the
    classic SQL way — two window passes, one shuffle on user_id that
    both reuse (same partitioning)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    prev_ts = F.lag("ts").over(w)
    flagged = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 15)
        .withColumn(
            "new_sess",
            F.when(
                prev_ts.isNull()
                | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800),
                1,
            ).otherwise(0),
        )
    )
    sessioned = flagged.withColumn(
        "sess_id", F.sum("new_sess").over(run).cast("bigint")
    )
    return (
        sessioned.groupBy("user_id", "sess_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("sess_start"),
            money_sum(F.col("value")).alias("total"),
        )
        .orderBy("user_id", "sess_id")
    )


@query(
    "q96_nested_in_subqueries",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_type LIKE '%BRASS%'
      )
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 200
    )
    ORDER BY s_suppkey
    """,
)
def q96_nested_in_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: two-level nested IN with an aggregate HAVING in
    the inner query — Catalyst decorrelates both levels into semi
    joins; the DataFrame side writes the decorrelated form explicitly
    (filter → semi-join → agg-filter → semi-join)."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type").like("%BRASS%"))
    heavy = (
        li.join(
            part.select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 200)
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q97_width_bucket_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 13
                     ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT)
               AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS lo,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS hi
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q97_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram binning via width_bucket — the profiling/
    feature-binning primitive. One pass, partial-aggregated."""
    from distcpplus_spark.queries import small_sort

    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .transform(small_sort, "bucket")
    )


@query(
    "q98_relational_division",
    oracle="""
    SELECT o_custkey AS c_custkey
    FROM orders
    GROUP BY o_custkey
    HAVING count(DISTINCT o_orderpriority) =
           (SELECT count(DISTINCT o_orderpriority) FROM orders)
    ORDER BY c_custkey
    """,
)
def q98_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ("for all"): customers who have placed
    orders in EVERY priority class — the count-distinct-equality
    formulation (set containment via cardinality), one agg plus a
    broadcast scalar."""
    orders = _t(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    n_prios = orders.select("o_orderpriority").distinct().count()
    return (
        orders.groupBy("c_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("_n"))
        .filter(F.col("_n") == n_prios)
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q99_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric,
           CAST(round(val, 6) AS DOUBLE) AS val
    FROM (
      SELECT l_orderkey, l_linenumber, 'qty' AS metric,
             l_quantity AS val FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'disc', l_discount
      FROM lineitem WHERE l_orderkey < 100
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax
      FROM lineitem WHERE l_orderkey < 100
    )
    ORDER BY l_orderkey, l_linenumber, metric
    """,
)
def q99_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long melt) via DataFrame.unpivot — the feature-
    table normalization step; oracle expresses the same as UNION ALL."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .withColumn("qty", F.col("l_quantity"))
        .withColumn("disc", F.col("l_discount"))
        .withColumn("tax", F.col("l_tax"))
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["qty", "disc", "tax"],
            "metric",
            "raw",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "metric",
            F.round("raw", 6).alias("val"),
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@query(
    "q100_cooccurrence_matrix",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events WHERE user_id < 200
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
)
def q100_cooccurrence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence (market-basket) matrix: for each pair of event
    types, how many users performed both. Distinct-reduce first so the
    self-join is over |users|x|types| pairs, not raw events — the
    standard cardinality-control step before any self-join at scale."""
    from distcpplus_spark.queries import small_sort

    ut = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("user_id", "event_type")
        .distinct()
    )
    a, b = ut.alias("a"), ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_users"))
        .transform(small_sort, "type_a", "type_b")
    )


@query(
    "q101_intersect_all",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 1000
      INTERSECT ALL
      SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    ORDER BY nationkey
    """,
)
def q101_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection, multiplicity = min of the
    two sides) — completes the set-op family with q23-q25/q37."""
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 1000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.intersectAll(b).orderBy("nationkey")


@query(
    "q102_median_percentile_disc",
    oracle="""
    SELECT o_orderstatus,
           CAST(round(median(o_totalprice), 4) AS DOUBLE) AS med,
           CAST(round(quantile_disc(o_totalprice, 0.25), 2) AS DOUBLE)
               AS p25_disc
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q102_median_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median (continuous, interpolated) vs percentile_disc (an actual
    data value) — the distinction matters for skewed monetary data."""
    from distcpplus_spark.queries import small_sort

    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.median("o_totalprice"), 4).alias("med"),
            F.round(
                F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"),
                2,
            ).alias("p25_disc"),
        )
        .transform(small_sort, "o_orderstatus")
    )
