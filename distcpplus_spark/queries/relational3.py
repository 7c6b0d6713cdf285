"""TPC-H-shape round-2 additions: the predicate/join patterns whose
PLANS decide scan cost at 100 TB — disjunctive pushdown (Q19 shape),
conditional aggregation over a join (Q14 shape), and the two-path
nation join (Q7 shape). Fixture columns differ slightly from stock
TPC-H (no shipmode/instruct), so the predicates are adapted while
keeping the plan shape the queries exist to pin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import money_sum, money_sum_2dec, query, small_sort


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q116_disjunctive_pushdown",
    oracle="""
    SELECT CAST(((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                           AS BIGINT)) + 50) // 100) / 100.0 AS DOUBLE)
               AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q116_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of conjunctive brand/size/quantity
    bands over a part⋈lineitem join. The plan matter: Catalyst must
    push the common sub-predicates (brand IN, size <= 50, quantity
    bounds) below the join on BOTH sides rather than filtering after —
    at 100 TB that's the difference between scanning three brands and
    scanning the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(pt, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            money_sum_2dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q117_promo_revenue_share",
    oracle="""
    SELECT CAST(round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
                 sum(l_extendedprice * (1 - l_discount)), 6) AS DOUBLE)
               AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def q117_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a join — promo
    revenue share for one ship year. The date range pushes to the
    lineitem scan; part broadcasts; the CASE rides the single
    aggregate (no second pass)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    pt = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(pt, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "q118_nation_volume_pairs",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(((sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                 * 10000) AS BIGINT)) + 50) // 100) / 100.0
                AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name != cn.n_name
    GROUP BY sn.n_name, cn.n_name, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def q118_nation_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year —
    the fact table reaches two different dimension PATHS (supplier
    nation and customer nation) that must both broadcast; the
    asymmetric nation filter lands on the dim scans, not post-join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            money_sum_2dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume")
        )
        .transform(small_sort, "supp_nation", "cust_nation", "ship_year")
    )


@query(
    "q120_sql_entry_point",
    oracle="""
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0
                AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q120_sql_entry_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-SQL entry point (engine.sql, SURVEY.md §3 entry (a)):
    the same statement DuckDB runs, fed verbatim through Spark's SQL
    parser with the fixture views registered — proving a reference
    user can bring raw SQL, not just the DataFrame API. Catalyst
    plans it identically to the DataFrame form (broadcast dims,
    partial aggs)."""
    from distcpplus_spark.engine import DistCpPlusEngine

    engine = DistCpPlusEngine(spark)
    return engine.sql(
        """
        SELECT n.n_name, count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0
                    AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
        ORDER BY n.n_name
        """,
        sf_dir,
    )


@query(
    "q121_grouping_indicators",
    oracle="""
    SELECT coalesce(n_name, 'ALL') AS nation,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE n.n_nationkey < 5
    GROUP BY ROLLUP(n_name, o_orderpriority)
    ORDER BY g_nation, g_priority, nation, priority
    """,
)
def q121_grouping_indicators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicators over a rollup: the flags that let a
    consumer tell a real NULL group from a subtotal row — the missing
    piece next to q14-q16's plain rollup/cube/grouping-sets output."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    joined = o.join(c, F.col("c_custkey") == F.col("o_custkey")).join(
        F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey")
    )
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.grouping("n_name").cast("bigint").alias("g_nation"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_nation",
            "g_priority",
            "n",
        )
        .transform(small_sort, "g_nation", "g_priority", "nation", "priority")
    )


@query(
    "q125_lateral_topk_per_row",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t ON true
    WHERE c.c_custkey < 50
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
)
def q125_lateral_topk_per_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    'top 2 orders for each customer' idiom a reference user writes as
    a lateral, which Catalyst decorrelates into a window-ranked join
    (DecorrelateInnerQuery) rather than executing N point queries.
    Same statement text runs on both engines."""
    from distcpplus_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 50
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@query(
    "q126_sole_blame_supplier",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q126_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to fixture columns: returned lines
    stand in for late lines): suppliers who were the ONLY supplier
    with a returned line on a finished multi-supplier order. The plan
    matter is the double self-correlation on the fact table — one
    EXISTS (left-semi) and one NOT EXISTS (left-anti) against the
    SAME lineitem scan — which must stay equi-keyed on l_orderkey so
    both land as hash joins at scale, never nested loops."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    others = (
        li.select(
            F.col("l_orderkey").alias("k_orderkey"),
            F.col("l_suppkey").alias("k_suppkey"),
            "l_returnflag",
        )
    )
    semi_keys = (F.col("l1.l_orderkey") == F.col("k_orderkey")) & (
        F.col("l1.l_suppkey") != F.col("k_suppkey")
    )
    blamed = (
        l1.join(o, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .join(others, semi_keys, "left_semi")
        .join(
            others.filter(F.col("l_returnflag") == "R"),
            semi_keys,
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == F.col("s_suppkey"))
    )
    return (
        blamed.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q127_idle_rich_customers",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0
                AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (1, 3, 5, 7)
      AND c_acctbal > (
        SELECT avg(c_acctbal) FROM customer
        WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7))
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
)
def q127_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in selected
    nations with no URGENT orders — an uncorrelated scalar aggregate
    subquery (computed once, broadcast as a literal predicate) plus a
    NOT EXISTS that must become a left-anti hash join on o_custkey.
    The avg is computed over the same nation slice both engines see."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7)
    )
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .collect()[0][0]
    )
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .transform(small_sort, "cntrycode")
    )


@query(
    "q129_locf_forward_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events WHERE user_id < 10
    ),
    spine AS (
      SELECT u.user_id, h.hour_start
      FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 10) u
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                  AS hour_start FROM bounds) h
    ),
    actual AS (
      SELECT user_id, date_trunc('hour', ts) AS hour_start,
             round(avg(value), 6) AS v
      FROM events WHERE user_id < 10
      GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT s.user_id, s.hour_start,
           CAST(round(last_value(a.v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.hour_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS DOUBLE)
               AS v_filled
    FROM spine s LEFT JOIN actual a USING (user_id, hour_start)
    ORDER BY s.user_id, s.hour_start
    """,
)
def q129_locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last observation carried forward): every
    user × hour slot carries the most recent observed hourly average —
    q78's spine join plus the IGNORE NULLS running last_value that
    zero-fill can't express. The window partitions by user, so no
    global sort; the spine is broadcast-joined against the hourly
    aggregate. Sensor/feature pipelines use exactly this shape to
    densify sparse series before training."""
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .crossJoin(
            F.broadcast(
                bounds.select(
                    F.explode(
                        F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
                    ).alias("hour_start")
                )
            )
        )
    )
    actual = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    win = (
        W.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(actual, ["user_id", "hour_start"], "left")
        .select(
            "user_id",
            "hour_start",
            F.round(F.last("v", ignorenulls=True).over(win), 6).alias(
                "v_filled"
            ),
        )
        .orderBy("user_id", "hour_start")
    )


_RECURSIVE_ANCESTORS_SQL = """
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
      FROM customer WHERE c_custkey BETWEEN 64 AND 255
      UNION ALL
      SELECT node, CAST(floor(cur / 2) AS BIGINT) AS cur, depth + 1 AS depth
      FROM anc WHERE cur > 1
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(max(depth) AS BIGINT) AS depth_to_root,
           CAST(sum(cur) AS BIGINT) AS ancestor_sum
    FROM anc GROUP BY node ORDER BY node LIMIT 50
"""


@query("q134_recursive_cte_closure", oracle=_RECURSIVE_ANCESTORS_SQL)
def q134_recursive_cte_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE transitive closure (new in Spark 4): each node's
    ancestor chain in an implicit binary tree (parent = node ÷ 2)
    walked to the root, aggregated to depth and ancestor-sum. The
    statement text is IDENTICAL on both engines — the recursion is
    engine-native, not emulated. Spark executes it as an iterative
    union with per-step plans; depth is O(log n) here, and at scale
    each step is a hash join against the previous frontier (the same
    shape as the connected-components loop in operators/dedup.py,
    which predates engine-native recursion and remains the
    checkpointed path for unbounded-depth graphs)."""
    from distcpplus_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_ANCESTORS_SQL)


@query(
    "q135_variant_semistructured",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           CAST(count(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                      THEN 1 END) AS BIGINT) AS n_big,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q135_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once into a variant column, then typed path extraction
    (try_variant_get) — the open-format answer to schemaless columns
    that replaces per-query string re-parsing (q32's
    get_json_object): at scale the variant encodes to a compact
    shredded binary that parses ONCE at ingest, and extractions are
    field lookups, not JSON tokenization per expression. The oracle
    reads the same numbers via the oracle engine's JSON path
    functions."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_big"),
            F.count("*").alias("n"),
        )
        .transform(small_sort, "event_type")
    )


@query(
    "q136_sql_scalar_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) AS DECIMAL(18, 6))), 2)
                AS DOUBLE) AS charged,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q136_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (CREATE FUNCTION ... RETURN <expr>): the
    user-defined-function surface that STAYS in Catalyst — the body
    inlines into the plan as an ordinary expression (whole-stage
    codegen, pushdown-eligible), unlike Python UDFs which cross the
    interpreter boundary. A reference user's reusable business
    formula ('charged amount') is defined once and used like a
    built-in; the oracle computes the same formula inline."""
    from distcpplus_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION charged_amount("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1 - d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(round(sum(CAST(charged_amount(l_extendedprice,
                    l_discount, l_tax) AS DECIMAL(18, 6))), 2)
                    AS DOUBLE) AS charged,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "q137_data_quality_audit",
    oracle="""
    SELECT 'orders_pk_dupes' AS check_name,
           CAST((SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT) AS violations
    UNION ALL
    SELECT 'orders_fk_orphans',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_null_qty',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_quantity IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_extendedprice <= 0) AS BIGINT)
    UNION ALL
    SELECT 'orders_bad_status',
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
    ORDER BY check_name
    """,
)
def q137_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit — the expectations gate an ingest pipeline
    runs before publishing a dataset version: primary-key uniqueness,
    referential integrity (FK orphans via anti join), null checks,
    domain checks. Each check is one aggregate; violation COUNTS (not
    violating rows) come back, so the result is O(checks) regardless
    of data size and the full audit is a handful of partial-aggregated
    scans. Pairs with the versioned publish operator (x15): publish
    only if every count is zero."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def one(name: str, cnt) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("bigint").alias("violations"),
        )

    pk_dupes = one(
        "orders_pk_dupes",
        o.groupBy("o_orderkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").alias("violations")),
    )
    fk_orphans = one(
        "orders_fk_orphans",
        o.join(c, F.col("c_custkey") == F.col("o_custkey"), "left_anti").agg(
            F.count("*").alias("violations")
        ),
    )
    null_qty = one(
        "lineitem_null_qty",
        li.agg(
            F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("violations")
        ),
    )
    nonpos = one(
        "lineitem_nonpositive_price",
        li.agg(
            F.count(F.when(F.col("l_extendedprice") <= 0, 1)).alias(
                "violations"
            )
        ),
    )
    bad_status = one(
        "orders_bad_status",
        o.agg(
            F.count(
                F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
            ).alias("violations")
        ),
    )
    return small_sort(
        pk_dupes.unionByName(fk_orphans)
        .unionByName(null_qty)
        .unionByName(nonpos)
        .unionByName(bad_status),
        "check_name",
    )


@query(
    "q139_explode_outer",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             regexp_extract_all(text || CASE WHEN doc_id % 11 = 0
                  THEN ' a' || doc_id || '@x.com b' || doc_id || '@y.org'
                  ELSE '' END,
                  '[A-Za-z0-9.]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}') AS emails
      FROM documents WHERE doc_id < 100
    )
    SELECT s.doc_id, u.email
    FROM synth s LEFT JOIN LATERAL unnest(s.emails) AS u(email) ON true
    ORDER BY s.doc_id, u.email
    """,
)
def q139_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER generator semantics: explode_outer keeps a row (with
    NULL) for documents whose extracted-email array is EMPTY — plain
    explode silently drops them, which in an audit query makes
    clean documents vanish from the report. Emails are planted on
    doc_id % 11 == 0 so both populated and empty arrays occur; the
    oracle expresses the same row preservation as a LEFT JOIN LATERAL
    unnest."""
    rx = r"[A-Za-z0-9.]+@[A-Za-z0-9.]+\.[A-Za-z]{2,}"
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" a"), F.col("doc_id").cast("string"), F.lit("@x.com b"),
                F.col("doc_id").cast("string"), F.lit("@y.org"),
            ),
        ).otherwise(""),
    )
    return (
        docs.select(
            "doc_id",
            F.explode_outer(
                F.regexp_extract_all(t, F.lit(rx), 0)
            ).alias("email"),
        )
        .orderBy("doc_id", "email")
    )


@query(
    "q141_funnel_analysis",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 'S1_view' AS stage, CAST((SELECT count(*) FROM v) AS BIGINT) AS users
    UNION ALL
    SELECT 'S2_click_after_view', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 'S3_purchase_after_click', CAST((SELECT count(*) FROM p) AS BIGINT)
    ORDER BY stage
    """,
)
def q141_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who VIEWED, then CLICKED strictly after
    their first view, then PURCHASED strictly after that first
    qualifying click. Each stage is one conditional min-aggregate over
    the previous stage's timestamps — computed in a SINGLE pass per
    stage with per-user state that fits in the aggregate buffer, then
    reduced to three counts. No per-user collect, no self-join
    explosion: the stage joins key on user_id (hash join) and events
    is scanned once per stage with the event-type filter pushed down.
    The product-analytics staple (conversion funnels) the reference's
    users would otherwise take to a specialized engine."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )

    return small_sort(
        stage("S1_view", v)
        .unionByName(stage("S2_click_after_view", c))
        .unionByName(stage("S3_purchase_after_click", p)),
        "stage",
    )


@query(
    "q142_cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             CAST(date_diff('day', f.cohort_day,
                  CAST(date_trunc('day', e.ts) AS DATE)) AS BIGINT)
                 AS day_offset
      FROM events e JOIN first_day f USING (user_id)
    )
    SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS active_users
    FROM activity WHERE day_offset <= 3
    GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset
    """,
)
def q142_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (funnel q141's companion): users grouped by
    first-seen day, counted as active on each subsequent day offset —
    the triangle a growth dashboard plots. Shapes: per-user min
    (hash aggregate), user-keyed hash join back to events, DISTINCT
    on (user, cohort, offset) then a small aggregate — each step
    partial-aggregates before its shuffle, and the join key is the
    user id, so no step widens beyond O(active users)."""
    ev = _t(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort_day")
    )
    activity = (
        ev.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.to_date(F.date_trunc("day", "ts")), F.col("cohort_day")
            )
            .cast("bigint")
            .alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 3)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("active_users"))
        .transform(small_sort, "cohort_day", "day_offset")
    )


@query(
    "q151_small_qty_avg_subquery",
    oracle="""
    WITH thresh AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS t
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                       / 100.0) / 7.0, 2) AS DOUBLE)
             AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thresh t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.t
    """,
)
def q151_small_qty_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — a correlated
    aggregate subquery (per-part 20%-of-average quantity threshold)
    decorrelated into a per-key aggregate + join, which is exactly how
    Catalyst rewrites it.

    Scale: the threshold table is |parts|-sized (one row per part) —
    joins hash-partition on partkey; the brand filter pushes to the
    part scan and prunes the expensive side first."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresh = li.groupBy(F.col("l_partkey").alias("tk")).agg(
        (0.2 * F.avg("l_quantity")).alias("t")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(thresh, li["l_partkey"] == F.col("tk"))
        .filter(F.col("l_quantity") < F.col("t"))
        .agg(
            F.round(
                money_sum(F.col("l_extendedprice")) / 7.0, 2
            ).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@query(
    "q152_top_revenue_supplier_view",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) + 50) // 100) / 100.0
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
           s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q152_top_revenue_supplier_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: suppliers achieving the maximum quarterly
    revenue — an aggregate view consumed twice (per-supplier revenue
    and its max) with a scalar-subquery filter.

    Scale: revenue aggregates to |suppliers| rows; the max is a
    single-row broadcast; the supplier join hash-partitions on the
    key. The shipdate range filter pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money_sum_2dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(revenue, s["s_suppkey"] == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q154_scd2_dimension_merge",
    oracle="""
    WITH hist AS (
      SELECT c_custkey AS k, round(c_acctbal, 2) AS bal,
             TIMESTAMP '1990-01-01' AS valid_from,
             TIMESTAMP '9999-12-31' AS valid_to,
             1 AS is_current
      FROM customer WHERE c_custkey < 80
    ),
    chg AS (
      SELECT k, bal, change_ts FROM (
        SELECT o_custkey AS k, round(o_totalprice, 2) AS bal,
               o_orderdate AS change_ts,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_custkey < 50
      ) WHERE rn = 1
    ),
    closed AS (
      SELECT h.k, h.bal, h.valid_from,
             CASE WHEN c.k IS NOT NULL THEN c.change_ts
                  ELSE h.valid_to END AS valid_to,
             CASE WHEN c.k IS NOT NULL THEN 0 ELSE 1 END AS is_current
      FROM hist h LEFT JOIN chg c ON h.k = c.k
    ),
    inserted AS (
      SELECT k, bal, change_ts AS valid_from,
             TIMESTAMP '9999-12-31' AS valid_to, 1 AS is_current
      FROM chg
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(bal AS DOUBLE) AS bal,
           valid_from, valid_to, CAST(is_current AS BIGINT) AS is_current
    FROM (SELECT * FROM closed UNION ALL SELECT * FROM inserted)
    ORDER BY k, valid_from
    """,
)
def q154_scd2_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension merge (operators/upsert.py::scd2_apply):
    a change batch closes each changed key's current row at the change
    timestamp and inserts the new open row; unchanged keys pass
    through. History = customer balances; changes = each customer's
    latest order total (DISTINCT ON via a per-key ranking window).

    Scale: the close-out is ONE left join on the key (broadcast or
    hash, Catalyst's choice), the insert is a free union; the ranking
    window partitions by customer. Pair with upsert_partitioned to
    rewrite only affected partitions at persist time."""
    from distcpplus_spark.operators.upsert import scd2_apply

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 80)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    history = cust.select(
        F.col("c_custkey").alias("k"),
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.lit("9999-12-31 00:00:00").cast("timestamp").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    changes = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("k"),
            F.round("o_totalprice", 2).alias("bal"),
            F.col("o_orderdate").alias("change_ts"),
        )
    )
    merged = scd2_apply(history, changes, key="k")
    return (
        merged.select(
            F.col("k").cast("bigint").alias("k"),
            F.col("bal").cast("double").alias("bal"),
            "valid_from",
            "valid_to",
            F.col("is_current").cast("bigint").alias("is_current"),
        )
        .orderBy("k", "valid_from")
    )


def _zorder_oracle() -> str:
    from distcpplus_spark.operators.layout import zvalue_sql

    z = zvalue_sql("(o_custkey % 256)", "(o_orderkey % 256)", 8)
    return f"""
    SELECT ({z} >> 8) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_custkey % 256) AS BIGINT) AS min_a,
           CAST(max(o_custkey % 256) AS BIGINT) AS max_a,
           CAST(min(o_orderkey % 256) AS BIGINT) AS min_b,
           CAST(max(o_orderkey % 256) AS BIGINT) AS max_b
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """


@query("q183_zorder_layout_stats", oracle=_zorder_oracle())
def q183_zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout statistics under the driver's hash
    gate (operators/layout.py): orders rows bucketed by the high
    8 bits of the 16-bit interleave of (o_custkey%256, o_orderkey
    %256), reporting each bucket's count and per-dimension min/max —
    the stats a parquet reader would prune on after zorder_by
    rewrites the table. The interleave is pure shiftleft/AND
    expression math (whole-stage codegen), mirrored bit-for-bit into
    the oracle via zvalue_sql; every output is an integer so the
    hash compare is rounding-free. Each bucket's (a, b) spread being
    a small rectangle — visible in min/max — is exactly why both
    columns prune after z-ordering, where single-column range layout
    prunes only one."""
    from distcpplus_spark.operators.layout import zorder_bucket_stats

    orders = load_table(spark, sf_dir, "orders")
    return (
        zorder_bucket_stats(
            orders,
            F.pmod(F.col("o_custkey"), F.lit(256)),
            F.pmod(F.col("o_orderkey"), F.lit(256)),
            bits=8,
            bucket_shift=8,
        )
        .transform(small_sort, "bucket")
    )


@query(
    "q306_parameterized_sql",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity >= 30
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q306_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark 4 parameterized queries through
    engine.sql(..., args=...)): the predicate values are BOUND as
    :minq/:lo/:hi parameters, not interpolated into the statement —
    the injection-safe path a reference user templating queries
    needs. The oracle runs the same statement with inline literals;
    matching hashes prove the binder feeds the parser identical
    typed values (including a datetime crossing the string boundary).
    """
    import datetime as _dt

    from distcpplus_spark.engine import DistCpPlusEngine

    engine = DistCpPlusEngine(spark)
    return engine.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                    AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_quantity >= :minq
          AND l_shipdate <  :hi
          AND l_shipdate >= :lo
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        sf_dir,
        args={
            "minq": 30,
            "lo": _dt.datetime(1995, 1, 1),
            "hi": _dt.datetime(1997, 1, 1),
        },
    )


@query(
    "q307_unpivot_melt",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
               AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
                AS DOUBLE) AS revenue,
             CAST(count(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY ALL
    )
    SELECT l_returnflag, measure, CAST(value AS DOUBLE) AS value
    FROM (UNPIVOT wide ON sum_qty, revenue, n_items
          INTO NAME measure VALUE value)
    ORDER BY l_returnflag, measure
    """,
)
def q307_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the wide-to-long reshape (the inverse of q36's
    pivot): three per-flag measures fold into (flag, measure, value)
    rows via DataFrame.unpivot (Catalyst Expand, one pass, no
    shuffle beyond the aggregate), checked against DuckDB's native
    UNPIVOT. The wide frame itself uses GROUP BY ALL (the Spark 4 /
    DuckDB dialect sugar) so both engines infer grouping keys the
    same way. Measures share one DOUBLE type — unpivot requires a
    common value type, the melt contract."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long"))
        .cast("double").alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).cast("double").alias("revenue"),
        F.count("*").cast("double").alias("n_items"),
    )
    return (
        wide.unpivot(
            ["l_returnflag"],
            ["sum_qty", "revenue", "n_items"],
            "measure",
            "value",
        )
        .transform(small_sort, "l_returnflag", "measure")
    )
