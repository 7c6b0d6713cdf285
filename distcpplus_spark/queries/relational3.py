"""TPC-H-shape round-2 additions: the predicate/join patterns whose
PLANS decide scan cost at 100 TB — disjunctive pushdown (Q19 shape),
conditional aggregation over a join (Q14 shape), and the two-path
nation join (Q7 shape). Fixture columns differ slightly from stock
TPC-H (no shipmode/instruct), so the predicates are adapted while
keeping the plan shape the queries exist to pin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import query, small_sort


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "q116_disjunctive_pushdown",
    oracle="""
    SELECT CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE)
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
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
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
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
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
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
        .transform(small_sort, "supp_nation", "cust_nation", "ship_year")
    )


@query(
    "q120_sql_entry_point",
    oracle="""
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(o.o_totalprice), 2) AS DOUBLE) AS revenue
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
               CAST(round(sum(o.o_totalprice), 2) AS DOUBLE) AS revenue
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
