"""Round-15 probe harness: time alternative formulations side by side.

Usage: python tools/probe_r15.py <experiment> <sf_dir> [reps]

Same discipline as probe_r14: warm each variant once, alternate reps
timed collects in ONE session, print medians, hard-fail unless all
variants return identical sorted rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.session import get_spark


# ------------------------------------------------------------- q06
def q06_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    return queries["q06_join_multiway_q5"](spark, sf_dir)


def _q06_parts(spark, sf_dir):
    from distcpplus_spark.queries.relational import _t

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return cust, orders, li, asia_supp


def q06_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double pre-aggregation (guide §2.3, aggregate before you
    shuffle): revenue units pre-summed by (l_orderkey, s_nationkey,
    n_name) BELOW the l⋈o exchange, then re-summed by (o_custkey,
    s_nationkey, n_name) BELOW the customer join. Exact: the money
    lattice quantizes PER LINEITEM ROW (floor(x*10000+0.5) BIGINT),
    and BIGINT sums are associative — the final (+50)//100/100.0 is
    applied once at the end, identical to money_sum_2dec."""
    from distcpplus_spark.queries import small_sort
    from distcpplus_spark.queries.relational import _t  # noqa: F401

    cust, orders, li, asia_supp = _q06_parts(spark, sf_dir)
    units = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("bigint")
    by_order = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_orderkey", "s_nationkey", "n_name")
        .agg(F.sum(units).alias("_u"))
    )
    o = orders.select("o_orderkey", "o_custkey")
    by_cust = (
        by_order.join(o, by_order.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "s_nationkey", "n_name")
        .agg(F.sum("_u").alias("_u"))
    )
    c = cust.select("c_custkey", "c_nationkey")
    return (
        by_cust.join(
            c,
            (by_cust.o_custkey == c.c_custkey)
            & (c.c_nationkey == by_cust.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            (
                ((F.sum("_u") + F.lit(50)) / F.lit(100)).cast("bigint")
                / F.lit(100.0)
            ).alias("revenue")
        )
        .transform(small_sort, F.desc("revenue"), "n_name")
    )


def q06_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current join order with explicit projection before the l⋈o
    exchange (guide §2.3 'project before the exchange' — cheap
    insurance; Spark usually prunes these itself)."""
    from distcpplus_spark.queries import money_sum_2dec, small_sort

    cust, orders, li, asia_supp = _q06_parts(spark, sf_dir)
    li_slim = li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    o_slim = orders.select("o_orderkey", "o_custkey")
    c_slim = cust.select("c_custkey", "c_nationkey")
    return (
        li_slim.join(F.broadcast(asia_supp), li_slim.l_suppkey == F.col("s_suppkey"))
        .join(o_slim, li_slim.l_orderkey == o_slim.o_orderkey)
        .join(
            c_slim,
            (o_slim.o_custkey == c_slim.c_custkey)
            & (c_slim.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            money_sum_2dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .transform(small_sort, F.desc("revenue"), "n_name")
    )


EXPERIMENTS = {
    "q06": {
        "current": q06_current,
        "project": q06_project,
        "preagg": q06_preagg,
    },
}


def main() -> None:
    exp = sys.argv[1]
    sf_dir = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    variants = EXPERIMENTS[exp]
    spark = get_spark(f"probe_{exp}")
    rows = {}
    for name, fn in variants.items():
        rows[name] = sorted(map(tuple, fn(spark, sf_dir).collect()))
    names = list(rows)
    for other in names[1:]:
        same = rows[names[0]] == rows[other]
        print(
            f"IDENTICAL {names[0]} vs {other}: {same} "
            f"({len(rows[names[0]])} vs {len(rows[other])} rows)"
        )
        if not same:
            print(rows[names[0]][:3], "vs", rows[other][:3])
            sys.exit(1)
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{exp}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{exp} {name}: median {med:.3f}s  all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
