"""Round-14 experiment (VERDICT item 3): q06 bucketed co-location A/B.

Usage: python tools/exp_q06_bucketed.py <sf_dir> [reps] [buckets]

Writes lineitem + orders from <sf_dir> as bucketed tables (bucketBy
orderkey, sortBy orderkey) into a throwaway warehouse, then times the
q06 join shape on the plain-parquet layout vs the bucketed layout,
alternating reps in ONE session (host-noise discipline). Asserts both
variants return identical sorted rows and prints the two physical
plans' Exchange counts.

This is an EXPERIMENT, not a query change: the bench always computes
from the plain parquet inputs (no precomputed layout ships in any
query path). The result is recorded in OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.operators.scale import write_bucketed
from distcpplus_spark.queries import load_all_queries, small_sort
from distcpplus_spark.session import get_spark


def q06_shape(
    li: DataFrame, orders: DataFrame, cust: DataFrame, asia_supp: DataFrame
) -> DataFrame:
    """The q06 join shape on caller-supplied fact inputs."""
    from distcpplus_spark.queries.relational import money_sum_2dec

    return (
        li.join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            money_sum_2dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .transform(small_sort, F.desc("revenue"), "n_name")
    )


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("exp_q06_bucketed")

    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = load_table(spark, sf_dir, "customer")

    tmp = tempfile.mkdtemp(prefix="q06_bkt_")
    print(f"writing bucketed tables ({n_buckets} buckets) under {tmp} ...")
    t0 = time.perf_counter()
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        ),
        "exp_li_bkt",
        "l_orderkey",
        n_buckets,
        path=os.path.join(tmp, "li"),
        sort_key="l_orderkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        "exp_orders_bkt",
        "o_orderkey",
        n_buckets,
        path=os.path.join(tmp, "orders"),
        sort_key="o_orderkey",
    )
    print(f"bucketed write: {time.perf_counter() - t0:.1f}s")

    queries, _ = load_all_queries()

    def parquet_variant() -> DataFrame:
        return queries["q06_join_multiway_q5"](spark, sf_dir)

    def bucketed_variant() -> DataFrame:
        return q06_shape(
            spark.table("exp_li_bkt"), spark.table("exp_orders_bkt"), cust, asia_supp
        )

    variants = {"parquet": parquet_variant, "bucketed": bucketed_variant}
    rows: dict[str, list] = {}
    for name, fn in variants.items():
        df = fn()
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(
            f"[{name}] Exchange={plan.count('Exchange')} "
            f"SortMergeJoin={plan.count('SortMergeJoin')} "
            f"ShuffledHashJoin={plan.count('ShuffledHashJoin')} "
            f"BroadcastHashJoin={plan.count('BroadcastHashJoin')}"
        )
        rows[name] = sorted(map(tuple, fn().collect()))  # warm + row check

    base = rows["parquet"]
    for name, r in rows.items():
        assert r == base, f"variant {name} returned different rows!"
    print(f"row cross-check OK ({len(base)} rows)")

    times: dict[str, list[float]] = {n: [] for n in variants}
    for rep in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"exp_q06:{name}:{rep}")
            t0 = time.perf_counter()
            fn().collect()
            times[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    for name, ts in times.items():
        print(
            f"{name:9s} median {statistics.median(ts):.3f}s "
            f"({', '.join(f'{t:.3f}' for t in ts)})"
        )


if __name__ == "__main__":
    main()
