"""Round-14 probe harness: time alternative formulations side by side.

Usage: python tools/probe_r14.py <experiment> <sf_dir> [reps]

Experiments are registered in EXPERIMENTS: each returns a dict of
{variant_name: fn(spark, sf_dir) -> DataFrame}. The harness warms each
variant once, then alternates reps timed collect() runs, prints
per-variant medians, and cross-checks that all variants return
identical sorted rows (so a faster variant is proven result-identical
before it ships).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from distcpplus_spark.catalog import load_table
from distcpplus_spark.session import get_spark


# ---------------------------------------------------------------- q79
def q79_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    return queries["q79_training_data_pipeline"](spark, sf_dir)


def q79_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.functions.text import punct_count, stopword_hits
    from distcpplus_spark.queries import small_sort

    docs = load_table(spark, sf_dir, "documents")
    lang_ok = docs.filter(stopword_hits(F.col("text")) >= 2)
    punct_ratio = punct_count(F.col("text")) / F.length("text").cast("double")
    quality_ok = lang_ok.filter((F.col("n_chars") >= 100) & (punct_ratio <= 0.10))
    slim = quality_ok.select(
        "source",
        "doc_id",
        "n_chars",
        F.md5(F.col("text").cast("binary")).alias("_h"),
        F.size(F.split("text", " ", -1)).alias("_tok"),
    )
    deduped = slim.groupBy("_h").agg(
        F.min_by(F.struct("source", "n_chars", "_tok"), "doc_id").alias("_w")
    ).select("_w.source", "_w.n_chars", "_w._tok")
    return (
        deduped.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_tok").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .transform(small_sort, "source")
    )


# ------------------------------------------------------ minhash sigs
def _sig_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs, "text", "doc_id", num_hashes=16)


def _sig_noexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.functions.text import char_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("_id"),
        F.explode(F.array_distinct(char_shingles(F.col("text"), 8))).alias(
            "_shingle"
        ),
    )
    n = 16
    aggs = [
        F.min(
            F.xxhash64(F.concat(F.lit(str(i)), F.col("_shingle")))
        ).alias(f"_m{i}")
        for i in range(n)
    ]
    pairs = ", ".join(f"{i}, _m{i}" for i in range(n))
    return (
        sh.groupBy("_id")
        .agg(*aggs)
        .select("_id", F.expr(f"stack({n}, {pairs}) AS (_seed, _minhash)"))
    )


# ------------------------------------------------------------- q05
def q05_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    return queries["q05_join_inner_q3"](spark, sf_dir)


def q05_orders_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import money_sum_2dec
    from distcpplus_spark.queries.relational import _t

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    bo = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(bo, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_sum_2dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
    )


# ------------------------------------------------------------- q11
def q11_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    return queries["q11_range_join"](spark, sf_dir)


def q11_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join -> range-frame window: one exchange of events instead of
    two join sides + an agg exchange. Exact because ts is integral
    microseconds: (e2.ts > e1.ts) & (e2.ts <= e1.ts + 1h)
    == unix_micros(e2.ts) in [unix_micros(e1.ts)+1, +3_600_000_000]."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(1, 3_600_000_000)
    )
    return (
        ev.select("event_id", "user_id", "ts", "event_type")
        .withColumn("n_following", F.count(F.lit(1)).over(w))
        .filter((F.col("event_type") == "signup") & (F.col("n_following") > 0))
        .select(F.col("event_id").alias("base_id"), "n_following")
        .orderBy("base_id")
    )


def q05_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 formulation: lineitem joins raw orders first."""
    from distcpplus_spark.queries import money_sum_2dec
    from distcpplus_spark.queries.relational import _t

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_sum_2dec(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
    )


# ------------------------------------------------------------- q13
def q13_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    return queries["q13_agg_distinct_stats"](spark, sf_dir)


def q13_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 formulation: distinct (flag, key) pair passes."""
    from distcpplus_spark.queries import small_sort
    from distcpplus_spark.queries.relational import _t

    li = _t(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )
    n_orders = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_orders"))
    )
    n_parts = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_parts"))
    )
    return (
        stats.join(n_orders, "l_returnflag")
        .join(n_parts, "l_returnflag")
        .select("l_returnflag", "n_orders", "n_parts", "sd_qty", "var_disc")
        .transform(small_sort, "l_returnflag")
    )


def q13_bitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT key) per flag via bit_or mask per key: the
    distinct-pair shuffle (|distinct (flag,key)| rows) becomes a
    fixed-width groupBy(key) shuffle (|distinct key| rows), and the
    per-flag counts are partial-aggregated sums of mask bits (no extra
    exchange). Flag->bit mapping is collected up front (3 tiny rows)."""
    from distcpplus_spark.queries import small_sort
    from distcpplus_spark.queries.relational import _t

    li = _t(spark, sf_dir, "lineitem")
    flags = sorted(
        r[0] for r in li.select("l_returnflag").distinct().collect()
    )
    bit = {f: 1 << i for i, f in enumerate(flags)}
    mapping = F.lit(None).cast("long")
    for f_, b in bit.items():
        mapping = F.when(F.col("l_returnflag") == f_, b).otherwise(mapping)

    def distinct_counts(key: str, out: str) -> DataFrame:
        masks = (
            li.select(F.col(key).alias("_k"), mapping.alias("_b"))
            .groupBy("_k")
            .agg(F.bit_or("_b").alias("_m"))
        )
        per_flag = [
            F.sum(F.shiftright(F.col("_m"), i).bitwiseAND(1)).alias(f"_c{i}")
            for i in range(len(flags))
        ]
        wide = masks.agg(*per_flag)
        pairs = ", ".join(f"'{f_}', _c{i}" for i, f_ in enumerate(flags))
        return wide.select(
            F.expr(f"stack({len(flags)}, {pairs}) AS (l_returnflag, {out})")
        )

    stats = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )
    return (
        stats.join(distinct_counts("l_orderkey", "n_orders"), "l_returnflag")
        .join(distinct_counts("l_partkey", "n_parts"), "l_returnflag")
        .select("l_returnflag", "n_orders", "n_parts", "sd_qty", "var_disc")
        .transform(small_sort, "l_returnflag")
    )


# ------------------------------------------------------------- q33
def q33_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    return queries["q33_tumbling_window"](spark, sf_dir)


def q33_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    from distcpplus_spark.queries import small_sort
    from distcpplus_spark.queries.relational import _t, money_sum

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    win = F.timestamp_micros(us - F.pmod(us, F.lit(600_000_000)))
    return (
        ev.groupBy(win.alias("win_start"), "event_type")
        .agg(F.count("*").alias("n"), money_sum(F.col("value")).alias("total"))
        .transform(small_sort, "win_start", "event_type")
    )


EXPERIMENTS = {
    "q79": {"current": q79_current, "minby": q79_minby},
    "sig16": {"current": _sig_current, "noexplode": _sig_noexplode},
    "q05": {"current": q05_current, "orders_first": q05_orders_first, "old": q05_old},
    "q11": {"current": q11_current, "window": q11_window},
    "q13": {"current": q13_current, "bitor": q13_bitor, "pairs": q13_pairs},
    "q33": {"current": q33_current, "arith": q33_arith},
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
        print(f"IDENTICAL {names[0]} vs {other}: {same} "
              f"({len(rows[names[0]])} vs {len(rows[other])} rows)")
        if not same:
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
        print(f"{exp} {name}: median {med:.3f}s  all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
