"""Source/sink format round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    roundtrip_schema,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
)

SF = "/root/testdata/sf0.001"


def canon(df, key):
    return sorted(tuple(r) for r in df.orderBy(key).collect())


def test_csv_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, roundtrip_schema(nation))
    assert canon(back, "n_nationkey") == canon(nation, "n_nationkey")


def test_jsonl_roundtrip(spark, tmp_path):
    cust = load_table(spark, SF, "customer")
    path = str(tmp_path / "cust_json")
    write_jsonl(cust, path)
    back = read_jsonl(spark, path, roundtrip_schema(cust))
    assert canon(back, "c_custkey") == canon(cust, "c_custkey")


def test_orc_roundtrip(spark, tmp_path):
    supp = load_table(spark, SF, "supplier")
    path = str(tmp_path / "supp_orc")
    write_orc(supp, path)
    back = read_orc(spark, path)
    assert canon(back, "s_suppkey") == canon(supp, "s_suppkey")


def test_parquet_partitioned_write(spark, tmp_path):
    orders = load_table(spark, SF, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["status"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: scanning one partition reads a subset
    one = back.filter(F.col("status") == "F")
    assert 0 < one.count() < orders.count()
