"""Table registry over the fixture parquet directories.

Tables are lazy DataFrames — Catalyst prunes columns and pushes filters
down to the parquet scans, so registering everything costs nothing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session id, sf_dir, table) → DataFrame. DataFrames are lazy plan
# handles; memoizing skips the per-query parquet footer/schema read.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (id(spark), sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _TABLE_CACHE[key] = df
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet INT64 TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects. Read nanos as long and convert to a
    microsecond timestamp (ns div 1000 — floor, matching DuckDB's
    ns→µs truncation so oracle results agree)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
