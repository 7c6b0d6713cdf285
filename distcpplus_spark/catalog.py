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
        # The engine's declared timestamp semantics are UTC session
        # time: the NTZ→TIMESTAMP normalisation below is only
        # value-preserving when the session timezone is UTC, and every
        # oracle comparison assumes it. Pin it here rather than trust
        # the environment default — a non-UTC session would silently
        # shift every timestamp by the zone offset.
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _TABLE_CACHE[key] = _normalize_timestamps(df)
    return _TABLE_CACHE[key]


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-tz TIMESTAMP.

    PySpark 4.x infers parquet timestamps without a timezone annotation
    as TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ.enabled
    defaults true); older engines read the same files as TIMESTAMP.
    The query registry (and rounds of green oracle runs) were built
    against the TIMESTAMP contract, so normalise at the catalog boundary.
    Sessions run with UTC timezone (the container default is also UTC),
    so the cast is value-preserving: naive-UTC wall times in both DuckDB
    and Spark.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType, TimestampType

    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns(
            {c: F.col(c).cast(TimestampType()) for c in ntz}
        )
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet, tolerating both physical layouts of `ts`.

    The fixtures have shipped `ts` two ways across environment versions:
    INT64 TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    unless read as long) and plain timestamp[us] (read natively).
    Inspect the loaded dtype instead of assuming either: only apply the
    ns→µs conversion when `ts` arrives as a LongType. Floor division
    matches DuckDB's ns→µs truncation so oracles agree. NTZ→TIMESTAMP
    normalisation happens in load_table for all tables.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    path = os.path.join(sf_dir, "events.parquet")
    try:
        df = spark.read.parquet(path)
    except Exception:
        # Likely TIMESTAMP(NANOS): retry with the legacy nanos-as-long read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
