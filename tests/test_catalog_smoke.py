"""Catalog smoke test — catches fixture/engine drift in seconds.

Round-4 lesson: a regenerated events.parquet changed ts from
INT64 TIMESTAMP(NANOS) to timestamp[us] and the hard-coded loader broke
33 queries; the drift only surfaced 10 minutes into the suite as eight
scattered failures. This test loads EVERY catalog table at both small
scale factors and asserts the exact column name → Spark dtype contract
the query registry relies on, so the next environment bump fails here
first with a readable diff.

Reference spirit: exec-time re-validation over plan-time assumptions
(reference DefaultCopyFilesMapper.java:129-136 re-checks FS state at
execution rather than trusting the plan).
"""

from __future__ import annotations

import os

import pytest

from distcpplus_spark.catalog import TABLES, load_all, load_table

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
           if os.path.isdir(d)]

# Expected logical schema per FIXTURES.md, post-catalog normalisation
# (events.ts is always a µs TIMESTAMP after _load_events, regardless of
# the fixture's physical layout).
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderdate": "timestamp", "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double",
        "l_tax": "double", "l_returnflag": "string",
        "l_linestatus": "string", "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_every_table_loads_with_expected_schema(spark, sf_dir):
    tables = load_all(spark, sf_dir)
    assert set(tables) == set(TABLES)
    problems = []
    for name, df in tables.items():
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        want = EXPECTED[name]
        if got != want:
            problems.append(f"{name}: got {got}, want {want}")
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_every_table_is_nonempty_and_events_ts_is_valid(spark, sf_dir):
    from pyspark.sql import functions as F

    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        assert df.limit(1).count() == 1, f"{name} is empty at {sf_dir}"
    ev = load_table(spark, sf_dir, "events")
    # ts must materialise as non-null concrete timestamps (not epoch junk):
    # the fixture generator writes 2024-era event times.
    row = ev.agg(
        F.count(F.when(F.col("ts").isNull(), 1)).alias("nulls"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    ).collect()[0]
    assert row["nulls"] == 0
    assert row["lo"].year >= 2000, f"events.ts decoded wrong: min={row['lo']}"
    assert row["hi"].year <= 2100, f"events.ts decoded wrong: max={row['hi']}"


def test_load_events_nanos_fallback(spark, tmp_path):
    """Rounds 1-3 fixtures shipped events.ts as INT64 TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects; the catalog must fall back
    to nanos-as-long and convert (floor ns→µs, matching DuckDB). The
    current fixtures no longer exercise that branch, so synthesize one."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from distcpplus_spark.catalog import load_table

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    ns = [
        int(base.timestamp()) * 1_000_000_000 + 123_456_789,
        int(base.timestamp()) * 1_000_000_000 + 999_999_999,
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ns, pa.timestamp("ns")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"),
                   store_schema=False, use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None)
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    # floor to µs: ...123456789 ns -> ...123456 µs, ...999999999 -> ...999999
    assert got[0].microsecond == 123456
    assert got[1].microsecond == 999999
