"""Guard: oracle output types must canonicalize identically through
every DuckDB fetch path.

The round-7 root cause of the only driver-gate red cell: DuckDB
`sum(int)` returns HUGEINT, which `fetchall()` converts to Python int
but `fetchdf()` (a pandas-path harness) converts to float64 — so
"52989" vs "52989.000000" hash-diverged ONLY in the driver
environment. Every oracle is DESCRIBE'd here and banned from emitting
the types whose Python conversion is fetch-path-dependent; the fix at
authoring time is a CAST in the SQL (AS BIGINT / AS DOUBLE)."""

import duckdb
import pytest

from distcpplus_spark.catalog import TABLES
from distcpplus_spark.queries import load_all_queries

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "INTERVAL", "UBIGINT")


def test_no_fetch_path_dependent_oracle_types():
    _, oracles = load_all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    offenders = []
    for name in sorted(oracles):
        sql = oracles[name].rstrip().rstrip(";")
        try:
            rows = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # DESCRIBE quirk — surface, don't skip
            offenders.append((name, f"describe-failed: {type(e).__name__}"))
            continue
        for col, typ, *_ in rows:
            if any(b in typ.upper() for b in BANNED):
                offenders.append((name, f"{col}: {typ}"))
    assert not offenders, (
        "oracles emitting fetch-path-dependent types (CAST them): "
        f"{offenders}"
    )


def test_verify_slice_partitions_cover_registry():
    """tools/verify_oracle.py --slice i/n: the n round-robin slices
    must partition the sorted query list exactly (every name in
    exactly one slice) — the sf3 sweep caveat: slices computed
    against DIFFERENT registry versions shift indices, so a sweep
    that spans registry growth must re-check coverage at the end."""
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    names = sorted(queries)
    for n in (2, 3, 5):
        slices = [
            {x for i, x in enumerate(names) if i % n == k}
            for k in range(n)
        ]
        union = set().union(*slices)
        assert union == set(names)
        assert sum(len(s) for s in slices) == len(names)  # disjoint


def test_money_sum_2dec_half_up_tie_matches_sql_mirror(spark):
    """The exact .xx50 tie (possible because the e4 units are exact
    integers) must round HALF-UP identically in the Spark helper and
    its documented SQL mirror — the float round(sum/1e4, 2) it
    replaces genuinely diverges there (Spark HALF_UP vs DuckDB
    rint)."""
    import duckdb

    from distcpplus_spark.queries import money_sum, money_sum_2dec
    from pyspark.sql import functions as F

    # values sum to 3.0050 exactly in 1e-4 units -> 3.01 half-up
    rows = [(1.0025,), (2.0025,)]
    df = spark.createDataFrame(rows, "v double")
    got = df.agg(money_sum_2dec(F.col("v")).alias("s")).collect()[0]["s"]
    assert got == 3.01
    mirror = duckdb.sql(
        "SELECT ((sum(CAST(round(v * 10000) AS BIGINT)) + 50) // 100)"
        " / 100.0 AS s FROM (VALUES (1.0025), (2.0025)) t(v)"
    ).fetchone()[0]
    assert float(mirror) == 3.01
    # plain cents path: exact single division
    got2 = df.agg(money_sum(F.col("v") * 2).alias("s")).collect()[0]["s"]
    assert got2 == duckdb.sql(
        "SELECT sum(CAST(round(v * 2 * 100) AS BIGINT)) / 100.0"
        " FROM (VALUES (1.0025), (2.0025)) t(v)"
    ).fetchone()[0]
