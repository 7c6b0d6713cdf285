"""UDF surface: pandas UDF vs JVM expression equivalence, grouped-map
UDAF, and row-UDF SQL registration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distcpplus_spark.functions.udfs import (
    cosine_pandas,
    ols_per_group,
    register_row_udf,
)
from distcpplus_spark.functions.vectors import cosine_similarity, to_double_array


def test_pandas_cosine_matches_jvm_expression(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0], [1.0, float(i), 3.0]) for i in range(1, 50)],
        "id int, a array<double>, b array<double>",
    )
    rows = df.select(
        cosine_pandas("a", "b").alias("py"),
        cosine_similarity(to_double_array("a"), to_double_array("b")).alias("jvm"),
    ).collect()
    for r in rows:
        assert math.isclose(r["py"], r["jvm"], rel_tol=1e-12)


def test_ols_recovers_known_line(spark):
    # y = 3x + 7 exactly → slope/intercept recovered to fp precision.
    df = spark.createDataFrame(
        [("g1", float(x), 3.0 * x + 7.0) for x in range(10)]
        + [("g2", float(x), -2.0 * x + 1.0) for x in range(10)],
        "k string, x double, y double",
    )
    out = {r["grp"]: r for r in ols_per_group(df, "k", "x", "y").collect()}
    assert math.isclose(out["g1"]["slope"], 3.0, abs_tol=1e-9)
    assert math.isclose(out["g1"]["intercept"], 7.0, abs_tol=1e-9)
    assert math.isclose(out["g2"]["slope"], -2.0, abs_tol=1e-9)
    assert out["g1"]["n"] == 10


def test_ols_degenerate_group_yields_null(spark):
    df = spark.createDataFrame(
        [("solo", 1.0, 5.0), ("flat", 2.0, 1.0), ("flat", 2.0, 9.0)],
        "k string, x double, y double",
    )
    out = {r["grp"]: r for r in ols_per_group(df, "k", "x", "y").collect()}
    assert out["solo"]["slope"] is None  # n < 2
    assert out["flat"]["slope"] is None  # zero x-variance


def test_row_udf_registered_for_sql(spark):
    register_row_udf(spark, "rev_str", lambda s: s[::-1] if s else s)
    df = spark.createDataFrame([("abc",), ("xy",)], "s string")
    df.createOrReplaceTempView("t_rowudf")
    got = {r[0] for r in spark.sql("SELECT rev_str(s) FROM t_rowudf").collect()}
    assert got == {"cba", "yx"}


def test_redact_pii_closed_form(spark):
    """Every PII class is replaced; clean text is untouched; the
    email pass wins over the IP pass on the domain."""
    from distcpplus_spark.functions.text import redact_pii
    from pyspark.sql import functions as F

    rows = [
        (1, "mail me at jo.doe+x@sub.example.org please"),
        (2, "call +1 555 12345 now"),
        (3, "server at 192.168.1.254 is down"),
        (4, "nothing sensitive here"),
        (5, "a@b.io and 10.0.0.1 and +44 207 946"),
    ]
    df = spark.createDataFrame(rows, "id BIGINT, t STRING")
    got = {
        r["id"]: r["r"]
        for r in df.select("id", redact_pii(F.col("t")).alias("r")).collect()
    }
    assert got[1] == "mail me at <EMAIL> please"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "server at <IP> is down"
    assert got[4] == "nothing sensitive here"
    assert got[5] == "<EMAIL> and <IP> and <PHONE>"
