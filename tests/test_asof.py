"""As-of join semantics: at-or-before matching, tolerance, no-match."""

from __future__ import annotations

from distcpplus_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_at_or_before(spark):
    left = _mk(spark, [
        (1, 100, 10.0), (1, 200, 20.0), (2, 150, 15.0),
    ], "k INT, ts LONG, lv DOUBLE")
    right = _mk(spark, [
        (1, 100, "a"), (1, 150, "b"), (2, 151, "c"),
    ], "k INT, ts LONG, rv STRING")
    out = {
        (r["k"], r["ts"]): (r["rv_asof"], r["ts_asof"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out[(1, 100)] == ("a", 100)   # equal ts matches (>=)
    assert out[(1, 200)] == ("b", 150)   # latest prior
    assert out[(2, 150)] == (None, None) # right row is AFTER -> no match


def test_asof_tolerance_voids_stale_matches(spark):
    left = _mk(spark, [(1, 1000, 1.0)], "k INT, ts LONG, lv DOUBLE")
    right = _mk(spark, [(1, 10, "old")], "k INT, ts LONG, rv STRING")
    fresh = asof_join(left, right, on="k").collect()[0]
    assert fresh["rv_asof"] == "old"
    cut = asof_join(
        left, right, on="k", tolerance_seconds=100
    ).collect()[0]
    assert cut["rv_asof"] is None


def test_asof_single_shuffle_plan(spark):
    """The plan must be union -> one hash exchange on the key ->
    window; never a range/nested-loop join."""
    left = spark.range(100).selectExpr("id % 5 AS k", "id AS ts", "id AS lv")
    right = spark.range(50).selectExpr("id % 5 AS k", "id * 2 AS ts", "id AS rv")
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(k") == 1


def test_asof_composite_key(spark):
    left = _mk(spark, [
        ("a", 1, 100), ("a", 2, 100), ("b", 1, 100),
    ], "k1 STRING, k2 INT, ts LONG")
    right = _mk(spark, [
        ("a", 1, 90, "a1"), ("a", 2, 95, "a2"), ("b", 2, 80, "b2"),
    ], "k1 STRING, k2 INT, ts LONG, rv STRING")
    out = {
        (r["k1"], r["k2"]): r["rv_asof"]
        for r in asof_join(left, right, on=["k1", "k2"]).collect()
    }
    assert out == {("a", 1): "a1", ("a", 2): "a2", ("b", 1): None}
