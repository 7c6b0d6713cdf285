"""As-of join semantics: at-or-before matching, tolerance, no-match."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_asof_matches_cogrouped_pandas_merge_asof(spark):
    """Cross-validation by a different algorithm AND a different API:
    the union-tag as-of join must agree with pandas merge_asof run
    per-key through cogroup().applyInPandas — the Arrow-batched
    cogroup surface (each key's left and right rows land in one
    pandas call). Also the coverage test for cogroup itself."""
    import pandas as pd

    from distcpplus_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )

    def per_key(left_pdf: pd.DataFrame, right_pdf: pd.DataFrame) -> pd.DataFrame:
        left_pdf = left_pdf.sort_values("ts")
        right_pdf = right_pdf.sort_values("ts")
        if right_pdf.empty:
            left_pdf["view_event_id"] = pd.Series(dtype="float64")
            left_pdf["view_ts"] = pd.Series(dtype=left_pdf["ts"].dtype)
            return left_pdf
        merged = pd.merge_asof(
            left_pdf,
            right_pdf.drop(columns=["user_id"]).rename(
                columns={"ts": "view_ts"}
            ),
            left_on="ts",
            right_on="view_ts",
            direction="backward",
        )
        return merged[["user_id", "ts", "event_id", "view_event_id", "view_ts"]]

    expected = (
        purchases.groupby("user_id")
        .cogroup(views.groupby("user_id"))
        .applyInPandas(
            per_key,
            "user_id BIGINT, ts TIMESTAMP, event_id BIGINT, "
            "view_event_id DOUBLE, view_ts TIMESTAMP",
        )
    )
    got = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts"
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.col("view_event_id_asof").alias("view_event_id"),
        F.col("ts_asof").alias("view_ts"),
    )
    e = {
        (r["event_id"]): (
            None if r["view_event_id"] is None else int(r["view_event_id"]),
            r["view_ts"],
        )
        for r in expected.collect()
    }
    g = {
        (r["event_id"]): (
            None if r["view_event_id"] is None else int(r["view_event_id"]),
            r["view_ts"],
        )
        for r in got.collect()
    }
    assert e == g


def test_asof_forward_direction(spark):
    """Forward as-of: earliest right row at-or-after each left ts;
    equal timestamps match; tolerance voids far-future matches."""
    left = _mk(spark, [
        (1, 100, 10.0), (1, 200, 20.0), (2, 150, 15.0), (2, 400, 40.0),
    ], "k INT, ts LONG, lv DOUBLE")
    right = _mk(spark, [
        (1, 100, "a"), (1, 150, "b"), (2, 160, "c"),
    ], "k INT, ts LONG, rv STRING")
    out = {
        (r["k"], r["ts"]): (r["rv_asof"], r["ts_asof"])
        for r in asof_join(
            left, right, on="k", direction="forward"
        ).collect()
    }
    assert out[(1, 100)] == ("a", 100)   # equal ts matches
    assert out[(1, 200)] == (None, None) # nothing after
    assert out[(2, 150)] == ("c", 160)   # next future row
    assert out[(2, 400)] == (None, None)

    cut = {
        (r["k"], r["ts"]): r["rv_asof"]
        for r in asof_join(
            left, right, on="k", direction="forward", tolerance_seconds=5
        ).collect()
    }
    assert cut[(2, 150)] is None  # 10s away > 5s tolerance
    assert cut[(1, 100)] == "a"


def test_asof_forward_matches_pandas(spark):
    """Forward direction agrees with pandas merge_asof
    direction='forward' on the events fixture."""
    import pandas as pd

    from distcpplus_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    got = {
        r["event_id"]: (
            None if r["view_event_id_asof"] is None
            else int(r["view_event_id_asof"])
        )
        for r in asof_join(
            purchases, views, on="user_id", direction="forward"
        ).collect()
    }
    lp = purchases.toPandas().sort_values("ts")
    rp = views.toPandas().sort_values("ts")
    exp_df = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="forward"
    )
    exp = {
        int(r.event_id): (None if pd.isna(r.view_event_id)
                          else int(r.view_event_id))
        for r in exp_df.itertuples()
    }
    assert got == exp


def test_asof_direction_duality(spark):
    """Time-reversal duality: forward(l, r) at ts must equal
    backward(l, r) with all timestamps negated — a structural
    property that catches tag/frame asymmetries in either direction
    on data with equal-ts collisions and unmatched keys."""
    import random

    rng = random.Random(7)
    lrows = [
        (rng.randrange(4), rng.randrange(0, 50), float(i))
        for i in range(80)
    ]
    rrows = [
        (rng.randrange(5), rng.randrange(0, 50), f"p{i}") for i in range(60)
    ]
    # dedupe right (k, ts) so the carried payload is well-defined
    seen = {}
    for k, ts, v in rrows:
        seen[(k, ts)] = v
    rrows = [(k, ts, v) for (k, ts), v in seen.items()]

    left = _mk(spark, lrows, "k INT, ts LONG, lv DOUBLE")
    right = _mk(spark, rrows, "k INT, ts LONG, rv STRING")
    neg = lambda df: df.withColumn("ts", -F.col("ts"))  # noqa: E731

    fwd = {
        (r["k"], r["ts"], r["lv"]): r["rv_asof"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    bwd_mirror = {
        (r["k"], -r["ts"], r["lv"]): r["rv_asof"]
        for r in asof_join(
            neg(left), neg(right), on="k", direction="backward"
        ).collect()
    }
    assert fwd == bwd_mirror


def test_interval_overlap_join_matches_naive_and_boundaries(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from distcpplus_spark.operators.asof import interval_overlap_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [
            (1, ts(0), ts(60)),
            (2, ts(60), ts(120)),    # touches 1 end-to-start: no overlap
            (3, ts(59), ts(61)),     # crosses the 60-min bucket boundary
            (4, ts(300), ts(301)),
            (5, ts(0), ts(600)),     # long interval spanning many buckets
        ],
        "lid int, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts(30), ts(90)),
            (11, ts(120), ts(180)),  # touches 2 end-to-start: no overlap
            (12, ts(0), ts(1)),
            (13, ts(240), ts(360)),
        ],
        "rid int, ws timestamp, we timestamp",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "s", "e", "ws", "we", bucket_seconds=3600
        ).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(
            right, (left.s < right.we) & (right.ws < left.e)
        ).collect()
    }
    assert got == naive
    assert (2, 10) in got           # genuine overlap via shared bucket
    assert (1, 11) not in got       # half-open: touching != overlap
    assert (5, 13) in got           # long interval found across buckets


def test_gapfill_interpolate_exact_values(spark):
    from datetime import datetime

    from distcpplus_spark.operators.asof import gapfill_interpolate

    rows = [
        (1, datetime(2024, 1, 1, 0), 10.0),
        (1, datetime(2024, 1, 1, 4), 18.0),   # 4h gap: 12, 14, 16
        (1, datetime(2024, 1, 1, 5), 5.0),
        (2, datetime(2024, 1, 1, 0), 1.0),    # single point: grid of 1
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = {
        (r["k"], r["ts"].hour): (r["value"], r["src"])
        for r in gapfill_interpolate(df, "k", "ts", "v", "1 hour").collect()
    }
    assert out[(1, 0)] == (10.0, "observed")
    assert out[(1, 1)] == (12.0, "interpolated")
    assert out[(1, 2)] == (14.0, "interpolated")
    assert out[(1, 3)] == (16.0, "interpolated")
    assert out[(1, 4)] == (18.0, "observed")
    assert out[(1, 5)] == (5.0, "observed")
    assert out[(2, 0)] == (1.0, "observed")
    assert len(out) == 7


def test_gapfill_null_values_fill_at_edges(spark):
    # null v rows widen the grid without providing a value, so the
    # edge rows exercise ffill/bfill (impossible when bounds come
    # from non-null observations only)
    from datetime import datetime

    from distcpplus_spark.operators.asof import gapfill_interpolate

    rows = [
        (1, datetime(2024, 1, 1, 0), None),
        (1, datetime(2024, 1, 1, 1), 7.0),
        (1, datetime(2024, 1, 1, 2), 9.0),
        (1, datetime(2024, 1, 1, 4), None),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    out = {
        r["ts"].hour: (r["value"], r["src"])
        for r in gapfill_interpolate(df, "k", "ts", "v", "1 hour").collect()
    }
    assert out[0] == (7.0, "bfill")
    assert out[1] == (7.0, "observed")
    assert out[2] == (9.0, "observed")
    assert out[3] == (9.0, "ffill")
    assert out[4] == (9.0, "ffill")


def test_gapfill_exact_mode_non_utc_session(spark):
    """Exact-mode step_us must be timezone-free (ADVICE r9): a bare
    unix_micros(epoch + interval) folds the session timezone's epoch
    offset into the step length, corrupting k/n_steps everywhere
    except UTC. Run the exact-mode interpolation under a non-UTC
    session timezone and require the same values as the UTC fixture."""
    from datetime import datetime

    from distcpplus_spark.operators.asof import gapfill_interpolate

    tz_before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        rows = [
            (1, datetime(2024, 1, 1, 0), 1000, 100),
            (1, datetime(2024, 1, 1, 4), 1800, 100),  # gap: 12,14,16
        ]
        df = spark.createDataFrame(
            rows, "k int, ts timestamp, vn long, vd long"
        ).withColumn("v", F.col("vn") / F.col("vd").cast("double"))
        got = [
            (r["value"], r["src"])
            for r in gapfill_interpolate(
                df, "k", "ts", "v", "1 hour", num_col="vn", den_col="vd"
            ).orderBy("ts").collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)
    assert got == [
        (10.0, "observed"),
        (12.0, "interpolated"),
        (14.0, "interpolated"),
        (16.0, "interpolated"),
        (18.0, "observed"),
    ]
