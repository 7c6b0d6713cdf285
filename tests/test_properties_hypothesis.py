"""Hypothesis property tests for pure-Python engine pieces (no Spark
session needed — these run in milliseconds)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from distcpplus_spark.cli import parse_args, parse_size


@given(st.integers(min_value=0, max_value=1 << 40))
def test_parse_size_plain(n):
    assert parse_size(str(n)) == n


@given(
    st.integers(min_value=0, max_value=1 << 20),
    st.sampled_from(["k", "K", "m", "M", "g", "G", "t", "T"]),
)
def test_parse_size_suffixes(n, suf):
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    assert parse_size(f"{n}{suf}") == n * mult[suf.lower()]


@settings(max_examples=50)
@given(
    st.lists(
        st.sampled_from(
            ["-update", "-overwrite", "-delete", "-i", "-skiptscheck", "-pugp"]
        ),
        unique=True,
    )
)
def test_parse_args_flag_algebra(flags):
    """Any flag subset either parses into consistent options or raises
    the reference's conflict rules — never crashes elsewhere."""
    argv = flags + ["/src", "/dst"]
    try:
        _, _, opts, _ = parse_args(argv)
    except ValueError:
        # must be one of the declared conflicts
        s = set(flags)
        assert (
            ({"-update", "-overwrite"} <= s)
            or ("-delete" in s and not ({"-update", "-overwrite"} & s))
            or ("-skiptscheck" in s and "-update" not in s)
        )
        return
    assert not (opts.update and opts.overwrite)
    if opts.delete:
        assert opts.update or opts.overwrite


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.integers(min_value=-1000, max_value=1000), st.none()),
        min_size=1,
        max_size=60,
    ),
    width=st.integers(min_value=1, max_value=20),
)
def test_partitioned_running_aggs_property(spark, vals, width):
    """Property: for ANY value list (including NULLs) and ANY bucket
    width, the two-phase multi-spec prefix sum/max equals the global
    ordered window."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from distcpplus_spark.operators.scale import partitioned_running_aggs

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id BIGINT, v BIGINT")
    w = W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
    expect = {
        r["id"]: (r["s"], r["m"])
        for r in df.withColumn("s", F.sum("v").over(w))
        .withColumn("m", F.max("v").over(w))
        .collect()
    }
    got = {
        r["id"]: (r["s"], r["m"])
        for r in partitioned_running_aggs(
            df,
            ["id"],
            [("v", "s", "sum"), ("v", "m", "max")],
            bucket=F.floor(F.col("id") / width),
        ).collect()
    }
    assert got == expect
