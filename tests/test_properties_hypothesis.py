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


# ---------------------------------------------------------------------------
# TFRecord wire format (round-7 continuation)
# ---------------------------------------------------------------------------

_feature_values = st.one_of(
    st.binary(min_size=0, max_size=64),
    st.lists(
        st.integers(min_value=-(1 << 62), max_value=1 << 62),
        min_size=1,
        max_size=8,
    ),
)


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1,
            max_size=8,
        ),
        _feature_values,
        min_size=1,
        max_size=5,
    )
)
def test_tfrecord_example_roundtrip(features):
    from distcpplus_spark.sources.tfrecord import (
        decode_example,
        encode_example,
    )

    got = decode_example(encode_example(features))
    for k, v in features.items():
        if isinstance(v, bytes):
            assert got[k] == v
        else:
            assert got[k] == list(v)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), max_size=10))
def test_tfrecord_framing_roundtrip(payloads):
    import os
    import tempfile

    from distcpplus_spark.sources.tfrecord import frame_record, iter_records

    fd, p = tempfile.mkstemp(suffix=".tfrecord")
    try:
        with os.fdopen(fd, "wb") as fh:
            for b in payloads:
                fh.write(frame_record(b))
        assert [bytes(r) for r in iter_records(p)] == payloads
    finally:
        os.unlink(p)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300), st.integers(min_value=0, max_value=299))
def test_crc32c_incremental_equals_oneshot(data, split):
    from distcpplus_spark.sources.tfrecord import crc32c

    split = min(split, len(data))
    assert crc32c(data) == crc32c(data[split:], crc32c(data[:split]))


# ---------------------------------------------------------------------------
# FastSS deletion-neighborhood completeness (edit distance <= 1)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abc", max_size=6), st.text(alphabet="abc", max_size=6)
)
def test_deletion_variant_rule_matches_edit_distance(s, t):
    """ed(s,t) <= 1  iff  D(s) ∩ D(t) != ∅ with D = {x} ∪ 1-deletions
    — the exact claim the FastSS join's candidate stage relies on
    (false positives allowed — the join re-verifies — but false
    NEGATIVES would silently lose pairs, so completeness is the
    property that matters)."""

    def dels(x):
        return {x} | {x[:i] + x[i + 1:] for i in range(len(x))}

    def ed(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    share = bool(dels(s) & dels(t))
    if ed(s, t) <= 1:
        assert share  # completeness: candidates never miss a true pair
