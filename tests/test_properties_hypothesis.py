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
