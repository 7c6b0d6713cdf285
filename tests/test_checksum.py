"""Mergeable CRC-32 (operators/checksum.py) — verified against
zlib.crc32 ground truth (independent oracle: the stdlib's C
implementation of the same public spec)."""

import os
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from distcpplus_spark.operators.checksum import (
    combine_chunk_crcs,
    crc32_combine,
    distributed_file_crc,
)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=500), st.binary(min_size=0, max_size=500))
def test_combine_matches_zlib(a, b):
    want = zlib.crc32(a + b)
    got = crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b))
    assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.binary(min_size=1, max_size=5000),
    st.lists(st.integers(min_value=1, max_value=4999), max_size=6),
)
def test_multi_chunk_fold(data, cut_points):
    cuts = sorted({c for c in cut_points if c < len(data)})
    bounds = [0] + cuts + [len(data)]
    chunks = [
        (zlib.crc32(data[s:e]), e - s)
        for s, e in zip(bounds, bounds[1:])
    ]
    assert combine_chunk_crcs(chunks) == zlib.crc32(data)


def test_combine_is_associative():
    data = os.urandom(10000)
    chunks = [
        (zlib.crc32(data[i : i + 1000]), 1000) for i in range(0, 10000, 1000)
    ]
    seq = combine_chunk_crcs(chunks)
    # tree grouping: combine halves first
    left = combine_chunk_crcs(chunks[:5])
    right = combine_chunk_crcs(chunks[5:])
    assert crc32_combine(left, right, 5000) == seq == zlib.crc32(data)


def test_distributed_file_crc(spark, tmp_path):
    data = os.urandom(1 << 20)
    p = str(tmp_path / "blob.bin")
    with open(p, "wb") as f:
        f.write(data)
    got = distributed_file_crc(spark, p, chunk_bytes=100_000)
    assert got == zlib.crc32(data)
