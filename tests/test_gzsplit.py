"""Splittable gzip (sources/gzsplit.py): reshard validity, line
alignment, index correctness, distributed read parity."""

from __future__ import annotations

import gzip
import os
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distcpplus_spark.sources.gzsplit import (
    _gzip_member_spans,
    _reshard_one,
    index_gzip_members,
    read_gz_indexed_lines,
    reshard_gzip,
)


def _write_gz(path, payload: bytes):
    with gzip.open(path, "wb") as fh:
        fh.write(payload)


def _mk_lines(n, width=80):
    return b"".join(
        (f"line-{i:05d}-" + "x" * ((i * 37) % width) + "\n").encode()
        for i in range(n)
    )


def test_reshard_output_is_valid_gzip_and_byte_identical(tmp_path):
    payload = _mk_lines(500)
    src = str(tmp_path / "a.gz")
    dst = str(tmp_path / "a.sharded.gz")
    _write_gz(src, payload)
    rows = _reshard_one(src, dst, span_bytes=2048, level=6)
    # multi-member output is still one valid gzip stream
    assert gzip.open(dst, "rb").read() == payload
    assert len(rows) > 1
    # rows: (member_idx, offset, length, n_lines, raw_bytes)
    assert sum(r[3] for r in rows) == 500
    assert sum(r[4] for r in rows) == len(payload)


def test_reshard_members_are_line_aligned_and_indexed(tmp_path):
    payload = _mk_lines(300)
    src = str(tmp_path / "a.gz")
    dst = str(tmp_path / "a.sharded.gz")
    _write_gz(src, payload)
    rows = _reshard_one(src, dst, span_bytes=1024, level=6)
    data = open(dst, "rb").read()
    # index rows: (member_idx, offset, length, n_lines, raw_bytes)
    with open(dst, "rb") as fh:
        spans = list(_gzip_member_spans(fh))
    assert [(r[1], r[2]) for r in rows] == spans
    total_lines = 0
    for (_, off, ln, n_lines, raw_bytes) in rows:
        raw = gzip.decompress(data[off: off + ln])
        assert len(raw) == raw_bytes
        # every member decodes to WHOLE lines
        assert raw.endswith(b"\n")
        assert raw.count(b"\n") == n_lines
        total_lines += n_lines
    assert total_lines == 300


def test_reshard_keeps_final_line_without_newline(tmp_path):
    payload = b"first\nsecond\nno-trailing-newline"
    src = str(tmp_path / "a.gz")
    dst = str(tmp_path / "a.sharded.gz")
    _write_gz(src, payload)
    rows = _reshard_one(src, dst, span_bytes=8, level=6)
    assert gzip.open(dst, "rb").read() == payload
    assert sum(r[3] for r in rows) == 3


def test_reshard_empty_file(tmp_path):
    src = str(tmp_path / "a.gz")
    dst = str(tmp_path / "a.sharded.gz")
    _write_gz(src, b"")
    rows = _reshard_one(src, dst, span_bytes=1024, level=6)
    assert rows == []
    assert gzip.open(dst, "rb").read() == b""


def test_reshard_accepts_multi_member_input(tmp_path):
    # bgzip-style input: already concatenated members
    src = str(tmp_path / "a.gz")
    dst = str(tmp_path / "a.sharded.gz")
    with open(src, "wb") as fh:
        fh.write(gzip.compress(b"alpha\nbeta\n"))
        fh.write(gzip.compress(b"gamma\n"))
    rows = _reshard_one(src, dst, span_bytes=6, level=6)
    assert gzip.open(dst, "rb").read() == b"alpha\nbeta\ngamma\n"
    assert sum(r[3] for r in rows) == 3


def test_distributed_read_matches_and_line_idx_global(spark, tmp_path):
    payload = _mk_lines(400)
    src = str(tmp_path / "a.gz")
    dst = str(tmp_path / "a.sharded.gz")
    _write_gz(src, payload)
    index = reshard_gzip(spark, [(src, dst)], span_bytes=1500)
    index = index.localCheckpoint(eager=True)
    assert index.count() > 3
    expected = payload.decode().splitlines()
    for split_bytes in (1, 10_000, 1 << 30):  # member-per-task .. one task
        got = (
            read_gz_indexed_lines(spark, index, split_bytes=split_bytes)
            .orderBy("line_idx")
            .collect()
        )
        assert [r["line"] for r in got] == expected
        assert [r["line_idx"] for r in got] == list(range(len(expected)))


def test_index_rebuild_matches_reshard_sidecar(spark, tmp_path):
    payload = _mk_lines(200)
    src = str(tmp_path / "b.gz")
    dst = str(tmp_path / "b.sharded.gz")
    _write_gz(src, payload)
    sidecar = {
        (r["member_idx"], r["offset"], r["length"], r["n_lines"],
         r["raw_bytes"])
        for r in reshard_gzip(spark, [(src, dst)], span_bytes=1024).collect()
    }
    rebuilt = {
        (r["member_idx"], r["offset"], r["length"], r["n_lines"],
         r["raw_bytes"])
        for r in index_gzip_members(
            spark, str(tmp_path), glob="b.sharded.gz"
        ).collect()
    }
    assert sidecar == rebuilt


@settings(max_examples=25, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                  max_size=60),
    span=st.integers(min_value=1, max_value=500),
    trailing_nl=st.booleans(),
)
def test_reshard_roundtrip_property(tmp_path_factory, lens, span, trailing_nl):
    tmp = tmp_path_factory.mktemp("gz")
    payload = b"".join(
        (("y" * n) + "\n").encode() for n in lens
    )
    if not trailing_nl and payload:
        payload = payload[:-1]
    src = str(tmp / "p.gz")
    dst = str(tmp / "p.sharded.gz")
    _write_gz(src, payload)
    rows = _reshard_one(src, dst, span_bytes=span, level=1)
    assert gzip.open(dst, "rb").read() == payload
    n_expected = len(payload.splitlines())
    assert sum(r[3] for r in rows) == n_expected
    assert sum(r[4] for r in rows) == len(payload)
