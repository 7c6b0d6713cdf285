"""Splittable bzip2 (sources/bz2split.py): bit-offset block scan,
per-block realigned decode, Hadoop line-boundary convention."""

from __future__ import annotations

import bz2
import hashlib
import io

from distcpplus_spark.sources.bz2split import (
    _decode_block_fh,
    _scan_magics,
    index_bz2_blocks,
    read_bz2_indexed_lines,
)


def _entropy_lines(n, salt=""):
    """Incompressible-ish lines (RLE-proof) so bzip2 actually cuts
    blocks at ~100k uncompressed under compresslevel=1."""
    return [
        f"{i:06d}{salt}\t"
        + "".join(
            hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()
            for j in range(3)
        )
        for i in range(n)
    ]


def _payload(lines, trailing_nl=True):
    s = "\n".join(lines)
    return (s + "\n").encode() if trailing_nl else s.encode()


def test_scan_finds_blocks_and_per_block_decode_roundtrips():
    payload = _payload(_entropy_lines(3000))
    comp = bz2.compress(payload, 1)
    fh = io.BytesIO(comp)
    assert fh.read(3) == b"BZh"
    starts, eos = _scan_magics(fh)
    assert len(starts) >= 3
    assert starts[0] == 32
    bounds = starts + [eos]
    out = b"".join(
        _decode_block_fh(fh, s, bounds[i + 1], 1)
        for i, s in enumerate(starts)
    )
    assert out == payload


def test_scan_small_chunks_match_one_shot():
    """Chunked streaming scan must agree with a single-chunk scan
    (seam-straddling magics)."""
    comp = bz2.compress(_payload(_entropy_lines(2500)), 1)
    fh = io.BytesIO(comp)
    fh.read(3)
    big = _scan_magics(fh)
    fh2 = io.BytesIO(comp)
    fh2.read(3)
    small = _scan_magics(fh2, chunk=997)  # prime, forces many seams
    assert big == small


def test_indexed_distributed_read_exact_lines(spark, tmp_path):
    lines = _entropy_lines(2800)
    path = tmp_path / "corpus.bz2"
    path.write_bytes(bz2.compress(_payload(lines), 1))
    index = index_bz2_blocks(spark, str(tmp_path)).localCheckpoint(
        eager=True
    )
    n_blocks = index.count()
    assert n_blocks >= 3
    for bps in (1, 2, 1000):  # block-per-task .. single task
        got = sorted(
            r["line"]
            for r in read_bz2_indexed_lines(
                spark, index, blocks_per_split=bps
            ).collect()
        )
        assert got == sorted(lines), f"blocks_per_split={bps}"


def test_no_trailing_newline_last_line_kept(spark, tmp_path):
    lines = _entropy_lines(2500, salt="z")
    path = tmp_path / "nt.bz2"
    path.write_bytes(bz2.compress(_payload(lines, trailing_nl=False), 1))
    index = index_bz2_blocks(spark, str(tmp_path), glob="nt.bz2")
    index = index.localCheckpoint(eager=True)
    assert index.count() >= 2
    got = sorted(
        r["line"]
        for r in read_bz2_indexed_lines(
            spark, index, blocks_per_split=1
        ).collect()
    )
    assert got == sorted(lines)


def test_line_spanning_multiple_blocks(spark, tmp_path):
    """One giant line (> 2 blocks of uncompressed size) plus normal
    lines: the forward read must cross several blocks, and the
    mid-line splits must emit nothing for it."""
    giant = "".join(
        hashlib.md5(f"g{j}".encode()).hexdigest() for j in range(9000)
    )  # ~288 KB, ~3 blocks at level 1
    lines = ["head-" + _entropy_lines(1)[0], giant, "tail-line"]
    path = tmp_path / "giant.bz2"
    path.write_bytes(bz2.compress(_payload(lines), 1))
    index = index_bz2_blocks(spark, str(tmp_path), glob="giant.bz2")
    index = index.localCheckpoint(eager=True)
    assert index.count() >= 3
    got = sorted(
        r["line"]
        for r in read_bz2_indexed_lines(
            spark, index, blocks_per_split=1
        ).collect()
    )
    assert got == sorted(lines)


def test_block_crc_recorded_matches_stream(tmp_path):
    """The index's block_crc is the 32 bits after each magic; for a
    single-block stream it must equal the stream's combined CRC (the
    32 bits after the EOS magic — bit-aligned, NOT the last 4 bytes)."""
    comp = bz2.compress(b"tiny\n", 9)
    fh = io.BytesIO(comp)
    fh.read(3)
    starts, eos = _scan_magics(fh)
    assert len(starts) == 1
    from distcpplus_spark.sources.bz2split import _read_bits_as_int

    crc = _read_bits_as_int(comp, starts[0] + 48, 32)
    combined = _read_bits_as_int(comp, eos + 48, 32)
    assert crc == combined
