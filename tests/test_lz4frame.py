"""LZ4 frame/block codec (sources/lz4frame.py): xxh32 published
sanity vectors, hand-assembled block and frame fixtures (built from
the spec text, independently of the writer), split equivalence, and
the cross-task line-reassembly convention."""

from __future__ import annotations

import os
import struct

import pytest

from distcpplus_spark.sources import lz4frame as lz


# --- xxh32: published sanity vectors (xxHash README/spec) -----------
@pytest.mark.parametrize(
    "data,seed,want",
    [
        (b"", 0, 0x02CC5D05),
        (b"a", 0, 0x550D7456),
        (b"abc", 0, 0x32D153FF),
        (b"", 0x9E3779B1, 0x36B78AE7),
    ],
)
def test_xxh32_vectors(data, seed, want):
    assert lz.xxh32(data, seed) == want


def test_xxh32_all_paths():
    # exercise 16-byte stripes + 4-byte lanes + tail bytes in one call
    v = lz.xxh32(bytes(range(37)))
    assert 0 <= v <= 0xFFFFFFFF
    assert v != lz.xxh32(bytes(range(36)))


# --- block decode: fixtures hand-assembled from the spec ------------
def test_block_literalonly_handmade():
    # token hi-nibble = 11 literals, lo = 0 (no match)
    blob = bytes([0xB0]) + b"hello world"
    assert lz.decompress_block(blob) == b"hello world"


def test_block_match_handmade():
    # "abc" literals then match offset 3 len 9 -> "abcabcabcabc"
    blob = bytes([0x35]) + b"abc" + struct.pack("<H", 3)
    assert lz.decompress_block(blob) == b"abcabcabcabc"


def test_block_rle_overlap_handmade():
    # 1 literal 'a' + match offset 1 len 8 -> 9 a's (overlapping copy)
    blob = bytes([0x14]) + b"a" + struct.pack("<H", 1)
    assert lz.decompress_block(blob) == b"a" * 9


def test_block_long_literal_extension_handmade():
    # literal len 15 + extension byte 5 = 20 literals
    payload = bytes(range(20))
    blob = bytes([0xF0, 5]) + payload
    assert lz.decompress_block(blob) == payload


def test_block_long_match_extension_handmade():
    # 4 literals "xyzw", then match len 15+4 + ext 255 + 3 = 277
    blob = (
        bytes([0x4F]) + b"xyzw" + struct.pack("<H", 4) + bytes([255, 3])
    )
    out = lz.decompress_block(blob)
    assert out == (b"xyzw" * 100)[: 4 + 277]


def test_block_invalid_offset_rejected():
    with pytest.raises(ValueError):
        lz.decompress_block(bytes([0x10]) + b"a" + struct.pack("<H", 9))
    with pytest.raises(ValueError):
        lz.decompress_block(bytes([0x10]) + b"a" + struct.pack("<H", 0))


def test_block_roundtrip_sweep():
    import random

    rnd = random.Random(42)
    cases = [
        b"",
        b"a",
        b"ab" * 3,
        b"x" * 10_000,
        bytes(rnd.randrange(256) for _ in range(5000)),  # incompressible
        (b"the quick brown fox " * 400),
        b"".join(
            f"line-{i % 17}\t{'y' * (i % 53)}\n".encode()
            for i in range(2000)
        ),
    ]
    for data in cases:
        comp = lz.compress_block(data)
        assert lz.decompress_block(comp) == data
        # end-of-block rules: final 5 bytes arrive as literals
        if len(data) >= 5:
            assert comp.endswith(data[-5:])


# --- frame: handmade fixture + writer round trip --------------------
def _handmade_frame(blocks, independence=True):
    """Assemble a frame byte-by-byte from the spec: magic, FLG
    (version 01 + flags), BD (64 KB code), xxh32-derived HC, then
    [u32 size][payload] blocks and the EndMark."""
    flg = 0x40 | (0x20 if independence else 0)
    bd = 0x40
    hc = (lz.xxh32(bytes([flg, bd])) >> 8) & 0xFF
    out = struct.pack("<I", lz.MAGIC) + bytes([flg, bd, hc])
    for payload, stored in blocks:
        sz = len(payload) | (0x80000000 if stored else 0)
        out += struct.pack("<I", sz) + payload
    return out + struct.pack("<I", 0)


def test_handmade_frame_reads(tmp_path):
    blk1 = b"alpha\nbeta\nga"  # line straddles into block 2
    blk2 = b"mma\ndelta\n"
    p = str(tmp_path / "hand.lz4")
    open(p, "wb").write(
        _handmade_frame([(blk1, True), (blk2, True)])
    )
    idx = lz.index_blocks(p)
    assert len(idx) == 2 and all(st for _, _, st in idx)
    with open(p, "rb") as f:
        whole = b"".join(lz._read_block(f, *b) for b in idx)
    assert whole == blk1 + blk2


def test_dependent_frame_rejected(tmp_path):
    p = str(tmp_path / "dep.lz4")
    open(p, "wb").write(
        _handmade_frame([(b"data\n", True)], independence=False)
    )
    with pytest.raises(ValueError, match="not splittable"):
        lz.index_blocks(p)


def test_header_checksum_enforced(tmp_path):
    blob = bytearray(_handmade_frame([(b"x\n", True)]))
    blob[6] ^= 0xFF  # corrupt HC
    p = str(tmp_path / "badhc.lz4")
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        lz.index_blocks(p)


def test_writer_roundtrip_and_block_cut(tmp_path):
    lines = [f"row {i} " + "z" * (i % 97) for i in range(3000)]
    p = str(tmp_path / "w.lz4")
    assert lz.write_lz4_lines(lines, p, block_bytes=2048) == 3000
    idx = lz.index_blocks(p)
    assert len(idx) > 10  # really multi-block
    with open(p, "rb") as f:
        data = b"".join(lz._read_block(f, *b) for b in idx)
    assert data.decode().splitlines() == lines
    # writer cuts at line boundaries: every block ends with newline
    with open(p, "rb") as f:
        for b in idx:
            assert lz._read_block(f, *b).endswith(b"\n")


def test_spark_split_read_equivalence(spark, tmp_path):
    lines = [f"{i}\tpayload-{i % 29}" for i in range(5000)]
    p = str(tmp_path / "s.lz4")
    lz.write_lz4_lines(lines, p, block_bytes=1024)
    whole = lz.read_lz4_lines_spark(spark, p)
    got_whole = sorted(r["line"] for r in whole.collect())
    assert got_whole == sorted(lines)
    # ANY split granularity reproduces the line set with dense idx
    for split in (512, 4096, 65536):
        df = lz.read_lz4_lines_spark(spark, p, split_bytes=split)
        rows = df.collect()
        assert sorted(r["line"] for r in rows) == sorted(lines), split
        idxs = sorted(r["line_idx"] for r in rows)
        assert idxs == list(range(5000)), split


def test_spark_straddling_lines_foreign_frame(spark, tmp_path):
    """A frame NOT cut at line boundaries (foreign writer): the
    task-boundary reassembly convention must still yield every line
    exactly once at every split size."""
    text = "".join(f"entry-{i}:{'q' * (i % 41)}\n" for i in range(800))
    raw = text.encode()
    # stored blocks of 97 bytes: lines straddle nearly every block
    blocks = [
        (raw[i : i + 97], True) for i in range(0, len(raw), 97)
    ]
    p = str(tmp_path / "foreign.lz4")
    open(p, "wb").write(_handmade_frame(blocks))
    want = sorted(text.splitlines())
    for split in (1, 200, 1000, 10**9):
        df = lz.read_lz4_lines_spark(spark, p, split_bytes=split)
        got = sorted(r["line"] for r in df.collect())
        assert got == want, split


def test_spark_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(0, 4000).select(
        F.concat(F.lit("doc|"), F.col("id").cast("string")).alias("line")
    )
    path = str(tmp_path / "shards")
    n = lz.write_lz4_shards(df.repartition(4), path, block_bytes=4096)
    assert n == 4000
    assert len([x for x in os.listdir(path) if x.endswith(".lz4")]) == 4
    back = lz.read_lz4_lines_spark(spark, path, split_bytes=2048)
    got = sorted(r["line"] for r in back.collect())
    assert got == sorted(f"doc|{i}" for i in range(4000))


def test_lz4text_python_datasource(spark, tmp_path):
    """spark.read.format('lz4text') — the DSv2 surface plans multiple
    byte-range partitions per file and agrees with the function
    surface at every split size."""
    from distcpplus_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    lines = [f"r{i}|{'w' * (i % 31)}" for i in range(3000)]
    p = str(tmp_path / "ds.lz4")
    lz.write_lz4_lines(lines, p, block_bytes=1024)
    df = (
        spark.read.format("lz4text")
        .option("path", p)
        .option("split_bytes", 2048)
        .load()
    )
    assert df.rdd.getNumPartitions() > 4  # really splittable
    got = sorted(r["line"] for r in df.collect())
    assert got == sorted(lines)


# --- round-10 ADVICE regressions: BD conformance + uniform errors ---
def test_bd_code_matches_block_bytes(tmp_path):
    """The frame descriptor's BD block-max code must cover
    block_bytes: conformant external decoders reject frames whose
    uncompressed blocks exceed the declared maximum."""
    for bb, want_code in ((65536, 4), (200_000, 5), (1 << 20, 6), (3 << 20, 7)):
        p = str(tmp_path / f"bd{want_code}.lz4")
        lz.write_lz4_lines(["x"], p, block_bytes=bb)
        blob = open(p, "rb").read()
        assert (blob[5] >> 4) & 0x07 == want_code, bb
        lz.index_blocks(p)  # still self-readable


def test_oversized_line_hard_split(tmp_path):
    """A single line longer than the declared block max is split
    across blocks (the reader reassembles straddling lines by
    design) — NO block's uncompressed size may exceed the BD max."""
    big = "A" * 150_000  # > 64 KiB declared max at default block_bytes
    lines = ["head", big, "tail"]
    p = str(tmp_path / "big.lz4")
    assert lz.write_lz4_lines(lines, p, block_bytes=65536) == 3
    idx = lz.index_blocks(p)
    with open(p, "rb") as f:
        for b in idx:
            assert len(lz._read_block(f, *b)) <= 65536
        whole = b"".join(lz._read_block(f, *b) for b in idx)
    assert whole.decode().splitlines() == lines


def test_block_bytes_over_spec_max_rejected(tmp_path):
    with pytest.raises(ValueError, match="4 MiB"):
        lz.write_lz4_lines(["x"], str(tmp_path / "no.lz4"),
                           block_bytes=(4 << 20) + 1)


@pytest.mark.parametrize(
    "blob,msg",
    [
        (b"\xf0", "literal length"),          # ext byte missing
        (b"\x12A\x01", "match offset"),       # only 1 of 2 offset bytes
        (b"\x1fA\x01\x00", "match length"),   # ext byte missing
    ],
)
def test_truncated_block_raises_valueerror(blob, msg):
    """Corrupt input raises the module's uniform ValueError contract,
    never bare IndexError/struct.error (ADVICE r9)."""
    with pytest.raises(ValueError, match=msg):
        lz.decompress_block(blob)


def test_decompress_block_fuzz_uniform_errors():
    """Corrupt-input CONTRACT under fuzz: decompress_block on
    arbitrary bytes either returns bytes or raises ValueError —
    never IndexError/struct.error/anything else (the round-10
    bounds-check fix, held under 2000 random blocks)."""
    import random

    rng = random.Random(1234)
    for _ in range(2000):
        n = rng.randint(0, 64)
        blob = bytes(rng.randrange(256) for _ in range(n))
        try:
            out = lz.decompress_block(blob, max_size=1 << 16)
            assert isinstance(out, bytes)
        except ValueError:
            pass  # the one allowed failure mode
