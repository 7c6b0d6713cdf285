"""Splittable bzip2: parallel reads of a MONOLITHIC .bz2 file.

Unlike DEFLATE, bzip2 is a BLOCK codec: the stream is a 4-byte
header ('BZh' + level digit) followed by independent blocks, each
beginning with the 48-bit magic 0x314159265359 and its own 32-bit
CRC, terminated by the end-of-stream magic 0x177245385090 + combined
CRC (the format is public — bzip2 source / Wikipedia's format note;
pbzip2 and Hadoop's Bzip2Codec split exactly this way). Blocks are
BIT-aligned, which is why naive byte splitting fails — and why this
module exists:

1. INDEX: scan the compressed bytes once for the block/EOS magics at
   every bit offset (a vectorized rolling 56-bit window in numpy — 8
   shift lanes per byte), recording each block's [start_bit, end_bit).
   One cheap pass per file, parallel across files; no decompression.
2. READ: each task takes a range of whole blocks, REALIGNS the bits
   to a byte boundary, wraps them in a synthesized single-block
   stream (header + block bits + EOS + the block's own CRC as the
   combined CRC — the combined CRC of a one-block stream IS the
   block CRC), and feeds stdlib bz2. Line boundaries straddle
   blocks, so tasks use the Hadoop LineRecordReader convention:
   skip through the first newline unless the split starts the
   stream, and read FORWARD past the split end to finish the last
   line (decoding as many following blocks as that takes).

A magic colliding with compressed payload bits is possible at
probability 2^-48 per bit position; like pbzip2, the reader treats
a block that fails CRC/decode as a fatal error rather than silently
skipping (corruption must not be guessed away).

Reference parity: the reference copies .bz2 as opaque bytes
(DefaultCopyFilesMapper.java:141-160); this is north-star scope for
the text-ingestion tier — the bz2 sibling of sources/gzsplit.py,
stronger because NO reshard pass is needed: any existing .bz2 is
already splittable once indexed.
"""

from __future__ import annotations

import bz2

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCK_MAGIC = 0x314159265359
EOS_MAGIC = 0x177245385090
_MASK48 = np.uint64((1 << 48) - 1)

BZ2_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("block_idx", T.LongType(), False),
        T.StructField("bit_start", T.LongType(), False),
        T.StructField("bit_end", T.LongType(), False),
        T.StructField("block_crc", T.LongType(), False),
    ]
)

BZ2_LINE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("line", T.StringType(), False),
    ]
)


def _local(p: str) -> str:
    if p.startswith("file://"):
        return p[7:]
    if p.startswith("file:"):
        return p[5:]
    return p


def _scan_magics(fh, chunk: int = 1 << 23) -> tuple[list[int], int]:
    """Bit offsets of every block magic, plus the EOS magic offset,
    streaming ``fh`` in chunks (constant memory at any file size).

    Rolling 56-bit windows over the byte stream, vectorized: w[i]
    holds bytes[i..i+6] big-endian, so the 48-bit run starting at bit
    b of byte i is (w[i] >> (8-b)) & mask — 8 numpy compares per
    chunk instead of 8 Python checks per byte. Chunks overlap by 6
    bytes so windows never straddle a chunk seam."""
    blocks: list[int] = []
    eos = -1
    fh.seek(0)
    carry = b""
    pos = 0  # absolute offset of carry[0]
    while True:
        data = fh.read(chunk)
        if not data:
            break
        buf = carry + data
        a = np.frombuffer(buf, np.uint8).astype(np.uint64)
        m = len(a) - 6
        if m <= 0:
            carry = buf
            continue
        w = a[:m].copy()
        for k in range(1, 7):
            w = (w << np.uint64(8)) | a[k: k + m]
        for b in range(8):
            run = (w >> np.uint64(8 - b)) & _MASK48
            for i in np.nonzero(run == np.uint64(BLOCK_MAGIC))[0]:
                blocks.append((pos + int(i)) * 8 + b)
            for i in np.nonzero(run == np.uint64(EOS_MAGIC))[0]:
                off = (pos + int(i)) * 8 + b
                if eos < 0 or off < eos:
                    eos = off
        pos += m
        carry = buf[m:]
    return sorted(set(blocks)), eos


def _read_bits_as_int(data: bytes, bit_start: int, n_bits: int) -> int:
    byte0 = bit_start // 8
    nbytes = (bit_start % 8 + n_bits + 7) // 8
    v = int.from_bytes(data[byte0: byte0 + nbytes], "big")
    extra = nbytes * 8 - (bit_start % 8) - n_bits
    return (v >> extra) & ((1 << n_bits) - 1)


def _realign_bits(data: bytes, bit_start: int, bit_end: int) -> tuple[bytearray, int]:
    """Bits [bit_start, bit_end) shifted to start at bit 0 of a fresh
    buffer (vectorized byte shift). Returns (buf, n_bits); surplus
    low bits of the final byte are NOT cleared — callers append."""
    n_bits = bit_end - bit_start
    byte0 = bit_start // 8
    shift = bit_start % 8
    nbytes_in = (shift + n_bits + 7) // 8
    a = np.frombuffer(
        data[byte0: byte0 + nbytes_in + 1].ljust(nbytes_in + 1, b"\0"),
        np.uint8,
    ).astype(np.uint16)
    if shift:
        out = ((a[:-1] << shift) | (a[1:] >> (8 - shift))) & 0xFF
    else:
        out = a[:-1]
    nbytes_out = (n_bits + 7) // 8
    return bytearray(out[:nbytes_out].astype(np.uint8).tobytes()), n_bits


def _synth_stream(data: bytes, bit_start: int, bit_end: int, level: int) -> bytes:
    """A valid single-block .bz2 stream from one block's bits: header
    + realigned block + EOS magic + combined CRC (== the block CRC,
    read from the block's own header bits 48..80)."""
    block_crc = _read_bits_as_int(data, bit_start + 48, 32)
    buf, n_bits = _realign_bits(data, bit_start, bit_end)
    # append 80 bits (EOS + CRC) at bit position n_bits
    rem = n_bits % 8
    tail_val = (EOS_MAGIC << 32) | block_crc
    if rem:
        keep = buf[-1] >> (8 - rem)
        tail_bits = rem + 80
        tail_val |= keep << 80
        del buf[-1]
    else:
        tail_bits = 80
    pad = (-tail_bits) % 8
    tail_val <<= pad
    buf += tail_val.to_bytes((tail_bits + pad) // 8, "big")
    return b"BZh" + str(level).encode() + bytes(buf)


def _decode_block(data: bytes, bit_start: int, bit_end: int, level: int) -> bytes:
    d = bz2.BZ2Decompressor()
    out = d.decompress(_synth_stream(data, bit_start, bit_end, level))
    if not d.eof:
        raise ValueError(
            f"bz2 block at bit {bit_start} did not terminate cleanly"
        )
    return out


def _decode_block_fh(fh, bit_start: int, bit_end: int, level: int) -> bytes:
    """Seek-and-decode ONE block: reads only the block's byte span
    (tasks never hold the whole file — a split of a 100 GB shard
    reads its own few MB)."""
    byte0 = bit_start // 8
    byte1 = (bit_end + 7) // 8 + 1
    fh.seek(byte0)
    data = fh.read(byte1 - byte0)
    return _decode_block(data, bit_start - byte0 * 8, bit_end - byte0 * 8, level)


def index_bz2_blocks(
    spark: SparkSession, path: str, glob: str = "*.bz2"
) -> DataFrame:
    """Block offset index for .bz2 files: one magic-scan task per
    file (parallel across files; the scan is byte-stream numpy, no
    decompression). Persist as parquet and reuse — the index is the
    once-per-corpus artifact that makes every later read splittable."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path")
    )

    def scan(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                with open(_local(p), "rb") as fh:
                    if fh.read(3) != b"BZh":
                        raise ValueError(f"not a bzip2 file: {p}")
                    starts, eos = _scan_magics(fh)
                    if eos < 0:
                        raise ValueError(f"no end-of-stream marker: {p}")
                    bounds = starts + [eos]
                    for i, s in enumerate(starts):
                        byte0 = s // 8
                        fh.seek(byte0)
                        hdr = fh.read(12)
                        crc = _read_bits_as_int(hdr, s - byte0 * 8 + 48, 32)
                        rows.append((p, i, s, bounds[i + 1], crc))
            yield pd.DataFrame(
                rows, columns=[f.name for f in BZ2_INDEX_SCHEMA.fields]
            )

    return files.mapInPandas(scan, BZ2_INDEX_SCHEMA)


def read_bz2_indexed_lines(
    spark: SparkSession, index: DataFrame, blocks_per_split: int = 8
) -> DataFrame:
    """Distributed line read of indexed .bz2: contiguous blocks group
    into splits, one task per split. Line-boundary convention
    (Hadoop LineRecordReader): a split that doesn't start the stream
    skips through its first newline (the previous split finishes
    that line); every split reads FORWARD past its last block to
    complete its final line, decoding following blocks as needed —
    so each line is emitted exactly once, by the split where its
    first byte lives."""
    import pandas as pd

    splits = (
        index.withColumn(
            "_split", (F.col("block_idx") / F.lit(blocks_per_split)).cast("long")
        )
        .groupBy("path", "_split")
        .agg(
            F.min("block_idx").alias("first_block"),
            F.collect_list(
                F.struct("block_idx", "bit_start", "bit_end")
            ).alias("blocks"),
        )
    )
    # every task needs the FULL per-file block list to read forward
    all_blocks = (
        index.groupBy("path")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("block_idx", "bit_start", "bit_end"))
            ).alias("all_blocks")
        )
    )
    splits = splits.join(all_blocks, "path")
    n_splits = splits.count()

    def read_split(batches):
        for pdf in batches:
            paths, lines = [], []
            for p, first, blocks, allb in zip(
                pdf["path"], pdf["first_block"], pdf["blocks"],
                pdf["all_blocks"],
            ):
                with open(_local(p), "rb") as fh:
                    level = int(chr(fh.read(4)[3]))
                    own = sorted(blocks, key=lambda r: r["block_idx"])
                    text = b"".join(
                        _decode_block_fh(
                            fh, r["bit_start"], r["bit_end"], level
                        )
                        for r in own
                    )
                    last_idx = own[-1]["block_idx"]
                    # read forward to finish the last line
                    tail = b""
                    for r in allb:
                        if r["block_idx"] <= last_idx:
                            continue
                        nxt = _decode_block_fh(
                            fh, r["bit_start"], r["bit_end"], level
                        )
                        nl = nxt.find(b"\n")
                        if nl >= 0:
                            tail += nxt[: nl + 1]
                            break
                        tail += nxt
                text += tail
                if int(first) > 0:
                    # previous split finishes this line (Hadoop rule)
                    nl = text.find(b"\n")
                    text = text[nl + 1:] if nl >= 0 else b""
                for ln in text.splitlines():
                    paths.append(p)
                    lines.append(ln.decode("utf-8", "replace"))
            yield pd.DataFrame({"path": paths, "line": lines})

    return splits.repartition(max(1, n_splits)).mapInPandas(
        read_split, BZ2_LINE_SCHEMA
    )
