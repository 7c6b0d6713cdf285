"""Mergeable CRC-32 checksums — verify a huge file from its chunks.

The copy executor's chunked mode (operators/copier.py) moves one
file as parallel byte ranges; verifying the WHOLE file afterwards
would re-read it sequentially — the exact straggler the chunking
removed. CRC-32 is linear over GF(2), so a chunk's CRC can be
"shifted" past the bytes that follow it and XOR-combined:
``crc32(A + B) == crc32_combine(crc32(A), crc32(B), len(B))``.
That makes the file checksum an ASSOCIATIVE fold over in-order
chunk CRCs — each task checksums only its range, the driver (or a
tree reduce) combines metadata-sized (crc, len) pairs, and the
result is bit-identical to a sequential ``zlib.crc32`` of the file.

The combine is the public zlib ``crc32_combine`` construction
(matrix exponentiation of the shift-by-one operator over GF(2));
HDFS's COMPOSITE_CRC file checksum is the same idea, which is what
makes distcp-style cross-filesystem verification possible without
ever streaming a 100 TB file through one reader.

Everything here is pure spec math testable against ``zlib.crc32``
ground truth — the independent-fixture rule the repo's codecs
follow.
"""

from __future__ import annotations

_POLY = 0xEDB88320  # reflected CRC-32 (IEEE 802.3), zlib's polynomial


def _gf2_matrix_times(mat: list[int], vec: int) -> int:
    total = 0
    i = 0
    while vec:
        if vec & 1:
            total ^= mat[i]
        vec >>= 1
        i += 1
    return total


def _gf2_matrix_square(square: list[int], mat: list[int]) -> None:
    for n in range(32):
        square[n] = _gf2_matrix_times(mat, mat[n])


def crc32_combine(crc1: int, crc2: int, len2: int) -> int:
    """CRC of the concatenation A+B given crc32(A), crc32(B), len(B).

    Shifts crc1 through len2 zero bytes by squaring the GF(2)
    "advance one byte" matrix (log2(len2) squarings, not len2
    steps), then XORs crc2 — O(log len2) regardless of chunk size."""
    if len2 <= 0:
        return crc1
    even = [0] * 32
    odd = [0] * 32
    # operator for one zero BIT: x^1 mod poly
    odd[0] = _POLY
    row = 1
    for n in range(1, 32):
        odd[n] = row
        row <<= 1
    # square to one zero BYTE (8 bits): odd->even (2 bits)...
    _gf2_matrix_square(even, odd)   # 2 bits
    _gf2_matrix_square(odd, even)   # 4 bits
    # now odd = advance 4 bits; loop squares from 8 bits upward
    while True:
        _gf2_matrix_square(even, odd)
        if len2 & 1:
            crc1 = _gf2_matrix_times(even, crc1)
        len2 >>= 1
        if len2 == 0:
            break
        _gf2_matrix_square(odd, even)
        if len2 & 1:
            crc1 = _gf2_matrix_times(odd, crc1)
        len2 >>= 1
        if len2 == 0:
            break
    return crc1 ^ crc2


def combine_chunk_crcs(chunks: list[tuple[int, int]]) -> int:
    """Fold in-order (crc, length) chunk pairs into the whole-file
    CRC-32. Associative: any contiguous grouping gives the same
    result, so a tree reduce works when the chunk list itself is
    large."""
    crc = 0
    for c, ln in chunks:
        crc = crc32_combine(crc, c, ln)
    return crc


def distributed_file_crc(
    spark, path: str, chunk_bytes: int = 64 << 20
) -> int:
    """Whole-file CRC-32 computed by parallel range tasks: chunk
    ranges fan out via mapInPandas (each task reads only its slice),
    the per-chunk (index, crc, length) rows come back
    metadata-sized, and the in-order combine runs on the driver.
    Bit-identical to ``zlib.crc32(open(path).read())``."""
    import os
    import zlib

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    size = os.path.getsize(path)
    n_chunks = max(1, -(-size // chunk_bytes))
    # parallelize directly into the task count: createDataFrame(list)
    # would slice by defaultParallelism and the old repartition() paid
    # an extra exchange of the Python-backed slices per call
    ranges = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, i * chunk_bytes, min(chunk_bytes, size - i * chunk_bytes))
             for i in range(n_chunks)],
            numSlices=min(n_chunks, 32),
        ),
        "idx INT, offset BIGINT, length BIGINT",
    )

    def crc_chunk(batches):
        for pdf in batches:
            rows = []
            for idx, off, ln in zip(
                pdf["idx"], pdf["offset"], pdf["length"]
            ):
                with open(path, "rb") as fh:
                    fh.seek(int(off))
                    data = fh.read(int(ln))
                rows.append((int(idx), zlib.crc32(data), len(data)))
            yield pd.DataFrame(rows, columns=["idx", "crc", "n"])

    parts = sorted(
        ranges.mapInPandas(crc_chunk, "idx INT, crc BIGINT, n BIGINT")
        .collect(),
        key=lambda r: r["idx"],
    )
    return combine_chunk_crcs([(r["crc"], r["n"]) for r in parts])
