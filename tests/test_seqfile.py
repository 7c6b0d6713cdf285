"""Hadoop SequenceFile codec (sources/seqfile.py): VInt spec vectors,
hand-assembled container fixture, sync-split equivalence, corruption
detection."""

from __future__ import annotations

import os
import struct

import pytest

from distcpplus_spark.sources import seqfile as sf


# --- WritableUtils VInt spec vectors (derivable from the public
# encoding rules: one raw byte in [-112, 127]; else prefix byte
# -113..-120 (positive, 1-8 magnitude bytes) / -121..-128 (negative,
# ones'-complement magnitude)) -------------------------------------
VINT_VECTORS = [
    (0, b"\x00"),
    (127, b"\x7f"),
    (-112, struct.pack("b", -112)),
    (128, struct.pack("b", -113) + b"\x80"),
    (255, struct.pack("b", -113) + b"\xff"),
    (256, struct.pack("b", -114) + b"\x01\x00"),
    (300, struct.pack("b", -114) + b"\x01\x2c"),
    (-113, struct.pack("b", -121) + b"\x70"),  # ~(-113) = 112 = 0x70
    (-256, struct.pack("b", -121) + b"\xff"),  # ~(-256) = 255
    (-257, struct.pack("b", -122) + b"\x01\x00"),  # ~(-257) = 256
    (2**40, struct.pack("b", -118) + b"\x01" + b"\x00" * 5),
]


@pytest.mark.parametrize("value,encoded", VINT_VECTORS)
def test_vint_spec_vectors(value, encoded):
    assert sf.write_vint(value) == encoded
    got, pos = sf.read_vint(encoded, 0)
    assert got == value and pos == len(encoded)


def test_vint_roundtrip_sweep():
    for v in list(range(-300, 300)) + [2**k for k in range(8, 63, 7)]:
        for x in (v, -v):
            enc = sf.write_vint(x)
            got, pos = sf.read_vint(enc, 0)
            assert got == x and pos == len(enc), x


def test_hand_assembled_container(tmp_path):
    """Byte-level fixture built independently of the writer: header
    fields laid out by hand, one record, one sync, one more record."""
    sync = bytes(range(16))
    kc = b"\x21" + sf.KEY_CLASS.encode()  # 33 = len(class name), VInt=raw
    vc = b"\x19" + sf.VALUE_CLASS.encode()  # 25
    header = b"SEQ\x06" + kc + vc + b"\x00\x00" + b"\x00\x00\x00\x00" + sync
    rec1 = (
        b"\x00\x00\x00\x0e"  # record length 8 + 6
        + b"\x00\x00\x00\x08"
        + struct.pack(">q", 42)
        + b"\x05hello"
    )
    rec2 = (
        b"\x00\x00\x00\x0e"
        + b"\x00\x00\x00\x08"
        + struct.pack(">q", -7)
        + b"\x05world"
    )
    blob = header + rec1 + b"\xff\xff\xff\xff" + sync + rec2
    p = tmp_path / "hand.seq"
    p.write_bytes(blob)
    assert list(sf.iter_seqfile(str(p))) == [(42, "hello"), (-7, "world")]


def test_roundtrip_and_split_equivalence(tmp_path):
    rows = [(i, f"doc-{i} " + "x" * (i % 57)) for i in range(500)]
    p = str(tmp_path / "t.seq")
    assert sf.write_seqfile(rows, p, sync_interval=512) == 500
    whole = list(sf.iter_seqfile(p))
    assert whole == rows
    size = os.path.getsize(p)
    # ANY disjoint cover of [0, size) must reproduce the file exactly
    for nsplits in (1, 2, 3, 7, 64):
        step = max(size // nsplits, 1)
        got = []
        off = 0
        while off < size:
            got.extend(sf.iter_seqfile(p, off, min(off + step, size)))
            off += step
        assert got == rows, nsplits


def test_corruption_detected(tmp_path):
    rows = [(i, "abc") for i in range(50)]
    p = str(tmp_path / "c.seq")
    sf.write_seqfile(rows, p, sync_interval=128)
    blob = bytearray(open(p, "rb").read())
    blob[:3] = b"XXX"
    bad = str(tmp_path / "bad.seq")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(ValueError):
        list(sf.iter_seqfile(bad))


def test_spark_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )
    path = str(tmp_path / "shards")
    n = sf.write_seqfile_shards(df.repartition(4), path)
    assert n == 1000
    back = sf.read_seqfile_spark(spark, path)
    assert back.count() == 1000
    assert back.agg(F.sum("doc_id")).collect()[0][0] == 499500
    # splittable read agrees with whole-file read
    split = sf.read_seqfile_spark(spark, path, split_bytes=2048)
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, split.collect()))
    assert a == b


def test_indexed_get(tmp_path):
    rows = [(i * 3, f"v{i * 3}") for i in range(400)]  # keys 0,3,...,1197
    d = str(tmp_path / "mapdir")
    assert sf.write_seqfile_sorted_indexed(rows, d, index_every=32) == 400
    # hits incl. first, last, and index-boundary keys
    for k in (0, 3, 96, 99, 600, 1197):
        assert sf.seqfile_get(d, k) == f"v{k}", k
    # misses: below range, between keys, above range
    for k in (-5, 1, 100, 1198, 10**9):
        assert sf.seqfile_get(d, k) is None, k
    # unsorted input is rejected
    import pytest as _pt

    with _pt.raises(ValueError):
        sf.write_seqfile_sorted_indexed(
            [(5, "a"), (4, "b")], str(tmp_path / "bad")
        )


def test_split_read_is_bounded_io(tmp_path):
    """The scale contract: a mid-file split must read O(split + one
    trailing block) bytes, never the whole file (regression for the
    round-8 whole-file `f.read()`). Counts bytes through a wrapped
    file object."""
    rows = [(i, "y" * 200) for i in range(40000)]  # ~8.5 MB file
    p = str(tmp_path / "big.seq")
    sf.write_seqfile(rows, p, sync_interval=1024)
    size = os.path.getsize(p)
    assert size > 8 * sf._CHUNK

    import builtins

    counted = {"n": 0}
    real_open = builtins.open

    class CountingFile:
        def __init__(self, f):
            self._f = f

        def read(self, n=-1):
            b = self._f.read(n)
            counted["n"] += len(b)
            return b

        def __getattr__(self, name):
            return getattr(self._f, name)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return self._f.__exit__(*a)

    def counting_open(path, mode="r", *a, **kw):
        f = real_open(path, mode, *a, **kw)
        return CountingFile(f) if "b" in mode else f

    # one 64 KiB split from the middle of the file
    start, end = size // 2, size // 2 + 65536
    builtins.open = counting_open
    try:
        got = list(sf.iter_seqfile(p, start, end))
    finally:
        builtins.open = real_open
    assert got  # the split owns at least one block
    # header cap (64 KiB) + split length + chunk overshoot; far < size
    assert counted["n"] < 65536 + (end - start) + 2 * sf._CHUNK
    assert counted["n"] < size // 2  # and far less than the whole file


def test_indexed_get_is_bounded_io(tmp_path):
    """seqfile_get must seek + read O(index_every) records, not load
    data.seq (regression for the round-8 whole-file read)."""
    rows = [(i, "z" * 200) for i in range(40000)]
    d = str(tmp_path / "mapdir_big")
    sf.write_seqfile_sorted_indexed(rows, d, index_every=16)
    size = os.path.getsize(os.path.join(d, "data.seq"))
    assert size > 8 * sf._CHUNK

    import builtins

    counted = {"n": 0}
    real_open = builtins.open

    class CountingFile:
        def __init__(self, f):
            self._f = f

        def read(self, n=-1):
            b = self._f.read(n)
            counted["n"] += len(b)
            return b

        def __getattr__(self, name):
            return getattr(self._f, name)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return self._f.__exit__(*a)

    def counting_open(path, mode="r", *a, **kw):
        f = real_open(path, mode, *a, **kw)
        return CountingFile(f) if "b" in mode else f

    builtins.open = counting_open
    try:
        assert sf.seqfile_get(d, 2500) == "z" * 200
    finally:
        builtins.open = real_open
    # index json + 64 KiB header cap + ~2 chunks of data; << file size
    assert counted["n"] < size // 2
    assert counted["n"] < 3 * sf._CHUNK


# --- compressed modes (DefaultCodec = stdlib zlib: an EXTERNAL
# ground truth for the codec layer; layout hand-assembled from the
# public SequenceFile javadoc so writer/reader bugs cannot cancel) --

def test_hand_assembled_record_compressed(tmp_path):
    import zlib

    sync = bytes(range(16))
    kc = b"\x21" + sf.KEY_CLASS.encode()
    vc = b"\x19" + sf.VALUE_CLASS.encode()
    codec = bytes([len(sf.CODEC_CLASS)]) + sf.CODEC_CLASS.encode()
    header = (
        b"SEQ\x06" + kc + vc + b"\x01\x00" + codec
        + b"\x00\x00\x00\x00" + sync
    )
    key = struct.pack(">q", 99)
    cval = zlib.compress(b"\x05world")  # Text: VInt len + utf8
    rec = (
        struct.pack(">i", 8 + len(cval))
        + struct.pack(">i", 8)
        + key
        + cval
    )
    p = tmp_path / "rc.seq"
    p.write_bytes(header + rec)
    assert list(sf.iter_seqfile(str(p))) == [(99, "world")]


def test_hand_assembled_block_compressed(tmp_path):
    import zlib

    sync = bytes(range(16))
    kc = b"\x21" + sf.KEY_CLASS.encode()
    vc = b"\x19" + sf.VALUE_CLASS.encode()
    codec = bytes([len(sf.CODEC_CLASS)]) + sf.CODEC_CLASS.encode()
    header = (
        b"SEQ\x06" + kc + vc + b"\x01\x01" + codec
        + b"\x00\x00\x00\x00" + sync
    )
    keys = [struct.pack(">q", 7), struct.pack(">q", 8)]
    vals = [b"\x02hi", b"\x03bye"]  # serialized Texts
    klens = b"\x08\x08"  # VInt(8) is one raw byte
    vlens = bytes([len(vals[0]), len(vals[1])])
    block = b"\xff\xff\xff\xff" + sync + b"\x02"  # VInt(2) records
    for buf in (
        zlib.compress(klens), zlib.compress(b"".join(keys)),
        zlib.compress(vlens), zlib.compress(b"".join(vals)),
    ):
        block += bytes([len(buf)]) + buf  # VInt lengths < 128
    p = tmp_path / "bc.seq"
    p.write_bytes(header + block)
    assert list(sf.iter_seqfile(str(p))) == [(7, "hi"), (8, "bye")]


@pytest.mark.parametrize("mode", ["record", "block"])
def test_compressed_roundtrip_and_splits(tmp_path, mode):
    rows = [(i, f"doc-{i} " + "quup " * (i % 23)) for i in range(800)]
    p = str(tmp_path / f"{mode}.seq")
    assert sf.write_seqfile(rows, p, sync_interval=700,
                            compression=mode) == 800
    assert list(sf.iter_seqfile(p)) == rows
    size = os.path.getsize(p)
    # any disjoint byte-range cover reads every record exactly once
    for nsplits in (1, 2, 5, 17):
        step = max(size // nsplits, 1)
        got = []
        off = 0
        while off < size:
            got.extend(sf.iter_seqfile(p, off, min(off + step, size)))
            off += step
        assert sorted(got) == sorted(rows), (mode, nsplits)
    # compression actually engaged (repetitive payload shrinks)
    plain = str(tmp_path / "plain.seq")
    sf.write_seqfile(rows, plain, sync_interval=700)
    if mode == "block":
        assert size < os.path.getsize(plain) * 0.6


def test_unknown_codec_rejected(tmp_path):
    sync = bytes(range(16))
    kc = b"\x21" + sf.KEY_CLASS.encode()
    vc = b"\x19" + sf.VALUE_CLASS.encode()
    other = b"org.apache.hadoop.io.compress.SnappyCodec"
    codec = bytes([len(other)]) + other
    header = (
        b"SEQ\x06" + kc + vc + b"\x01\x00" + codec
        + b"\x00\x00\x00\x00" + sync
    )
    p = tmp_path / "snappy.seq"
    p.write_bytes(header)
    with pytest.raises(ValueError, match="unsupported codec"):
        list(sf.iter_seqfile(str(p)))


# --- round-10 ADVICE regressions: indexed-get compression modes ----
def test_indexed_get_record_compressed(tmp_path):
    """seqfile_get must honor the header's compression mode: a
    record-compressed data.seq decodes per record (every record is
    still a seek point so the sparse index stays valid)."""
    rows = [(i * 3, f"value-{i * 3}" * 4) for i in range(300)]
    d = str(tmp_path / "recdir")
    assert sf.write_seqfile_sorted_indexed(
        rows, d, index_every=32, compression="record"
    ) == 300
    for k in (0, 3, 96, 600, 897):
        assert sf.seqfile_get(d, k) == f"value-{k}" * 4, k
    for k in (-1, 1, 898, 10**9):
        assert sf.seqfile_get(d, k) is None, k


def test_indexed_writer_rejects_block_mode(tmp_path):
    with pytest.raises(ValueError, match="block"):
        sf.write_seqfile_sorted_indexed(
            [(1, "a")], str(tmp_path / "blk"), compression="block"
        )


def test_indexed_get_rejects_block_data(tmp_path):
    """A block-compressed data.seq under an indexed dir must raise
    explicitly, never silently misparse (ADVICE r9: values were
    previously decoded as plain Text regardless of header mode)."""
    import json
    import os

    d = tmp_path / "blkdir"
    d.mkdir()
    sf.write_seqfile(
        [(1, "a"), (2, "b")], str(d / "data.seq"), compression="block"
    )
    (d / "index.json").write_text(
        json.dumps({"keys": [1], "offsets": [0], "n": 2})
    )
    with pytest.raises(ValueError, match="block-compressed"):
        sf.seqfile_get(str(d), 1)
