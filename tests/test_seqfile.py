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
