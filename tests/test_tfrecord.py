"""TFRecord sink/source: CRC-32C spec vectors, proto wire round
trips, shard round trips, corruption detection."""

from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distcpplus_spark.sources.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    frame_record,
    iter_records,
    masked_crc32c,
    read_tfrecord,
    write_tfrecord_shards,
)


def test_crc32c_spec_vectors():
    # the standard Castagnoli check vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 zero bytes — published CRC-32C vector (RFC 3720 appendix)
    assert crc32c(bytes(32)) == 0x8A9136AA
    # incremental == one-shot
    assert crc32c(b"123456789") == crc32c(b"6789", crc32c(b"12345"))


def test_example_roundtrip_all_types():
    ex = {
        "text": b"hello world",
        "ids": [1, 5, 1 << 40, -3],
        "scores": [0.5, -1.25],
    }
    got = decode_example(encode_example(ex))
    assert got["text"] == b"hello world"
    assert got["ids"] == [1, 5, 1 << 40, -3]
    assert got["scores"] == [0.5, -1.25]


def test_decode_unpacked_int64_variant():
    # other writers may emit repeated int64 UNPACKED: field 1,
    # wire type 0, once per value — the reader must accept it
    def varint(n):
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    # Int64List message content = repeated (tag 1, varint) directly
    int64_list = b"".join(varint(1 << 3 | 0) + varint(v) for v in (7, 9))
    feat = varint(3 << 3 | 2) + varint(len(int64_list)) + int64_list
    entry = (
        varint(1 << 3 | 2) + varint(1) + b"k"
        + varint(2 << 3 | 2) + varint(len(feat)) + feat
    )
    fmap = varint(1 << 3 | 2) + varint(len(entry)) + entry
    ex = varint(1 << 3 | 2) + varint(len(fmap)) + fmap
    assert decode_example(ex)["k"] == [7, 9]


def test_frame_corruption_detected(tmp_path):
    p = str(tmp_path / "x.tfrecord")
    with open(p, "wb") as fh:
        fh.write(frame_record(b"payload-one"))
        fh.write(frame_record(b"payload-two"))
    assert [bytes(r) for r in iter_records(p)] == [
        b"payload-one",
        b"payload-two",
    ]
    raw = bytearray(open(p, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte of record 1
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc mismatch"):
        list(iter_records(p))


def test_shard_roundtrip_spark(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") * 0.5).alias("score"),
    ).repartition(4)
    root = str(tmp_path / "tfr")
    n_shards = write_tfrecord_shards(df, root)
    assert 1 <= n_shards <= 4
    back = read_tfrecord(
        spark, root, "doc_id bigint, text string, score double"
    )
    got = {r["doc_id"]: (r["text"], r["score"]) for r in back.collect()}
    assert len(got) == 200
    assert got[7] == ("text-7", 3.5)


def test_missing_feature_keeps_big_int64_exact(spark, tmp_path):
    """An example lacking a feature yields None for that column; the
    None must not demote co-batched int64 values above 2^53 to
    float64 (round-8 _typed_pdf bug class)."""
    from distcpplus_spark.sources.tfrecord import (
        encode_example,
        frame_record,
        read_tfrecord,
    )

    big = (1 << 59) + 987654321
    path = tmp_path / "part-0.tfrecord"
    with open(path, "wb") as fh:
        fh.write(frame_record(encode_example({"a": [big], "b": b"x"})))
        fh.write(frame_record(encode_example({"b": b"y"})))  # 'a' missing
        fh.write(frame_record(encode_example({"a": [big + 7], "b": b"z"})))
    back = {
        r["b"]: r["a"]
        for r in read_tfrecord(
            spark, str(tmp_path), "a BIGINT, b STRING"
        ).collect()
    }
    assert back == {"x": big, "y": None, "z": big + 7}
