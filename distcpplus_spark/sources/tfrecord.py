"""TFRecord source/sink — the training-shard format TF/JAX input
pipelines consume, implemented from the PUBLIC specs only:

* framing: ``uint64 length | uint32 masked_crc32c(length) | data |
  uint32 masked_crc32c(data)`` with CRC-32C (Castagnoli, reflected
  poly 0x82F63B78) and mask ``((c >> 15) | (c << 17)) + 0xa282ead8``
  (TensorFlow's documented record format);
* payload: ``tf.train.Example`` protobuf messages, hand-encoded on
  the protobuf WIRE format (varints + length-delimited submessages —
  the wire spec is public and tiny; the container has no protobuf
  runtime, and doesn't need one for this fixed message shape).

Feature types supported: bytes (strings land as UTF-8), int64 lists,
float32 lists — the three tf.train.Feature arms.

Scale: one shard per Spark partition, written executor-side via
mapInPandas with tmp+rename (the repo's sink commit protocol); the
reader lists shards driver-side (metadata) and parses record frames
executor-side, one task per shard — the same file-per-task unit as
the WARC reader. CRCs are verified on read; a bad frame fails loudly
rather than yielding silently-truncated training data.
"""

from __future__ import annotations

import os
import struct

_CRC32C_TABLE = None


def _crc32c_table():
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tab = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tab.append(c)
        _CRC32C_TABLE = tab
    return _CRC32C_TABLE


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (Castagnoli), table-driven, from the public polynomial."""
    tab = _crc32c_table()
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _feature(value) -> bytes:
    """Encode one tf.train.Feature from a python value."""
    if isinstance(value, bytes):
        return _ld(1, _ld(1, value))  # bytes_list.value
    if isinstance(value, str):
        return _ld(1, _ld(1, value.encode("utf-8")))
    if isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            packed = b"".join(
                _varint(v & 0xFFFFFFFFFFFFFFFF) for v in value
            )
            return _ld(3, _ld(1, packed))  # int64_list.value (packed)
        packed = b"".join(struct.pack("<f", float(v)) for v in value)
        return _ld(2, _ld(1, packed))  # float_list.value (packed)
    if isinstance(value, int):
        return _ld(3, _ld(1, _varint(value & 0xFFFFFFFFFFFFFFFF)))
    raise TypeError(f"unsupported feature value type {type(value)!r}")


def encode_example(features: dict) -> bytes:
    """tf.train.Example wire bytes for {name: value}. Keys are
    emitted in sorted order so byte output is deterministic."""
    feats = b"".join(
        _ld(1, _ld(1, k.encode("utf-8")) + _ld(2, _feature(v)))
        for k, v in sorted(features.items())
    )
    return _ld(1, feats)


def decode_example(buf: bytes) -> dict:
    """Parse the Example shapes encode_example emits (plus unpacked
    int64/float repeats, which other writers legally produce)."""
    out = {}
    # Example -> features (field 1, ld)
    tag, pos = _read_varint(buf, 0)
    if tag >> 3 != 1:
        raise ValueError("not a tf.train.Example")
    flen, pos = _read_varint(buf, pos)
    fbuf = buf[pos: pos + flen]
    p = 0
    while p < len(fbuf):
        tag, p = _read_varint(fbuf, p)
        mlen, p = _read_varint(fbuf, p)
        entry = fbuf[p: p + mlen]
        p += mlen
        # map entry: key (1, ld), value (2, ld Feature)
        name, feat = None, None
        q = 0
        while q < len(entry):
            etag, q = _read_varint(entry, q)
            elen, q = _read_varint(entry, q)
            body = entry[q: q + elen]
            q += elen
            if etag >> 3 == 1:
                name = body.decode("utf-8")
            else:
                feat = body
        if name is None or feat is None:
            raise ValueError("malformed feature map entry")
        ftag, q2 = _read_varint(feat, 0)
        flen2, q2 = _read_varint(feat, q2)
        inner = feat[q2: q2 + flen2]
        kind = ftag >> 3  # 1 bytes_list / 2 float_list / 3 int64_list
        vals = []
        r = 0
        while r < len(inner):
            vtag, r = _read_varint(inner, r)
            if vtag & 7 == 2:  # length-delimited: bytes or packed
                vlen, r = _read_varint(inner, r)
                body = inner[r: r + vlen]
                r += vlen
                if kind == 1:
                    vals.append(body)
                elif kind == 3:
                    s = 0
                    while s < len(body):
                        v, s = _read_varint(body, s)
                        if v >= 1 << 63:
                            v -= 1 << 64
                        vals.append(v)
                else:
                    vals.extend(
                        struct.unpack(f"<{len(body) // 4}f", body)
                    )
            elif vtag & 7 == 0:  # unpacked varint
                v, r = _read_varint(inner, r)
                if v >= 1 << 63:
                    v -= 1 << 64
                vals.append(v)
            elif vtag & 7 == 5:  # unpacked float
                vals.append(struct.unpack("<f", inner[r: r + 4])[0])
                r += 4
            else:
                raise ValueError("unsupported wire type in Feature")
        out[name] = vals[0] if kind == 1 and len(vals) == 1 else vals
    return out


def frame_record(payload: bytes) -> bytes:
    ln = struct.pack("<Q", len(payload))
    return (
        ln
        + struct.pack("<I", masked_crc32c(ln))
        + payload
        + struct.pack("<I", masked_crc32c(payload))
    )


def iter_records(path: str):
    """Yield verified payloads from one TFRecord shard; raises on any
    CRC or framing mismatch."""
    with open(path, "rb") as fh:
        while True:
            hdr = fh.read(12)
            if not hdr:
                return
            if len(hdr) != 12:
                raise ValueError(f"{path}: truncated length header")
            (n,) = struct.unpack("<Q", hdr[:8])
            (lcrc,) = struct.unpack("<I", hdr[8:])
            if masked_crc32c(hdr[:8]) != lcrc:
                raise ValueError(f"{path}: length crc mismatch")
            payload = fh.read(n)
            if len(payload) != n:
                raise ValueError(f"{path}: truncated record")
            (dcrc,) = struct.unpack("<I", fh.read(4))
            if masked_crc32c(payload) != dcrc:
                raise ValueError(f"{path}: data crc mismatch")
            yield payload


def write_tfrecord_shards(df, path: str) -> int:
    """Write every row as one tf.train.Example; one shard per Spark
    partition (tmp+rename commit). String columns become bytes
    features, integral become int64 lists, float/array<float> become
    float lists. Returns the number of shards written."""
    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def write(batches):
        # mapInArrow, NOT mapInPandas: the Arrow->pandas conversion
        # turns a nullable bigint column into float64, silently
        # rewriting int64 features above 2^53 AND re-typing them as
        # float lists (round-8 _typed_pdf bug class, input side).
        # Arrow to_pylist hands exact Python ints; a None value means
        # the feature is OMITTED from that Example (the tf.train
        # missing-feature convention the reader mirrors).
        import pyarrow as pa

        first = None
        tmp = None
        fh = None
        n = 0
        for batch in batches:
            if fh is None and batch.num_rows:
                import uuid

                first = str(uuid.uuid4())[:8]
                tmp = os.path.join(path, f".tmp-{first}")
                fh = open(tmp, "wb")
            cols_data = [
                batch.column(i).to_pylist()
                for i in range(batch.num_columns)
            ]
            for vals in zip(*cols_data):
                feats = {}
                for k, v in zip(cols, vals):
                    if v is None:
                        continue
                    if isinstance(v, bool):
                        feats[k] = int(v)
                    elif isinstance(v, float):
                        feats[k] = [v]
                    else:
                        feats[k] = v  # int / str / bytes / list
                fh.write(frame_record(encode_example(feats)))
                n += 1
        if fh is not None:
            fh.close()
            final = os.path.join(path, f"part-{first}.tfrecord")
            os.rename(tmp, final)
            yield pa.RecordBatch.from_pydict(
                {"shard": [final], "n_records": [n]},
                schema=pa.schema(
                    [("shard", pa.string()), ("n_records", pa.int64())]
                ),
            )

    out = df.mapInArrow(write, "shard string, n_records long").collect()
    return len(out)


def read_tfrecord(spark, path: str, schema: str):
    """Distributed TFRecord read: one task per shard, each parsing
    and CRC-verifying its frames, decoding Examples into the given
    column schema (names must match the written feature names)."""
    import pandas as pd
    from pyspark.sql import types as T

    shards = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tfrecord")
    )
    sdf = spark.createDataFrame([(s,) for s in shards], "path string")
    target = T._parse_datatype_string(schema)
    names = [f.name for f in target.fields]
    kinds = [f.dataType.simpleString() for f in target.fields]

    def parse(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                for payload in iter_records(p):
                    ex = decode_example(payload)
                    row = []
                    for name, kind in zip(names, kinds):
                        v = ex.get(name)
                        if kind == "string" and isinstance(v, bytes):
                            v = v.decode("utf-8")
                        elif kind in ("bigint", "int") and isinstance(
                            v, list
                        ):
                            v = v[0]
                        elif kind in ("double", "float") and isinstance(
                            v, list
                        ):
                            v = float(v[0])
                        row.append(v)
                    rows.append(tuple(row))
            # column-wise OBJECT series: a missing feature (None) in a
            # tuple-list frame demotes int64 columns to float64 and
            # corrupts values above 2^53 (multimodal._typed_pdf bug
            # class, round 8); object columns keep exact Python ints
            yield pd.DataFrame(
                {
                    n: pd.Series([r[i] for r in rows], dtype=object)
                    for i, n in enumerate(names)
                }
            )

    return sdf.repartition(max(len(shards), 1)).mapInPandas(parse, target)
