"""Hadoop SequenceFile source/sink, hand-rolled from the public
on-disk format (Apache Hadoop ``SequenceFile`` / ``WritableUtils``
spec; no Hadoop classes involved):

    header:  b"SEQ" + version(=6)
             keyClassName, valueClassName   (VInt length + UTF-8)
             compression(=0), blockCompression(=0)   (boolean bytes)
             metadata count (4-byte BE) + (Text key, Text value) pairs
             sync marker (16 bytes, unique per file)
    record:  recordLength (4-byte BE: len(key bytes)+len(value bytes))
             keyLength    (4-byte BE)
             key bytes, value bytes
    every ~sync_interval bytes the writer emits the SYNC ESCAPE:
             0xFFFFFFFF + the file's 16-byte sync marker

Writables implemented: LongWritable (8-byte BE two's complement) and
Text (Hadoop VInt length + UTF-8). VInt encoding (WritableUtils):
values in [-112, 127] are one raw byte; otherwise a prefix byte
(-113..-120 positive, -121..-128 negative, encoding the byte count)
followed by the big-endian magnitude bytes (ones' complement for
negatives).

Why this format matters here: it is the REFERENCE ecosystem's native
container (the reference engine is Hadoop MapReduce —
turn/DistCPPlus treats SequenceFiles as opaque bytes when copying;
this engine can actually read them), and the sync-marker design is
the original SPLITTABLE-file trick this repo re-uses for WARC/gzip:
a byte-range task seeks to the first sync after its start offset and
reads to the first sync after its end — no central index needed.

Scale: reading is file-per-task or sync-split byte ranges (hundreds
of tasks per large file); writing is shard-per-partition with the
tmp+rename commit protocol.
"""

from __future__ import annotations

import os
import struct
import uuid

SYNC_ESCAPE = b"\xff\xff\xff\xff"
_MAGIC = b"SEQ\x06"
KEY_CLASS = "org.apache.hadoop.io.LongWritable"
VALUE_CLASS = "org.apache.hadoop.io.Text"


def write_vint(i: int) -> bytes:
    """Hadoop WritableUtils.writeVLong."""
    if -112 <= i <= 127:
        return struct.pack("b", i)
    neg = i < 0
    mag = ~i if neg else i
    nbytes = (mag.bit_length() + 7) // 8
    prefix = (-120 if neg else -112) - nbytes
    return struct.pack("b", prefix) + mag.to_bytes(nbytes, "big")


def read_vint(buf: bytes, pos: int) -> tuple[int, int]:
    first = struct.unpack_from("b", buf, pos)[0]
    pos += 1
    if first >= -112:
        return first, pos
    neg = first < -120
    nbytes = (-120 - first) if neg else (-112 - first)
    mag = int.from_bytes(buf[pos : pos + nbytes], "big")
    pos += nbytes
    return (~mag if neg else mag), pos


def _text(s: str) -> bytes:
    b = s.encode("utf-8")
    return write_vint(len(b)) + b


def _read_text(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = read_vint(buf, pos)
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _header(sync: bytes) -> bytes:
    out = [
        _MAGIC,
        _text(KEY_CLASS),
        _text(VALUE_CLASS),
        b"\x00",  # compression
        b"\x00",  # block compression
        struct.pack(">i", 0),  # metadata pairs
        sync,
    ]
    return b"".join(out)


def _record(doc_id: int, text: str) -> bytes:
    key = struct.pack(">q", doc_id)
    val = _text(text)
    return (
        struct.pack(">i", len(key) + len(val))
        + struct.pack(">i", len(key))
        + key
        + val
    )


def write_seqfile(rows, path: str, sync_interval: int = 2000) -> int:
    """Write (long, str) rows as one uncompressed SequenceFile with a
    sync marker roughly every ``sync_interval`` bytes; returns rows
    written. Atomic: tmp + rename."""
    sync = uuid.uuid4().bytes
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "wb") as f:
        f.write(_header(sync))
        since_sync = 0
        for doc_id, text in rows:
            rec = _record(doc_id, text)
            if since_sync >= sync_interval:
                f.write(SYNC_ESCAPE + sync)
                since_sync = 0
            f.write(rec)
            since_sync += len(rec)
            n += 1
    os.replace(tmp, path)
    return n


def read_seqfile_header(buf: bytes) -> tuple[bytes, int]:
    """Validate the header, return (sync marker, payload offset)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not a SequenceFile v6 (bad magic)")
    pos = 4
    kc, pos = _read_text(buf, pos)
    vc, pos = _read_text(buf, pos)
    if kc != KEY_CLASS or vc != VALUE_CLASS:
        raise ValueError(f"unsupported writables: {kc} / {vc}")
    if buf[pos] != 0 or buf[pos + 1] != 0:
        raise ValueError("compressed SequenceFiles not supported")
    pos += 2
    (nmeta,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    for _ in range(nmeta):
        _, pos = _read_text(buf, pos)
        _, pos = _read_text(buf, pos)
    sync = buf[pos : pos + 16]
    return sync, pos + 16


def _block_starts(buf: bytes, sync: bytes, payload0: int) -> list[int]:
    """Offsets where blocks begin: payload0 for the first block, then
    every sync-escape position. Records never straddle a sync."""
    marker = SYNC_ESCAPE + sync
    starts = [payload0]
    p = payload0
    while True:
        hit = buf.find(marker, p)
        if hit == -1:
            return starts
        starts.append(hit)
        p = hit + 1


def iter_seqfile(path: str, start: int | None = None, end: int | None = None):
    """Yield (doc_id, text). With (start, end): the Hadoop split
    convention — a split OWNS a block iff the block's anchor offset
    falls in [start, end), where the first block (whose records
    follow the header) anchors at byte 0 and every later block
    anchors at its sync escape. Any disjoint cover of [0, filesize)
    therefore reads every record exactly once."""
    with open(path, "rb") as f:
        buf = f.read()
    sync, payload0 = read_seqfile_header(buf)
    starts = _block_starts(buf, sync, payload0)
    bounds = starts + [len(buf)]
    for i, bstart in enumerate(starts):
        anchor = 0 if i == 0 else bstart
        if start is not None and not (start <= anchor < end):
            continue
        pos = bstart if i == 0 else bstart + 20  # skip escape + sync
        stop = bounds[i + 1]
        while pos < stop:
            if pos + 8 > stop:
                raise ValueError(f"truncated record header at {pos}")
            rec_len, key_len = struct.unpack_from(">ii", buf, pos)
            if rec_len == -1:
                raise ValueError(f"unexpected sync inside block at {pos}")
            pos += 8
            if key_len != 8:
                raise ValueError(f"unexpected key length {key_len}")
            (doc_id,) = struct.unpack_from(">q", buf, pos)
            tlen, tpos = read_vint(buf, pos + 8)
            text = buf[tpos : tpos + tlen].decode("utf-8")
            pos += rec_len
            yield doc_id, text


def write_seqfile_shards(df, path: str) -> int:
    """One SequenceFile shard per partition of df(doc_id, text);
    returns total rows written. mapInArrow keeps int64 ids exact."""
    os.makedirs(path, exist_ok=True)

    def write(batches):
        import pyarrow as pa

        rows = []
        for batch in batches:
            ids = batch.column(0).to_pylist()
            txts = batch.column(1).to_pylist()
            rows.extend(
                (i, t) for i, t in zip(ids, txts) if i is not None
            )
        if rows:
            shard = os.path.join(
                path, f"part-{uuid.uuid4().hex[:8]}.seq"
            )
            n = write_seqfile(rows, shard)
            yield pa.RecordBatch.from_pydict(
                {"shard": [shard], "n": [n]},
                schema=pa.schema([("shard", pa.string()), ("n", pa.int64())]),
            )

    out = df.mapInArrow(write, "shard string, n long").collect()
    return sum(r["n"] for r in out)


def read_seqfile_spark(spark, path: str, split_bytes: int | None = None):
    """Read a directory of SequenceFile shards as a DataFrame
    (doc_id long, text string). With ``split_bytes``, each file is
    read as MULTIPLE byte-range tasks delimited by sync markers —
    the splittable path a 100 GB file needs (tasks seek, never read
    the whole file into one executor)."""
    import pandas as pd

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".seq")
    )
    tasks = []
    for f in files:
        size = os.path.getsize(f)
        if split_bytes is None:
            tasks.append((f, 0, size))
        else:
            off = 0
            while off < size:
                tasks.append((f, off, min(off + split_bytes, size)))
                off += split_bytes

    def gen(pdfs):
        for pdf in pdfs:
            for f, s, e in zip(pdf["f"], pdf["s"], pdf["e"]):
                rows = list(iter_seqfile(f, int(s), int(e)))
                if rows:
                    yield pd.DataFrame(
                        {
                            "doc_id": pd.Series(
                                [r[0] for r in rows], dtype="int64"
                            ),
                            "text": [r[1] for r in rows],
                        }
                    )

    tdf = spark.createDataFrame(
        tasks, "f string, s long, e long"
    ).repartition(max(len(tasks), 1))
    return tdf.mapInPandas(gen, "doc_id long, text string")


# ---------------------------------------------------------------------------
# MapFile-style indexed point get over a SORTED SequenceFile
# (Hadoop MapFile = sorted data SequenceFile + a sparse key->offset
# index; the index here is a JSON sidecar rather than a second
# SequenceFile — same seek semantics, simpler plumbing)


def write_seqfile_sorted_indexed(
    rows_sorted, dirpath: str, index_every: int = 64,
    sync_interval: int = 2000,
) -> int:
    """Write key-ascending (long, str) rows as ``data.seq`` plus a
    sparse index sampling every ``index_every``-th record's (key,
    absolute byte offset). Raises if keys are not non-decreasing —
    the MapFile contract."""
    os.makedirs(dirpath, exist_ok=True)
    sync = uuid.uuid4().bytes
    data_tmp = os.path.join(dirpath, "data.seq.tmp")
    keys, offsets = [], []
    last = None
    n = 0
    with open(data_tmp, "wb") as f:
        f.write(_header(sync))
        since_sync = 0
        for doc_id, text in rows_sorted:
            if last is not None and doc_id < last:
                raise ValueError(
                    f"keys out of order: {doc_id} after {last}"
                )
            last = doc_id
            if since_sync >= sync_interval:
                f.write(SYNC_ESCAPE + sync)
                since_sync = 0
            if n % index_every == 0:
                keys.append(doc_id)
                offsets.append(f.tell())
            rec = _record(doc_id, text)
            f.write(rec)
            since_sync += len(rec)
            n += 1
    os.replace(data_tmp, os.path.join(dirpath, "data.seq"))
    import json

    idx_tmp = os.path.join(dirpath, "index.json.tmp")
    with open(idx_tmp, "w") as f:
        json.dump({"keys": keys, "offsets": offsets, "n": n}, f)
    os.replace(idx_tmp, os.path.join(dirpath, "index.json"))
    return n


def scan_seqfile_from(buf: bytes, sync: bytes, pos: int):
    """Yield (doc_id, text, next_pos) from an absolute record/sync
    offset onward — the Hadoop reader loop (sync escapes verified and
    skipped inline)."""
    while pos < len(buf):
        if buf[pos : pos + 4] == SYNC_ESCAPE:
            if buf[pos + 4 : pos + 20] != sync:
                raise ValueError(f"sync mismatch at {pos}")
            pos += 20
            continue
        rec_len, key_len = struct.unpack_from(">ii", buf, pos)
        pos += 8
        if key_len != 8:
            raise ValueError(f"unexpected key length {key_len}")
        (doc_id,) = struct.unpack_from(">q", buf, pos)
        tlen, tpos = read_vint(buf, pos + 8)
        text = buf[tpos : tpos + tlen].decode("utf-8")
        pos += rec_len
        yield doc_id, text, pos


def seqfile_get(dirpath: str, key: int):
    """Point get: binary-search the sparse index for the rightmost
    sampled key <= ``key``, seek there, scan forward until found or
    passed (keys sorted). O(log index + index_every) per get."""
    import bisect
    import json

    with open(os.path.join(dirpath, "index.json")) as f:
        idx = json.load(f)
    keys, offsets = idx["keys"], idx["offsets"]
    if not keys or key < keys[0]:
        return None
    i = bisect.bisect_right(keys, key) - 1
    with open(os.path.join(dirpath, "data.seq"), "rb") as f:
        buf = f.read()
    sync, _ = read_seqfile_header(buf)
    for doc_id, text, _pos in scan_seqfile_from(buf, sync, offsets[i]):
        if doc_id == key:
            return text
        if doc_id > key:
            return None
    return None
