"""Splittable LZ4-frame source/sink in pure Python.

LZ4 is the modern cluster compression default (Spark's own shuffle
and parquet codecs), and — unlike single-member gzip — the FRAME
format (lz4.github.io/lz4/lz4_Frame_format.html, spec v1.6.x) was
DESIGNED for this engine's favorite trick: with the
block-independence flag set, every block decompresses alone, so a
100 GB .lz4 shard becomes thousands of byte-range tasks after one
cheap header-hop pass that records (offset, size) per block — the
same manifest move as sources/warc.py and gzsplit.py, but with no
reshard pass needed when the writer already set the flag (lz4 CLI
``-B4 --block-independence`` output qualifies).

Everything here derives from the two public specs:

* LZ4 block format (lz4_Block_format.md): a sequence stream of
  [token: hi=literal len, lo=match len-4][literal len extension
  0xFF*][literals][offset: 2 bytes LE, 1-based back ref][match len
  extension 0xFF*]; the last sequence is literals-only; a match
  never starts within the final 12 bytes, the final 5 bytes are
  literals (end-of-block rules §"End of block restrictions").
* LZ4 frame format: magic 0x184D2204 (LE), FLG/BD descriptor with
  xxh32-derived header-checksum byte, data blocks as [u32 LE size,
  high bit = stored/uncompressed][payload][optional u32 block
  checksum], 0x00000000 EndMark, optional u32 content checksum.

xxh32 is implemented from the public xxHash spec (seeded 4-lane
rotate-multiply over 16-byte stripes + avalanche); the frame needs
it for the mandatory header-checksum byte and optional block/content
checksums.

Scale shape: writing shards executor-side via mapInArrow (one frame
per partition, line-aligned blocks); reading plans one header-hop
per FILE (driver or executor, O(#blocks) each), then groups blocks
into ~split_bytes tasks. Line reassembly across task boundaries uses
the TextInputFormat convention: a task drops its leading partial
line (unless it owns byte 0) and reads forward into the next block
to finish its trailing line — correct for ANY independent-block
.lz4, not just this writer's line-aligned output.

Reference parity: the reference copies .lz4 as opaque bytes
(DefaultCopyFilesMapper.java:141-160); this is north-star scope for
the 100 TB ingestion tier beside gzsplit.py (RFC 1952 reshard) and
bz2split.py (bit-aligned block scan).
"""

from __future__ import annotations

import os
import struct
import uuid

from pyspark.sql import types as T

MAGIC = 0x184D2204
_TAIL_CAP = 4 << 20  # carried tail window for cross-seam line completion
_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 from the public spec (github.com/Cyan4973/xxHash,
    doc/xxhash_spec.md). Pinned by the published sanity vectors in
    tests (xxh32(b'') == 0x02CC5D05 etc.)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while pos <= limit:
            for_v = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl32((v1 + for_v[0] * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + for_v[1] * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + for_v[2] * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + for_v[3] * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        acc = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
            + _rotl32(v4, 18)
        ) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl32((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl32((acc + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# --- block codec -----------------------------------------------------------


def decompress_block(src: bytes, max_size: int | None = None) -> bytes:
    """LZ4 block decode per the public block-format spec. Corrupt or
    truncated input raises ValueError uniformly (the module's
    corrupt-input contract) — never IndexError/struct.error."""
    out = bytearray()
    pos = 0
    n = len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated block (literal length)")
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if lit:
            if pos + lit > n:
                raise ValueError("literal run past end of block")
            out += src[pos : pos + lit]
            pos += lit
        if pos >= n:
            break  # last sequence is literals-only
        if pos + 2 > n:
            raise ValueError("truncated block (match offset)")
        (offset,) = struct.unpack_from("<H", src, pos)
        pos += 2
        if offset == 0:
            raise ValueError("zero match offset is invalid")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated block (match length)")
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("match offset beyond output start")
        # overlapping copy is byte-at-a-time by spec semantics
        for i in range(mlen):
            out.append(out[start + i])
        if max_size is not None and len(out) > max_size:
            raise ValueError("decompressed size exceeds declared max")
    return bytes(out)


def compress_block(src: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder: correct per the spec's
    end-of-block rules (final 5 bytes literal, no match into the
    last 12), not ratio-tuned. Used by the shard writer; any real
    lz4 encoder's output is equally readable."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"  # single empty-literal token

    def emit(lit_start: int, lit_end: int, offset: int, mlen: int) -> None:
        lit = lit_end - lit_start
        ml = mlen - 4 if mlen else 0
        token = (min(lit, 15) << 4) | (min(ml, 15) if mlen else 0)
        out.append(token)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start:lit_end])
        if mlen:
            out.extend(struct.pack("<H", offset))
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    # spec: matches may not start in the final 12 bytes
    match_limit = n - 12
    while pos <= match_limit and pos + 4 <= n:
        key = src[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 65535 and cand + 4 <= n:
            # extend the match, stopping 5 bytes before the end
            # (last 5 bytes must be literals)
            mlen = 4
            max_ext = n - 5 - pos
            while (
                mlen < max_ext
                and src[cand + mlen] == src[pos + mlen]
            ):
                mlen += 1
            if mlen >= 4:
                emit(anchor, pos, pos - cand, mlen)
                pos += mlen
                anchor = pos
                continue
        pos += 1
    emit(anchor, n, 0, 0)  # trailing literals-only sequence
    return bytes(out)


# --- frame format ----------------------------------------------------------


# BD block-max codes per the frame spec: 4=64 KiB, 5=256 KiB,
# 6=1 MiB, 7=4 MiB. Conformant decoders REJECT frames whose
# uncompressed blocks exceed the declared max, so the writer must
# both declare a code covering block_bytes and hard-split any
# oversized buffer (a single line longer than block_bytes).
_BD_MAX = {4: 64 << 10, 5: 256 << 10, 6: 1 << 20, 7: 4 << 20}


def _bd_code_for(block_bytes: int) -> int:
    for code in (4, 5, 6, 7):
        if block_bytes <= _BD_MAX[code]:
            return code
    raise ValueError(
        f"block_bytes {block_bytes} exceeds the LZ4 frame spec's "
        "4 MiB block maximum (BD code 7)"
    )


def _frame_header(block_max_code: int = 4) -> bytes:
    # FLG: version=01, block independence=1, no checksums/size/dict
    flg = 0x60
    bd = (block_max_code & 0x07) << 4
    hc = (xxh32(bytes([flg, bd])) >> 8) & 0xFF
    return struct.pack("<I", MAGIC) + bytes([flg, bd, hc])


def write_lz4_lines(
    lines, path: str, block_bytes: int = 65536
) -> int:
    """Write an iterable of str lines as one independent-block .lz4
    frame, blocks cut at line boundaries (the bgzf move — any lz4
    consumer reads the file whole; this reader splits it). The BD
    byte declares the smallest spec code covering block_bytes, and a
    buffered line longer than that max is hard-split across blocks
    (this module's reader reassembles straddling lines by design, and
    external decoders never see an over-max block). Atomic
    tmp+rename; returns lines written."""
    bd_code = _bd_code_for(block_bytes)
    bd_max = _BD_MAX[bd_code]
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "wb") as f:
        f.write(_frame_header(bd_code))
        buf = bytearray()

        def emit_block(chunk: bytes) -> None:
            comp = compress_block(chunk)
            if len(comp) < len(chunk):
                f.write(struct.pack("<I", len(comp)) + comp)
            else:  # incompressible: stored block, high bit set
                f.write(struct.pack("<I", 0x80000000 | len(chunk)) + chunk)

        def flush():
            while len(buf) > bd_max:  # oversized single line: split
                emit_block(bytes(buf[:bd_max]))
                del buf[:bd_max]
            if buf:
                emit_block(bytes(buf))
                buf.clear()

        for line in lines:
            data = (line + "\n").encode("utf-8")
            if buf and len(buf) + len(data) > block_bytes:
                flush()
            buf += data
            n += 1
        flush()
        f.write(struct.pack("<I", 0))  # EndMark
    os.replace(tmp, path)
    return n


def read_frame_header(f) -> tuple[int, bool, bool]:
    """Validate magic + descriptor; returns (offset of first block,
    block-checksums?, content-checksum?). Requires the
    block-independence flag (a dependent-block frame is NOT
    splittable — explicit error, never silent-wrong)."""
    magic = f.read(4)
    if len(magic) < 4 or struct.unpack("<I", magic)[0] != MAGIC:
        raise ValueError("not an LZ4 frame (bad magic)")
    desc = f.read(2)  # FLG + BD
    flg, bd = desc[0], desc[1]
    if (flg >> 6) != 0b01:
        raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
    if not (flg & 0x20):
        raise ValueError(
            "dependent-block LZ4 frame: not splittable (re-write with "
            "block independence, e.g. lz4 -BI or this module's writer)"
        )
    if flg & 0x01:
        raise ValueError("dictionary frames not supported")
    if flg & 0x08:  # content size: 8 more descriptor bytes
        desc += f.read(8)
    hc_byte = f.read(1)[0]
    want = (xxh32(desc) >> 8) & 0xFF
    if hc_byte != want:
        raise ValueError("LZ4 frame header checksum mismatch")
    first_block = 4 + len(desc) + 1
    return first_block, bool(flg & 0x10), bool(flg & 0x04)


def index_blocks(path: str) -> list[tuple[int, int, bool]]:
    """One header-hop pass: (payload offset, payload size, stored?)
    per block. O(#blocks) seeks, reads only the 4-byte size words —
    the cheap planning pass that makes the file splittable."""
    out = []
    with open(path, "rb") as f:
        data_off, block_cksum, _content_cksum = read_frame_header(f)
        f.seek(data_off)
        while True:
            word = f.read(4)
            if len(word) < 4:
                raise ValueError("truncated frame (no EndMark)")
            (sz,) = struct.unpack("<I", word)
            if sz == 0:
                break
            stored = bool(sz & 0x80000000)
            sz &= 0x7FFFFFFF
            out.append((f.tell(), sz, stored))
            f.seek(sz + (4 if block_cksum else 0), os.SEEK_CUR)
    return out


def _read_block(f, off: int, size: int, stored: bool) -> bytes:
    f.seek(off)
    payload = f.read(size)
    if len(payload) < size:
        raise ValueError("truncated block")
    return payload if stored else decompress_block(payload)


def read_lz4_lines_spark(spark, path: str, split_bytes: int | None = None):
    """DataFrame (line_idx long, line string) over a directory of
    .lz4 files (or one file). Each file's blocks are grouped into
    ~split_bytes byte-range tasks; line reassembly across TASK
    boundaries follows the TextInputFormat convention (drop leading
    partial line unless the task owns the file's first block; read
    forward into the next block to complete the trailing line), so
    any disjoint cover of the block list yields every line exactly
    once. line_idx is globally dense via prefix-summed per-task
    counts (two tiny driver passes over the task list, not the
    data)."""
    import pandas as pd

    files = (
        sorted(
            os.path.join(path, x)
            for x in os.listdir(path)
            if x.endswith(".lz4")
        )
        if os.path.isdir(path)
        else [path]
    )

    # planning pass runs IN EXECUTORS (one task per file): the block
    # index requires walking the size-word chain from the header, and
    # a 10k-file corpus must not funnel that I/O through the driver.
    # Each emitted group carries its own blocks plus a tail window of
    # following blocks (up to _TAIL_CAP compressed bytes) for the
    # cross-seam line completion; a single line spanning more than
    # the cap is an explicit error, never a silent truncation.
    def plan(pdfs):
        for pdf in pdfs:
            for fp in pdf["f"]:
                blocks = index_blocks(fp)
                if not blocks:
                    continue
                if split_bytes is None:
                    groups = [(0, len(blocks))]
                else:
                    groups = []
                    start = acc = 0
                    for i, (_off, sz, _st) in enumerate(blocks):
                        acc += sz
                        if acc >= split_bytes and i + 1 > start:
                            groups.append((start, i + 1 - start))
                            start, acc = i + 1, 0
                    if start < len(blocks):
                        groups.append((start, len(blocks) - start))
                rows = []
                for g_start, g_n in groups:
                    tail = []
                    acc = 0
                    rest = blocks[g_start + g_n :]
                    for b in rest:
                        tail.append(b)
                        acc += b[1]
                        if acc >= _TAIL_CAP:
                            break
                    truncated = len(tail) < len(rest)
                    carry = blocks[g_start : g_start + g_n] + tail
                    rows.append(
                        (
                            fp,
                            g_start,
                            g_n,
                            ";".join(
                                f"{o},{s},{int(st)}" for o, s, st in carry
                            ),
                            truncated,
                        )
                    )
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "f", "g_start", "g_n", "blocks", "tail_cut"
                        ],
                    )

    fdf = spark.createDataFrame(
        [(f,) for f in files], "f string"
    ).repartition(max(len(files), 1))
    schema = (
        "f string, g_start long, g_n long, blocks string, tail_cut boolean"
    )
    tasks = [
        (r["f"], r["g_start"], r["g_n"], r["blocks"], r["tail_cut"])
        for r in fdf.mapInPandas(plan, schema).collect()
    ]

    def gen(pdfs):
        for pdf in pdfs:
            for fp, g_start, g_n, blocks_s, tail_cut in zip(
                pdf["f"], pdf["g_start"], pdf["g_n"], pdf["blocks"],
                pdf["tail_cut"],
            ):
                # carried list = this group's blocks + tail window
                # (RELATIVE indices: own = [0, g_n), tail after)
                blocks = [
                    (int(a), int(b), bool(int(c)))
                    for a, b, c in (
                        x.split(",") for x in blocks_s.split(";")
                    )
                ]
                g_start = int(g_start)
                g_n = int(g_n)
                with open(fp, "rb") as f:
                    chunks = [
                        _read_block(f, *blocks[i]) for i in range(g_n)
                    ]
                    data = b"".join(chunks)
                    # Hadoop LineRecordReader convention with an
                    # INCLUSIVE end: a non-first task drops through
                    # its first newline (that prefix — partial line
                    # OR the full line starting exactly at the
                    # boundary — belongs upstream), and every
                    # non-last task ALWAYS reads forward through the
                    # next newline (completing a straddling line, or
                    # claiming the line that starts exactly at its
                    # end). Together: every line owned exactly once
                    # for ANY disjoint block cover.
                    owns_tail = True
                    if g_start > 0:
                        nl = data.find(b"\n")
                        if nl < 0:
                            # whole range is the middle of one line
                            # owned upstream: yield nothing, claim
                            # nothing forward
                            data = b""
                            owns_tail = False
                        else:
                            data = data[nl + 1 :]
                    if owns_tail:
                        j = g_n
                        found = False
                        while j < len(blocks):
                            nxt = _read_block(f, *blocks[j])
                            nl = nxt.find(b"\n")
                            if nl >= 0:
                                data += nxt[: nl + 1]
                                found = True
                                break
                            data += nxt
                            j += 1
                        if not found and tail_cut:
                            raise ValueError(
                                "line spans beyond the carried tail "
                                f"window ({_TAIL_CAP} compressed "
                                "bytes) — raise _TAIL_CAP or fix the "
                                "producer"
                            )
                lines = data.decode("utf-8").split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                if lines:
                    yield pd.DataFrame({"line": lines})

    tdf = spark.createDataFrame(tasks, schema).repartition(
        max(len(tasks), 1)
    )
    lines = tdf.mapInPandas(gen, "line string")
    # dense global line_idx: per-task counts are tiny (one row per
    # task), so the prefix sum is a driver-side fold over the task
    # list, never over the data
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # zipWithIndex via monotonically_increasing_id would not be
    # dense; instead re-number with a per-partition rank + offset.
    # persist BEFORE the counts pass: without it the
    # decompress/reassembly job runs TWICE (2x the I/O on a 100 GB
    # corpus) and the pid->offset map would hinge on round-robin
    # repartition assigning identical partition ids across two
    # separate jobs — cached partitions make the ids and intra-
    # partition order fixed by construction.
    from pyspark import StorageLevel

    with_pid = lines.withColumn("_pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = (
        with_pid.groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    omap = F.create_map(
        *[
            x
            for pid, off in offsets.items()
            for x in (F.lit(pid), F.lit(off))
        ]
    ) if offsets else F.create_map()
    w = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    return (
        with_pid.withColumn("_r", F.row_number().over(w) - 1)
        .withColumn("line_idx", (omap[F.col("_pid")] + F.col("_r")).cast("long"))
        .select("line_idx", "line")
    )


def write_lz4_shards(df, path: str, block_bytes: int = 65536) -> int:
    """One .lz4 frame per partition of df(line string); executor-side
    via mapInArrow, tmp+rename per shard. Returns total lines."""
    os.makedirs(path, exist_ok=True)

    def write(batches):
        import pyarrow as pa

        rows = []
        for batch in batches:
            rows.extend(
                v for v in batch.column(0).to_pylist() if v is not None
            )
        if rows:
            shard = os.path.join(path, f"part-{uuid.uuid4().hex[:8]}.lz4")
            n = write_lz4_lines(rows, shard, block_bytes)
            yield pa.RecordBatch.from_pydict(
                {"shard": [shard], "n": [n]},
                schema=pa.schema(
                    [("shard", pa.string()), ("n", pa.int64())]
                ),
            )

    out = df.mapInArrow(write, "shard string, n long").collect()
    return sum(r["n"] for r in out)
