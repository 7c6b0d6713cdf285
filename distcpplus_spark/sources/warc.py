"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl
ingestion format every web-scale training-data pipeline starts
from.

Implements the public WARC/1.0-1.1 format: records of
``WARC/1.x\\r\\n`` + header lines + ``\\r\\n`` + Content-Length
payload + ``\\r\\n\\r\\n``, both as a plain concatenation and as the
standard gzip member-per-record framing Common Crawl ships
(each record its own gzip stream, concatenated — readable by a
plain gzip decompressor that keeps consuming members). ``response``
records additionally split the HTTP header block from the body.

Scale shape: WARC files are processed ONE PER TASK via Spark's
binaryFile source + mapInPandas — a 1 GiB .warc.gz is one task's
stream work, the standard Common Crawl processing unit (the corpus
is millions of such files, so file-level parallelism saturates any
cluster without needing splittable decompression). Parsed records
come out as ordinary rows; everything downstream (langid, quality,
dedup) is the existing pipeline.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _split_records(raw: bytes):
    """Yield (headers_dict, payload_bytes) for each WARC record in a
    decompressed stream."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            break
        if not raw[pos : pos + 5] == b"WARC/":
            # tolerate trailing junk: scan to the next record marker
            nxt = raw.find(b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = raw[pos:hdr_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        headers = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        body_start = hdr_end + 4
        payload = raw[body_start : body_start + clen]
        yield headers, payload
        pos = body_start + clen


def parse_warc_bytes(content: bytes):
    """Parse one WARC file (plain or gzip member-per-record) into
    row tuples matching WARC_RECORD_SCHEMA."""
    import gzip

    if content[:2] == b"\x1f\x8b":
        # concatenated gzip members: GzipFile reads them all
        raw = gzip.GzipFile(fileobj=io.BytesIO(content)).read()
    else:
        raw = content
    rows = []
    for headers, payload in _split_records(raw):
        status = None
        body = payload
        if headers.get("warc-type") == "response" and payload[:5] == b"HTTP/":
            split = payload.find(b"\r\n\r\n")
            if split >= 0:
                http_head = payload[:split].decode("utf-8", "replace")
                body = payload[split + 4 :]
                first = http_head.split("\r\n", 1)[0].split()
                if len(first) >= 2 and first[1].isdigit():
                    status = int(first[1])
        rows.append(
            (
                headers.get("warc-type"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("warc-record-id"),
                headers.get("content-type"),
                status,
                body,
            )
        )
    return rows


def read_warc(spark, path: str) -> DataFrame:
    """Distributed WARC ingestion: binaryFile scan (one file per
    row/task) → mapInPandas record explosion."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def explode(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                if content is None:
                    continue
                rows.extend(parse_warc_bytes(bytes(content)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return files.select("content").mapInPandas(explode, WARC_RECORD_SCHEMA)


def build_warc(records, gzip_members: bool = True) -> bytes:
    """Assemble a WARC file from (warc_type, uri, date, record_id,
    content_type, payload_bytes) tuples — the writer half, used for
    fixtures and for re-sharding corpora. With ``gzip_members`` each
    record is its own gzip member (the Common Crawl layout)."""
    import gzip

    out = bytearray()
    for wtype, uri, date, rid, ctype, payload in records:
        head = [f"WARC/1.0", f"WARC-Type: {wtype}"]
        if uri:
            head.append(f"WARC-Target-URI: {uri}")
        if date:
            head.append(f"WARC-Date: {date}")
        if rid:
            head.append(f"WARC-Record-ID: {rid}")
        if ctype:
            head.append(f"Content-Type: {ctype}")
        head.append(f"Content-Length: {len(payload)}")
        rec = (
            "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


WARC_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("member_idx", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
    ]
)


def _gzip_member_spans(stream):
    """Yield (offset, length) of each gzip member in a concatenated-
    member stream (the Common Crawl layout) by streaming it through
    zlib and watching for member end — one decompress pass, constant
    memory, no payload retained."""
    import zlib

    buf = b""
    abs_pos = 0  # absolute file offset of buf[0]
    member_start = 0
    d = zlib.decompressobj(31)
    while True:
        if not buf:
            chunk = stream.read(1 << 20)
            if not chunk:
                break
            buf = chunk
        d.decompress(buf)
        if d.eof:
            rem = d.unused_data
            abs_pos += len(buf) - len(rem)
            yield member_start, abs_pos - member_start
            member_start = abs_pos
            buf = rem
            d = zlib.decompressobj(31)
        else:
            abs_pos += len(buf)
            buf = b""


def _plain_record_spans(raw: bytes):
    """Yield (offset, length) of each record in an UNCOMPRESSED WARC
    byte stream, walking Content-Length headers (never guessing at
    'WARC/' markers, which can occur inside payloads)."""
    pos = 0
    n = len(raw)
    while pos < n:
        start = pos
        while pos < n and raw[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n or raw[pos : pos + 5] != b"WARC/":
            break
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        clen = 0
        for line in raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n"):
            if ":" in line:
                k, v = line.split(":", 1)
                if k.strip().lower() == "content-length":
                    try:
                        clen = int(v.strip())
                    except ValueError:
                        clen = 0
        end = min(hdr_end + 4 + clen + 4, n)  # trailing \r\n\r\n
        yield start, end - start
        pos = end


def index_warc(spark, path: str, glob: str = "*.warc*") -> DataFrame:
    """Build the record/member OFFSET INDEX that makes .warc.gz
    splittable — the cdx-style move: gzip member-per-record framing
    means any whole-member byte range decompresses standalone, so
    once per corpus a one-task-per-file pass records every member's
    (offset, length); afterwards a single 100 GB shard is readable
    by hundreds of range tasks (read_warc_indexed) instead of one.

    One decompress pass per file, constant memory, index rows are
    metadata (~32 bytes/record). Persist the result as parquet next
    to the corpus and reuse it across every downstream job."""
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
                local = p[7:] if p.startswith("file://") else (
                    p[5:] if p.startswith("file:") else p
                )
                with open(local, "rb") as fh:
                    magic = fh.read(2)
                    fh.seek(0)
                    if magic == b"\x1f\x8b":
                        spans = _gzip_member_spans(fh)
                        for i, (off, ln) in enumerate(spans):
                            rows.append((p, i, off, ln))
                    else:
                        raw = fh.read()
                        for i, (off, ln) in enumerate(
                            _plain_record_spans(raw)
                        ):
                            rows.append((p, i, off, ln))
            yield pd.DataFrame(
                rows, columns=["path", "member_idx", "offset", "length"]
            )

    return files.mapInPandas(scan, WARC_INDEX_SCHEMA)


def read_warc_indexed(
    spark, index: DataFrame, split_bytes: int = 128 << 20
) -> DataFrame:
    """Distributed WARC read driven by the offset index: members
    group into ~split_bytes byte-range SPLITS (contiguous whole
    members, so each range decompresses standalone), one task per
    split — the splittable path that turns a handful of huge
    .warc.gz shards into cluster-wide parallelism, where the
    file-per-task read_warc would leave all but a few executors
    idle.

    Split assignment is a per-file running sum of member lengths
    (window partitioned BY FILE — parallel across files; index rows
    are metadata, so even a 100 GB shard's ~100k members are one
    light task). Each split task seeks, reads its range, and parses
    with the same record splitter as read_warc."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    w = W.partitionBy("path").orderBy("member_idx").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    splits = (
        index.withColumn("_cum", F.sum("length").over(w))
        .withColumn(
            "_split",
            ((F.col("_cum") - F.col("length")) / F.lit(split_bytes)).cast(
                "long"
            ),
        )
        .groupBy("path", "_split")
        .agg(
            F.min("offset").alias("start"),
            F.max(F.col("offset") + F.col("length")).alias("end"),
        )
    )
    n_splits = splits.count()

    def read_split(batches):
        for pdf in batches:
            rows = []
            for p, start, end in zip(pdf["path"], pdf["start"], pdf["end"]):
                local = p[7:] if p.startswith("file://") else (
                    p[5:] if p.startswith("file:") else p
                )
                with open(local, "rb") as fh:
                    fh.seek(int(start))
                    blob = fh.read(int(end) - int(start))
                rows.extend(parse_warc_bytes(blob))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return (
        splits.repartition(max(1, n_splits))
        .mapInPandas(read_split, WARC_RECORD_SCHEMA)
    )


WARC_INDEX_META_SCHEMA = T.StructType(
    WARC_INDEX_SCHEMA.fields
    + [
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("payload_digest", T.StringType(), True),
    ]
)


def _member_meta(raw: bytes):
    """(warc_type, target_uri, sha1-of-payload) from ONE decompressed
    record — the fields a CDX line carries."""
    import hashlib

    recs = list(_split_records(raw))
    if not recs:
        return None, None, None
    headers, payload = recs[0]
    return (
        headers.get("warc-type"),
        headers.get("warc-target-uri"),
        hashlib.sha1(payload).hexdigest(),
    )


def index_warc_with_meta(spark, path: str, glob: str = "*.warc*") -> DataFrame:
    """Offset index enriched with per-record metadata (type, URI,
    payload sha1) — the information a CDX(J) capture index carries.
    Same one-decompress-pass cost as :func:`index_warc`: the member
    bytes are in hand at boundary time anyway; parsing the header
    block is noise next to the inflate."""
    import gzip
    import io as _io

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
                local = p[7:] if p.startswith("file://") else (
                    p[5:] if p.startswith("file:") else p
                )
                with open(local, "rb") as fh:
                    magic = fh.read(2)
                    fh.seek(0)
                    if magic == b"\x1f\x8b":
                        data = fh.read()
                        for i, (off, ln) in enumerate(
                            _gzip_member_spans(_io.BytesIO(data))
                        ):
                            raw = gzip.decompress(data[off : off + ln])
                            wt, uri, dig = _member_meta(raw)
                            rows.append((p, i, off, ln, wt, uri, dig))
                    else:
                        raw = fh.read()
                        for i, (off, ln) in enumerate(
                            _plain_record_spans(raw)
                        ):
                            wt, uri, dig = _member_meta(raw[off : off + ln])
                            rows.append((p, i, off, ln, wt, uri, dig))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in WARC_INDEX_META_SCHEMA.fields],
            )

    return files.mapInPandas(scan, WARC_INDEX_META_SCHEMA)


def _surt_key(uri: str) -> str:
    """SURT-style canonical sort key (org,example)/path — the
    host-reversed form CDX indexes sort by so one domain's captures
    are contiguous."""
    from urllib.parse import urlsplit

    parts = urlsplit(uri)
    host = ",".join(reversed((parts.hostname or "").split(".")))
    path = parts.path or "/"
    q = f"?{parts.query}" if parts.query else ""
    return f"{host}){path}{q}".lower()


def write_cdxj(index_meta: DataFrame, out_path: str) -> int:
    """Emit a CDXJ-style capture index (one JSON record per line,
    keyed by SURT URL, sorted) from :func:`index_warc_with_meta`
    rows — the interop format Common Crawl / pywb tooling consumes,
    restricted to response records. Returns the line count.

    The sort is a range exchange on the SURT key at scale; the
    single-file write here is the fixture-sized tail (shard it by
    key range for a real corpus)."""
    import json
    import os

    from pyspark.sql import functions as F

    rows = (
        index_meta.filter(F.col("warc_type") == "response")
        .select("target_uri", "path", "offset", "length", "payload_digest")
        .collect()
    )
    lines = []
    for r in rows:
        key = _surt_key(r["target_uri"] or "")
        body = json.dumps(
            {
                "url": r["target_uri"],
                "filename": os.path.basename(r["path"]),
                "offset": str(int(r["offset"])),
                "length": str(int(r["length"])),
                "digest": f"sha1:{r['payload_digest']}",
            },
            sort_keys=True,
        )
        lines.append(f"{key} {body}")
    lines.sort()
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
    os.replace(tmp, out_path)
    return len(lines)
