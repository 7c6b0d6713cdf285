"""Splittable gzip for monolithic single-member .gz text files.

THE PROBLEM. A classic single-member .gz is the one ingestion shape
that defeats data parallelism: DEFLATE's back-references make every
byte depend on the 32 KB window before it, so a 100 GB shard reads
as ONE task while the rest of the cluster idles. (The WARC path
doesn't have this problem — Common Crawl gzips member-per-record,
and sources/warc.py's offset index already makes that splittable.)

THE OPTIONS, honestly weighed:

* zran-style checkpoint index (zlib/examples/zran.c): record a
  bit-offset + 32 KB window every N MB, then inflate from any
  checkpoint. Needs ``inflatePrime``/``inflateSetDictionary`` at a
  BIT granularity that Python's stdlib ``zlib`` does not expose —
  a C extension the container can't build. Documented, not faked.
* Hadoop's SplittableGzipCodec trick (every task decompresses from
  byte 0, keeps only its slice) parallelizes I/O but the LAST task
  still inflates the whole file — O(splits x bytes) CPU and a
  full-file straggler. Not worth the complexity.
* RESHARD ONCE into concatenated members (what bgzip/BGZF does for
  genomics, block-gzip with an index): one sequential streaming
  pass rewrites the file as back-to-back gzip members of ~span
  uncompressed bytes, each cut at a LINE boundary, and records a
  member offset index. RFC 1952 §2.2 makes multi-member output a
  perfectly valid .gz — every existing consumer still reads it
  whole — while the index turns it into hundreds of independent
  byte-range tasks forever after. One O(bytes) pass amortized over
  every downstream job.

This module implements the third option Spark-first: resharding is
sequential per file (forced by DEFLATE) but PARALLEL ACROSS FILES
(one executor task per file via mapInPandas); reading groups indexed
members into ~split_bytes byte ranges exactly like
sources/warc.py::read_warc_indexed.

Reference parity: the reference treats .gz as opaque bytes
(DefaultCopyFilesMapper.java:141-160 copies, never decodes); this
operator is north-star scope for the 100 TB text-ingestion tier.
"""

from __future__ import annotations

import gzip
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distcpplus_spark.sources.warc import _gzip_member_spans

GZ_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("member_idx", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("n_lines", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
    ]
)

GZ_LINE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("line_idx", T.LongType(), False),
        T.StructField("line", T.StringType(), False),
    ]
)


def _local(p: str) -> str:
    if p.startswith("file://"):
        return p[7:]
    if p.startswith("file:"):
        return p[5:]
    return p


def _reshard_one(src: str, dst: str, span_bytes: int, level: int):
    """Stream-decompress ``src`` (any .gz, single- or multi-member),
    re-emit as concatenated members of ~span_bytes uncompressed each,
    CUT AT LINE BOUNDARIES (a member always decodes to whole lines),
    via tmp+rename (the copy executor's no-partial-file discipline).
    Yields (member_idx, offset, length, n_lines, raw_bytes) as it
    writes — the index is a free byproduct of the pass."""
    tmp = dst + "._tmp_reshard"
    out_off = 0
    idx = 0
    pending = b""   # undecoded-into-lines residue (no trailing \n yet)
    buf: list[bytes] = []   # complete lines accumulated for the member
    buf_bytes = 0
    buf_lines = 0

    def emit(fh_out):
        nonlocal idx, out_off, buf, buf_bytes, buf_lines
        if not buf:
            return None
        blob = b"".join(buf)
        member = gzip.compress(blob, compresslevel=level)
        fh_out.write(member)
        row = (idx, out_off, len(member), buf_lines, len(blob))
        idx += 1
        out_off += len(member)
        buf, buf_bytes, buf_lines = [], 0, 0
        return row

    rows = []
    with open(_local(src), "rb") as fh_in, open(tmp, "wb") as fh_out:
        d = zlib.decompressobj(31)
        while True:
            chunk = fh_in.read(1 << 20)
            if not chunk:
                break
            data = chunk
            # concatenated-member input: restart the inflater on eof
            while data:
                raw = d.decompress(data)
                data = d.unused_data if d.eof else b""
                if d.eof:
                    d = zlib.decompressobj(31)
                if not raw:
                    continue
                pending += raw
                # split into complete lines; keep the residue
                nl = pending.rfind(b"\n")
                if nl < 0:
                    continue
                complete, pending = pending[: nl + 1], pending[nl + 1:]
                for ln in complete.splitlines(keepends=True):
                    buf.append(ln)
                    buf_bytes += len(ln)
                    buf_lines += 1
                    if buf_bytes >= span_bytes:
                        r = emit(fh_out)
                        if r:
                            rows.append(r)
        if pending:  # final line without trailing newline
            buf.append(pending)
            buf_bytes += len(pending)
            buf_lines += 1
        r = emit(fh_out)
        if r:
            rows.append(r)
    os.replace(tmp, dst)
    return rows


def reshard_gzip(
    spark: SparkSession,
    files: list[tuple[str, str]],
    span_bytes: int = 64 << 20,
    level: int = 6,
) -> DataFrame:
    """Reshard monolithic .gz files into indexed multi-member gzip.

    ``files`` is [(src, dst), ...]. Each file is ONE executor task
    (DEFLATE forces sequential decode within a file; the parallelism
    is across files — the same shape as index_warc). Returns the
    member index DataFrame (GZ_INDEX_SCHEMA, path = dst); persist it
    as parquet next to the corpus and reuse it in every downstream
    read (read_gz_indexed_lines). The output is a valid RFC 1952
    multi-member .gz: non-indexed consumers read it unchanged.
    """
    import pandas as pd

    pairs = spark.createDataFrame(files, "src STRING, dst STRING")
    n = len(files)

    def work(batches):
        for pdf in batches:
            out = []
            for src, dst in zip(pdf["src"], pdf["dst"]):
                for (i, off, ln, nl, rb) in _reshard_one(
                    src, dst, span_bytes, level
                ):
                    out.append((dst, i, off, ln, nl, rb))
            yield pd.DataFrame(
                out, columns=[f.name for f in GZ_INDEX_SCHEMA.fields]
            )

    return pairs.repartition(max(1, n)).mapInPandas(work, GZ_INDEX_SCHEMA)


def index_gzip_members(spark: SparkSession, path: str, glob: str = "*.gz") -> DataFrame:
    """(Re)build the member offset index for already-multi-member .gz
    files (bgzip output, WARC-style member framing, or a previous
    reshard whose sidecar was lost): one decompress pass per file,
    parallel across files — index_warc's walk with line counting."""
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
                    spans = list(_gzip_member_spans(fh))
                    for i, (off, ln) in enumerate(spans):
                        fh.seek(off)
                        raw = gzip.decompress(fh.read(ln))
                        nl = raw.count(b"\n")
                        if raw and not raw.endswith(b"\n"):
                            nl += 1
                        rows.append((p, i, off, ln, nl, len(raw)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in GZ_INDEX_SCHEMA.fields]
            )

    return files.mapInPandas(scan, GZ_INDEX_SCHEMA)


def read_gz_indexed_lines(
    spark: SparkSession, index: DataFrame, split_bytes: int = 128 << 20
) -> DataFrame:
    """Distributed line read driven by the member index: contiguous
    members group into ~split_bytes byte-range splits (each range
    decompresses standalone — members are self-contained), one task
    per split. line_idx is GLOBAL per file, computed from the
    index's per-member line counts (a prefix sum over metadata rows
    — no data pass), so downstream order-dependent processing works
    without re-reading."""
    import pandas as pd
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("path")
        .orderBy("member_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    annotated = (
        index.withColumn("_cum", F.sum("length").over(w))
        .withColumn("_line0", F.sum("n_lines").over(w) - F.col("n_lines"))
        .withColumn(
            "_split",
            ((F.col("_cum") - F.col("length")) / F.lit(split_bytes)).cast(
                "long"
            ),
        )
    )
    splits = annotated.groupBy("path", "_split").agg(
        F.min("offset").alias("start"),
        F.max(F.col("offset") + F.col("length")).alias("end"),
        F.min("_line0").alias("line0"),
    )
    n_splits = splits.count()

    def read_split(batches):
        for pdf in batches:
            paths, idxs, lines = [], [], []
            for p, start, end, line0 in zip(
                pdf["path"], pdf["start"], pdf["end"], pdf["line0"]
            ):
                with open(_local(p), "rb") as fh:
                    fh.seek(int(start))
                    blob = fh.read(int(end) - int(start))
                # concatenated members: loop the inflater across eofs
                raw = bytearray()
                d = zlib.decompressobj(31)
                data = bytes(blob)
                while data:
                    raw += d.decompress(data)
                    data = d.unused_data if d.eof else b""
                    if d.eof:
                        d = zlib.decompressobj(31)
                li = int(line0)
                for ln in bytes(raw).splitlines():
                    paths.append(p)
                    idxs.append(li)
                    lines.append(ln.decode("utf-8", "replace"))
                    li += 1
            yield pd.DataFrame(
                {"path": paths, "line_idx": idxs, "line": lines}
            )

    return splits.repartition(max(1, n_splits)).mapInPandas(
        read_split, GZ_LINE_SCHEMA
    )
