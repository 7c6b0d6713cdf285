"""Spark 4 Python DataSource API integration: the engine's custom
formats exposed as first-class ``spark.read.format(...)`` sources.

Why this exists beside the function-style readers (read_warc,
read_avro_py): the DataSource API is the Spark-4-native extension
point — once registered, a custom format composes with everything
that expects a reader path (SQL `CREATE TABLE ... USING`, options,
schema negotiation) and the planner sees honest per-partition
splits. Each InputPartition carries (file, offset, length), so a
gzip-member WARC shard indexed by sources/warc.py reads as MANY
partitions — the splittable path — while unindexed files fall back
to one partition per file.

Partition planning runs on the driver over file METADATA only;
record parsing happens in the executors' ``read()``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from distcpplus_spark.sources.warc import (
    WARC_RECORD_SCHEMA,
    parse_warc_bytes,
)


class WarcInputPartition(InputPartition):
    def __init__(self, path: str, offset: int, length: int):
        self.path = path
        self.offset = offset
        self.length = length


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path")
        self.split_bytes = int(options.get("split_bytes", 0) or 0)

    def partitions(self):
        import glob as _glob

        root = self.path
        files = (
            sorted(_glob.glob(os.path.join(root, "*.warc*")))
            if os.path.isdir(root)
            else [root]
        )
        parts: list[WarcInputPartition] = []
        for f in files:
            size = os.path.getsize(f)
            if self.split_bytes > 0:
                # whole-member byte-range splits via the offset
                # index — a single huge shard fans out
                from distcpplus_spark.sources.warc import (
                    _gzip_member_spans,
                    _plain_record_spans,
                )

                with open(f, "rb") as fh:
                    magic = fh.read(2)
                    fh.seek(0)
                    if magic == b"\x1f\x8b":
                        spans = list(_gzip_member_spans(fh))
                    else:
                        spans = list(_plain_record_spans(fh.read()))
                start = None
                end = 0
                for off, ln in spans:
                    if start is None:
                        start = off
                    end = off + ln
                    if end - start >= self.split_bytes:
                        parts.append(
                            WarcInputPartition(f, start, end - start)
                        )
                        start = None
                if start is not None:
                    parts.append(WarcInputPartition(f, start, end - start))
            else:
                parts.append(WarcInputPartition(f, 0, size))
        return parts

    def read(self, partition: WarcInputPartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            fh.seek(partition.offset)
            blob = fh.read(partition.length)
        for row in parse_warc_bytes(blob):
            yield row


class WarcWriterCommit(WriterCommitMessage):
    def __init__(self, tmp: str, final: str, n: int):
        self.tmp = tmp
        self.final = final
        self.n = n


class WarcDataSourceWriter(DataSourceWriter):
    """One ``part-*.warc.gz`` per partition (gzip member-per-record,
    the Common Crawl layout), via the engine's builder. Executors
    write to dot-prefixed tmp names; commit renames them in on the
    driver and abort removes them — the two-phase protocol every
    Spark sink follows, expressed in the Python writer API."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires a path")
        self.overwrite = overwrite

    def write(self, rows) -> WarcWriterCommit:
        import uuid

        from pyspark import TaskContext

        from distcpplus_spark.sources.warc import build_warc

        pid = TaskContext.get().partitionId()
        recs = [
            (
                r["warc_type"],
                r["target_uri"],
                r["warc_date"],
                r["record_id"],
                r["content_type"],
                bytes(r["payload"]) if r["payload"] is not None else b"",
            )
            for r in rows
        ]
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.warc.gz"
        )
        tmp = os.path.join(self.path, "." + os.path.basename(final) + ".tmp")
        with open(tmp, "wb") as fh:
            fh.write(build_warc(recs))
        return WarcWriterCommit(tmp, final, len(recs))

    def commit(self, messages) -> None:
        for m in messages:
            if m is not None:
                os.replace(m.tmp, m.final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` / ``df.write.format("warc")`` —
    register once per session via :func:`register_python_sources`."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_RECORD_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return WarcDataSourceReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return WarcDataSourceWriter(self.options, overwrite)


def register_python_sources(spark) -> None:
    """Idempotently register the engine's Python data sources on a
    session (re-registration replaces, so repeat calls are safe)."""
    spark.dataSource.register(WarcDataSource)
    spark.dataSource.register(WarcStreamDataSource)
    spark.dataSource.register(TfrecordDataSource)
    spark.dataSource.register(Lz4TextDataSource)


class WarcStreamReader:
    """Streaming half of the warc source (Spark 4
    SimpleDataSourceStreamReader): micro-batches are NEW FILES — the
    offset is the sorted list of fully-ingested file names, so a
    directory that web crawlers keep appending shards to tails as a
    stream. Files are assumed immutable once written (the WARC
    convention: writers stage elsewhere and rename in), replays of a
    committed range re-read the same frozen name list —
    deterministic re-execution, the property exactly-once sinks
    need."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream requires a path")

    def _list(self) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(os.path.join(self.path, "*.warc*")))

    def initialOffset(self) -> dict:
        return {"files": []}

    def read(self, start: dict):
        seen = set(start.get("files", []))
        now = self._list()
        new = [f for f in now if f not in seen]
        end = {"files": sorted(seen | set(new))}
        return self._rows(new), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        target = set(end.get("files", []))
        return self._rows(sorted(target - seen))

    def commit(self, end: dict) -> None:
        pass  # offsets are self-contained; nothing to GC

    @staticmethod
    def _rows(files: list[str]) -> list[tuple]:
        # a LIST, not a generator: the simple stream reader prefetches
        # and pickles the batch's rows into the offset log
        out: list[tuple] = []
        for f in files:
            with open(f, "rb") as fh:
                blob = fh.read()
            out.extend(parse_warc_bytes(blob))
        return out


class WarcStreamDataSource(DataSource):
    """``spark.readStream.format("warc_stream")``."""

    @classmethod
    def name(cls) -> str:
        return "warc_stream"

    def schema(self):
        return WARC_RECORD_SCHEMA

    def simpleStreamReader(self, schema):
        return WarcStreamReader(self.options)


class TfrecordInputPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TfrecordDataSourceReader(DataSourceReader):
    """One partition per shard — TFRecord frames are not seekable
    without an index (lengths live inline), so the shard is the
    split unit, same as every TF input pipeline treats it. Schema is
    caller-declared via the ``schema`` option (a DDL string naming
    the Example features wanted)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tfrecord source requires a path")
        ddl = options.get(
            "columns", "doc_id bigint, text string, lang string"
        )
        # the DataSource python worker has no active session, so the
        # flat `name type, ...` DDL is split by hand (nested types
        # aren't representable in a tf.train.Example anyway)
        fields = [f.strip().split() for f in ddl.split(",")]
        self.names = [f[0] for f in fields]
        self.kinds = [f[1].lower() for f in fields]

    def partitions(self):
        files = (
            sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".tfrecord")
            )
            if os.path.isdir(self.path)
            else [self.path]
        )
        return [TfrecordInputPartition(f) for f in files]

    def read(self, partition: TfrecordInputPartition) -> Iterator[tuple]:
        from distcpplus_spark.sources.tfrecord import (
            decode_example,
            iter_records,
        )

        names, kinds = self.names, self.kinds
        for payload in iter_records(partition.path):
            ex = decode_example(payload)
            row = []
            for name, kind in zip(names, kinds):
                v = ex.get(name)
                if kind == "string" and isinstance(v, bytes):
                    v = v.decode("utf-8")
                elif kind in ("bigint", "int") and isinstance(v, list):
                    v = v[0]
                elif kind in ("double", "float") and isinstance(v, list):
                    v = float(v[0])
                row.append(v)
            yield tuple(row)


class TfrecordDataSource(DataSource):
    """``spark.read.format("tfrecord")`` over the engine's own
    CRC-verified reader (sources/tfrecord.py)."""

    @classmethod
    def name(cls) -> str:
        return "tfrecord"

    def schema(self):
        return self.options.get(
            "columns", "doc_id bigint, text string, lang string"
        )

    def reader(self, schema) -> DataSourceReader:
        return TfrecordDataSourceReader(self.options)


class Lz4TextInputPartition(InputPartition):
    def __init__(self, path: str, g_start: int, g_n: int,
                 blocks: list[tuple[int, int, bool]]):
        self.path = path
        self.g_start = g_start
        self.g_n = g_n
        self.blocks = blocks


class Lz4TextDataSourceReader(DataSourceReader):
    """SPLITTABLE partitions — unlike the tfrecord source (shard =
    split unit), an independent-block LZ4 frame plans MULTIPLE
    byte-range partitions per file from one O(#blocks) header hop
    (sources/lz4frame.py). Line ownership across partition seams is
    the inclusive-end LineRecordReader convention, so any split size
    yields every line exactly once. Schema is fixed `line string`
    (the function surface read_lz4_lines_spark additionally provides
    a dense global line_idx, which needs cross-partition counts this
    API doesn't coordinate)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lz4text source requires a path")
        self.split_bytes = int(options.get("split_bytes", 4 << 20))

    def partitions(self):
        from distcpplus_spark.sources.lz4frame import index_blocks

        files = (
            sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".lz4")
            )
            if os.path.isdir(self.path)
            else [self.path]
        )
        parts = []
        for fp in files:
            blocks = index_blocks(fp)
            if not blocks:
                continue
            start, acc = 0, 0
            for i, (_o, sz, _st) in enumerate(blocks):
                acc += sz
                if acc >= self.split_bytes and i + 1 > start:
                    parts.append(
                        Lz4TextInputPartition(fp, start, i + 1 - start, blocks)
                    )
                    start, acc = i + 1, 0
            if start < len(blocks):
                parts.append(
                    Lz4TextInputPartition(
                        fp, start, len(blocks) - start, blocks
                    )
                )
        return parts

    def read(self, p: Lz4TextInputPartition) -> Iterator[tuple]:
        from distcpplus_spark.sources.lz4frame import _read_block

        with open(p.path, "rb") as f:
            data = b"".join(
                _read_block(f, *p.blocks[i])
                for i in range(p.g_start, p.g_start + p.g_n)
            )
            owns_tail = True
            if p.g_start > 0:
                nl = data.find(b"\n")
                if nl < 0:
                    data, owns_tail = b"", False
                else:
                    data = data[nl + 1 :]
            if owns_tail:
                j = p.g_start + p.g_n
                while j < len(p.blocks):
                    nxt = _read_block(f, *p.blocks[j])
                    nl = nxt.find(b"\n")
                    if nl >= 0:
                        data += nxt[: nl + 1]
                        break
                    data += nxt
                    j += 1
        lines = data.decode("utf-8").split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        for line in lines:
            yield (line,)


class Lz4TextDataSource(DataSource):
    """``spark.read.format("lz4text")`` over the engine's splittable
    LZ4-frame reader (sources/lz4frame.py)."""

    @classmethod
    def name(cls) -> str:
        return "lz4text"

    def schema(self):
        return "line string"

    def reader(self, schema) -> DataSourceReader:
        return Lz4TextDataSourceReader(self.options)
