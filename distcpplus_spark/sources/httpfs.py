"""HTTP(S) remote source — distributed fetch of remote objects into
the engine, stdlib-only (urllib).

This is the remote-FS half of the copy engine's job: training
corpora are pulled from object stores and web hosts before any
query runs. The shapes mirror the reference's copy semantics
(DistCPPlus.java): per-object tasks, byte-range chunking for huge
objects (the chunked-copy analogue, O13), length verification, and
tmp+rename atomicity on landing.

Scale shape: the URL list is a DataFrame; each executor task fetches
its rows with streaming reads (no whole-object buffering beyond the
row that becomes the DataFrame cell). Range fetches parallelize ONE
huge object across tasks — (url, offset, length) rows — then either
land as part-files or reassemble downstream. Backpressure is the
natural Spark task scheduling; a polite `max_parallelism` is just a
repartition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _fetch_one(url: str, offset: int | None = None,
               length: int | None = None, timeout: float = 30.0):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url)
    if offset is not None:
        end = "" if length is None else str(offset + length - 1)
        req.add_header("Range", f"bytes={offset}-{end}")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            return int(resp.status), body, None
    except urllib.error.HTTPError as e:
        return int(e.code), None, str(e)
    except Exception as e:  # DNS, refused, timeout
        return None, None, str(e)


def read_http(
    spark: SparkSession, urls: list[str], max_parallelism: int = 32
) -> DataFrame:
    """Fetch each URL in its own task → (url, status, content,
    length, error). Failed fetches keep their row with the error
    string — the collect-ALL-failures discipline of the copy planner
    (O5/O14), not fail-fast."""
    import pandas as pd

    df = spark.createDataFrame(
        [(u,) for u in urls], "url STRING"
    ).repartition(min(max_parallelism, max(1, len(urls))))

    def fetch(batches):
        for pdf in batches:
            rows = []
            for u in pdf["url"]:
                status, body, err = _fetch_one(u)
                rows.append(
                    (u, status, body,
                     len(body) if body is not None else None, err)
                )
            yield pd.DataFrame(
                rows, columns=["url", "status", "content", "length",
                               "error"],
            )

    return df.mapInPandas(fetch, FETCH_SCHEMA)


def read_http_ranges(
    spark: SparkSession, url: str, total_size: int, chunk_bytes: int
) -> DataFrame:
    """Parallel byte-range fetch of ONE large object → (chunk_idx,
    offset, content) rows in order — the HTTP analogue of the
    chunked parallel copy (copier.py): a 1 TB object becomes
    ceil(size/chunk) independent tasks instead of one straggler."""
    import pandas as pd

    n_chunks = -(-total_size // chunk_bytes)
    chunks = spark.createDataFrame(
        [(i, i * chunk_bytes, min(chunk_bytes, total_size - i * chunk_bytes))
         for i in range(n_chunks)],
        "chunk_idx INT, offset LONG, length LONG",
    ).repartition(min(32, n_chunks))

    schema = T.StructType(
        [
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def fetch(batches):
        for pdf in batches:
            rows = []
            for ci, off, ln in zip(
                pdf["chunk_idx"], pdf["offset"], pdf["length"]
            ):
                status, body, err = _fetch_one(
                    url, offset=int(off), length=int(ln)
                )
                if status not in (200, 206) or body is None:
                    raise IOError(
                        f"range fetch failed at {off}: {status} {err}"
                    )
                # a 200 means the server ignored Range: slice locally
                if status == 200:
                    body = body[int(off) : int(off) + int(ln)]
                rows.append((int(ci), int(off), body))
            yield pd.DataFrame(
                rows, columns=["chunk_idx", "offset", "content"]
            )

    return chunks.mapInPandas(fetch, schema)


def http_copy(
    spark: SparkSession, urls: list[str], dst_dir: str
) -> DataFrame:
    """Distributed download-to-directory with the copy executor's
    guarantees: stream to `.tmp`, verify length, atomic rename;
    returns (url, dst, n_bytes, sha256, ok, error) — failures are
    rows, not exceptions.

    Destination naming: URL basename, EXCEPT when two input URLs
    share a basename (host1/a/data.bin vs host2/b/data.bin) — then
    each gets a short sha256-of-URL disambiguator so concurrent
    tasks can't silently overwrite each other while both report ok.
    The collision check runs on the driver over the full url list,
    so naming stays deterministic across retries."""
    import hashlib
    import os
    from collections import Counter

    import pandas as pd

    os.makedirs(dst_dir, exist_ok=True)

    def base_name(u: str) -> str:
        return u.rstrip("/").rsplit("/", 1)[-1] or "index"

    counts = Counter(base_name(u) for u in urls)

    def dst_name(u: str) -> str:
        name = base_name(u)
        if counts[name] > 1:
            d = hashlib.sha256(u.encode()).hexdigest()[:12]
            if "." in name:
                stem, ext = name.rsplit(".", 1)
                return f"{stem}-{d}.{ext}"
            return f"{name}-{d}"
        return name
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("dst", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("sha256", T.StringType(), True),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("error", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(u, dst_name(u)) for u in urls], "url STRING, dst_name STRING"
    ).repartition(min(32, max(1, len(urls))))

    def copy(batches):
        for pdf in batches:
            rows = []
            for u, name in zip(pdf["url"], pdf["dst_name"]):
                dst = os.path.join(dst_dir, name)
                status, body, err = _fetch_one(u)
                if status != 200 or body is None:
                    rows.append((u, None, None, None, False,
                                 err or f"status {status}"))
                    continue
                # unique tmp per attempt: duplicate input URLs map to
                # the same dst, and two tasks sharing one .tmp would
                # interleave writes
                tmp = f"{dst}.tmp-{os.getpid()}-{id(pdf):x}"
                with open(tmp, "wb") as f:
                    f.write(body)
                if os.path.getsize(tmp) != len(body):
                    os.unlink(tmp)
                    rows.append((u, None, None, None, False,
                                 "length verify failed"))
                    continue
                os.replace(tmp, dst)
                rows.append(
                    (u, dst, len(body),
                     hashlib.sha256(body).hexdigest(), True, None)
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "dst", "n_bytes", "sha256", "ok", "error"],
            )

    return df.mapInPandas(copy, schema)
