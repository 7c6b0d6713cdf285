"""WARC reader (sources/warc.py): record framing (plain + gzip
member-per-record), HTTP response splitting, and the distributed
binaryFile ingestion path."""

import numpy as np

from distcpplus_spark.sources.warc import (
    build_warc,
    parse_warc_bytes,
    read_warc,
)


def _recs():
    return [
        ("warcinfo", None, "2024-01-01T00:00:00Z", "<urn:uuid:0>",
         "application/warc-fields", b"software: test\r\n"),
        ("response", "http://a.example/x", "2024-01-02T00:00:00Z",
         "<urn:uuid:1>", "application/http;msgtype=response",
         b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
         b"<html>hello</html>"),
        ("response", "http://a.example/missing", "2024-01-02T00:01:00Z",
         "<urn:uuid:2>", "application/http;msgtype=response",
         b"HTTP/1.1 404 Not Found\r\n\r\ngone"),
        ("request", "http://a.example/x", "2024-01-02T00:00:00Z",
         "<urn:uuid:3>", "application/http;msgtype=request",
         b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n"),
    ]


def test_plain_and_gzip_member_framing_agree():
    recs = _recs()
    plain = parse_warc_bytes(build_warc(recs, gzip_members=False))
    gz = parse_warc_bytes(build_warc(recs, gzip_members=True))
    assert plain == gz
    assert len(plain) == 4


def test_http_response_split_and_status():
    rows = parse_warc_bytes(build_warc(_recs()))
    by_id = {r[3]: r for r in rows}
    assert by_id["<urn:uuid:1>"][5] == 200
    assert by_id["<urn:uuid:1>"][6] == b"<html>hello</html>"
    assert by_id["<urn:uuid:2>"][5] == 404
    assert by_id["<urn:uuid:2>"][6] == b"gone"
    # request records keep their raw payload, no status
    assert by_id["<urn:uuid:3>"][5] is None
    assert by_id["<urn:uuid:3>"][6].startswith(b"GET /x")
    assert by_id["<urn:uuid:0>"][0] == "warcinfo"


def test_read_warc_distributed(spark, tmp_path):
    import os

    d = tmp_path / "warcs"
    os.makedirs(d)
    for i in range(3):
        recs = [
            ("response", f"http://site{i}.test/p{j}",
             "2024-01-01T00:00:00Z", f"<urn:uuid:{i}-{j}>",
             "application/http;msgtype=response",
             b"HTTP/1.1 200 OK\r\n\r\n" + f"body-{i}-{j}".encode())
            for j in range(4)
        ]
        with open(d / f"f{i}.warc.gz", "wb") as f:
            f.write(build_warc(recs))
    df = read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 12
    bodies = sorted(bytes(r["payload"]).decode() for r in rows)
    assert bodies == sorted(f"body-{i}-{j}" for i in range(3) for j in range(4))
    assert all(r["http_status"] == 200 for r in rows)


def _many_recs(n_files=2, per_file=30):
    out = []
    for f in range(n_files):
        out.append(
            [
                ("response", f"http://s{f}.example/p{j}",
                 "2024-01-01T00:00:00Z", f"<urn:uuid:{f}-{j}>",
                 "application/http;msgtype=response",
                 b"HTTP/1.1 200 OK\r\n\r\n"
                 + (f"body {f}-{j} " * (j % 5 + 1)).encode())
                for j in range(per_file)
            ]
        )
    return out


def test_index_warc_gzip_member_spans(spark, tmp_path):
    """Index rows must tile each .warc.gz exactly: contiguous,
    gap-free spans summing to the file size, each starting on a
    gzip magic."""
    import os

    from distcpplus_spark.sources.warc import index_warc

    per_file = 30
    for f, recs in enumerate(_many_recs()):
        (tmp_path / f"f{f}.warc.gz").write_bytes(build_warc(recs))
    idx = index_warc(spark, str(tmp_path)).collect()
    by_path = {}
    for r in idx:
        by_path.setdefault(r["path"], []).append(r)
    assert len(by_path) == 2
    for p, rows in by_path.items():
        rows.sort(key=lambda r: r["member_idx"])
        assert len(rows) == per_file
        local = p[len("file:"):] if p.startswith("file:") else p
        blob = open(local, "rb").read()
        pos = 0
        for r in rows:
            assert r["offset"] == pos
            assert blob[r["offset"] : r["offset"] + 2] == b"\x1f\x8b"
            pos += r["length"]
        assert pos == os.path.getsize(local)


def test_read_warc_indexed_matches_file_per_task(spark, tmp_path):
    """The splittable range reader must return exactly what the
    file-per-task reader returns, while actually using many
    splits."""
    from distcpplus_spark.sources.warc import index_warc, read_warc_indexed

    for f, recs in enumerate(_many_recs()):
        (tmp_path / f"f{f}.warc.gz").write_bytes(build_warc(recs))
    idx = index_warc(spark, str(tmp_path))
    # tiny split budget: every split carries only a few members
    split = read_warc_indexed(spark, idx, split_bytes=400)
    base = read_warc(spark, str(tmp_path))
    key = lambda r: (r["target_uri"], bytes(r["payload"]))  # noqa: E731
    assert sorted(map(key, split.collect())) == sorted(
        map(key, base.collect())
    )
    # and the parallelism is real: more range tasks than files
    from pyspark.sql import functions as F

    w_counts = idx.groupBy("path").count().collect()
    assert all(r["count"] == 30 for r in w_counts)


def test_index_warc_plain_record_spans(spark, tmp_path):
    """Uncompressed WARC indexes by Content-Length walking — spans
    tile the file and payloads containing 'WARC/' don't fool it."""
    from distcpplus_spark.sources.warc import index_warc, read_warc_indexed

    recs = [
        ("response", "http://x.example/a", "2024-01-01T00:00:00Z",
         "<urn:uuid:a>", "application/http;msgtype=response",
         b"HTTP/1.1 200 OK\r\n\r\nbody with WARC/1.0 inside"),
        ("response", "http://x.example/b", "2024-01-01T00:00:00Z",
         "<urn:uuid:b>", "application/http;msgtype=response",
         b"HTTP/1.1 200 OK\r\n\r\nplain second body"),
    ]
    (tmp_path / "plain.warc").write_bytes(build_warc(recs, gzip_members=False))
    idx = index_warc(spark, str(tmp_path), glob="*.warc")
    rows = sorted(idx.collect(), key=lambda r: r["member_idx"])
    assert len(rows) == 2
    got = read_warc_indexed(spark, idx, split_bytes=1)
    assert sorted(r["target_uri"] for r in got.collect()) == [
        "http://x.example/a", "http://x.example/b",
    ]


def test_index_with_meta_and_cdxj(spark, tmp_path):
    """Enriched index carries per-record type/URI/sha1; the CDXJ
    export is SURT-keyed, sorted, and its offsets round-trip: the
    byte range named by each line decompresses to the record whose
    digest the line claims."""
    import gzip
    import hashlib
    import json

    from distcpplus_spark.sources.warc import (
        index_warc_with_meta,
        write_cdxj,
    )

    recs = [
        ("response", "http://b.example/two", "2024-01-01T00:00:00Z",
         "<urn:uuid:2>", "application/http;msgtype=response",
         b"HTTP/1.1 200 OK\r\n\r\nsecond body"),
        ("response", "http://a.example/one", "2024-01-01T00:00:00Z",
         "<urn:uuid:1>", "application/http;msgtype=response",
         b"HTTP/1.1 200 OK\r\n\r\nfirst body"),
        ("request", "http://a.example/one", "2024-01-01T00:00:00Z",
         "<urn:uuid:3>", "application/http;msgtype=request",
         b"GET /one HTTP/1.1\r\n\r\n"),
    ]
    blob = build_warc(recs)
    p = tmp_path / "cc.warc.gz"
    p.write_bytes(blob)
    idx = index_warc_with_meta(spark, str(tmp_path))
    rows = sorted(idx.collect(), key=lambda r: r["member_idx"])
    assert [r["warc_type"] for r in rows] == ["response", "response",
                                             "request"]
    assert rows[0]["payload_digest"] == hashlib.sha1(
        recs[0][5]
    ).hexdigest()

    out = str(tmp_path / "index.cdxj")
    n = write_cdxj(idx, out)
    assert n == 2  # responses only
    lines = open(out).read().splitlines()
    keys = [ln.split(" ", 1)[0] for ln in lines]
    assert keys == sorted(keys)
    assert keys[0].startswith("example,a)/one")
    # offsets round-trip through the raw file
    body_by_uri = {"http://a.example/one": b"first body",
                   "http://b.example/two": b"second body"}
    for ln in lines:
        meta = json.loads(ln.split(" ", 1)[1])
        raw = blob[int(meta["offset"]):int(meta["offset"]) + int(meta["length"])]
        rec = gzip.decompress(raw)
        assert meta["url"].encode() in rec
        payload = rec.split(b"\r\n\r\n", 2)[2]
        assert body_by_uri[meta["url"]] in payload
        # the line's digest is the sha1 of the FULL record payload
        # (HTTP headers + body), matching the index rows
        full_payload = rec.split(b"\r\n\r\n", 1)[1][: -4]
        assert meta["digest"] == "sha1:" + hashlib.sha1(
            full_payload
        ).hexdigest()
