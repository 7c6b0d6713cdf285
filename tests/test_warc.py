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
