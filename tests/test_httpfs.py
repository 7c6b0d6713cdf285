"""HTTP remote source (sources/httpfs.py) against a localhost
http.server: parallel fetch, byte-range chunking, verified copy,
and the collect-all-failures contract."""

import hashlib
import os
import threading

import pytest

from distcpplus_spark.sources.httpfs import (
    http_copy,
    read_http,
    read_http_ranges,
)


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    import functools
    from http.server import HTTPServer, SimpleHTTPRequestHandler

    root = tmp_path_factory.mktemp("httpfs")
    files = {}
    rng_bytes = os.urandom(300_000)
    (root / "d1").mkdir()
    (root / "d2").mkdir()
    for name, content in [
        ("a.bin", b"alpha-content"),
        ("b.bin", b"beta" * 1000),
        ("big.bin", rng_bytes),
        ("d1/data.bin", b"from-host-one"),
        ("d2/data.bin", b"from-host-two-longer"),
    ]:
        (root / name).write_bytes(content)
        files[name] = content
    handler = functools.partial(
        SimpleHTTPRequestHandler, directory=str(root)
    )
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", files
    finally:
        srv.shutdown()


def test_read_http_parallel_and_error_rows(spark, http_root):
    base, files = http_root
    urls = [f"{base}/a.bin", f"{base}/b.bin", f"{base}/missing.bin"]
    rows = {r["url"]: r for r in read_http(spark, urls).collect()}
    assert bytes(rows[f"{base}/a.bin"]["content"]) == files["a.bin"]
    assert rows[f"{base}/b.bin"]["length"] == len(files["b.bin"])
    miss = rows[f"{base}/missing.bin"]
    assert miss["status"] == 404 and miss["content"] is None
    assert miss["error"]


def test_read_http_ranges_reassembles_exactly(spark, http_root):
    base, files = http_root
    big = files["big.bin"]
    df = read_http_ranges(
        spark, f"{base}/big.bin", len(big), chunk_bytes=64 * 1024
    )
    rows = sorted(df.collect(), key=lambda r: r["chunk_idx"])
    assert len(rows) == -(-len(big) // (64 * 1024))
    joined = b"".join(bytes(r["content"]) for r in rows)
    assert joined == big
    assert all(
        r["offset"] == i * 64 * 1024 for i, r in enumerate(rows)
    )


def test_http_copy_verified_atomic(spark, http_root, tmp_path):
    base, files = http_root
    dst = str(tmp_path / "landed")
    rows = {
        r["url"]: r
        for r in http_copy(
            spark,
            [f"{base}/a.bin", f"{base}/b.bin", f"{base}/nope.bin"],
            dst,
        ).collect()
    }
    ok_a = rows[f"{base}/a.bin"]
    assert ok_a["ok"] and ok_a["n_bytes"] == len(files["a.bin"])
    assert ok_a["sha256"] == hashlib.sha256(files["a.bin"]).hexdigest()
    with open(os.path.join(dst, "a.bin"), "rb") as f:
        assert f.read() == files["a.bin"]
    assert not rows[f"{base}/nope.bin"]["ok"]
    # no tmp debris
    assert not [f for f in os.listdir(dst) if ".tmp" in f]


def test_http_copy_disambiguates_basename_collisions(spark, http_root, tmp_path):
    """Two URLs sharing a basename must land as two distinct files
    (sha256-of-URL suffix), not silently overwrite each other."""
    base, files = http_root
    dst = str(tmp_path / "landed2")
    rows = {
        r["url"]: r
        for r in http_copy(
            spark,
            [f"{base}/d1/data.bin", f"{base}/d2/data.bin", f"{base}/a.bin"],
            dst,
        ).collect()
    }
    r1, r2 = rows[f"{base}/d1/data.bin"], rows[f"{base}/d2/data.bin"]
    assert r1["ok"] and r2["ok"]
    assert r1["dst"] != r2["dst"]
    with open(r1["dst"], "rb") as f:
        assert f.read() == files["d1/data.bin"]
    with open(r2["dst"], "rb") as f:
        assert f.read() == files["d2/data.bin"]
    # the non-colliding url keeps its plain basename
    assert os.path.basename(rows[f"{base}/a.bin"]["dst"]) == "a.bin"
    assert not [f for f in os.listdir(dst) if ".tmp" in f]
