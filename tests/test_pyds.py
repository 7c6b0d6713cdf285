"""Spark 4 Python DataSource API (sources/pyds.py): format("warc")
equivalence with the function readers, and split planning."""

from distcpplus_spark.sources.pyds import register_python_sources
from distcpplus_spark.sources.warc import build_warc, read_warc


def _write(tmp_path, n_files=2, per_file=20):
    for f in range(n_files):
        recs = [
            ("response", f"http://s{f}.example/p{j}",
             "2024-01-01T00:00:00Z", f"<urn:uuid:{f}-{j}>",
             "application/http;msgtype=response",
             b"HTTP/1.1 200 OK\r\n\r\n" + f"body {f}-{j}".encode())
            for j in range(per_file)
        ]
        (tmp_path / f"f{f}.warc.gz").write_bytes(build_warc(recs))


def test_format_warc_matches_function_reader(spark, tmp_path):
    _write(tmp_path)
    register_python_sources(spark)
    via_ds = spark.read.format("warc").load(str(tmp_path))
    via_fn = read_warc(spark, str(tmp_path))
    key = lambda r: (r["target_uri"], bytes(r["payload"]))  # noqa: E731
    assert sorted(map(key, via_ds.collect())) == sorted(
        map(key, via_fn.collect())
    )


def test_format_warc_split_bytes_fans_out(spark, tmp_path):
    _write(tmp_path, n_files=1, per_file=30)
    register_python_sources(spark)
    whole = spark.read.format("warc").load(str(tmp_path))
    split = (
        spark.read.format("warc")
        .option("split_bytes", "300")
        .load(str(tmp_path))
    )
    assert split.rdd.getNumPartitions() > whole.rdd.getNumPartitions()
    key = lambda r: (r["target_uri"], bytes(r["payload"]))  # noqa: E731
    assert sorted(map(key, split.collect())) == sorted(
        map(key, whole.collect())
    )


def test_warc_stream_tails_new_files(spark, tmp_path):
    """Streaming source: first drain sees the initial shard; a shard
    arriving later is picked up by the next drain from the SAME
    checkpoint (offsets = ingested file set)."""
    from distcpplus_spark.streaming.sinks import drain_to_parquet

    register_python_sources(spark)
    src = tmp_path / "crawl"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _writeone = lambda name, tag: (src / name).write_bytes(  # noqa: E731
        build_warc([
            ("response", f"http://{tag}/p{j}", "2024-01-01T00:00:00Z",
             f"<urn:{tag}-{j}>", "application/http;msgtype=response",
             b"HTTP/1.1 200 OK\r\n\r\n" + f"{tag} body {j}".encode())
            for j in range(5)
        ])
    )
    _writeone("a.warc.gz", "one")

    def drain():
        stream = spark.readStream.format("warc_stream").load(str(src))
        drain_to_parquet(stream, out, ckpt)
        return {
            r["target_uri"] for r in spark.read.parquet(out).collect()
        }

    got1 = drain()
    assert got1 == {f"http://one/p{j}" for j in range(5)}
    _writeone("b.warc.gz", "two")
    got2 = drain()
    assert got2 == {
        f"http://{t}/p{j}" for t in ("one", "two") for j in range(5)
    }


def test_format_warc_write_read_roundtrip(spark, tmp_path):
    """df.write.format("warc") emits gzip member-per-record shards
    (tmp+rename commit protocol) that the reader — and the plain
    function reader — ingest back value-identical."""
    register_python_sources(spark)
    rows = [
        ("response", f"http://w.example/p{j}", "2024-01-01T00:00:00Z",
         f"<urn:uuid:{j}>", "application/http;msgtype=response",
         f"payload {j}".encode())
        for j in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "warc_type STRING, target_uri STRING, warc_date STRING, "
        "record_id STRING, content_type STRING, payload BINARY",
    ).repartition(3)
    dst = str(tmp_path / "written")
    df.write.format("warc").mode("append").save(dst)
    import os

    names = os.listdir(dst)
    assert all(n.endswith(".warc.gz") for n in names)
    assert len(names) == 3
    back = spark.read.format("warc").load(dst)
    key = lambda uri, pay: (uri, bytes(pay))  # noqa: E731
    assert sorted(key(r["target_uri"], r["payload"]) for r in back.collect()) \
        == sorted(key(u, p) for _, u, _, _, _, p in rows)
    via_fn = read_warc(spark, dst)
    assert via_fn.count() == 40


def test_tfrecord_datasource_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from distcpplus_spark.sources.pyds import register_python_sources
    from distcpplus_spark.sources.tfrecord import write_tfrecord_shards

    register_python_sources(spark)
    df = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    ).repartition(3)
    root = str(tmp_path / "tfds")
    write_tfrecord_shards(df, root)
    back = (
        spark.read.format("tfrecord")
        .option("columns", "doc_id bigint, text string, lang string")
        .option("path", root)
        .load()
    )
    # one InputPartition per shard
    assert back.rdd.getNumPartitions() == len(
        [f for f in __import__("os").listdir(root) if f.endswith(".tfrecord")]
    )
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert len(got) == 60 and got[42] == "t42"
