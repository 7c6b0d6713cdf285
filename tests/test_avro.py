"""Pure-Python Avro Object Container File codec (sources/avro_py):
binary-encoding round trips, a hand-assembled spec fixture
independent of the writer, container integrity, and the distributed
Spark read/write paths."""

import datetime
import glob
import os

import pytest

from distcpplus_spark.sources.avro_py import (
    read_container,
    read_header,
    write_container,
)

FULL_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "kv", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "n",
                "fields": [{"name": "a", "type": "int"}],
            },
        },
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
    ],
}


def _mk_records(n):
    return [
        {
            "id": i * 1000003 - 500,
            "name": None if i % 3 == 0 else f"n{i}",
            "score": i / 7.0,
            "ok": i % 2 == 0,
            "blob": bytes([i % 256] * 3),
            "tags": [f"t{j}" for j in range(i % 4)],
            "kv": {"a": i, "b": -i},
            "nested": {"a": i},
            "ts": datetime.datetime(2024, 1, 1)
            + datetime.timedelta(seconds=i, microseconds=i * 13),
            "d": datetime.date(2024, 1, 1) + datetime.timedelta(days=i),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    recs = _mk_records(250)
    blob = write_container(recs, FULL_SCHEMA, codec=codec, block_rows=100)
    schema, out = read_container(blob)
    assert schema == FULL_SCHEMA
    assert out == recs


def test_deflate_actually_compresses():
    recs = _mk_records(500)
    raw = write_container(recs, FULL_SCHEMA, codec="null")
    packed = write_container(recs, FULL_SCHEMA, codec="deflate")
    assert len(packed) < 0.8 * len(raw)


def test_hand_assembled_spec_fixture():
    """A container file assembled byte-by-byte from the published
    spec (zigzag varints and length prefixes computed by hand, NOT by
    the writer): magic, metadata map, sync, one 2-row block of
    {id: long, name: string} = (1,'ab'), (-2,'c'). The reader must
    reproduce the records exactly — this catches any varint/framing
    bug the writer would cancel out."""
    schema_json = (
        b'{"type":"record","name":"r","fields":'
        b'[{"name":"id","type":"long"},{"name":"name","type":"string"}]}'
    )
    sync = bytes(range(16))
    blob = (
        b"Obj\x01"
        + b"\x04"  # meta map: 2 entries (zigzag 2 -> 4)
        + bytes([22]) + b"avro.schema"  # key len 11 -> zigzag 22
        # schema len 99 -> zigzag 198 -> varint bytes C6 01
        + bytes([0xC6, 0x01]) + schema_json
        + bytes([20]) + b"avro.codec"  # key len 10 -> zigzag 20
        + b"\x08" + b"null"  # value len 4 -> zigzag 8
        + b"\x00"  # end of map
        + sync
        + b"\x04"  # block: 2 rows
        + b"\x0e"  # block byte size 7 -> zigzag 14
        + b"\x02" + b"\x04" + b"ab"  # id=1 (zz 2), name len 2 (zz 4)
        + b"\x03" + b"\x02" + b"c"  # id=-2 (zz 3), name len 1 (zz 2)
        + sync
    )
    schema, recs = read_container(blob)
    assert schema["fields"][0]["name"] == "id"
    assert recs == [{"id": 1, "name": "ab"}, {"id": -2, "name": "c"}]


def test_corrupt_sync_marker_detected():
    blob = bytearray(write_container(_mk_records(10), FULL_SCHEMA))
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        read_container(bytes(blob))


def test_header_parse_exposes_codec_and_schema():
    blob = write_container(_mk_records(3), FULL_SCHEMA, codec="deflate")
    schema, codec, sync, pos = read_header(blob)
    assert codec == "deflate"
    assert schema == FULL_SCHEMA
    assert len(sync) == 16 and pos > 4


def test_spark_roundtrip_scalars_and_timestamps(spark, tmp_path):
    """Distributed write (one container per partition, executors only)
    then distributed read reproduces orders exactly — including the
    TIMESTAMP column through the timestamp-micros logical type."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.sources.avro_py import read_avro_py, write_avro_py

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").limit(400)
    dst = str(tmp_path / "orders_avro")
    n = write_avro_py(orders.repartition(4), dst, codec="deflate")
    assert n == 400
    parts = glob.glob(os.path.join(dst, "*.avro"))
    assert len(parts) == 4  # one file per partition, no driver funnel
    back = read_avro_py(spark, dst)
    assert back.schema == orders.schema or [
        (f.name, f.dataType.simpleString()) for f in back.schema.fields
    ] == [(f.name, f.dataType.simpleString()) for f in orders.schema.fields]
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )


def test_spark_roundtrip_array_column(spark, tmp_path):
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.sources.avro_py import read_avro_py, write_avro_py

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    dst = str(tmp_path / "emb_avro")
    write_avro_py(emb.repartition(2), dst, codec="null")
    back = read_avro_py(spark, dst)
    want = sorted(
        (r["vec_id"], [round(float(x), 5) for x in r["embedding"]])
        for r in emb.collect()
    )
    got = sorted(
        (r["vec_id"], [round(float(x), 5) for x in r["embedding"]])
        for r in back.collect()
    )
    assert want == got


def test_formats_gate_falls_back_to_pure_python(spark, tmp_path):
    """formats.read_avro/write_avro try the JVM datasource first and
    silently fall back to avro_py in this jar-less environment."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.sources.formats import read_avro, write_avro

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .limit(100)
    )
    dst = str(tmp_path / "docs_avro")
    write_avro(docs, dst)
    back = read_avro(spark, dst)
    assert back.count() == 100
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_nullable_columns_roundtrip(spark, tmp_path):
    from distcpplus_spark.sources.avro_py import read_avro_py, write_avro_py

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)],
        "id bigint, s string, x double",
    )
    dst = str(tmp_path / "nulls_avro")
    write_avro_py(df, dst)
    back = read_avro_py(spark, dst)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def _jvm_avro_available(spark, tmp_path) -> bool:
    probe = str(tmp_path / "_jvm_probe")
    try:
        spark.createDataFrame([(1,)], "i bigint").write.format(
            "avro"
        ).save(probe)
        return True
    except Exception:
        return False


def test_jvm_python_parity_when_jar_present(spark, tmp_path):
    """When the spark-avro JVM datasource IS on the classpath, the
    pure-Python OCF codec must agree with it in BOTH directions:
    python-written containers readable by the JVM reader and vice
    versa, value-identical. q156 pins the oracle query to the python
    path; this test is what licenses that pin — any environment drift
    between the two implementations fails here, not in the gate.
    Skips in jar-less environments (the current container)."""
    if not _jvm_avro_available(spark, tmp_path):
        pytest.skip("spark-avro JVM datasource not on classpath")
    from distcpplus_spark.sources.avro_py import read_avro_py, write_avro_py

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)],
        "id bigint, s string, x double",
    )
    py_dst = str(tmp_path / "py_written")
    jvm_dst = str(tmp_path / "jvm_written")
    write_avro_py(df, py_dst)
    df.write.format("avro").save(jvm_dst)
    want = sorted(map(tuple, df.collect()))
    via_jvm = spark.read.format("avro").load(py_dst)
    via_py = read_avro_py(spark, jvm_dst)
    assert sorted(map(tuple, via_jvm.collect())) == want
    assert sorted(map(tuple, via_py.collect())) == want


def test_nullable_long_column_with_nulls_keeps_big_ints_exact(spark, tmp_path):
    """A null sharing a batch with 2^53+ longs must NOT demote the
    column to float64 (the round-8 _typed_pdf bug class): nullable
    unions are the Avro norm, so this is the reader's core contract."""
    from distcpplus_spark.sources.avro_py import read_avro_py, write_avro_py

    big = (1 << 60) + 123456789  # unrepresentable in float64
    df = spark.createDataFrame(
        [(1, big), (2, None), (3, big + 1)], "id BIGINT, v BIGINT"
    )
    dst = str(tmp_path / "bigint_nulls")
    write_avro_py(df.coalesce(1), dst, codec="null")
    back = {r["id"]: r["v"] for r in read_avro_py(spark, dst).collect()}
    assert back == {1: big, 2: None, 3: big + 1}
