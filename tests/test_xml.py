"""XML record source (sources/xml_src.py): iterparse streaming,
namespace handling, nested paths, missing fields, and compressed
payloads."""

from distcpplus_spark.sources.xml_src import parse_xml_records, read_xml


def test_namespaced_nested_and_missing_fields():
    doc = (
        '<root xmlns="http://x/ns"><item><name>a</name>'
        "<meta><score>7</score></meta></item>"
        "<item><name>b</name></item>"
        "<other><name>skip</name></other></root>"
    ).encode()
    rows = parse_xml_records(
        doc, "item", {"name": "name", "score": "meta/score"}
    )
    assert rows == [("a", "7"), ("b", None)]


def test_gzip_and_bz2_payloads():
    import bz2
    import gzip

    doc = b"<r><p><t>x</t></p><p><t>y</t></p></r>"
    for blob in (gzip.compress(doc), bz2.compress(doc), doc):
        assert parse_xml_records(blob, "p", {"t": "t"}) == [
            ("x",), ("y",),
        ]


def test_read_xml_distributed(spark, tmp_path):
    import os

    d = tmp_path / "xml"
    os.makedirs(d)
    for i in range(3):
        body = "".join(
            f"<rec><k>f{i}-{j}</k><v>{i * 10 + j}</v></rec>"
            for j in range(5)
        )
        (d / f"f{i}.xml").write_bytes(f"<top>{body}</top>".encode())
    df = read_xml(spark, str(d), "rec", {"k": "k", "v": "v"})
    rows = sorted((r["k"], r["v"]) for r in df.collect())
    assert len(rows) == 15
    assert rows[0] == ("f0-0", "0")
    assert rows[-1] == ("f2-4", "24")
