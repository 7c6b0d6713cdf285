"""Source/sink format round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    roundtrip_schema,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
)

SF = "/root/testdata/sf0.001"


def canon(df, key):
    return sorted(tuple(r) for r in df.orderBy(key).collect())


def test_csv_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, roundtrip_schema(nation))
    assert canon(back, "n_nationkey") == canon(nation, "n_nationkey")


def test_jsonl_roundtrip(spark, tmp_path):
    cust = load_table(spark, SF, "customer")
    path = str(tmp_path / "cust_json")
    write_jsonl(cust, path)
    back = read_jsonl(spark, path, roundtrip_schema(cust))
    assert canon(back, "c_custkey") == canon(cust, "c_custkey")


def test_orc_roundtrip(spark, tmp_path):
    supp = load_table(spark, SF, "supplier")
    path = str(tmp_path / "supp_orc")
    write_orc(supp, path)
    back = read_orc(spark, path)
    assert canon(back, "s_suppkey") == canon(supp, "s_suppkey")


def test_parquet_partitioned_write(spark, tmp_path):
    orders = load_table(spark, SF, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["status"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: scanning one partition reads a subset
    one = back.filter(F.col("status") == "F")
    assert 0 < one.count() < orders.count()


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Hive-partitioned layout must turn a filter on the partition
    column into PartitionFilters (directory pruning) — the scan never
    opens non-matching partitions. At 100 TB this is the difference
    between reading one day and reading the lake."""
    from distcpplus_spark.sources.formats import write_parquet

    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS day", "id * 2 AS v"
    )
    out = str(tmp_path / "part_tbl")
    write_parquet(df, out, partition_by=["day"])

    back = spark.read.parquet(out).filter("day = '3'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "isnotnull(day" in plan or "day#" in plan
    # the filter must NOT appear as a post-scan data filter only
    assert back.count() == df.filter("id % 7 = 3").count()

    # and a non-partition filter still reaches the scan as PushedFilters
    back2 = spark.read.parquet(out).filter("v > 100")
    plan2 = back2._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(v), GreaterThan(v,100)]" in plan2


def test_sorted_write_produces_selective_row_groups(spark, tmp_path):
    """sort_by must reach the files: row-group min/max stats on the
    sort column are then non-overlapping ranges, which is what lets a
    filtered scan skip row groups entirely (zone-map pruning)."""
    import glob

    import pyarrow.parquet as pq

    from distcpplus_spark.sources.formats import write_parquet

    df = spark.range(0, 100000).selectExpr(
        "CAST(id * 7919 % 100000 AS BIGINT) AS k", "id AS v"
    ).repartition(1)
    out = str(tmp_path / "sorted_tbl")
    # tiny row groups so one file holds several (default 128 MB = 1)
    write_parquet(
        df, out, sort_by=["k"], options={"parquet.block.size": "65536"}
    )

    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(len(md.schema))]
        col_idx = names.index("k")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) >= 2, "need multiple row groups to prove sorting"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"row-group ranges overlap: {(lo1,hi1)} {(lo2,hi2)}"


def test_avro_gated_or_roundtrips(spark, tmp_path):
    """Avro works when the package is present, else raises the
    documented ImportError — never Spark's opaque ClassNotFound."""
    from distcpplus_spark.sources.formats import read_avro, write_avro

    df = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    out = str(tmp_path / "avro_tbl")
    try:
        write_avro(df, out)
    except ImportError as e:
        assert "spark-avro" in str(e)
        return
    back = read_avro(spark, out)
    assert back.count() == 10


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-order vs single-column sort on a 2-D grid. Sorting by x makes
    every row group span the full y range, so a selective y filter can
    prune NOTHING; Z-order bounds both dimensions per row group, so
    the same filter skips most of them. The metric below is exactly
    what a zone-map reader computes: how many row groups intersect a
    narrow y band."""
    import glob

    import pyarrow.parquet as pq

    from distcpplus_spark.sources.formats import write_parquet, write_zordered

    n = 1 << 16
    df = spark.range(n).selectExpr(
        "CAST(id % 256 AS BIGINT) AS x",
        "CAST(CAST(id / 256 AS BIGINT) AS BIGINT) AS y",
    ).repartition(1)
    opts = {"parquet.block.size": "65536"}

    def y_ranges(path):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(len(md.schema))]
            yi = names.index("y")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(yi).statistics
                out.append((st.min, st.max))
        return out

    linear = str(tmp_path / "linear")
    write_parquet(df, linear, sort_by=["x"], options=opts)
    zordered = str(tmp_path / "zorder")
    write_zordered(df, zordered, ["x", "y"], options=opts)

    def hit_fraction(ranges, lo=100, hi=110):
        hits = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
        return hits / len(ranges)

    lin = y_ranges(linear)
    zo = y_ranges(zordered)
    assert len(lin) >= 4 and len(zo) >= 4
    # x-sorted: almost every row group spans ~all y → nothing prunable
    # (a trailing partial row group may miss the band)
    assert hit_fraction(lin) >= 0.9
    # z-ordered: most row groups don't touch the band → real pruning
    assert hit_fraction(zo) <= 0.5, (hit_fraction(zo), zo)


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from distcpplus_spark.sources.formats import compact_parquet

    path = str(tmp_path / "fragmented")
    # 40 tiny files (one per partition write)
    spark.range(0, 4000).repartition(40).write.parquet(path)
    before = spark.read.parquet(path).orderBy("id").collect()

    n_before, n_after = compact_parquet(spark, path, target_file_mb=256)
    assert n_before == 40
    assert n_after < 5
    after = spark.read.parquet(path).orderBy("id").collect()
    assert after == before


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Readers must survive additive schema evolution: files written
    before a column existed read as NULL for it under mergeSchema."""
    path = str(tmp_path / "evolving")
    spark.range(0, 5).selectExpr("id", "id * 2 AS v").write.parquet(path)
    spark.range(5, 10).selectExpr(
        "id", "id * 2 AS v", "'new' AS tag"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "tag"}
    rows = {r["id"]: r["tag"] for r in merged.collect()}
    assert rows[0] is None and rows[7] == "new"


def test_union_by_name_missing_columns(spark):
    """unionByName(allowMissingColumns=True): schema-mismatched frames
    union with NULL fill — the multi-source ingestion staple."""
    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(2, "b", "x")], "id long, v string, tag string")
    u = old.unionByName(new, allowMissingColumns=True)
    rows = {r["id"]: r["tag"] for r in u.collect()}
    assert rows == {1: None, 2: "x"}


def test_malformed_json_policies(spark, tmp_path):
    """The three malformed-row policies on a JSONL file with two bad
    lines: PERMISSIVE+corrupt_col quarantines them, DROPMALFORMED
    silently skips, FAILFAST aborts."""
    import pytest as _pytest

    from distcpplus_spark.sources.formats import (
        quarantine_corrupt,
        read_jsonl,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.0}\n'
        "this is not json\n"
        '{"id": 2, "v": 20.0}\n'
        '{"id": "NOT_A_NUMBER and unclosed\n'
        '{"id": 3, "v": 30.0}\n'
    )
    schema = "id BIGINT, v DOUBLE"

    # no .cache() here on purpose: quarantine_corrupt must handle the
    # raw-source corrupt-column restriction itself
    df = read_jsonl(spark, str(p), schema, corrupt_col="_bad")
    good, bad = quarantine_corrupt(df, "_bad")
    assert [r["id"] for r in good.orderBy("id").collect()] == [1, 2, 3]
    bad_lines = sorted(r["_bad"] for r in bad.collect())
    assert len(bad_lines) == 2
    assert bad_lines[0] == "this is not json"
    assert bad_lines[1].startswith('{"id": "NOT_A_NUMBER')

    dropped = read_jsonl(spark, str(p), schema, mode="DROPMALFORMED")
    assert dropped.count() == 3

    with _pytest.raises(Exception):
        read_jsonl(spark, str(p), schema, mode="FAILFAST").collect()


def test_malformed_csv_policies(spark, tmp_path):
    """CSV quarantine: unparseable cells null-fill and the raw line
    lands in the corrupt column; FAILFAST aborts. (CSV DROPMALFORMED
    is NOT asserted: since Spark 3 it only drops rows that fail
    structural parsing, not cell-level conversion failures, so it
    silently behaves like PERMISSIVE here — the quarantine pattern is
    the one to use.)"""
    import pytest as _pytest

    from distcpplus_spark.sources.formats import read_csv

    p = tmp_path / "in.csv"
    p.write_text("id,v\n1,10.0\n2,oops\n3,30.0\n")
    schema = "id BIGINT, v DOUBLE"

    df = read_csv(spark, str(p), schema, corrupt_col="_bad")
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["v"] is None and rows[2]["_bad"] == "2,oops"
    assert rows[1]["_bad"] is None

    with _pytest.raises(Exception):
        read_csv(spark, str(p), schema, mode="FAILFAST").collect()


def test_release_quarantine_unpersists(spark, tmp_path):
    from distcpplus_spark.sources.formats import (
        quarantine_corrupt,
        read_csv,
        release_quarantine,
    )

    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,2\nbad,row,extra\n3,4\n")
    df = read_csv(
        spark, str(p), "a INT, b INT", header=True,
        mode="PERMISSIVE", corrupt_col="_bad",
    )
    good, bad = quarantine_corrupt(df, "_bad")
    assert good.count() >= 1 and bad.count() >= 1
    cached = good._quarantine_source
    assert cached.storageLevel.useMemory  # cache() took effect
    release_quarantine(good)
    assert not cached.storageLevel.useMemory  # blocks released
    release_quarantine(good)  # idempotent
    release_quarantine(df)    # no-op on a non-quarantine frame


def test_jsonl_shards_deterministic_and_complete(spark, tmp_path):
    """Same input -> byte-identical shards (digests equal across two
    runs); shards reassemble to exactly the input; manifest file
    written."""
    import json
    import os

    from distcpplus_spark.sources.formats import write_jsonl_shards

    df = spark.createDataFrame(
        [(i, f"w{i % 9}", i * 7) for i in range(137)],
        "id BIGINT, s STRING, v BIGINT",
    )
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r["shard"]: r for r in write_jsonl_shards(df, d1, 25, "id").collect()}
    m2 = {r["shard"]: r for r in write_jsonl_shards(df, d2, 25, "id").collect()}
    assert {s: m1[s]["sha256"] for s in m1} == {
        s: m2[s]["sha256"] for s in m2
    }
    assert sorted(m1) == list(range(6))  # ceil(137/25)
    assert [m1[s]["n_rows"] for s in sorted(m1)] == [25] * 5 + [12]
    # reassembly: every row exactly once, in rank order within shards
    rows = []
    for s in sorted(m1):
        with open(os.path.join(d1, f"shard-{s:05d}.jsonl")) as f:
            rows.extend(json.loads(line) for line in f)
    assert [r["id"] for r in rows] == list(range(137))
    assert all(r["v"] == r["id"] * 7 for r in rows)
    assert os.path.exists(os.path.join(d1, "_MANIFEST.json"))


def test_arrow_ipc_roundtrip(spark, tmp_path):
    """Feather-v2 sink per partition via mapInArrow; source re-emits
    the embedded RecordBatches with the footer-sniffed schema."""
    from pyspark.sql import functions as F

    from distcpplus_spark.sources.formats import (
        read_arrow_ipc,
        write_arrow_ipc,
    )

    df = spark.range(0, 2000).select(
        "id",
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("row"), F.col("id")).alias("s"),
        (F.col("id") % 2 == 0).alias("b"),
    )
    d = str(tmp_path / "ipc")
    n_files = write_arrow_ipc(df.repartition(5), d)
    assert n_files == 5
    back = read_arrow_ipc(spark, d)
    assert back.schema.simpleString() == df.schema.simpleString()
    got = sorted(tuple(r) for r in back.collect())
    exp = sorted(tuple(r) for r in df.collect())
    assert got == exp


def test_arrow_ipc_empty_partitions_ok(spark, tmp_path):
    from distcpplus_spark.sources.formats import (
        read_arrow_ipc,
        write_arrow_ipc,
    )

    df = spark.range(0, 3)
    d = str(tmp_path / "ipc2")
    # 8 partitions, most empty: only non-empty ones produce files
    n_files = write_arrow_ipc(df.repartition(8), d)
    assert 1 <= n_files <= 8
    assert sorted(r["id"] for r in read_arrow_ipc(spark, d).collect()) == [
        0, 1, 2,
    ]


class TestSchemaEvolution:
    def test_rename_add_drop_by_field_id(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from distcpplus_spark.sources.schema_evo import (
            read_by_field_id,
            read_field_ids,
            write_with_field_ids,
        )

        v1 = spark.createDataFrame(
            [(1, "a", 9.5), (2, "b", 8.0)], "id int, name string, junk double"
        )
        write_with_field_ids(
            v1, str(tmp_path / "v1.parquet"),
            {"id": 1, "name": 2, "junk": 9},
        )
        v2 = spark.createDataFrame(
            [(3, "c", 30)], "id int, label string, extra int"
        )
        write_with_field_ids(
            v2, str(tmp_path / "v2.parquet"),
            {"id": 1, "label": 2, "extra": 3},
        )
        assert read_field_ids(str(tmp_path / "v1.parquet")) == {
            1: "id", 2: "name", 9: "junk"
        }
        out = read_by_field_id(
            spark,
            [str(tmp_path / "v1.parquet"), str(tmp_path / "v2.parquet")],
            [(1, "id", "int"), (2, "label", "string"), (3, "extra", "int")],
        )
        got = {r["id"]: (r["label"], r["extra"]) for r in out.collect()}
        # rename served from old file; added col null-filled; junk (id 9,
        # dropped from target) absent entirely
        assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}
        assert out.columns == ["id", "label", "extra"]

    def test_missing_field_id_raises(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest

        from distcpplus_spark.sources.schema_evo import read_field_ids

        pq.write_table(
            pa.table({"x": [1, 2]}), str(tmp_path / "bare.parquet")
        )
        with pytest.raises(ValueError, match="no field id"):
            read_field_ids(str(tmp_path / "bare.parquet"))

    def test_write_requires_declared_ids(self, spark, tmp_path):
        import pytest

        from distcpplus_spark.sources.schema_evo import write_with_field_ids

        df = spark.createDataFrame([(1,)], "id int")
        with pytest.raises(ValueError, match="no field id declared"):
            write_with_field_ids(df, str(tmp_path / "x.parquet"), {})

    def test_field_ids_survive_distributed_multifile_write(
        self, spark, tmp_path
    ):
        """Round 14: the distributed sink (one pyarrow writer PER TASK,
        no driver collect) must stamp identical field ids into every
        file's footer, and a directory written this way must resolve
        through read_by_field_id including a rename."""
        from distcpplus_spark.sources.schema_evo import (
            read_by_field_id,
            read_field_ids,
            write_dataset_with_field_ids,
        )

        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(40)], "id int, name string"
        ).repartition(4)
        d = str(tmp_path / "evo_ds")
        files = write_dataset_with_field_ids(df, d, {"id": 1, "name": 2})
        assert len(files) > 1, "distributed write must produce >1 file"
        for f in files:
            assert read_field_ids(f) == {1: "id", 2: "name"}
        # directory resolves per file; rename (2 -> label) served by id
        out = read_by_field_id(
            spark, [d], [(1, "id", "int"), (2, "label", "string")]
        )
        got = {r["id"]: r["label"] for r in out.collect()}
        assert got == {i: f"n{i}" for i in range(40)}
        # missing ids fail at plan time
        import pytest

        with pytest.raises(ValueError, match="no field id declared"):
            write_dataset_with_field_ids(
                df, str(tmp_path / "evo_bad"), {"id": 1}
            )

    def test_single_file_write_empty_df_keeps_schema(self, spark, tmp_path):
        from distcpplus_spark.sources.schema_evo import (
            read_field_ids,
            write_with_field_ids,
        )

        df = spark.createDataFrame([], "id int, name string")
        p = str(tmp_path / "empty.parquet")
        write_with_field_ids(df, p, {"id": 1, "name": 2})
        assert read_field_ids(p) == {1: "id", 2: "name"}
        assert spark.read.parquet(p).count() == 0
