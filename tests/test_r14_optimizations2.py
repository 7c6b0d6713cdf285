"""Round-14 optimization pins, batch 2 (the non-headline sweep).

Same discipline as test_r14_optimizations.py: every operator-internal
rewrite from the registry-wide triage is pinned against the round-13
formulation it replaced (bit-identical rows), plus the two structural
contracts the wins rely on (one-slice local relations, clustered
partitioned writes).
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.functions.text import char_shingles
from distcpplus_spark.queries import local_rows

SF = "/root/testdata/sf0.001"


def rows(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_local_rows_one_slice_and_identical(spark):
    """local_rows = createDataFrame(list) in exactly one slice: same
    rows, same schema, one partition (the coalesce(1) fix's whole
    point — a downstream single-task sort evaluates ONE slice)."""
    data = [(1, "a", 1.5), (2, None, -0.25), (None, "c", 0.0)]
    schema = "k BIGINT, s STRING, v DOUBLE"
    via_helper = local_rows(spark, data, schema)
    via_create = spark.createDataFrame(data, schema)
    assert via_helper.rdd.getNumPartitions() == 1
    assert via_helper.schema == via_create.schema
    assert rows(via_helper) == rows(via_create)


def test_local_rows_empty(spark):
    assert local_rows(spark, [], "k BIGINT").count() == 0


def test_minhash_signatures_stack_equals_explode(spark):
    """The stack()-after-agg signature formulation == the round-13
    seed-explode, bit for bit, in BOTH hash modes."""
    from distcpplus_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)

    def old_formulation(num_hashes, portable):
        sh = docs.select(
            F.col("doc_id").alias("_id"),
            F.explode(
                F.array_distinct(char_shingles(F.col("text"), 8))
            ).alias("_shingle"),
        )
        seeds = F.explode(
            F.sequence(F.lit(0), F.lit(num_hashes - 1))
        ).alias("_seed")
        if portable:
            h = F.md5(
                F.concat(
                    F.col("_seed").cast("string"),
                    F.lit(":"),
                    F.col("_shingle"),
                ).cast("binary")
            )
        else:
            h = F.xxhash64(
                F.concat(F.col("_seed").cast("string"), F.col("_shingle"))
            )
        return (
            sh.select("_id", "_shingle", seeds)
            .groupBy("_id", "_seed")
            .agg(F.min(h).alias("_minhash"))
        )

    for num_hashes, portable in [(4, True), (8, False)]:
        new = minhash_signatures(
            docs, "text", "doc_id", num_hashes, 8, portable=portable
        )
        old = old_formulation(num_hashes, portable)
        # nullability differs (stack marks outputs nullable); names
        # and types must match exactly
        assert [(f.name, f.dataType) for f in new.schema] == [
            (f.name, f.dataType) for f in old.schema
        ]
        assert rows(new) == rows(old)


def test_portable_minhash_stack_equals_explode(spark):
    """_portable_minhash (the incremental-dedup index unit) == the
    round-13 seed-explode formulation."""
    from distcpplus_spark.operators.dedup import _portable_minhash

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)
    new = _portable_minhash(docs, "doc_id", "text", 8, 4)
    sh = docs.select(
        F.col("doc_id").alias("_id"),
        F.explode(
            F.array_distinct(char_shingles(F.col("text"), 8))
        ).alias("shingle"),
    )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("seed")
    old = (
        sh.select("_id", "shingle", seeds)
        .groupBy("_id", "seed")
        .agg(
            F.min(
                F.md5(
                    F.concat(
                        F.col("seed").cast("string"),
                        F.lit(":"),
                        F.col("shingle"),
                    ).cast("binary")
                )
            ).alias("minhash")
        )
    )
    assert [(f.name, f.dataType) for f in new.schema] == [
        (f.name, f.dataType) for f in old.schema
    ]
    assert rows(new) == rows(old)


def test_union_find_fixpoint_rider_schema(spark):
    """union_find_components still returns exactly (node, component)
    — the _prev fixpoint rider must not leak into the result — and
    labels a two-chain + singleton-pair graph correctly."""
    from distcpplus_spark.operators.dedup import union_find_components

    pairs = local_rows(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11)],
        "id_a BIGINT, id_b BIGINT",
    )
    out = union_find_components(pairs)
    assert out.columns == ["node", "component"]
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_hidden_partition_write_clusters_files(spark):
    """The clustered partitioned write produces at most one file per
    partition directory when one task owns the partition — never the
    tasks-x-dirs spray (q231's 7.7k-tiny-file pathology)."""
    from distcpplus_spark.sources.formats import hidden_partition_write

    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="t_hpw_")
    try:
        hidden_partition_write(
            ev, root, [("p_day", "days", "ts"), ("p_bucket", "bucket", "user_id", 4)]
        )
        dirs = glob.glob(os.path.join(root, "p_day=*", "p_bucket=*"))
        assert dirs, "no partition directories written"
        for d in dirs:
            files = [
                f
                for f in glob.glob(os.path.join(d, "*"))
                if not os.path.basename(f).startswith(("_", "."))
            ]
            assert len(files) == 1, f"{d} has {len(files)} data files"
        # read-back equality: layout must lose nothing
        assert (
            spark.read.parquet(root).count() == ev.count()
        )
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
