"""Round-15 optimization equivalence pins.

Every optimization that changes an operator's internals gets a test
proving the new formulation returns IDENTICAL results to the old
one (the round-14 discipline, continued).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distcpplus_spark.operators.dedup import (
    _spread_scan,
    minhash_signatures,
    union_find_components,
)

SF = "/root/testdata/sf0.01"


def test_union_find_local_finish_matches_distributed(spark):
    """The size-gated local union-find must label exactly like the
    pointer-doubling rounds: min id per connected component."""
    edges = (
        # chain 0-1-...-40 (diameter stresses doubling), a triangle,
        # an isolated pair, a self-loop, duplicate + reversed edges
        [(i, i + 1) for i in range(40)]
        + [(100, 101), (101, 102), (102, 100)]
        + [(200, 201)]
        + [(300, 300)]
        + [(5, 4), (10, 11)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = sorted(
        map(tuple, union_find_components(pairs).collect())
    )
    dist = sorted(
        map(
            tuple,
            union_find_components(pairs, local_max_edges=0).collect(),
        )
    )
    assert local == dist
    assert len(local) == 41 + 3 + 2 + 1


def test_union_find_local_finish_is_one_slice(spark):
    """The local-finish result is a one-slice local relation (the
    round-14 local_rows discipline: no 32-way Python parallelize)."""
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = union_find_components(pairs)
    assert out.rdd.getNumPartitions() == 1


def test_spread_scan_repartitions_deficient_input(spark):
    """A one-partition frame is spread to defaultParallelism; a frame
    that already has enough partitions passes through untouched."""
    one = spark.range(1000).coalesce(1)
    spread = _spread_scan(one, "id")
    assert spread.rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    wide = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism
    )
    assert _spread_scan(wide, "id") is wide


def test_minhash_signatures_spread_identical(spark):
    """Signatures from a deficient (1-partition) scan equal the
    round-14 formulation's output — the spread only moves rows."""
    docs = spark.createDataFrame(
        [(i, f"document text number {i} " * 6) for i in range(50)],
        "doc_id long, text string",
    ).coalesce(1)
    got = sorted(
        map(
            tuple,
            minhash_signatures(
                docs, "text", "doc_id", num_hashes=4, portable=True
            ).collect(),
        )
    )
    # reference: same input already spread, so _spread_scan no-ops
    ref = sorted(
        map(
            tuple,
            minhash_signatures(
                docs.repartition(64, "doc_id"),
                "text",
                "doc_id",
                num_hashes=4,
                portable=True,
            ).collect(),
        )
    )
    assert got == ref
    assert len(got) == 50 * 4


def test_q229_bounds_hex_equal_on_both_branches(spark):
    """q229 is size-adaptive (shared-buffer percentile below the
    broadcast-threshold-class size, exact_percentiles above): both
    branches must produce HEX-IDENTICAL winsorization bounds, so the
    branch point can never change results."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.operators.scale import exact_percentiles

    import struct

    li = load_table(spark, SF, "lineitem")
    shared = li.agg(
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.01), F.lit(0.99))
        ).alias("_ps")
    ).select(
        F.col("_ps")[0].alias("lo"), F.col("_ps")[1].alias("hi")
    ).collect()[0]
    exact = exact_percentiles(
        li, "l_extendedprice", [0.01, 0.99]
    ).collect()[0]

    def bits(x: float) -> str:
        return struct.pack("<d", x).hex()

    assert bits(shared["lo"]) == bits(exact["_p0"])
    assert bits(shared["hi"]) == bits(exact["_p1"])


def test_q411_decomposition_matches_pair_enumeration(spark):
    """q411's sufficient-statistics form == the round-14 blocked
    pair-join + linkage_score form, row for row. The decomposition's
    only nontrivial claims — matches ⇔ name_eq ∧ bal_close (weight
    algebra), the ±500 band join's adjacent-sub-bucket exhaustiveness,
    and the linear weight_sum — are all exercised on real data here."""
    from distcpplus_spark.catalog import load_table
    from distcpplus_spark.operators.dedup import linkage_score
    from distcpplus_spark.queries import load_all_queries

    queries, _ = load_all_queries()
    got = sorted(
        map(tuple, queries["q411_fellegi_sunter_linkage"](spark, SF).collect())
    )

    cust = load_table(spark, SF, "customer")
    a = cust.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg_a"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("SHIFTED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_b"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 7 == 0, F.lit(13700)).otherwise(
                F.lit(200)
            )
        ).alias("bal_b"),
    )
    pairs = a.withColumn("blk", F.expr("bal_a div 50000")).join(
        b.withColumn("blk", F.expr("bal_b div 50000")), ["nat", "blk"]
    )
    scored = linkage_score(
        pairs,
        [
            (F.col("name_a") == F.col("name_b"), 6, -5),
            (F.col("seg_a") == F.col("seg_b"), 3, -2),
            (F.abs(F.col("bal_a") - F.col("bal_b")) <= 500, 4, -3),
        ],
    )
    ref = sorted(
        map(
            tuple,
            scored.groupBy("nat")
            .agg(
                F.count("*").cast("long").alias("n_pairs"),
                F.sum((F.col("fs_weight") >= 8).cast("long")).alias(
                    "n_matches"
                ),
                F.sum(
                    (
                        (F.col("fs_weight") >= 8)
                        & (F.col("id_a") == F.col("id_b"))
                    ).cast("long")
                ).alias("n_true"),
                F.sum("fs_weight").cast("long").alias("weight_sum"),
            )
            .withColumn("nat", F.col("nat").cast("int"))
            .orderBy("nat")
            .collect(),
        )
    )
    assert got == ref


def test_exact_percentiles_rejects_out_of_range(spark):
    """ADVICE round 14: an out-of-range percentage raises (matching
    the F.percentile aggregate) instead of returning silent NULLs."""
    from distcpplus_spark.operators.scale import exact_percentiles

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match=r"percentages must be in"):
        exact_percentiles(df, "v", [0.5, 1.5])
