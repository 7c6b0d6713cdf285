"""Z-order (Morton) data layout — multi-dimensional clustering for
data skipping, the OPTIMIZE ZORDER BY of lakehouse engines
re-expressed as plain Spark primitives.

Why it matters at 100 TB: parquet row-group pruning works off
per-file min/max stats. Range-partitioning on ONE column gives
perfect pruning on that column and none on any other; interleaving
the bits of two (or more) columns into a Morton code and
range-partitioning on THAT gives every file a small rectangle in
(a, b) space — both columns prune. The transform is one
repartitionByRange (a single shuffle with sampled range boundaries)
plus a local sort; nothing is collected.

The bit-interleave is pure integer math on JVM-side expressions
(shiftleft/shiftright/AND — whole-stage codegen, no UDF), which also
makes it closed-form reproducible in ANSI SQL for the q183 oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton code of two non-negative ints, interleaving the low
    ``bits`` bits of each (a takes the odd bit positions): callers
    normalize/clamp their columns first (e.g. ``pmod``/rank), same
    as production z-ordering normalizes via range-bucket ids."""
    terms = [
        F.shiftleft(
            F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
        for i in range(bits)
    ] + [
        F.shiftleft(
            F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)),
            2 * i,
        )
        for i in range(bits)
    ]
    return reduce(lambda x, y: x + y, terms)


def zvalue_sql(a_expr: str, b_expr: str, bits: int = 8) -> str:
    """The identical Morton code as an ANSI-SQL expression string —
    used by oracles and anyone pushing the layout key into SQL."""
    terms = [
        f"((({a_expr} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)
    ] + [f"((({b_expr} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    return "(" + " + ".join(terms) + ")"


def zorder_by(
    df: DataFrame, a: Column, b: Column, bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rewrite the DataFrame's layout so rows land range-partitioned
    and locally sorted by their Morton code — write the result out
    and every file covers a compact rectangle of (a, b)."""
    z = zvalue(a, b, bits).alias("_z")
    out = df.withColumn("_z", z)
    out = (
        out.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").drop("_z")


def zorder_bucket_stats(
    df: DataFrame, a: Column, b: Column, bits: int = 8,
    bucket_shift: int = 8,
) -> DataFrame:
    """Data-skipping effectiveness report: bucket rows by the HIGH
    Morton bits (what a range-partitioned file boundary would see)
    and emit each bucket's row count and per-column min/max — the
    exact stats a reader would prune on. Deterministic (no sampling),
    hence oracle-checkable, unlike repartitionByRange boundaries."""
    z = zvalue(a, b, bits)
    return (
        df.select(
            F.shiftright(z, bucket_shift).alias("bucket"),
            a.cast("bigint").alias("_a"),
            b.cast("bigint").alias("_b"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_a").alias("min_a"),
            F.max("_a").alias("max_a"),
            F.min("_b").alias("min_b"),
            F.max("_b").alias("max_b"),
        )
    )
