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


# ---------------------------------------------------------------------------
# Zone maps: per-file min/max manifests + driver-side file pruning.
# ---------------------------------------------------------------------------

def write_zonemapped(
    df: DataFrame,
    path: str,
    cluster_col: str,
    num_files: int,
) -> None:
    """Write ``df`` as parquet clustered so zone maps are TIGHT:
    repartitionByRange on the cluster column gives every output file
    a disjoint value range, so a later min/max manifest prunes the
    file list to exactly the files a range predicate touches.

    Scale: one shuffle (range exchange with sampled boundaries) —
    the same cost profile as any sorted write; nothing collects.
    """
    (
        df.repartitionByRange(num_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zonemap_manifest(spark, path: str, stat_cols: list[str]) -> DataFrame:
    """Build a per-file min/max manifest by reading parquet FOOTERS
    only — the metadata-scale analogue of a lakehouse manifest file.

    The file list is driver-side (one directory listing — metadata),
    but the footer scan is distributed: each task opens its files
    with pyarrow and reads row-group statistics, so a 100 TB table
    with 100k files costs 100k footer reads spread over the cluster,
    never a data scan. Numeric stats are carried as DOUBLE (exact
    for integers below 2^53 — parquet keys and timestamps-as-micros
    beyond that should range-partition on a derived bucket instead).
    """
    import os

    import pandas as pd

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    cols = list(stat_cols)

    def scan(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                idx = {md.schema.column(i).name: i
                       for i in range(md.num_columns)}
                for c in cols:
                    lo = hi = None
                    n = 0
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[c]).statistics
                        n += md.row_group(rg).num_rows
                        if st is None or not st.has_min_max:
                            continue
                        mn, mx = float(st.min), float(st.max)
                        lo = mn if lo is None else min(lo, mn)
                        hi = mx if hi is None else max(hi, mx)
                    out.append((p, c, lo, hi, n))
            yield pd.DataFrame(
                out, columns=["path", "col", "vmin", "vmax", "n_rows"]
            )

    fdf = spark.createDataFrame([(f,) for f in files], "path string")
    return fdf.repartition(min(len(files), 32) or 1).mapInPandas(
        scan,
        "path string, col string, vmin double, vmax double, n_rows bigint",
    )


def read_with_zonemap(
    spark,
    path: str,
    manifest_rows,
    col: str,
    lo: float | None,
    hi: float | None,
):
    """Prune the file list against a [lo, hi] range predicate using
    the zone-map manifest, then read ONLY surviving files and apply
    the residual filter (pruning is an optimization, never the
    correctness carrier — a file whose stats are missing is kept).

    ``manifest_rows`` is the collected manifest (one row per file —
    metadata-scale by construction, like any table-format planner's
    manifest read). Returns (DataFrame, files_kept, files_total).
    """
    by_file: dict[str, tuple] = {}
    total = set()
    for r in manifest_rows:
        total.add(r["path"])
        if r["col"] == col:
            by_file[r["path"]] = (r["vmin"], r["vmax"])
    kept = []
    for p in sorted(total):
        vmin, vmax = by_file.get(p, (None, None))
        if vmin is None or vmax is None:
            kept.append(p)  # no stats -> cannot prune
            continue
        if (hi is not None and vmin > hi) or (lo is not None and vmax < lo):
            continue
        kept.append(p)
    df = spark.read.parquet(*kept) if kept else spark.read.parquet(path).limit(0)
    c = F.col(col)
    if lo is not None:
        df = df.filter(c >= F.lit(lo))
    if hi is not None:
        df = df.filter(c <= F.lit(hi))
    return df, len(kept), len(total)
