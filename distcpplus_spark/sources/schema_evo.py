"""Field-id schema evolution for parquet datasets (Iceberg-v2-style
column mapping, spec at iceberg.apache.org/spec — public).

Parquet files written at different schema versions are unified by
FIELD ID, not by name: a rename keeps the id (old files keep
serving the column under its new name), an added column gets a
fresh id (old files read NULL), a dropped id is simply absent from
the target schema. Name-based unification (Spark's ``mergeSchema``)
cannot express renames — after `b RENAME TO c` it returns BOTH a
null-padded `b` and a null-padded `c` — which is exactly why table
formats carry ids.

The ids ride IN the parquet files themselves: pyarrow stores a
field's ``PARQUET:field_id`` metadata in the file footer, so the
mapping needs no side-channel — any Iceberg-compatible reader sees
the same ids.

Scale design: resolution is a MANIFEST-level operation — one footer
read per file (the same per-file cost every lakehouse reader pays;
at cluster scale footers are read by the planning job or cached in
a manifest table, cf. operators/maintenance.py's zone maps).
Per-file projection/rename is a zero-cost plan node (alias), the
union is by position on the target schema, and every file scan
stays a plain pushdown-capable parquet scan — no Python in the row
path.

Reference parity: the reference engine copies files byte-for-byte
(DefaultCopyFilesMapper.java) and has no schema surface; this
belongs to the maintenance/lakehouse tier the north star adds
(SURVEY.md §2b scale levers, beside merge-on-read deletes in
operators/mor.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FIELD_ID_KEY = b"PARQUET:field_id"


def write_dataset_with_field_ids(
    df: DataFrame,
    dir_path: str,
    field_ids: dict[str, int],
    filename_prefix: str = "part",
) -> list[str]:
    """Distributed parquet sink with Iceberg-style field ids: EVERY
    task writes its own file via a pyarrow ParquetWriter inside
    ``mapInArrow`` — no data row visits the driver — and stamps the
    standard ``PARQUET:field_id`` footer metadata per column (what
    Iceberg/Spark vectorized readers consume). Files are written to
    ``<tmp>.inprogress`` and atomically renamed (the copier.py
    no-partial-file convention), named ``{prefix}-{partitionId:05d}``
    so a task RETRY overwrites its own output idempotently.

    EAGER, like Spark's native ``df.write``: returns the sorted list
    of written file paths (empty partitions write no file). Missing
    field ids fail HERE at plan time, not per task.

    Scale: this is the per-task write every distributed sink does —
    parallelism = input partitions, footer stamping is metadata-only.
    Arrow batches stream through the writer (one row group per Spark
    arrow batch), so a task never holds its partition in memory."""
    import pyarrow as pa

    for name in df.columns:
        if name not in field_ids:
            raise ValueError(f"no field id declared for column {name!r}")
    os.makedirs(dir_path, exist_ok=True)
    ids = {k: int(v) for k, v in field_ids.items()}

    def write_partition(batches):
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(
            dir_path, f"{filename_prefix}-{pid:05d}.parquet"
        )
        tmp = final + ".inprogress"
        writer = None
        schema = None
        n = 0
        try:
            for batch in batches:
                if writer is None:
                    schema = pa.schema(
                        [
                            pa.field(
                                f.name,
                                f.type,
                                f.nullable,
                                metadata={
                                    _FIELD_ID_KEY: str(
                                        ids[f.name]
                                    ).encode()
                                },
                            )
                            for f in batch.schema
                        ]
                    )
                    writer = pq.ParquetWriter(tmp, schema)
                # types are identical, only field METADATA differs —
                # re-wrapping the arrays under the stamped schema is
                # zero-copy in every pyarrow version
                writer.write_batch(
                    pa.RecordBatch.from_arrays(
                        list(batch.columns), schema=schema
                    )
                )
                n += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if writer is not None:
            os.replace(tmp, final)
            yield pa.record_batch(
                {"file": pa.array([final]), "rows": pa.array([n])}
            )

    manifest = df.mapInArrow(
        write_partition, "file string, rows long"
    ).collect()
    return sorted(r["file"] for r in manifest)


def write_with_field_ids(
    df: DataFrame, path: str, field_ids: dict[str, int]
) -> None:
    """Write ``df`` to ONE parquet file at ``path`` with an explicit
    field id per column — the version-fixture shape. Implemented on
    the distributed writer over a single partition + atomic rename,
    so no data row visits the driver (the pre-round-14 formulation
    was a ``toPandas`` collect); an EMPTY input still produces a
    schema-only file, matching the old behavior."""
    import shutil
    import tempfile

    for name in df.columns:
        if name not in field_ids:
            raise ValueError(f"no field id declared for column {name!r}")
    parent = os.path.dirname(path) or "."
    os.makedirs(parent, exist_ok=True)
    tmpdir = tempfile.mkdtemp(prefix="._fieldid_", dir=parent)
    try:
        files = write_dataset_with_field_ids(
            df.coalesce(1), tmpdir, field_ids
        )
        if files:
            os.replace(files[0], path)
        else:
            # zero rows -> zero task output files: emit the
            # schema-only file driver-side (metadata, not data)
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = pa.Table.from_pandas(
                df.limit(0).toPandas(), preserve_index=False
            )
            fields = [
                pa.field(
                    f.name, f.type, f.nullable,
                    metadata={
                        _FIELD_ID_KEY: str(
                            int(field_ids[f.name])
                        ).encode()
                    },
                )
                for f in tbl.schema
            ]
            pq.write_table(tbl.cast(pa.schema(fields)), path)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def read_field_ids(path: str) -> dict[int, str]:
    """Read the (field_id -> column name) mapping from a parquet
    file's footer. Raises if any column lacks an id (a file written
    outside id discipline must be backfilled, not guessed by name —
    Iceberg's `schema.name-mapping.default` is the explicit opt-in
    for that, deliberately not silently applied here)."""
    import pyarrow.parquet as pq

    out: dict[int, str] = {}
    for f in pq.read_schema(path):
        meta = f.metadata or {}
        if _FIELD_ID_KEY not in meta:
            raise ValueError(
                f"{path}: column {f.name!r} carries no field id"
            )
        out[int(meta[_FIELD_ID_KEY].decode())] = f.name
    return out


def read_by_field_id(
    spark: SparkSession,
    paths: list[str],
    target: list[tuple[int, str, str]],
) -> DataFrame:
    """Read parquet files written under DIFFERENT schema versions as
    one DataFrame with the ``target`` schema: a list of
    (field_id, name, spark_type) in output order.

    Per file: resolve each target id against the footer's id->name
    map — present ids project (and alias, which silently handles any
    rename history), absent ids fill NULL of the declared type (the
    add-column case). Extra ids in a file (dropped columns) are
    pruned by the projection, so their bytes are never read
    (ReadSchema excludes them — column pruning still reaches the
    scan).

    A DIRECTORY entry in ``paths`` expands to the parquet files
    inside it (sorted), resolved per file — the shape a
    ``write_dataset_with_field_ids`` output directory has."""
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            expanded.extend(
                sorted(
                    os.path.join(p, f)
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
            )
        else:
            expanded.append(p)
    parts = []
    for p in expanded:
        ids = read_field_ids(p)
        cols = []
        for fid, name, typ in target:
            if fid in ids:
                cols.append(F.col(ids[fid]).cast(typ).alias(name))
            else:
                cols.append(F.lit(None).cast(typ).alias(name))
        parts.append(spark.read.parquet(p).select(*cols))
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def schema_drift_report(spark, path_a: str, path_b: str):
    """Schema + null-profile drift between two table versions — the
    audit artifact a platform emits before accepting a new snapshot
    (what breaks downstream readers: dropped columns, type changes;
    what degrades models: null-rate jumps).

    Per column union of both schemas, one row:
    (column, change in {added, dropped, retyped, unchanged},
    type_a, type_b, null_rate_a_6, null_rate_b_6).

    Scale: schemas come from parquet FOOTERS (metadata); the null
    profile is ONE aggregation pass per side (count + per-column
    null counts fused into a single agg — no per-column scans), so
    the report costs two scans regardless of column count. Null
    rates use the floor(x*1e6 + 0.5)/1e6 gate (identical op sequence
    on identical bits in any engine — Python round() is half-EVEN
    and would diverge from SQL half-up at exact ties)."""
    import math

    from pyspark.sql import functions as F

    a = spark.read.parquet(path_a)
    b = spark.read.parquet(path_b)
    types_a = {f.name: f.dataType.simpleString() for f in a.schema.fields}
    types_b = {f.name: f.dataType.simpleString() for f in b.schema.fields}

    def null_rates(df, cols):
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols
        ]
        row = df.agg(*aggs).collect()[0]
        n = row["_n"] or 1
        return {
            c: math.floor(row[c] / n * 1e6 + 0.5) / 1e6 for c in cols
        }

    nr_a = null_rates(a, list(types_a))
    nr_b = null_rates(b, list(types_b))
    rows = []
    for c in sorted(set(types_a) | set(types_b)):
        ta, tb = types_a.get(c), types_b.get(c)
        if ta is None:
            change = "added"
        elif tb is None:
            change = "dropped"
        elif ta != tb:
            change = "retyped"
        else:
            change = "unchanged"
        rows.append((c, change, ta, tb, nr_a.get(c), nr_b.get(c)))
    # one-slice local relation: one row per drifted column
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1),
        "column string, change string, type_a string, type_b string, "
        "null_rate_a double, null_rate_b double",
    )
