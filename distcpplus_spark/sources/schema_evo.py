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


def write_with_field_ids(
    df: DataFrame, path: str, field_ids: dict[str, int]
) -> None:
    """Write ``df`` to one parquet file at ``path`` with an explicit
    field id per column, stored in the standard ``PARQUET:field_id``
    footer metadata (what Iceberg/Spark vectorized readers consume).

    Driver-side arrow write (version-fixture sized — the PRODUCTION
    write path for big tables is the normal distributed parquet sink;
    field ids there come from the table format's metadata layer).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
    fields = []
    for f in tbl.schema:
        fid = field_ids.get(f.name)
        if fid is None:
            raise ValueError(f"no field id declared for column {f.name!r}")
        fields.append(
            pa.field(f.name, f.type, f.nullable,
                     metadata={_FIELD_ID_KEY: str(int(fid)).encode()})
        )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl.cast(pa.schema(fields)), path)


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
    scan)."""
    parts = []
    for p in paths:
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
