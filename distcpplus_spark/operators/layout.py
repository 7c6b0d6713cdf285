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

import os
from functools import reduce

# module-top import: pandas_udf type hints (pd.Series) resolve in the
# DEFINING module's globals — a function-local import breaks them
import pandas as pd
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


# ---------------------------------------------------------------------------
# Bloom sidecar file index: point-lookup file skipping


def write_bloom_indexed(
    df: DataFrame,
    path: str,
    key_col: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
    num_files: int = 8,
    bits_per_key: int = 10,
) -> int:
    """Write ``df`` as parquet plus a per-file Bloom SIDECAR over
    ``key_col`` — the file-skipping index zone maps can't provide:
    min/max stats prune RANGE predicates, but a point lookup on a
    key hash-scattered across files prunes nothing without a
    membership index (what Delta/Iceberg Bloom indexes do; pyarrow
    16 cannot write parquet-native bloom filters, so the index rides
    beside the files).

    Build is distributed AND sidecars are written from the executor
    that built them: one pass reads the written files back, groups
    rows by ``input_file_name``, builds each file's bitmap in ONE
    task with the same double-hash family as operators/bloom.py (no
    false negatives by construction), and writes it as
    ``_bloomidx/<base>.bloom`` (tmp + atomic rename) before
    returning ONLY the manifest row (file, sidecar name, n_keys).
    Driver traffic is therefore independent of
    ``num_files * num_bits`` — a million-file table with 1 Mbit
    blooms collects ~a hundred bytes per file, not ~125 GB of
    bitmaps (the pre-round-10 shape). Executors must share the
    table's filesystem — the same assumption the parquet write
    itself makes. Returns the number of indexed files.

    Sizing (round 13): ``num_bits=None`` (the default) sizes the
    bitmap FROM THE DATA — ``bits_per_key`` bits per expected
    key-per-file, rounded up to a power of two, floored at 2^16. A
    FIXED default is a scale bug: 2^16 bits was ~100 bits/key at the
    driver SFs but ~1 bit/key at sf10 (62.5k keys/file), where the
    saturated bitmap matched every probe and the index stopped
    pruning (caught by q410's provable-miss assertion in the round-13
    sf10 sweep). bits_per_key=10 with 5 hashes gives ~0.9% FPR at any
    SF; the row count comes from parquet FOOTER metadata of the files
    just written, never a data scan.
    """
    import json

    df.repartition(num_files, F.col(key_col)).write.mode("error").parquet(
        path
    )
    spark = df.sparkSession
    if num_bits is None:
        n_rows = spark.read.parquet(path).count()  # footer-only count
        want = max(1 << 16, bits_per_key * max(n_rows, 1) // num_files)
        num_bits = 1 << (int(want) - 1).bit_length()
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of 2")
    idx_dir = os.path.join(path, "_bloomidx")
    os.makedirs(idx_dir, exist_ok=True)
    files = [
        f for f in os.listdir(path) if f.endswith(".parquet")
    ]
    manifest = _build_sidecars(
        spark, path, files, key_col, num_bits, num_hashes, idx_dir
    )
    meta = {
        "version": 2,
        "key_col": key_col,
        # recorded so probes build their one-row-per-value frame with
        # the SAME Spark type the bitmaps were hashed with (xxhash64
        # of a long and of its string rendering differ — a probe that
        # hardcoded 'long' made every non-long index write-only)
        "key_type": df.schema[key_col].dataType.simpleString(),
        "num_bits": num_bits,
        "num_hashes": num_hashes,
        "files": {
            r["file"]: {"sidecar": r["sidecar"], "n_keys": r["n_keys"]}
            for r in manifest
        },
    }
    _write_index_json(idx_dir, meta)
    return len(meta["files"])


def _build_sidecars(
    spark, path: str, bases: list[str], key_col: str,
    num_bits: int, num_hashes: int, idx_dir: str,
) -> list:
    """Distributed per-file bitmap build over the given parquet
    basenames, each sidecar written (tmp + atomic rename) by the
    executor task that built it; returns only the tiny manifest rows
    (file, sidecar, n_keys)."""
    import uuid as _uuid

    import pandas as pd
    from pyspark.sql import types as T

    from distcpplus_spark.operators.bloom import _positions, _with_hashes

    back = _with_hashes(
        spark.read.parquet(
            *[os.path.join(path, b) for b in bases]
        ).select(key_col),
        key_col,
    ).select(F.input_file_name().alias("_file"), "_h1", "_h2")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bitmap = np.zeros(num_bits // 8, dtype=np.uint8)
        h1 = pdf["_h1"].to_numpy()
        h2 = pdf["_h2"].to_numpy()
        for pos in _positions(h1, h2, num_hashes, num_bits):
            np.bitwise_or.at(
                bitmap,
                (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
        base = os.path.basename(str(pdf["_file"].iloc[0]))
        sidecar = base + ".bloom"
        # executor-side sidecar write: tmp + atomic rename, so a
        # crashed task leaves debris, never a torn sidecar
        tmp = os.path.join(idx_dir, f"{sidecar}.tmp-{_uuid.uuid4().hex[:8]}")
        with open(tmp, "wb") as fh:
            fh.write(bitmap.tobytes())
        os.replace(tmp, os.path.join(idx_dir, sidecar))
        return pd.DataFrame(
            {"file": [base], "sidecar": [sidecar], "n_keys": [len(pdf)]}
        )

    schema = T.StructType(
        [
            T.StructField("file", T.StringType(), False),
            T.StructField("sidecar", T.StringType(), False),
            T.StructField("n_keys", T.LongType(), False),
        ]
    )
    return back.groupBy("_file").applyInPandas(build, schema).collect()


def _write_index_json(idx_dir: str, meta: dict) -> None:
    import json

    tmp = os.path.join(idx_dir, "index.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(idx_dir, "index.json"))


def bloom_index_refresh(spark, path: str) -> tuple[int, int]:
    """INCREMENTAL index maintenance: detect parquet files that have
    appeared under ``path`` since the index was written (appends,
    compaction output), build sidecars for ONLY those files
    (executor-side, same hash family/params recorded in the
    manifest), and merge them into index.json (tmp + atomic rename —
    readers always see a complete manifest). Returns
    (files_indexed_now, files_total).

    Scale: the incremental cost is proportional to the NEW data, not
    the table — the append path of a lakehouse index. Files deleted
    from the table are dropped from the manifest (their sidecars are
    left for a vacuum pass; a stale sidecar can only cost a false
    candidate, never correctness, and index.json is the source of
    truth)."""
    idx_dir = os.path.join(path, "_bloomidx")
    meta = _load_bloom_meta(path)
    meta.pop("_bitmap_of")
    current = {f for f in os.listdir(path) if f.endswith(".parquet")}
    known = set(meta["files"])
    new = sorted(current - known)
    dropped = known - current
    for b in dropped:
        del meta["files"][b]
    if new:
        manifest = _build_sidecars(
            spark, path, new, meta["key_col"],
            meta["num_bits"], meta["num_hashes"], idx_dir,
        )
        for r in manifest:
            meta["files"][r["file"]] = {
                "sidecar": r["sidecar"], "n_keys": r["n_keys"]
            }
    if new or dropped:
        meta["version"] = 2  # refreshed v1 indexes upgrade in place
        _write_index_json(idx_dir, meta)
    return len(new), len(meta["files"])


def _load_bloom_meta(path: str) -> dict:
    import base64
    import json

    with open(os.path.join(path, "_bloomidx", "index.json")) as f:
        meta = json.load(f)
    idx_dir = os.path.join(path, "_bloomidx")

    def bitmap_of(base: str) -> bytes:
        ent = meta["files"][base]
        if isinstance(ent, str):  # v1: inline base64 bitmap
            return base64.b64decode(ent.encode())
        with open(os.path.join(idx_dir, ent["sidecar"]), "rb") as fh:
            return fh.read()

    meta["_bitmap_of"] = bitmap_of
    return meta


def bloom_index_candidates(
    spark, path: str, values: list
) -> tuple[list[str], int]:
    """Files that may contain ANY of ``values`` per the sidecar index
    (plus the total file count). POINT-GET path: membership tests run
    on the driver — fine for a handful of values; batch probes go
    through :func:`bloom_index_mark`, which never collects probe
    hashes. The value hashes come from a one-row-per-value Spark job
    so the probe uses the exact JVM xxhash64 the build used."""
    import numpy as np

    from distcpplus_spark.operators.bloom import _positions, _with_hashes

    meta = _load_bloom_meta(path)
    key_type = meta.get("key_type", "long")  # pre-round-9 indexes
    # one-slice local relation (the round-14 local_rows device): the
    # lookup values are a handful of keys, and a 32-slice parallelize
    # pays one Python round trip per slice on the collect below
    vals = spark.createDataFrame(
        spark.sparkContext.parallelize([(v,) for v in values], numSlices=1),
        f"{meta['key_col']} {key_type}",
    )
    hashed = _with_hashes(vals, meta["key_col"]).select("_h1", "_h2").collect()
    h1 = np.array([r["_h1"] for r in hashed], dtype=np.int64)
    h2 = np.array([r["_h2"] for r in hashed], dtype=np.int64)
    poss = _positions(h1, h2, meta["num_hashes"], meta["num_bits"])
    cands = []
    for base in meta["files"]:
        bitmap = np.frombuffer(meta["_bitmap_of"](base), dtype=np.uint8)
        hit = np.ones(len(values), dtype=bool)
        for pos in poss:
            byte = (pos >> np.uint64(3)).astype(np.int64)
            bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
            hit &= (bitmap[byte] & bit) != 0
        if hit.any():
            cands.append(os.path.join(path, base))
    return cands, len(meta["files"])


def bloom_index_mark(spark, path: str, probes: DataFrame) -> DataFrame:
    """BATCH probe: annotate every row of ``probes`` (which must
    carry the index's key column) with ``_candidate_files`` — the
    array of table files whose sidecar bloom admits the key. An
    empty array is a PROVABLE miss (no false negatives by
    construction); non-empty means candidate, to be confirmed by the
    exact residual read.

    Scale shape (the round-9 verdict's probe-side ask): nothing
    about the probe side crosses the driver — keys hash JVM-side
    (xxhash64, identical to the build), the sidecar bitmaps ride ONE
    broadcast (bounded by the index's declared
    num_files * num_bits/8 — the same budget the build declares),
    and membership tests run vectorized in an Arrow-batched pandas
    UDF over the probe partitions. A 10^9-row probe batch is
    map-only."""
    import pandas as pd
    from pyspark.sql import types as T

    from distcpplus_spark.operators.bloom import _positions, _with_hashes

    meta = _load_bloom_meta(path)
    key_col = meta["key_col"]
    num_bits, num_hashes = meta["num_bits"], meta["num_hashes"]
    bases = sorted(meta["files"])
    bc = spark.sparkContext.broadcast(
        {b: meta["_bitmap_of"](b) for b in bases}
    )

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def mark(h1: pd.Series, h2: pd.Series) -> pd.Series:
        import numpy as np

        maps = bc.value
        h1v = h1.to_numpy()
        h2v = h2.to_numpy()
        poss = _positions(h1v, h2v, num_hashes, num_bits)
        hits_per_file = []
        names = sorted(maps)
        for b in names:
            arr = np.frombuffer(maps[b], dtype=np.uint8)
            ok = np.ones(len(h1v), dtype=bool)
            for pos in poss:
                byte = arr[(pos >> np.uint64(3)).astype(np.int64)]
                bit = (pos & np.uint64(7)).astype(np.uint8)
                ok &= (byte >> bit) & np.uint8(1) == 1
            hits_per_file.append(ok)
        m = np.stack(hits_per_file) if hits_per_file else np.zeros(
            (0, len(h1v)), dtype=bool
        )
        return pd.Series(
            [[names[i] for i in np.flatnonzero(m[:, j])]
             for j in range(len(h1v))]
        )

    return (
        _with_hashes(probes, key_col)
        .withColumn("_candidate_files", mark(F.col("_h1"), F.col("_h2")))
        .drop("_h1", "_h2")
    )


def read_bloom_pruned_batch(
    spark, path: str, probes: DataFrame
) -> DataFrame:
    """Batch point-lookup join through the sidecar index: mark the
    probe batch executor-side, read ONLY the union of candidate
    files, and semi-join on the exact key (correctness is always the
    join's; the index only buys the skip). The only driver-side data
    is the DISTINCT candidate-file list — bounded by the table's
    file count, independent of probe cardinality."""
    meta = _load_bloom_meta(path)
    key_col = meta["key_col"]
    marked = bloom_index_mark(spark, path, probes)
    cands = [
        r["f"]
        for r in marked.select(
            F.explode("_candidate_files").alias("f")
        ).distinct().collect()
    ]
    if not cands:
        return spark.read.parquet(path).limit(0).join(
            probes.select(key_col), key_col, "left_semi"
        )
    table = spark.read.parquet(*[os.path.join(path, b) for b in cands])
    return table.join(
        probes.select(key_col).distinct(), key_col, "left_semi"
    )


def read_bloom_pruned(
    spark, path: str, key_col: str, values: list
) -> DataFrame:
    """Point lookup through the sidecar index: scan ONLY candidate
    files, then apply the exact IN-list residual filter (correctness
    is always the residual's; the index only buys the skip)."""
    cands, _total = bloom_index_candidates(spark, path, values)
    if not cands:
        return (
            spark.read.parquet(path)
            .filter(F.col(key_col).isin(values))
            .limit(0)
        )
    return spark.read.parquet(*cands).filter(F.col(key_col).isin(values))


def bloom_index_vacuum(path: str) -> list[str]:
    """Delete sidecar files under ``_bloomidx/`` that the manifest no
    longer references — refresh drops DELETED table files from
    index.json but leaves their sidecars (and crashed tasks can leave
    ``.tmp-*`` debris). index.json is the source of truth, so a stale
    sidecar costs only bytes, never correctness; this reclaims them.
    Returns the deleted file names. Mirrors the txlog vacuum
    discipline: only files provably unreferenced by the CURRENT
    manifest are touched."""
    idx_dir = os.path.join(path, "_bloomidx")
    meta = _load_bloom_meta(path)
    live = {"index.json"}
    for ent in meta["files"].values():
        if isinstance(ent, dict):
            live.add(ent["sidecar"])
    deleted = []
    for f in sorted(os.listdir(idx_dir)):
        if f not in live and (f.endswith(".bloom") or ".tmp-" in f):
            os.remove(os.path.join(idx_dir, f))
            deleted.append(f)
    return deleted
