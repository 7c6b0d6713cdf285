"""Round-8 queries: verification-surface closures (hash-gated twins
of the last impl-defined x-queries) and new operator tiers.

Reference parity notes cite turn/DistCPPlus files as provenance
(what to compute), never as implementation source — the execution
design here is Spark-first (see SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import query


@query(
    "q295_image_pattern_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CASE WHEN doc_id < 56 THEN 16 END AS width,
           CASE WHEN doc_id < 56 THEN 16 END AS height,
           CASE WHEN doc_id < 56 THEN 3 END AS channels,
           CASE WHEN doc_id < 56
                THEN CAST(round((1 + doc_id % 7) / 8.0, 6) AS DOUBLE)
           END AS mean_luma,
           CASE WHEN doc_id < 56
                THEN (CAST(1 AS BIGINT)
                      << CAST(8 * (1 + doc_id % 7) AS INTEGER)) - 1
           END AS phash
    FROM documents WHERE doc_id < 76
    ORDER BY media_id
    """,
)
def q295_image_pattern_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x05's hash-gated twin: REAL image decode + average-hash over
    NON-uniform synthetic images, plus the decode-error path, both
    under the driver's value gate.

    Per document < 56 the executors assemble a 16x16 24-bit BMP whose
    BOTTOM k cell-rows are white (k = 1 + doc_id % 7 of the 8 ahash
    grid rows; BMP rows are stored bottom-up, so the white rows are
    simply the FIRST stored rows). Closed forms, provable exact:
    mean_luma = k/8 (exact binary fraction; BT.601 weights sum to 1
    within 1e-16, far inside the round-6 gate) and the average hash
    sets exactly the LAST 8k bits — no cell ties are possible because
    white cells (luma 255) sit strictly above the global cell mean
    255*k/8 for k < 8 and black cells (0) strictly below it for
    k > 0 (the q257/q122 tie-avoidance discipline). Documents
    56-75 carry NULL content and must surface as all-null feature
    rows — the decode-error contract of the Arrow-batched
    mapInPandas pipeline (operators/multimodal.py), previously only
    rows-only-checked via x05."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 76)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import struct

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did >= 56:
                    rows.append((did, None))
                    continue
                w = h = 16
                k = 1 + did % 7          # white ahash cell-rows
                t = 2 * k                # white pixel rows (cell = 2x2)
                white = b"\xff" * (w * 3)
                black = b"\x00" * (w * 3)
                # bottom-up storage: first stored rows are the bottom
                body = white * t + black * (h - t)
                hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
                dib = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                    2835, 2835, 0, 0,
                )
                rows.append((did, hdr + dib + body))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return extract_image_features(media).orderBy("media_id")


@query(
    "q296_vacuum_plan_paths",
    oracle="""
    SELECT * FROM (VALUES
        ('_tmp_v9', true),
        ('stray.txt', false),
        ('v=1', true),
        ('v=2', true)
    ) AS t(relative_dst, is_dir)
    ORDER BY relative_dst
    """,
)
def q296_vacuum_plan_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x15's hash-gated twin: the vacuum PLAN's doomed-path set is
    deterministic (version dirs are named v=<N> in publish order;
    ancestor suppression collapses each doomed version to its
    top-level dir), so the kept/deleted split gates exactly.

    Publishes three versions, plants _tmp_v9 crash debris (with a
    child file, proving ancestor suppression) and a stray file, then
    plans vacuum keep_last=1: doomed must be exactly
    {v=1, v=2, _tmp_v9, stray.txt} — v=3 and the _CURRENT pointer
    kept, no doomed dir's children re-listed. Mirrors the reference's
    plan/execute split (O19) applied to table upkeep."""
    import os
    import tempfile

    from distcpplus_spark.operators.maintenance import (
        plan_vacuum,
        publish_dataset,
    )

    root = tempfile.mkdtemp(prefix="vacuum_gate_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    for take in (10, 20, 30):
        publish_dataset(docs.limit(take), root)
    os.makedirs(os.path.join(root, "_tmp_v9"), exist_ok=True)
    with open(os.path.join(root, "_tmp_v9", "part-000.parquet"), "wb") as f:
        f.write(b"debris")
    with open(os.path.join(root, "stray.txt"), "w") as f:
        f.write("not part of any version")
    return (
        plan_vacuum(spark, root, keep_last=1)
        .select("relative_dst", "is_dir")
        .orderBy("relative_dst")
    )
