"""Non-SQL-expressible operator entries (no oracle — the driver
records rows-only checks; FIXTURES.md excludes UDF/multimodal ops
from hashing).

These exercise the library operators end-to-end on fixture tables:
LSH dedup pipeline, hyperplane-LSH similarity, connected components,
multimodal mapInPandas plumbing, and approximate aggregates (whose
results are impl-defined and cannot hash-match DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distcpplus_spark.catalog import load_table
from distcpplus_spark.queries import local_rows, query, small_sort


@query(
    "x01_minhash_lsh_dedup",
    # doc set bounded to doc_id < 5000 on BOTH sides (the q252
    # discipline): the fixture's 31-word vocabulary gives random
    # documents high ambient Jaccard, so LSH buckets degenerate toward
    # all-pairs as the corpus grows — the full-corpus variant cost
    # 1256 s at sf3 (round-10 sweep) purely on fixture ambience. The
    # bound is a no-op at sf0.01 (500 docs) and sf0.1 (doc_id tops out
    # at 4999); real corpora have near-zero ambient similarity.
    oracle="""
    WITH sh AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 range(1, greatest(length(text) - 7, 0) + 1),
                 i -> substr(text, CAST(i AS INTEGER), 8)))) AS shingle
        FROM documents WHERE doc_id < 5000
      )
    ),
    sig AS (
      SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS minhash
      FROM sh, (SELECT unnest(range(0, 16)) AS seed) seeds
      GROUP BY doc_id, seed
    ),
    banded AS (
      SELECT doc_id, CAST(floor(seed / 4) AS INTEGER) AS band,
             string_agg(minhash, ',' ORDER BY minhash) AS band_sig
      FROM sig
      GROUP BY doc_id, CAST(floor(seed / 4) AS INTEGER)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS ni
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a
      JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    losers AS (
      SELECT DISTINCT id_b FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE ni / CAST(na.n + nb.n - ni AS DOUBLE) >= 0.7
    )
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM losers) AND doc_id < 5000
    ORDER BY doc_id
    """,
)
def x01_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH dedup pipeline (operators.dedup) over
    documents: signatures → banded candidates → Jaccard verify →
    survivors. Runs the PORTABLE (md5) hash variant so the whole
    pipeline — 16 seeded minhashes, 4 bands × 4 rows, exact-Jaccard
    verification at 0.7, star-collapse survivor choice — is
    reproduced bit-for-bit by the DuckDB oracle; x10 keeps the
    xxhash64 fast path exercised.
    """
    from distcpplus_spark.operators.dedup import minhash_lsh_dedup

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 5000  # mirrors the oracle's bound (see above)
    )
    return minhash_lsh_dedup(
        docs, "text", "doc_id", threshold=0.7, portable=True
    ).select("doc_id", "lang", "source").orderBy("doc_id")


@query("x02_simhash_fingerprints")
def x02_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64-based 32-bit SimHash fingerprints (engine-native hash,
    not the portable md5 variant of q60)."""
    from distcpplus_spark.operators.dedup import simhash_fingerprints

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_fingerprints(docs, "text", "doc_id").orderBy("_id")


@query("x03_lsh_similarity_topk")
def x03_lsh_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (operators.similarity)."""
    from distcpplus_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, queries_df, "embedding", "vec_id", k=5).orderBy(
        "query_id", "rank"
    )


@query("x04_connected_components")
def x04_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative min-label connected components over LSH candidate
    pairs — the exact-components alternative to star-collapse dedup."""
    from distcpplus_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        union_find_components,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8)
    cands = minhash_lsh_candidates(sigs, bands=4, rows_per_band=2)
    return union_find_components(cands).orderBy("node")


@query("x05_multimodal_features")
def x05_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas image-feature plumbing over synthetic
    media derived deterministically from documents (text bytes stand
    in for image bytes; decode is stubbed — see operators.multimodal)."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
    )
    return extract_image_features(media).orderBy("media_id")


@query("x06_approx_aggregates")
def x06_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct + percentile_approx smoke (impl-defined
    sketch results — rows-only check by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_p50"),
    ).orderBy("l_returnflag")


@query("x07_file_listing")
def x07_file_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed lister (sources.lister) over the fixture dir
    itself — real filesystem listing as a DataFrame."""
    from distcpplus_spark.sources.lister import list_tree

    return (
        list_tree(spark, [sf_dir])
        .select("relative_dst", "length", "is_dir", "cost")
        .orderBy("relative_dst")
    )


@query("x08_copy_plan_dryrun")
def x08_copy_plan_dryrun(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dry-run copy plan (engine.plan, O19): plan the fixture dir →
    an empty dst; returns the plan rows without executing."""
    import tempfile

    from distcpplus_spark.engine import CopyOptions, DistCpPlusEngine

    engine = DistCpPlusEngine(spark)
    dst = tempfile.mkdtemp(prefix="dryrun_dst_")
    plan = engine.plan([sf_dir], dst, CopyOptions(update=True, skip_ts_check=True))
    return plan.copies.select(
        "relative_dst", "length", "is_dir", "action", "bucket"
    ).orderBy("relative_dst")


@query("x09_ivf_ann_probed")
def x09_ivf_ann_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN in its approximate operating point: 16 inverted lists,
    2 probed per query — ~1/8 of the corpus scanned per query. Result
    is impl-defined (depends on the quantizer), hence rows-only."""
    from distcpplus_spark.operators.similarity import ivf_build, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(
        emb, "embedding", "vec_id", n_lists=16, iters=2
    )
    return ivf_search(
        assigned,
        centroids,
        emb.filter(F.col("vec_id") < 5),
        "embedding",
        "vec_id",
        k=5,
        nprobe=2,
    ).orderBy("query_id", "rank")


@query("x10_lsh_amplified_pairs")
def x10_lsh_amplified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified (3-seed) LSH near-dup pair search over embeddings
    (operators.similarity.pairwise_above_threshold_amplified)."""
    from distcpplus_spark.operators.similarity import (
        pairwise_above_threshold_amplified,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    # fixture embeddings are near-orthogonal (max pairwise cosine
    # ~0.44), so the "near-dup" bar here is the top tail of that range;
    # 4 planes → 16 buckets keeps the 200-vector subset co-bucketed
    return (
        pairwise_above_threshold_amplified(
            emb, "embedding", "vec_id", threshold=0.25, n_planes=4
        )
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy("id_a", "id_b")
    )


@query("x11_stratified_sample")
def x11_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sampling (df.stat.sampleBy): deterministic
    within a Spark version but impl-defined across engines — rows-only.
    For engine-portable splits use q80's hash-based assignment."""
    li = load_table(spark, sf_dir, "lineitem")
    frac = {"A": 0.1, "N": 0.05, "R": 0.1}
    sample = li.stat.sampleBy("l_returnflag", frac, seed=42)
    return (
        sample.groupBy("l_returnflag")
        .count()
        .withColumnRenamed("count", "n_sampled")
        .orderBy("l_returnflag")
    )


@query("x12_chunk_split_plan")
def x12_chunk_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked-copy split plan (operators.copier.split_into_chunks)
    over the fixture dir listing: files larger than 256 KB explode
    into byte-range chunk rows — the huge-file straggler fix, shown
    as its plan rows (no copying)."""
    from distcpplus_spark.operators.copier import split_into_chunks
    from distcpplus_spark.sources.lister import list_tree

    listing = list_tree(spark, [sf_dir]).filter(~F.col("is_dir"))
    return (
        split_into_chunks(listing, chunk_bytes=256 * 1024)
        .select(
            "relative_dst", "length", "n_chunks", "chunk_idx",
            "offset", "chunk_len",
        )
        .orderBy("relative_dst", "chunk_idx")
    )


@query("x13_lsh_multiprobe_topk")
def x13_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe hyperplane LSH top-k: each query probes its own
    bucket plus every Hamming-1 neighbor (operators.similarity.
    hamming1_probes) — the recall-lift knob of the LSH index.

    DIAGNOSTIC-ONLY on this fixture (rows-only by design): the
    embeddings are near-orthogonal (true top-5 cosines <= ~0.44), so
    multiprobe recall is ~0.15-0.3 BY THEORY (per-plane collision
    p = 1-θ/π; recovery p^8 + 8p^7(1-p)) — no ANN family has an
    honest bound on that geometry; brute force (q61) is the correct
    tool there. The honest recall CONTRACT lives in q258 on planted
    clustered geometry; tests/test_multiprobe_theory.py pins the
    measured recall here to the collision formula within a 4.5σ
    Poisson-binomial band and asserts the superset theorem
    (multi-probe candidates ⊇ single-probe) on any geometry."""
    from distcpplus_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(
        emb, queries_df, "embedding", "vec_id", k=5, multi_probe=True
    ).orderBy("query_id", "rank")


@query(
    "q105_audio_wav_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           8000 AS sample_rate,
           1 AS channels,
           CAST(800 + (doc_id % 7) * 400 AS BIGINT) AS n_samples,
           CAST(round((800 + (doc_id % 7) * 400) / 8000.0, 6) AS DOUBLE)
               AS duration_s,
           CAST(round((4096 + (doc_id % 5) * 4096) / 32768.0, 6) AS DOUBLE)
               AS rms
    FROM documents WHERE doc_id < 50
    ORDER BY media_id
    """,
)
def q105_audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over mapInPandas: PCM WAV bytes synthesized
    deterministically per document (tone length/amplitude derived from
    doc_id, built with stdlib struct inside the executors), then
    parsed back by the engine's own RIFF/PCM parser
    (operators.multimodal._parse_wav) — rate, duration, and RMS are
    computed from actual samples, not stubs."""
    from distcpplus_spark.operators.multimodal import extract_audio_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import struct

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                n = 800 + int(did) % 7 * 400          # 0.1-0.4 s at 8 kHz
                amp = 4096 + int(did) % 5 * 4096
                samples = [amp if i % 2 == 0 else -amp for i in range(n)]
                data = struct.pack(f"<{n}h", *samples)
                wav = struct.pack(
                    "<4sI4s4sIHHIIHH4sI",
                    b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
                    8000, 16000, 2, 16, b"data", len(data),
                ) + data
                rows.append((int(did), wav))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return extract_audio_features(media).orderBy("media_id")


@query("x15_dataset_vacuum_plan")
def x15_dataset_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-dataset maintenance (operators.maintenance): publish
    three versions of a derived table into a temp root, then PLAN the
    vacuum (keep_last=1) — the doomed-path DataFrame with ancestor
    suppression, the O19 plan/execute split applied to table upkeep."""
    import tempfile

    from distcpplus_spark.operators.maintenance import (
        plan_vacuum,
        publish_dataset,
    )

    root = tempfile.mkdtemp(prefix="vacuum_ds_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    for take in (10, 20, 30):
        publish_dataset(docs.limit(take), root)
    return (
        plan_vacuum(spark, root, keep_last=1)
        .select("relative_dst", "is_dir")
        .orderBy("relative_dst")
    )


@query(
    "q122_image_bmp_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(8 + doc_id % 9 AS INTEGER) AS width,
           CAST(8 + doc_id % 5 AS INTEGER) AS height,
           3 AS channels,
           CAST(round((doc_id % 256) / 255.0, 6) AS DOUBLE) AS mean_luma,
           CAST(0 AS BIGINT) AS phash
    FROM documents WHERE doc_id < 60
    ORDER BY media_id
    """,
)
def q122_image_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under the driver's hash gate: per document a
    deterministic solid-gray BMP is assembled in the executors
    (stdlib struct), decoded by the engine's own parser
    (operators.multimodal._decode_bmp), and the features checked
    against closed form — a solid gray=c image has mean_luma c/255
    exactly (BT.601 weights sum to 1) and an average-hash of 0 (no
    cell exceeds the global mean)."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import struct

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                w = 8 + int(did) % 9
                h = 8 + int(did) % 5
                c = int(did) % 256
                row_bytes = (w * 3 + 3) & ~3
                body = (
                    bytes((c, c, c)) * w + b"\x00" * (row_bytes - w * 3)
                ) * h
                hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
                dib = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                    2835, 2835, 0, 0,
                )
                rows.append((int(did), hdr + dib + body))
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
    "q155_image_jpeg_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           16 AS width,
           16 AS height,
           3 AS channels,
           CAST(round((
               (doc_id % 256) + (doc_id * 7 + 31) % 256
               + (doc_id * 13 + 67) % 256 + (doc_id * 29 + 5) % 256
           ) / 4.0 / 255.0, 6) AS DOUBLE) AS mean_luma
    FROM documents WHERE doc_id < 60
    ORDER BY media_id
    """,
)
def q155_image_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode under the driver's hash gate: per document a
    16x16 quadrant-gray image is compressed to a genuine baseline
    JFIF stream (4:2:0, quality 99) by the hand-rolled encoder inside
    the executors, then decoded back by the engine's own Huffman+DCT
    decoder (operators/jpeg.py) via extract_image_features. At
    quality 99 the luma DC quant step is 1 and each 8x8 block is
    constant, so every pixel reconstructs EXACTLY and mean_luma
    matches the closed form (c1+c2+c3+c4)/4/255 computed by DuckDB
    (BT.601 weights sum to 1; gray pixels carry zero chroma diff, so
    4:2:0 subsampling is lossless here). phash is dropped from the
    projection: its strict > comparisons sit on float ties for
    near-equal quadrants — pytest (tests/test_jpeg.py) covers hashes
    and the AC/texture paths instead."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                px = np.zeros((16, 16, 3), dtype=np.uint8)
                px[:8, :8] = d % 256
                px[:8, 8:] = (d * 7 + 31) % 256
                px[8:, :8] = (d * 13 + 67) % 256
                px[8:, 8:] = (d * 29 + 5) % 256
                rows.append(
                    (d, encode_jpeg(px, quality=99, subsampling="420"))
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return (
        extract_image_features(media)
        .select("media_id", "width", "height", "channels", "mean_luma")
        .orderBy("media_id")
    )


@query(
    "q157_video_frame_sampling",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(round(i / 5.0, 6) AS DOUBLE) AS pts_s,
           CAST(length('frame-' || doc_id || '-' || i) AS BIGINT)
               AS frame_len,
           md5('frame-' || doc_id || '-' || i) AS frame_md5
    FROM documents,
         LATERAL unnest(range(0, 12 + doc_id % 7)) AS t(i)
    WHERE doc_id < 50 AND i % 5 = 0
    ORDER BY media_id, frame_idx
    """,
)
def q157_video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 frame sampling under the driver's hash gate: per
    document a structurally valid progressive MP4 (ftyp+mdat+moov
    with full stts/stsz/stsc/stco/stss tables, operators/mp4.py
    build_mp4) is assembled in the executors carrying 12+doc_id%7
    ASCII frame payloads at 5 fps, then sample_video_frames walks the
    container's sample tables for real — one frame per second means
    exactly the samples with index % 5 == 0, each cut byte-exact from
    mdat (verified via md5 against DuckDB's closed-form string hash)
    with its decode timestamp."""
    from distcpplus_spark.operators.multimodal import sample_video_frames

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        from distcpplus_spark.operators.mp4 import build_mp4

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                frames = [
                    f"frame-{d}-{i}".encode() for i in range(12 + d % 7)
                ]
                rows.append((d, build_mp4(frames, fps=5)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return (
        sample_video_frames(media, every_n_seconds=1.0)
        .select(
            "media_id",
            "frame_idx",
            "pts_s",
            F.length("frame").cast("bigint").alias("frame_len"),
            F.md5("frame").alias("frame_md5"),
        )
        .orderBy("media_id", "frame_idx")
    )


@query(
    "q171_image_gif_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           14 AS width,
           10 AS height,
           3 AS channels,
           CAST(round((
             least(doc_id % 256, 255) * 70
             + least((doc_id * 11 + 13) % 256, 255) * 70
           ) / 140.0 / 255.0, 6) AS DOUBLE) AS mean_luma
    FROM documents WHERE doc_id < 60
    ORDER BY media_id
    """,
)
def q171_image_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode under the driver's hash gate: per document a
    14x10 two-tone gray GIF (left/right halves) is LZW-compressed by
    the engine's own encoder inside the executors and decoded back by
    its own LZW decoder via extract_image_features. GIF is lossless,
    so mean_luma matches the closed form (7 columns of c1 + 7 of c2,
    BT.601 weights summing to 1); phash is dropped (gray-tie float
    comparisons), the same projection choice as q155."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.gif import encode_gif

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                px = np.zeros((10, 14, 3), dtype=np.uint8)
                px[:, :7] = d % 256
                px[:, 7:] = (d * 11 + 13) % 256
                rows.append((d, encode_gif(px)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return (
        extract_image_features(media)
        .select("media_id", "width", "height", "channels", "mean_luma")
        .orderBy("media_id")
    )


@query(
    "q172_image_tiff_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(6 + doc_id % 8 AS INTEGER) AS width,
           CAST(5 + doc_id % 6 AS INTEGER) AS height,
           3 AS channels,
           CAST(round((doc_id * 3 + 7) % 256 / 255.0, 6) AS DOUBLE)
               AS mean_luma
    FROM documents WHERE doc_id < 60
    ORDER BY media_id
    """,
)
def q172_image_tiff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode under the driver's hash gate: per document a
    solid-gray PackBits-compressed TIFF (operators/tiff.py encoder)
    is assembled in the executors and decoded back by the engine's
    own IFD/strip/PackBits parser via extract_image_features. TIFF
    is lossless, so mean_luma is exactly c/255 (BT.601 weights sum
    to 1) — same closed-form contract as q122 (BMP), q155 (JPEG
    q99), and q171 (GIF)."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.tiff import encode_tiff

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 6 + d % 8, 5 + d % 6
                c = (d * 3 + 7) % 256
                px = np.full((h, w, 3), c, dtype=np.uint8)
                rows.append((d, encode_tiff(px, packbits=True)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return (
        extract_image_features(media)
        .select("media_id", "width", "height", "channels", "mean_luma")
        .orderBy("media_id")
    )


@query("x17_image_ahash_neardup")
def x17_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual near-duplicate detection end-to-end: deterministic
    textured BMPs (10 base patterns × 8 one-pixel-flip variants) are
    synthesized in executors, decoded by the engine's REAL BMP parser
    into 64-bit average-hashes (operators.multimodal), then paired by
    the SimHash banding trick — split each hash into 4×16-bit bands,
    equi-join on (band_idx, band_value), verify candidates with exact
    bit_count(XOR) ≤ 6. One-pixel variants of the same pattern keep
    most ahash bits, so they share a band; distinct patterns don't.
    Scale shape: candidate generation is a band equi-join (shuffle on
    16-bit keys), never an all-pairs image comparison; rows-only
    because the pair set depends on the engine's own hash."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import struct

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                g, v = int(did) % 10, int(did) // 10
                w = h = 16
                px = bytearray()
                row_bytes = (w * 3 + 3) & ~3
                for y in range(h - 1, -1, -1):  # BMP is bottom-up
                    line = bytearray()
                    for x in range(w):
                        lum = 255 if ((x * 31 + y * 17 + g * 7) % 97) > 48 else 0
                        if (x + y * 16) % 256 == v * 37:
                            lum = 255 - lum  # the one-pixel variant flip
                        line += bytes((lum, lum, lum))
                    px += line + b"\x00" * (row_bytes - w * 3)
                hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
                dib = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                    2835, 2835, 0, 0,
                )
                rows.append((int(did), hdr + dib + bytes(px)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    feats = extract_image_features(
        docs.select("doc_id").mapInPandas(synth, media_schema)
    ).select("media_id", "phash")

    bands = feats.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("phash", i * 16) % (1 << 16)
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 6)
    )
    return small_sort(pairs, "media_a", "media_b")


@query("x20_pq_ann_topk")
def x20_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.pq_build/
    pq_search): per-subspace k-means codebooks compress each vector
    to m=8 codes, search scans codes only via the ADC table fold —
    the memory-bound scale path beside IVF (x09) and LSH (x03).
    Deterministic (seeded codebooks, tie-broken folds) but
    codebook-dependent, hence rows-only; tests/test_pq.py pins the
    ADC invariant and exactness on codebook-resident vectors."""
    from distcpplus_spark.operators.similarity import pq_build, pq_search

    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = pq_build(emb, "embedding", "vec_id", m=8, k=16, iters=2)
    return (
        pq_search(
            codes,
            books,
            emb.filter(F.col("vec_id") < 5),
            "embedding",
            "vec_id",
            k=5,
        )
        .select(
            "query_id",
            "corpus_id",
            F.round("approx_cos", 6).alias("approx_cos"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


@query("x18_pagerank")
def x18_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite part↔supplier graph derived from
    lineitem (undirected edges, damping 0.85, 8 fixed iterations —
    deterministic, so the driver's stability re-run hashes agree).

    The iterative pattern: per-iteration contribution join + aggregate
    stays fully distributed; only the loop control runs on the driver.
    At scale, checkpoint the rank frame every few iterations to
    truncate lineage, and key both sides by the same partitioning so
    the join reuses one shuffle (the same driver-fold shape as k-means
    and connected components)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + 1_000_000).alias("dst"),
    ).distinct()
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(8):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(0.15) + 0.85 * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                "rank"
            ),
        )
        if i % 4 == 3:  # truncate lineage mid-loop
            ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
    )


@query("x19_partitioned_upsert")
def x19_partitioned_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned upsert (operators/upsert.py::upsert_partitioned):
    publish documents partitioned by source into a fresh temp table,
    apply a batch that UPDATES some keys, INSERTS new ones, and MOVES
    one key across partitions, then read back the affected state.

    Scale contract on display: only partitions touched by the batch
    (plus moved-key old homes, found via a column-pruned broadcast
    join) are rewritten — a 100 TB table absorbs a small batch by
    rewriting MBs, not the table. Deterministic: fixed batch, fresh
    dir per invocation (the driver's stability re-run hashes agree)."""
    import shutil
    import tempfile

    from distcpplus_spark.operators.upsert import upsert_partitioned

    root = tempfile.mkdtemp(prefix="upsert_ds_")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).filter(F.col("doc_id") < 120)
    docs.write.mode("overwrite").partitionBy("source").parquet(root)
    updates = spark.createDataFrame(
        [
            (1, "src1", 111_111),       # update in place
            (2, "src0", 222_222),       # moved key: new partition
            (100_000, "src2", 42),      # brand-new key
        ],
        "doc_id BIGINT, source STRING, n_chars BIGINT",
    )
    try:
        n_rewritten = upsert_partitioned(
            spark, root, updates, key="doc_id", partition_col="source"
        )
        rows = (
            spark.read.parquet(root)
            .filter(
                F.col("doc_id").isin(1, 2, 100_000)
                | (F.col("n_chars") > 100_000)
            )
            .select(
                "doc_id", "source", "n_chars",
                F.lit(n_rewritten).alias("n_partitions_rewritten"),
            )
            .orderBy("doc_id")
            .collect()
        )
    finally:
        # repeated bench/stability invocations must not accumulate
        # parquet copies on disk — materialize, then remove the dir
        shutil.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows,
        "doc_id BIGINT, source STRING, n_chars BIGINT, "
        "n_partitions_rewritten INT",
    ).orderBy("doc_id")


@query(
    "q178_image_jpeg_progressive",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           16 AS width,
           16 AS height,
           3 AS channels,
           CAST(round((
               (doc_id * 3 + 11) % 256 + (doc_id * 17 + 43) % 256
               + (doc_id * 23 + 7) % 256 + (doc_id * 31 + 91) % 256
           ) / 4.0 / 255.0, 6) AS DOUBLE) AS mean_luma
    FROM documents WHERE doc_id < 60
    ORDER BY media_id
    """,
)
def q178_image_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PROGRESSIVE JPEG decode under the driver's hash gate: per
    document a 16x16 quadrant-gray image is compressed to a genuine
    SOF2 multi-scan stream (spectral selection + successive
    approximation, the libjpeg-style 10-scan script) by
    operators/jpeg.py:encode_jpeg_progressive inside the executors,
    then decoded back through the engine's progressive scan decoder
    via extract_image_features. Same exactness premise as q155: at
    quality 99 the luma DC quant step is 1 and every 8x8 block is
    constant, so the successive-approximation DC scans (Al=1 then the
    refinement bit) reconstruct each block's DC exactly and mean_luma
    matches DuckDB's closed form. The reference has no JPEG analogue
    (DefaultCopyFilesMapper.java:141-160 treats content as opaque
    bytes); this closes the progressive half of the round-5 review's
    codec ask."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.jpeg import encode_jpeg_progressive

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                px = np.zeros((16, 16, 3), dtype=np.uint8)
                px[:8, :8] = (d * 3 + 11) % 256
                px[:8, 8:] = (d * 17 + 43) % 256
                px[8:, :8] = (d * 23 + 7) % 256
                px[8:, 8:] = (d * 31 + 91) % 256
                rows.append(
                    (d, encode_jpeg_progressive(px, quality=99))
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return (
        extract_image_features(media)
        .select("media_id", "width", "height", "channels", "mean_luma")
        .orderBy("media_id")
    )


@query(
    "q182_audio_spectrum",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           8000 AS sample_rate,
           CAST(8000 AS BIGINT) AS n_samples,
           CAST(100 + (doc_id % 40) * 25 AS BIGINT) AS dominant_hz,
           CAST(0.8 AS DOUBLE) AS peak_share4
    FROM documents WHERE doc_id < 80
    ORDER BY media_id
    """,
)
def q182_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frequency-domain audio analysis under the driver's hash
    gate (operators/multimodal.py:extract_audio_spectrum): per
    document a 1-second 8 kHz PCM WAV carrying two pure tones —
    amp 12000 at f = 100 + (doc_id%40)*25 Hz and amp 6000 at 2f — is
    synthesized in the executors, then the numpy rFFT finds the
    dominant bin. Integer tone frequencies over a full second land
    exactly on FFT bins (zero spectral leakage), so dominant_hz is
    exact and the peak's energy share is the closed-form rational
    144/(144+36) = 0.8. int16 quantization noise shifts the measured
    share by ~5e-6 (it counts in the total-energy denominator), so
    the gate compares at round-4 — a 10x margin — rather than
    round-6."""
    from distcpplus_spark.operators.multimodal import extract_audio_spectrum

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.multimodal import _build_wav

        t = np.arange(8000)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                f1 = 100 + (d % 40) * 25
                x = (
                    12000.0 * np.sin(2 * np.pi * f1 * t / 8000.0)
                    + 6000.0 * np.sin(2 * np.pi * 2 * f1 * t / 8000.0)
                )
                sig = np.round(x).astype(np.int16).reshape(-1, 1)
                rows.append((d, _build_wav(sig, 8000)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return (
        extract_audio_spectrum(media)
        .select(
            "media_id", "sample_rate", "n_samples", "dominant_hz",
            F.round("peak_share", 4).alias("peak_share4"),
        )
        .orderBy("media_id")
    )


@query(
    "q191_compaction_report",
    oracle="""
    SELECT CAST(48 AS BIGINT) AS files_before,
           CAST(1 AS BIGINT) AS files_after,
           CAST(count(*) AS BIGINT) AS rows,
           CAST(count(*) AS BIGINT) AS rows_after
    FROM documents WHERE doc_id < 120
    """,
)
def q191_compaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction under the driver's hash gate
    (operators/maintenance.py:compact_dataset): a 48-file
    pathological layout of the documents slice is rewritten toward a
    1 GiB file target — everything fits one file — with an atomic
    tmp+rename swap. File counts and row preservation are
    deterministic (the slice is far under one target file), so the
    report oracle is closed-form; byte totals are excluded (codec
    and footer sizes are environment-specific). Fresh temp dir per
    invocation."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators.maintenance import compact_dataset

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 120
    )
    root = _tf.mkdtemp(prefix="q191_compact_")
    path = root + "/ds"
    try:
        docs.repartition(48).write.parquet(path)
        rep = compact_dataset(spark, path, target_bytes=1 << 30)
        rows_after = spark.read.parquet(path).count()
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                rep["files_before"],
                rep["files_after"],
                rep["rows"],
                rows_after,
            )
        ],
        "files_before BIGINT, files_after BIGINT, rows BIGINT, "
        "rows_after BIGINT",
    )


@query(
    "q192_video_mjpeg_decode",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(round(i / 2.0, 6) AS DOUBLE) AS pts_s,
           16 AS width,
           16 AS height,
           CAST(round(((doc_id * 7 + i * 13) % 256) / 255.0, 6) AS DOUBLE)
               AS mean_luma
    FROM documents,
         LATERAL unnest(range(0, 6 + doc_id % 5)) AS t(i)
    WHERE doc_id < 40 AND i % 2 = 0
    ORDER BY media_id, frame_idx
    """,
)
def q192_video_mjpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END video frame decode under the driver's hash gate
    (operators/multimodal.py:extract_video_frame_features): per
    document a Motion-JPEG MP4 is assembled in the executors — a
    real ISO-BMFF container (operators/mp4.py:build_mp4) whose
    sample payloads are genuine baseline JPEGs (operators/jpeg.py)
    of solid 16x16 frames at quality 99 — then the engine samples
    one frame per second from the stts/stsz/stco tables AND decodes
    each sampled frame to pixels with its own codec. Solid frames at
    unit DC quant reconstruct exactly (the q155/q178 premise), so
    every frame's mean_luma is closed-form. This retires the 'frame
    payload decode is stubbed' caveat for the MJPEG codec family;
    inter-frame codecs (H.264) still yield NULL features honestly."""
    from distcpplus_spark.operators.multimodal import (
        extract_video_frame_features,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.jpeg import encode_jpeg
        from distcpplus_spark.operators.mp4 import build_mp4

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                frames = []
                for i in range(6 + d % 5):
                    g = (d * 7 + i * 13) % 256
                    px = np.full((16, 16, 3), g, dtype=np.uint8)
                    frames.append(encode_jpeg(px, quality=99))
                rows.append((d, build_mp4(frames, fps=2)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return extract_video_frame_features(media, every_n_seconds=1.0).orderBy(
        "media_id", "frame_idx"
    )


@query(
    "q193_time_travel_versions",
    oracle="""
    SELECT 1 AS version,
           CAST((SELECT count(*) FROM documents WHERE doc_id < 50)
                AS BIGINT) AS n_rows,
           FALSE AS is_current
    UNION ALL
    SELECT 2,
           CAST((SELECT count(*) FROM documents WHERE doc_id < 90)
                AS BIGINT),
           FALSE
    UNION ALL
    SELECT 3,
           CAST((SELECT count(*) FROM documents
                 WHERE doc_id < 90 AND doc_id % 3 != 0) AS BIGINT),
           TRUE
    ORDER BY version
    """,
)
def q193_time_travel_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-dataset time travel under the driver's hash gate
    (operators/maintenance.py): three generations of a documents
    slice are published through the atomic tmp+verify+rename+pointer
    protocol — append, then a delete rewrite — and every historical
    version stays addressable by number while the pointer marks the
    current one. Row counts per version are closed-form. Fresh temp
    root per invocation."""
    import shutil as _sh
    import tempfile as _tf

    from distcpplus_spark.operators.maintenance import (
        current_version,
        publish_dataset,
        read_version,
    )

    docs = load_table(spark, sf_dir, "documents")
    root = _tf.mkdtemp(prefix="q193_versions_")
    try:
        publish_dataset(docs.filter(F.col("doc_id") < 50), root)
        publish_dataset(docs.filter(F.col("doc_id") < 90), root)
        publish_dataset(
            docs.filter(
                (F.col("doc_id") < 90) & (F.col("doc_id") % 3 != 0)
            ),
            root,
        )
        cur = current_version(root)
        rows = [
            (v, read_version(spark, root, v).count(), v == cur)
            for v in (1, 2, 3)
        ]
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "version INT, n_rows BIGINT, is_current BOOLEAN"
    ).orderBy("version")


@query(
    "q194_audio_flac_spectrum",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           8000 AS sample_rate,
           CAST(8000 AS BIGINT) AS n_samples,
           CAST(150 + (doc_id % 30) * 20 AS BIGINT) AS dominant_hz,
           CAST(0.8 AS DOUBLE) AS peak_share4
    FROM documents WHERE doc_id < 60
    ORDER BY media_id
    """,
)
def q194_audio_flac_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC decode + FFT under the driver's hash gate: the q182
    two-tone signal (amp 12000 at f = 150 + (doc_id%30)*20 Hz, amp
    6000 at 2f) is compressed to a genuine FLAC stream by the
    hand-rolled encoder (operators/flac.py — FIXED-order-2 rice
    frames) inside the executors, decoded back LOSSLESSLY by the
    engine's own decoder via the shared audio parse path, and
    spectrum-analyzed. Because FLAC is exact, the post-decode FFT
    matches the q182 closed forms bit-for-bit: integer dominant_hz,
    peak share 0.8 at round-4."""
    from distcpplus_spark.operators.multimodal import extract_audio_spectrum

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.flac import encode_flac

        t = np.arange(8000)
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                f1 = 150 + (d % 30) * 20
                x = (
                    12000.0 * np.sin(2 * np.pi * f1 * t / 8000.0)
                    + 6000.0 * np.sin(2 * np.pi * 2 * f1 * t / 8000.0)
                )
                sig = np.round(x).astype(np.int16).reshape(-1, 1)
                rows.append((d, encode_flac(sig, 8000)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    # Round-14 (guide §2.5 input skew): the 60 doc_ids land in one
    # parquet scan split, so ONE task paid all 60 pure-Python FLAC
    # encodes + decodes + FFTs serially (~11 s at sf0.1; the sibling
    # codec queries are numpy-vectorized and stay under ~1 s, so only
    # the FLAC variant needs the spread). The fixed 60-row bound makes
    # row-per-task round-robin the right parallelism at every SF.
    media = (
        docs.select("doc_id").repartition(60).mapInPandas(synth, media_schema)
    )
    return (
        extract_audio_spectrum(media)
        .select(
            "media_id", "sample_rate", "n_samples", "dominant_hz",
            F.round("peak_share", 4).alias("peak_share4"),
        )
        .orderBy("media_id")
    )


@query(
    "q207_http_remote_ingest",
    oracle="""
    SELECT 'obj-' || i || '.bin' AS name,
           200 AS status,
           CAST(1000 + i * 37 AS BIGINT) AS n_bytes,
           md5(repeat(chr(CAST(97 + i % 26 AS INTEGER)), CAST(1000 + i * 37 AS INTEGER))) AS body_md5
    FROM range(0, 12) t(i)
    ORDER BY name
    """,
)
def q207_http_remote_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-FS ingestion over HTTP under the driver's hash gate
    (sources/httpfs.py): twelve objects with closed-form contents
    are served by a loopback http.server and fetched IN THE
    EXECUTORS (one task per object, stdlib urllib) — status, length,
    and body md5 must match DuckDB's closed forms. This is the
    remote half of the copy engine: the same per-object task shape,
    collect-all-failures error rows, and verify-then-land discipline
    as the local copy executor, pointed at a network endpoint.
    Fresh server+tempdir per invocation."""
    import functools as _ft
    import os as _os
    import shutil as _sh
    import tempfile as _tf
    import threading as _th
    from http.server import HTTPServer, SimpleHTTPRequestHandler

    from distcpplus_spark.sources.httpfs import read_http

    root = _tf.mkdtemp(prefix="q207_http_")
    try:
        for i in range(12):
            body = chr(97 + i % 26).encode() * (1000 + i * 37)
            with open(_os.path.join(root, f"obj-{i}.bin"), "wb") as f:
                f.write(body)
        handler = _ft.partial(SimpleHTTPRequestHandler, directory=root)
        srv = HTTPServer(("127.0.0.1", 0), handler)
        t = _th.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{srv.server_port}"
            urls = [f"{base}/obj-{i}.bin" for i in range(12)]
            rows = (
                read_http(spark, urls)
                .select(
                    F.element_at(F.split("url", "/"), -1).alias("name"),
                    "status",
                    F.col("length").alias("n_bytes"),
                    F.md5("content").alias("body_md5"),
                )
                .orderBy("name")
                .collect()
            )
        finally:
            srv.shutdown()
    finally:
        _sh.rmtree(root, ignore_errors=True)
    return local_rows(spark,
        rows, "name STRING, status INT, n_bytes BIGINT, body_md5 STRING"
    ).orderBy("name")


@query(
    "q210_image_webp_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           16 AS width,
           16 AS height,
           3 AS channels,
           CAST(round((
               0.299 * ((doc_id * 11 + 3) % 256)
               + 0.587 * ((doc_id * 19 + 45) % 256)
               + 0.114 * ((doc_id * 5 + 201) % 256)
           ) / 255.0, 6) AS DOUBLE) AS mean_luma
    FROM documents WHERE doc_id < 60
    ORDER BY media_id
    """,
)
def q210_image_webp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP-lossless decode under the driver's hash gate: per
    document a solid-color 16x16 image is compressed to a genuine
    VP8L stream (subtract-green + Huffman literals,
    operators/webp.py:encode_webp_lossless) inside the executors,
    then decoded back through the engine's own prefix-code decoder
    via extract_image_features. Lossless means pixels — and the
    BT.601 luma closed form — are exact. The VP8L decoder itself
    covers the full spec (LZ77, color cache, meta groups, all four
    transforms), pinned by the independent in-test encoder and
    per-feature hand streams in tests/test_webp.py."""
    from distcpplus_spark.operators.multimodal import extract_image_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)

    import pandas as pd
    from pyspark.sql import types as T

    def synth(batches):
        import numpy as np

        from distcpplus_spark.operators.webp import encode_webp_lossless

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                px = np.zeros((16, 16, 3), dtype=np.uint8)
                px[:, :, 0] = (d * 11 + 3) % 256
                px[:, :, 1] = (d * 19 + 45) % 256
                px[:, :, 2] = (d * 5 + 201) % 256
                rows.append((d, encode_webp_lossless(px)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    media = docs.select("doc_id").mapInPandas(synth, media_schema)
    return (
        extract_image_features(media)
        .select("media_id", "width", "height", "channels", "mean_luma")
        .orderBy("media_id")
    )


@query("x23_power_iteration_centrality")
def x23_power_iteration_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dominant-eigenvector centrality of the part co-purchase graph
    by FULLY-DISTRIBUTED power iteration, on the operators/graph.py
    pagerank shape: the score vector stays a DataFrame end-to-end
    (join + groupBy-sum per step, localCheckpoint lineage truncation
    every 4 rounds); the ONLY thing that crosses the driver is the
    per-round L2 norm — one scalar aggregate. A 10^8-node graph runs
    unchanged; the round-8 version folded the full vector through
    the driver each round and is gone. Deterministic start vector
    (all-ones) and fixed 12 iterations; scores round to 6 so the
    driver's stability re-run hashes agree. Rows-only: the iterative
    loop is not a single SQL statement (pytest pins convergence
    against a numpy eigendecomposition on the same matrix)."""
    import math

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < 80
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("w"))
        .repartition("v")  # the per-iteration join key
        .persist()
    )
    nodes = edges.select("u").distinct()
    score = nodes.select(F.col("u").alias("node"), F.lit(1.0).alias("s"))
    for i in range(12):
        agg = (
            edges.join(score, edges["v"] == score["node"])
            .groupBy("u")
            .agg(F.sum(F.col("w") * F.col("s")).alias("ns"))
        )
        raw = nodes.join(agg, "u", "left").select(
            "u", F.coalesce(F.col("ns"), F.lit(0.0)).alias("ns")
        )
        # lazy checkpoint EVERY round (round 14): the norm collect
        # below evaluates `raw` and the next round's join evaluates
        # it again — checkpointing only every 4th round re-ran up to
        # 3 rounds of lineage on both paths (A/B on x23: 9.0 -> 4.7 s
        # at sf0.1, rows identical; the vector is node-count-sized,
        # so per-round persistence is the cheap side of the trade)
        raw = raw.localCheckpoint(eager=False)
        # scalar L2 norm: the one driver round-trip per iteration
        norm = raw.agg(
            F.sum(F.col("ns") * F.col("ns")).alias("q")
        ).collect()[0]["q"]
        norm = math.sqrt(norm) if norm else 1.0
        score = raw.select(
            F.col("u").alias("node"), (F.col("ns") / F.lit(norm)).alias("s")
        )
    out = (
        score.select(
            F.col("node").alias("part_id"),
            F.round("s", 6).alias("centrality"),
        )
        .orderBy(F.desc("centrality"), "part_id")
        .limit(20)
    )
    edges.unpersist()
    return out


@query(
    "q223_stratified_sample_bound",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(1 AS BOOLEAN) AS sample_within_bound
    FROM lineitem
    WHERE l_returnflag IN ('A', 'N', 'R')
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q223_stratified_sample_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x11's seeded stratified sample under a statistical CONTRACT
    the hash gate can check: sampleBy draws each stratum as
    independent Bernoulli(p) trials, so the sampled count must sit
    within 5 standard deviations of n*p (floor of 10 covers tiny
    strata at sf0.001) — a ~1e-6 false-alarm bound that any correct
    sampler passes and any fraction/stratum mixup breaks. The oracle
    pins the exact stratum sizes and asserts the boolean."""
    import math

    li = load_table(spark, sf_dir, "lineitem")
    frac = {"A": 0.1, "N": 0.05, "R": 0.1}
    sampled = (
        li.stat.sampleBy("l_returnflag", frac, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_sampled"))
    )
    totals = li.groupBy("l_returnflag").agg(F.count("*").alias("n_total"))
    frac_col = F.create_map(
        *[x for kv in frac.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )[F.col("l_returnflag")]
    joined = (
        totals.join(sampled, "l_returnflag", "left")
        .withColumn("n_sampled", F.coalesce("n_sampled", F.lit(0)))
        .withColumn("p", frac_col)
        .withColumn("expected", F.col("n_total") * F.col("p"))
        .withColumn(
            "slack",
            F.greatest(
                F.lit(10.0),
                F.lit(5.0)
                * F.sqrt(F.col("expected") * (F.lit(1.0) - F.col("p"))),
            ),
        )
    )
    return (
        joined.select(
            "l_returnflag",
            F.col("n_total").cast("bigint").alias("n_total"),
            (
                F.abs(F.col("n_sampled") - F.col("expected"))
                <= F.col("slack")
            ).alias("sample_within_bound"),
        )
        .transform(small_sort, "l_returnflag")
    )


@query(
    "q232_ivf_recall_bound",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_queries,
           CAST(5 AS BIGINT) AS k,
           CAST(1 AS BOOLEAN) AS recall_at_least_60pct
    """,
)
def q232_ivf_recall_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x09's IVF-ANN under a recall CONTRACT the hash gate can
    check: probing 2 of 8 inverted lists, recall@5 against the
    exact brute-force top-5 must clear 0.6 (measured 0.82-0.88
    across sf0.001/0.01/0.1; the build is deterministic —
    tests/test_ivf.py pins that — so the boolean is stable).
    The multiprobe-LSH path stays rows-only (x13): the fixture's
    near-orthogonal embeddings give it no honest bound."""
    from distcpplus_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    assigned, centroids = ivf_build(
        emb, "embedding", "vec_id", n_lists=8, iters=2
    )
    ivf = ivf_search(
        assigned, centroids, queries, "embedding", "vec_id", k=5, nprobe=2
    )
    bf = brute_force_topk(emb, queries, "embedding", "vec_id", k=5)
    hits = (
        ivf.select("query_id", "corpus_id")
        .join(bf.select("query_id", "corpus_id"), ["query_id", "corpus_id"])
        .count()
    )
    total = bf.count()
    n_q = queries.count()
    return spark.createDataFrame(
        [(int(n_q), 5, bool(hits / total >= 0.6))],
        "n_queries BIGINT, k BIGINT, recall_at_least_60pct BOOLEAN",
    )


@query(
    "q234_connected_components",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT doc_id AS src, doc_id % 50 AS dst
      FROM documents WHERE doc_id >= 50 AND doc_id < 400
      UNION ALL
      SELECT h, h + 1 FROM unnest([10, 20, 30]) t(h)
    ),
    sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    reach(a, b) AS (
      SELECT src, dst FROM sym
      UNION
      SELECT r.a, s.dst FROM reach r JOIN sym s ON r.b = s.src
    )
    SELECT CAST(a AS BIGINT) AS node,
           CAST(least(a, min(b)) AS BIGINT) AS component
    FROM reach GROUP BY a ORDER BY node
    """,
)
def q234_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components under the oracle hash gate (x04's
    operator, previously rows-only because LSH candidate graphs are
    seed-defined): a deterministic star-plus-bridge graph is built
    identically on both engines — hub edges (doc, doc mod 50) give
    shallow components, bridge edges merge three hub pairs — and
    Spark's iterative min-label propagation
    (operators/dedup.py::union_find_components) must agree with
    DuckDB's recursive-CTE transitive closure on every node's
    min-id component label. The closure is O(component²) pairs —
    fine as an ORACLE at fixture scale, which is exactly why the
    engine side uses the O(E · diameter) propagation instead."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 400)
    )
    from distcpplus_spark.operators.dedup import union_find_components

    hub = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") % 50).alias("id_b"),
    )
    bridges = spark.createDataFrame(
        [(10, 11), (20, 21), (30, 31)], "id_a BIGINT, id_b BIGINT"
    )
    comps = union_find_components(hub.unionByName(bridges))
    return comps.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    ).orderBy("node")


def _pr_iter_sql(i: int) -> str:
    return f"""
    pr{i} AS (
      SELECT n.v,
             0.15 / 50 + 0.85 * coalesce(sum(p.r / d.deg), 0) AS r
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.v
      LEFT JOIN pr{i - 1} p ON p.v = e.src
      LEFT JOIN deg d ON d.src = e.src
      GROUP BY n.v
    )"""


@query(
    "q235_pagerank_fixed_iters",
    oracle="""
    WITH nodes AS (SELECT unnest(range(0, 50)) AS v),
    edges AS (
      SELECT DISTINCT v AS src, dst FROM (
        SELECT v, (v + 1) % 50 AS dst FROM nodes
        UNION ALL
        SELECT v, (v * 7 + 3) % 50 FROM nodes
      )
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    pr0 AS (SELECT v, 1.0 / 50 AS r FROM nodes),"""
    + ",".join(_pr_iter_sql(i) for i in range(1, 5))
    + """
    SELECT CAST(v AS BIGINT) AS node,
           CAST(round(r, 8) AS DOUBLE) AS pr
    FROM pr4 ORDER BY node
    """,
)
def q235_pagerank_fixed_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank under the oracle hash gate (x18 stays the
    fixture-graph rows-only variant): a 50-node deterministic
    digraph — ring edges plus (7v+3) mod 50 shortcuts, no dangling
    nodes so both engines share the mass convention — runs 4 fixed
    power iterations. Spark's per-iteration contribution join +
    aggregate (the same driver-fold loop as k-means/components)
    must match DuckDB's UNROLLED iterations CTE-for-CTE to 8
    decimals; recursive CTEs can't aggregate in the recursive term,
    so unrolling IS the SQL expression of a fixed-depth iteration."""
    n = 50
    nodes = spark.range(n).select(F.col("id").alias("v"))
    fwd = nodes.select(
        F.col("v").alias("src"), ((F.col("v") + 1) % n).alias("dst")
    ).unionByName(
        nodes.select(
            F.col("v").alias("src"), ((F.col("v") * 7 + 3) % n).alias("dst")
        )
    ).distinct()
    deg = fwd.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(4):
        contribs = (
            fwd.join(ranks, fwd.src == ranks.v)
            .join(deg, "src")
            .select("dst", (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contribs, nodes.v == contribs.dst, "left")
            .select(
                "v",
                (
                    F.lit(0.15 / n)
                    + F.lit(0.85) * F.coalesce("csum", F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("v").cast("bigint").alias("node"),
        F.round("r", 8).alias("pr"),
    ).orderBy("node")


def _centrality_oracle(iters: int = 6) -> str:
    parts = ["""
    WITH edges AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v,
             CAST(count(*) AS DOUBLE) AS w
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < 80 AND b.l_partkey < 80
        AND a.l_partkey <> b.l_partkey
      GROUP BY u, v
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT u AS v FROM edges),
    it0n AS (SELECT v, 1.0 AS s FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    it{i} AS MATERIALIZED (
      SELECT e.u AS v, sum(e.w * p.s) AS raw
      FROM edges e JOIN it{i - 1}n p ON e.v = p.v
      GROUP BY e.u
    ),
    nrm{i} AS (
      SELECT CASE WHEN sqrt(sum(raw * raw)) = 0 THEN 1.0
                  ELSE sqrt(sum(raw * raw)) END AS nv
      FROM it{i}
    ),
    it{i}n AS MATERIALIZED (
      SELECT n.v, coalesce(r.raw, 0) / (SELECT nv FROM nrm{i}) AS s
      FROM nodes n LEFT JOIN it{i} r ON n.v = r.v
    )""")
    return "".join(parts) + f"""
    SELECT CAST(v AS BIGINT) AS node,
           CAST(round(s, 6) AS DOUBLE) AS centrality
    FROM it{iters}n ORDER BY node
    """


@query("q238_power_iteration_centrality", oracle=_centrality_oracle())
def q238_power_iteration_centrality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eigenvector centrality under the driver's hash gate (x23
    stays the longer numpy-pinned rows-only run): 6 power iterations
    over the part co-purchase graph, v_{t+1} = normalize(A v_t) as
    an edge join + aggregate per round. The oracle unrolls the same
    6 rounds as normalize-threading CTEs over the SAME
    fixture-derived graph — iterative linear algebra under a
    cross-engine hash, per the q236/q237 unrolling discipline.

    Same distributed shape as x23 (round-10: the last driver-folded
    loop in the registry, rewritten): the score vector stays a
    DataFrame across rounds — join + groupBy-sum per step,
    localCheckpoint lineage truncation — and the ONLY per-round
    driver traffic is the scalar L2 norm. The graph is bounded by
    construction (l_partkey < 80 ⇒ ≤80 nodes at any SF) but the plan
    no longer depends on that bound."""
    import math

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < 80
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("w"))
        .repartition("v")  # the per-iteration join key
        .persist()
    )
    nodes = edges.select("u").distinct()
    score = nodes.select(F.col("u").alias("node"), F.lit(1.0).alias("s"))
    for i in range(6):
        agg = (
            edges.join(score, edges["v"] == score["node"])
            .groupBy("u")
            .agg(F.sum(F.col("w") * F.col("s")).alias("ns"))
        )
        raw = nodes.join(agg, "u", "left").select(
            "u", F.coalesce(F.col("ns"), F.lit(0.0)).alias("ns")
        )
        # lazy checkpoint EVERY round (round 14): the norm collect
        # below evaluates `raw` and the next round's join evaluates
        # it again — checkpointing only every 4th round re-ran up to
        # 3 rounds of lineage on both paths (A/B on x23: 9.0 -> 4.7 s
        # at sf0.1, rows identical; the vector is node-count-sized,
        # so per-round persistence is the cheap side of the trade)
        raw = raw.localCheckpoint(eager=False)
        # scalar L2 norm: the one driver round-trip per iteration
        norm = raw.agg(
            F.sum(F.col("ns") * F.col("ns")).alias("q")
        ).collect()[0]["q"]
        norm = math.sqrt(norm) if norm else 1.0
        score = raw.select(
            F.col("u").alias("node"), (F.col("ns") / F.lit(norm)).alias("s")
        )
    out = score.select(
        F.col("node").cast("bigint").alias("node"),
        F.round("s", 6).alias("centrality"),
    ).orderBy("node")
    edges.unpersist()
    return out


def _kmeans_oracle(iters: int = 2, k: int = 4) -> str:
    parts = [f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
    ),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
               AS list_id, x AS c
      FROM (SELECT vec_id, x FROM v ORDER BY vec_id LIMIT {k})
    )"""]
    for i in range(1, iters + 1):
        parts.append(f""",
    a{i} AS (
      SELECT vec_id, list_id FROM (
        SELECT v.vec_id, c.list_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_cosine_similarity(v.x, c.c) DESC,
                          c.list_id
               ) AS rn
        FROM v CROSS JOIN c{i - 1} c
      ) WHERE rn = 1
    ),
    m{i} AS (
      SELECT a.list_id, u.i AS pos,
             avg(v.x[CAST(u.i AS INTEGER)]) AS m
      FROM a{i} a JOIN v ON v.vec_id = a.vec_id,
           LATERAL unnest(range(1, len(v.x) + 1)) u(i)
      GROUP BY a.list_id, u.i
    ),
    c{i} AS (
      SELECT list_id, list(m ORDER BY pos) AS c
      FROM m{i} GROUP BY list_id
    )""")
    return "".join(parts) + f"""
    SELECT n.list_id,
           CAST(n.cnt AS BIGINT) AS n_members,
           CAST(round(list_sum(c.c), 6) AS DOUBLE) AS cent_sum
    FROM (SELECT list_id, count(*) AS cnt FROM a{iters}
          GROUP BY list_id) n
    JOIN c{iters} c USING (list_id)
    ORDER BY n.list_id
    """


@query("q239_kmeans_quantizer", oracle=_kmeans_oracle())
def q239_kmeans_quantizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF k-means quantizer ITSELF under the driver's hash gate
    (q75/x09 verify searches, which are correct for ANY centroids —
    the training loop was previously oracle-blind): 2 Lloyd
    iterations, 4 lists, lowest-id seeds, cosine argmax with
    lowest-list tie-break (operators/similarity.py::ivf_build). The
    oracle unrolls assign→means rounds as CTEs over the same
    vectors; member counts pin the assignment exactly and the
    round-6 centroid checksum pins the means."""
    from distcpplus_spark.operators.similarity import ivf_build

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_build(
        emb, "embedding", "vec_id", n_lists=4, iters=2
    )
    counts = assigned.groupBy("list_id").agg(
        F.count("*").alias("n_members")
    )
    sums = centroids.select(
        "list_id",
        F.round(
            F.aggregate(
                "_centroid", F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("cent_sum"),
    )
    return (
        counts.join(sums, "list_id")
        .select(
            F.col("list_id").cast("int").alias("list_id"),
            F.col("n_members").cast("bigint").alias("n_members"),
            "cent_sum",
        )
        .orderBy("list_id")
    )


@query(
    "q240_pq_contract",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_codes,
           CAST(8 AS INT) AS m,
           CAST(16 AS INT) AS ksub,
           CAST(1 AS BOOLEAN) AS codes_in_range,
           CAST(1 AS BOOLEAN) AS rel_err_below_075
    FROM embeddings
    """,
)
def q240_pq_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x20's product quantizer under a verification CONTRACT: every
    vector gets exactly one m-length code row (count pinned by the
    oracle), codes stay inside the ksub codebook range, and the
    relative reconstruction error sum||v - dequant(code)||² /
    sum||v||² stays under 0.75 (measured 0.57-0.61 across SFs on the
    near-orthogonal fixture — a wrong subspace split or codebook
    indexing pushes it to ~1.0). The error check is distributed:
    per-subspace slices join the exploded codes against a codebook
    table and fold squared error in codegen.

    Round-14 (guide §5 cache-when-reused, §2.3 project-early, §4):
    ``codes`` is lazily localCheckpointed — the stats collect AND the
    count both read it, and each re-evaluation was a full PQ
    assignment pass; the m per-subspace slices come from ONE
    posexplode projection instead of an m-way union of m separate
    embeddings scans; and the codebook / single-row result relations
    go through ``local_rows`` (1 slice, not 32 Python-evaluated
    ones). Identical rows asserted in the probe A/B."""
    from distcpplus_spark.operators.similarity import pq_build

    m, ksub, d_sub = 8, 16, 8
    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = pq_build(emb, "embedding", "vec_id", m=m, k=ksub, iters=2)
    codes = codes.localCheckpoint(eager=False)
    books_df = local_rows(
        spark,
        [
            (s, c, [float(x) for x in books[s][c]])
            for s in range(m)
            for c in range(len(books[s]))
        ],
        "sub INT, code INT, bvec ARRAY<DOUBLE>",
    )
    code_rows = codes.select(
        "corpus_id", F.posexplode("_codes").alias("sub", "code")
    )
    sub_vecs = emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.posexplode(
            F.array(
                *[
                    F.transform(
                        F.slice("embedding", s * d_sub + 1, d_sub),
                        lambda x: x.cast("double"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("sub", "svec"),
    )
    sq = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0.0), lambda acc, x: acc + x * x
    )
    joined = (
        code_rows.join(sub_vecs, ["corpus_id", "sub"])
        .join(F.broadcast(books_df), ["sub", "code"])
        .select(
            "corpus_id",
            "code",
            sq(F.zip_with("svec", "bvec", lambda a, b: a - b)).alias("e2"),
            sq(F.col("svec")).alias("v2"),
        )
    )
    stats = joined.agg(
        F.count("*").alias("n_sub"),
        F.sum("e2").alias("err"),
        F.sum("v2").alias("norm"),
        F.min("code").alias("cmin"),
        F.max("code").alias("cmax"),
    ).collect()[0]
    n_codes = codes.count()
    return local_rows(
        spark,
        [(
            int(n_codes),
            m,
            ksub,
            bool(stats["cmin"] >= 0 and stats["cmax"] < ksub
                 and stats["n_sub"] == n_codes * m),
            bool(stats["err"] / stats["norm"] < 0.75),
        )],
        "n_codes BIGINT, m INT, ksub INT, codes_in_range BOOLEAN, "
        "rel_err_below_075 BOOLEAN",
    )
