"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing is real and tested: schemas, binaryFile
ingestion, batch iteration, partition sizing. The codec calls
themselves (image decode, audio resample, frame sampling) are STUBBED
behind ``_decode_*`` hooks — the runtime has no image/audio libraries
— with a deterministic fake used by tests. Swapping in PIL/ffmpeg is
a one-function change; nothing in the distributed plan moves.

Scale notes:
- binary payloads ride in the DataFrame as ``binary`` columns; Spark
  handles spill, so a partition of 100 MB images is fine — but set
  spark.sql.files.maxPartitionBytes so a partition's batch fits in
  executor memory alongside the decoded arrays (decoded >> encoded).
- mapInPandas streams Arrow batches — peak memory is one batch, not
  one partition. Tune spark.sql.execution.arrow.maxRecordsPerBatch
  down (e.g. 64) for large media rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("path", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a directory of media files via Spark's binaryFile source
    (distributed read; driver only lists). Adds media_id + size."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(
        F.xxhash64("path").alias("media_id"),
        "path",
        F.element_at(F.split(F.element_at(F.split("path", "/"), -1), "\\."), -1).alias(
            "media_type"
        ),
        "content",
        F.col("length").alias("size_bytes"),
        F.create_map(
            F.lit("mtime"), F.col("modificationTime").cast("string")
        ).alias("metadata"),
    )


def _decode_image_stub(content: bytes) -> dict:
    """STUB: real impl would be PIL.Image.open(BytesIO(content)).

    Deterministic fake keyed on the byte content so tests can assert
    exact outputs. Raises on None to exercise the error path.
    """
    if content is None:
        raise ValueError("no content")
    h = len(content)
    csum = sum(content[:256]) if content else 0
    return {
        "width": 64 + (csum % 64),
        "height": 64 + (h % 64),
        "channels": 3,
        "mean_luma": (csum % 1000) / 1000.0,
        "phash": (csum * 2654435761 + h) % (1 << 62),
    }


def extract_image_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Decode + featurize images with Arrow-batched mapInPandas.

    The UDF signature, batch shape, and output schema are the real
    plumbing; only _decode_image_stub is fake (see module docstring).
    """
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    f = _decode_image_stub(content)
                    out.append(
                        (mid, f["width"], f["height"], f["channels"],
                         f["mean_luma"], f["phash"])
                    )
                except Exception:
                    out.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "channels", "mean_luma", "phash",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        featurize, IMAGE_FEATURES_SCHEMA
    )


def _resample_audio_stub(content: bytes, target_rate: int) -> bytes:
    """STUB: real impl would shell to ffmpeg / use soundfile."""
    if content is None:
        raise ValueError("no content")
    # deterministic fake: truncate/pad to a rate-proportional length
    n = max(1, (len(content) * target_rate) // 48000)
    return (content * ((n // max(len(content), 1)) + 1))[:n]


def resample_audio(
    media: DataFrame, target_rate: int = 16000, batch_size: int = 64
) -> DataFrame:
    """Audio resampling plumbing: binary in → binary out, schema kept."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("sample_rate", T.IntegerType(), False),
        ]
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rows.append((mid, _resample_audio_stub(content, target_rate),
                                 target_rate))
                except Exception:
                    rows.append((mid, None, target_rate))
            yield pd.DataFrame(rows, columns=["media_id", "content", "sample_rate"])

    return media.select("media_id", "content").mapInPandas(resample, out_schema)


def sample_video_frames(
    media: DataFrame, every_n_seconds: float = 1.0
) -> DataFrame:
    """Frame-sampling plumbing: one input row → N frame rows
    (flatMap-shaped mapInPandas). Frame extraction is stubbed; the
    row-explosion contract (media_id, frame_idx, frame_bytes) is real."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                # STUB: pretend 1 frame per 1000 bytes per second
                n_frames = max(1, int(len(content) // (1000 * every_n_seconds)))
                for i in range(min(n_frames, 32)):
                    chunk = bytes(content[i * 10 : i * 10 + 10])
                    rows.append((mid, i, chunk))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "content").mapInPandas(explode_frames, out_schema)


def _resize_image_stub(content: bytes, width: int, height: int) -> bytes:
    """STUB: real impl would be PIL Image.resize + re-encode."""
    if content is None:
        raise ValueError("no content")
    # deterministic fake sized proportionally to the target area
    n = max(1, (width * height) // 128)
    return (content * ((n // max(len(content), 1)) + 1))[:n]


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, batch_size: int = 64
) -> DataFrame:
    """Image-resize plumbing (binary in → resized binary + dims out).

    The Arrow batch shape, error-row behavior (failed decode → NULL
    content, row kept), and output schema are the production contract;
    only the pixel work is stubbed (no image libs in this container).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rows.append(
                        (mid, _resize_image_stub(content, width, height),
                         width, height)
                    )
                except Exception:
                    rows.append((mid, None, width, height))
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height"]
            )

    return media.select("media_id", "content").mapInPandas(resize, out_schema)


def hash_media_arrow(media: DataFrame) -> DataFrame:
    """Content-hash media via mapInArrow — the zero-conversion fast
    path for opaque binary columns. mapInPandas converts every Arrow
    batch to pandas (copying the binary column into Python objects);
    mapInArrow hands over the Arrow RecordBatch itself, so bytes are
    touched exactly once by the hash. Use this shape for any
    pass-through transform of large binary payloads.
    """
    import pyarrow as pa

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("sha256", T.StringType(), True),
            T.StructField("n_bytes", T.LongType(), False),
        ]
    )

    def hash_batches(batches):
        import hashlib

        for batch in batches:
            ids = batch.column("media_id")
            contents = batch.column("content")
            shas, sizes = [], []
            for buf in contents:
                b = buf.as_py()
                if b is None:
                    shas.append(None)
                    sizes.append(0)
                else:
                    shas.append(hashlib.sha256(b).hexdigest())
                    sizes.append(len(b))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(shas, type=pa.string()),
                    pa.array(sizes, type=pa.int64()),
                ],
                names=["media_id", "sha256", "n_bytes"],
            )

    return media.select("media_id", "content").mapInArrow(
        hash_batches, out_schema
    )
