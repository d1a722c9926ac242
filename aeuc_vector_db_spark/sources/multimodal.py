"""Multimodal columns (E5): binary payloads with typed metadata.

Images/audio/video are opaque BINARY columns plus a MAP<STRING,STRING>
metadata bag; heavy per-item work (decode, resize, feature-extract,
frame-sample) runs in Arrow-batched `mapInPandas` so bytes stay in
columnar batches and the work scales with partitions, never the driver.

The decode kernels themselves are STUBBED: the image/audio libraries are
not in this container, so each `*_stub` either raises a clearly-marked
NotImplementedError (strict mode) or produces a deterministic fake
derived from the payload bytes (test mode). The Spark-side plumbing —
schemas, batch iteration shape, partition-parallelism, binaryFile
source, metadata propagation — is real and tested; swapping a stub for
Pillow/ffmpeg changes only the body of one function.

Scale notes: `binaryFile` splits at file granularity — fine for many
small/medium objects; huge objects should be sharded upstream. Column
pruning matters doubly here: project `content` ONLY in the mapInPandas
stage, never in joins/filters (the bytes would ride through every
shuffle).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: modality-tagged binary record: the engine's multimodal row shape
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile source → MULTIMODAL_SCHEMA rows (modality from extension).

    The source provides (path, modificationTime, length, content); we
    derive blob_id from the path and keep length/mtime as typed meta.
    """
    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality = (
        F.when(ext.isin("png", "jpg", "jpeg", "bmp", "gif"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("binary")
    )
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("blob_id"),
        modality.alias("modality"),
        F.col("content"),
        F.create_map(
            F.lit("source_path"), F.col("path"),
            F.lit("length"), F.col("length").cast("string"),
            F.lit("modified"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake (width, height, channels) from the payload hash."""
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4


def decode_image_features_stub(
    blobs: DataFrame, feature_dim: int = 8, strict: bool = False
) -> DataFrame:
    """Image decode + feature extraction over mapInPandas (Arrow batches).

    STUB: real decoding needs an image library not present in this
    container. strict=True raises the clearly-marked NotImplementedError;
    strict=False emits deterministic fakes (dims + features from the
    payload sha256) so the distributed plumbing is fully exercisable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode stub: install an image library (e.g. Pillow) "
                    "and replace decode_image_features_stub's kernel"
                )
            rows = []
            for blob_id, content in zip(pdf["blob_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                w, h, c = _fake_dims(payload)
                digest = hashlib.sha256(payload).digest()
                feats = [float(digest[i % 32]) / 255.0 for i in range(feature_dim)]
                rows.append((blob_id, w, h, c, feats))
            yield pd.DataFrame(
                rows, columns=["blob_id", "width", "height", "channels", "features"]
            )

    return blobs.select("blob_id", "content").mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


def sample_frames_stub(
    blobs: DataFrame, every_ms: int = 1000, max_frames: int = 4, strict: bool = False
) -> DataFrame:
    """Video frame sampling over mapInPandas — 1 input row → N frame rows.

    STUB kernel (no ffmpeg in container): emits max_frames deterministic
    pseudo-frames per blob, frame bytes = sha256(payload ‖ idx). The
    expansion shape (flat-map via mapInPandas) is the real contract.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "frame sampling stub: install ffmpeg bindings and replace "
                    "sample_frames_stub's kernel"
                )
            rows = []
            for blob_id, content in zip(pdf["blob_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                for i in range(max_frames):
                    rows.append(
                        (
                            blob_id,
                            i,
                            i * every_ms,
                            hashlib.sha256(payload + bytes([i])).digest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["blob_id", "frame_idx", "frame_ts_ms", "frame_bytes"]
            )

    return blobs.select("blob_id", "content").mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
