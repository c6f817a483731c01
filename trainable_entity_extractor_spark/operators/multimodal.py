"""Multimodal column operators: image/audio/video as opaque `binary`
columns with typed metadata structs.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partition behavior — is real and tested. The actual
decode/resample kernels require media libraries this container doesn't
ship, so they are stubbed: `decode_image`/`decode_audio` raise
NotImplementedError unless `deterministic_fake=True`, which produces a
seeded, content-derived fake (stable across runs/parallelism) that keeps
the downstream feature pipeline exercisable end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_STRUCT = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("meta", IMAGE_META_STRUCT, True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _fake_bytes_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic content-derived pseudo-embedding: sha256 expand."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 - 0.5 for b in h)
        counter += 1
    return out[:dim]


def decode_image(payload: bytes, deterministic_fake: bool = False) -> dict:
    """STUB: real decode needs PIL/opencv (absent here)."""
    if not deterministic_fake:
        raise NotImplementedError("image decoding requires a media library not present in this environment")
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 3,
        "format": "fake",
    }


def image_features(
    assets: DataFrame,
    id_col: str = "asset_id",
    blob_col: str = "blob",
    dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """binary blobs → (meta struct, feature vector) via mapInPandas.

    Batch shape: one Arrow batch of blobs in, one batch of structs out —
    the exact plumbing a real CNN/feature extractor would use (model
    broadcast, batch inference per partition)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, feats = [], []
            for blob in pdf[blob_col]:
                payload = bytes(blob) if blob is not None else b""
                metas.append(decode_image(payload, deterministic_fake))
                feats.append(_fake_bytes_features(payload, dim))
            yield pd.DataFrame({"asset_id": pdf[id_col], "meta": metas, "feature": feats})

    return assets.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    assets: DataFrame,
    id_col: str = "asset_id",
    blob_col: str = "blob",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling plumbing: emits N pseudo-frames per asset (byte
    slices standing in for decoded frames). One-to-many mapInPandas — the
    partition-preserving explode shape a real ffmpeg sampler would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, blob in zip(pdf[id_col], pdf[blob_col]):
                payload = bytes(blob) if blob is not None else b""
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def synth_assets(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic binary asset table for tests/bench (content = hashed
    id bytes, no external data)."""
    return spark.range(n).select(
        F.concat(F.lit("asset/"), F.col("id").cast("string")).alias("asset_id"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("blob"),
    )
