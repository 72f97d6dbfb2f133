"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata structs.
Decode / feature-extraction / resize / frame-sampling run as Arrow-batched
`mapInPandas` stages — the Spark-side contract (schema, batch shape,
partitioning) is real and tested; the actual codec step is stubbed because
media libraries aren't available in this container:

- with PIL/librosa/etc. installed, plug the real decoder into
  `_decode_image_bytes` (raises NotImplementedError today);
- `deterministic_fake=True` (default) derives plausible, reproducible
  metadata/features from the payload hash, so pipelines are testable
  end-to-end without codecs.

At scale, the important properties are already here: media bytes never
leave the executor (no driver collect), Arrow moves batches into pandas
zero-copy-ish, and `spark.sql.files.maxPartitionBytes` bounds batch memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _decode_image_bytes(payload: bytes):
    """Real codec hook. Plug PIL here when available."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires a codec library (PIL) not present in this environment"
        ) from e
    raise NotImplementedError("real decode path not wired yet")


def _fake_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic pseudo-metadata from the payload digest."""
    d = hashlib.md5(payload or b"").digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    channels = 1 + (d[2] % 2) * 2  # 1 or 3
    fmt = ["png", "jpeg", "webp"][d[3] % 3]
    return width, height, channels, fmt


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Attach an `image_meta` struct decoded from the binary payload."""
    out_schema = StructType(df.schema.fields + [StructField("image_meta", IMAGE_META_SCHEMA)])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if deterministic_fake:
                    w, h, c, fmt = _fake_meta(raw)
                else:
                    w, h, c, fmt = _decode_image_bytes(raw)
                metas.append({"width": w, "height": h, "channels": c, "format": fmt})
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(batches, out_schema)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Attach a float feature vector per image (stubbed: digest-derived)."""
    out_schema = StructType(df.schema.fields + [StructField("features", ArrayType(FloatType()))])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if not deterministic_fake:
                    raise NotImplementedError("real feature extraction requires a codec library")
                d = hashlib.sha256(raw).digest()
                feats.append([(d[i % 32] - 128) / 128.0 for i in range(dim)])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, out_schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_time_ms", LongType()),
        StructField("frame_payload", StringType()),  # stub: digest, not pixels
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Explode a video payload into sampled frame rows (one row per
    `every_ms`). Frame decode is stubbed with a deterministic digest; the
    row-explosion shape (the part that matters for partitioning/shuffle
    planning at scale) is real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_index": [], "frame_time_ms": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                raw = bytes(row[payload_col]) if row[payload_col] is not None else b""
                duration = int(row[duration_col])
                for i, t in enumerate(range(0, max(duration, 1), every_ms)):
                    out["media_id"].append(int(row[id_col]))
                    out["frame_index"].append(i)
                    out["frame_time_ms"].append(t)
                    out["frame_payload"].append(
                        hashlib.md5(raw + t.to_bytes(8, "little")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)
