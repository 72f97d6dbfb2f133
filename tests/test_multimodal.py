"""Multimodal plumbing tests: binary payload columns through mapInPandas
stages (decode stubbed deterministically — no codec libs in container)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from kamu_engine_flink_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("duration_ms", LongType()),
        ]
    )
    rows = [(i, bytes([i % 256]) * (100 + i), 3500 + i * 100) for i in range(20)]
    return spark.createDataFrame(rows, schema).repartition(4)


def test_decode_images_schema_and_determinism(media):
    out = multimodal.decode_images(media)
    assert "image_meta" in out.columns
    rows1 = {r.media_id: r.image_meta for r in out.collect()}
    rows2 = {r.media_id: r.image_meta for r in multimodal.decode_images(media).collect()}
    assert rows1 == rows2  # deterministic across runs
    meta = rows1[0]
    assert 64 <= meta.width < 256 and 64 <= meta.height < 256
    assert meta.channels in (1, 3)
    assert meta.format in ("png", "jpeg", "webp")


def test_image_features_shape(media):
    out = multimodal.image_features(media, dim=16)
    feats = out.select("features").first()[0]
    assert len(feats) == 16
    assert all(-1.0 <= v <= 1.0 for v in feats)


def test_sample_frames_explosion(media):
    frames = multimodal.sample_frames(media, every_ms=1000)
    counts = {r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    # duration 3500ms + 100*i sampled at 1s -> 4+ frames
    assert counts[0] == 4
    assert counts[19] == 6  # 5400ms -> t in {0,1000,...,5000}
    one = frames.filter((F.col("media_id") == 0)).orderBy("frame_index").collect()
    assert [r.frame_time_ms for r in one] == [0, 1000, 2000, 3000]
    assert len({r.frame_payload for r in one}) == 4  # distinct per frame


def test_real_decode_path_gated(media, spark):
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_images(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(exc_info.value)
