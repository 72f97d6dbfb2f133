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


def test_decode_audio_schema_and_determinism(media):
    out = multimodal.decode_audio(media)
    assert "audio_meta" in out.columns
    rows1 = {r.media_id: r.audio_meta for r in out.collect()}
    rows2 = {r.media_id: r.audio_meta for r in multimodal.decode_audio(media).collect()}
    assert rows1 == rows2
    meta = rows1[0]
    assert meta.sample_rate in (8000, 16000, 22050, 44100)
    assert meta.channels in (1, 2)
    assert 1000 <= meta.duration_ms < 61000
    assert meta.codec in ("wav", "flac", "opus")


def test_sample_audio_windows_explosion(media):
    wins = multimodal.sample_audio_windows(media, window_ms=500, sample_rate=16000)
    counts = {r.media_id: r.n for r in wins.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    assert counts[0] == 7  # 3500ms / 500ms
    assert counts[19] == 11  # 5400ms -> ceil(5400/500)
    one = wins.filter(F.col("media_id") == 19).orderBy("window_index").collect()
    assert [r.start_ms for r in one][:3] == [0, 500, 1000]
    assert one[-1].end_ms == 5400  # last window clamped to duration
    assert one[-1].n_samples == (5400 - 5000) * 16000 // 1000
    assert one[0].n_samples == 500 * 16000 // 1000
    assert len({r.window_payload for r in one}) == len(one)  # distinct digests


def test_real_decode_path_gated(media, spark):
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_images(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(exc_info.value)
