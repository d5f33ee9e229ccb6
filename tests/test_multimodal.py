"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub decode."""

from __future__ import annotations

from pyspark.sql import functions as F

from database2ogr_spark.multimodal.binaryops import (
    FEATURE_DIM,
    decode_features,
    frame_sample,
    with_media_metadata,
)


def _media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-bytes-1", 64, 64, None),
        (2, "image", "image/png", b"\x89PNG-fake-bytes-2", 32, 32, None),
        (3, "video", "video/mp4", b"\x00mp4-fake", None, None, 3000),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms int",
    )


def test_metadata_native_columns(spark):
    out = {r.media_id: r for r in with_media_metadata(_media(spark)).collect()}
    assert out[1].n_bytes == len(b"\x89PNG-fake-bytes-1")
    assert len(out[1].content_hash) == 32


def test_decode_features_shape_and_determinism(spark):
    out1 = {r.media_id: r for r in decode_features(_media(spark)).collect()}
    out2 = {r.media_id: r for r in decode_features(_media(spark)).collect()}
    assert all(len(r.feature) == FEATURE_DIM for r in out1.values())
    assert all(0.0 <= x < 1.0 for x in out1[1].feature)
    assert out1[1].feature == out2[1].feature  # deterministic stub
    assert out1[1].feature != out1[2].feature


def test_frame_sample_row_per_frame(spark):
    out = frame_sample(_media(spark), every_ms=1000).collect()
    # video duration 3000ms sampled at 0,1000,2000,3000 → 4 frames; images skipped
    assert len(out) == 4
    assert {r.frame_ts_ms for r in out} == {0, 1000, 2000, 3000}
    assert len({r.frame_hash for r in out}) == 4
