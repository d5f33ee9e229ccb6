"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub decode."""

from __future__ import annotations

from pyspark.sql import functions as F

from database2ogr_spark.multimodal.binaryops import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
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


def test_decode_fallback_on_unparseable_bytes():
    # garbage bytes must produce the deterministic stub features whether or
    # not Pillow is installed (PIL raises -> fallback) — row never fails
    from database2ogr_spark.multimodal.binaryops import _decode_payload, _decode_stub

    junk = b"\x89PNG-not-really-a-png"
    assert _decode_payload(junk) == _decode_stub(junk)
    assert _decode_payload(None) is None


def test_decode_golden_png_real_seam():
    # golden test for the real-decoder seam: a 2x1 PNG (black, white pixels)
    # must decode to real luminance features, not the md5 stub. Skipped where
    # Pillow is absent (this container); runs wherever media libs exist.
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from database2ogr_spark.multimodal.binaryops import (
        FEATURE_DIM,
        _decode_payload,
        _decode_stub,
    )

    im = PIL_Image.new("L", (2, 1))
    im.putdata([0, 255])
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    png = buf.getvalue()
    feat = _decode_payload(png)
    assert len(feat) == FEATURE_DIM
    assert feat != _decode_stub(png)
    assert all(0.0 <= x < 1.0 for x in feat)
    # a black->white strip keeps its gradient direction under any resample
    assert feat[0] < feat[-1]
    # and the real decode is deterministic too
    assert _decode_payload(png) == feat


def test_resize_images_contract(spark):
    from database2ogr_spark.multimodal.binaryops import resize_images

    media = spark.createDataFrame(
        [
            (1, "image", "img", bytearray(b"\x01\x02\x03"), 100, 80, None),
            (2, "video", "vid", bytearray(b"\x04"), None, None, 5000),
            (3, "image", "img", None, 10, 10, None),
        ],
        MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in resize_images(media, width=32, height=32).collect()}
    assert set(out) == {1, 3}  # only images; non-image rows dropped here
    assert out[1].width == 32 and out[1].height == 32
    assert len(out[1].payload) == 32 * 32 * 3 // 64
    assert out[3].payload is None  # NULL payload quarantine policy
    # deterministic: same input -> same bytes
    again = {r.media_id: r for r in resize_images(media, width=32, height=32).collect()}
    assert bytes(again[1].payload) == bytes(out[1].payload)


def test_dedup_media_exact_groups_identical_payloads(spark):
    from database2ogr_spark.multimodal.binaryops import dedup_media_exact

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"aaa")), (2, "image", bytearray(b"aaa")),
         (3, "image", bytearray(b"bbb"))],
        "media_id long, kind string, payload binary",
    )
    out = {r.survivor_id: r for r in dedup_media_exact(media).collect()}
    assert set(out) == {1, 3}
    assert out[1].dup_count == 2 and out[3].dup_count == 1
    assert out[1].n_bytes == 3


def test_phash_media_buckets_exact_dups_and_marks_survivor(spark):
    from database2ogr_spark.multimodal.binaryops import phash_media

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"xyz")), (2, "image", bytearray(b"xyz")),
         (9, "image", bytearray(b"qrs"))],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r for r in phash_media(media, tier="stub").collect()}
    # identical payloads share a phash; survivor is the min id of the bucket
    assert rows[1].phash == rows[2].phash
    assert rows[1].is_survivor and not rows[2].is_survivor
    assert rows[1].group_size == rows[2].group_size >= 2
    assert rows[9].is_survivor
    # 8 stub dims -> phash fits in [0, 255]
    assert all(0 <= r.phash <= 255 for r in rows.values())
