"""Multimodal binary-column plumbing: schema, Arrow batch shape,
deterministic fake decode, stubbed production decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.multimodal import (
    decode_fake,
    decode_stub,
    extract_media_features,
    generate_media_blobs,
)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image")


def test_blob_generation_deterministic(spark):
    a = generate_media_blobs(spark, 50).orderBy("media_ref").collect()
    b = generate_media_blobs(spark, 50).orderBy("media_ref").collect()
    assert [(r.media_ref, bytes(r.payload)) for r in a] == [
        (r.media_ref, bytes(r.payload)) for r in b
    ]


def test_feature_extraction_schema_and_values(spark):
    blobs = generate_media_blobs(spark, 120)
    feats = extract_media_features(blobs, decode=decode_fake)
    assert [f.name for f in feats.schema.fields] == [
        "media_ref", "media_kind", "size_bytes", "content_hash",
        "width", "height", "duration_ms",
    ]
    rows = feats.collect()
    assert len(rows) == 120
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.media_kind, []).append(r)
    # images get dimensions, audio/video get durations — never both
    assert all(
        r.width is not None and r.duration_ms is None for r in by_kind["image"]
    )
    assert all(
        r.width is None and r.duration_ms is not None for r in by_kind["audio"]
    )
    # size matches actual payload length
    sizes = {r.media_ref: r.size_bytes for r in rows}
    for r in blobs.collect():
        assert sizes[r.media_ref] == len(r.payload)


def test_feature_extraction_no_payload_downstream(spark):
    """Output is narrow — payload bytes never cross the shuffle."""
    feats = extract_media_features(
        generate_media_blobs(spark, 30), decode=decode_fake
    )
    assert "payload" not in feats.columns
    agg = feats.groupBy("media_kind").agg(
        F.sum("size_bytes").alias("total_bytes")
    )
    assert agg.count() == 3


def test_resize_images_only(spark):
    from anomalydetection_spark.operators.multimodal import (
        resize_fake,
        resize_media,
        resize_stub,
    )

    blobs = generate_media_blobs(spark, 60)
    out = resize_media(blobs, 32, 32, resize=resize_fake).collect()
    assert len(out) == 60
    for r in out:
        if r.media_kind == "image":
            assert (r.width, r.height) == (32, 32)
            assert len(r.payload) == (32 * 32) // 64
        else:
            assert r.width is None and r.height is None
    # deterministic
    again = resize_media(blobs, 32, 32, resize=resize_fake).collect()
    assert sorted(bytes(r.payload) for r in out) == sorted(
        bytes(r.payload) for r in again
    )
    with pytest.raises(NotImplementedError):
        resize_stub(b"x", "image", 8, 8)


def test_frame_sampling(spark):
    from anomalydetection_spark.operators.multimodal import (
        frame_sample_fake,
        frame_sample_stub,
        sample_frames,
    )

    blobs = generate_media_blobs(spark, 60)
    frames = sample_frames(blobs, every_ms=5000, sampler=frame_sample_fake)
    rows = frames.collect()
    refs = {r.media_ref for r in rows}
    videos = {
        r.media_ref for r in blobs.collect() if r.media_kind == "video"
    }
    assert refs == videos  # only videos produce frames, all of them do
    by_ref: dict[str, list] = {}
    for r in rows:
        by_ref.setdefault(r.media_ref, []).append(r)
    for ref, rs in by_ref.items():
        rs.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rs] == list(range(len(rs)))
        assert all(r.frame_ts_ms == i * 5000 for i, r in enumerate(rs))
        # duration 1000..66535 ms -> 1..14 frames at 5s spacing
        assert 1 <= len(rs) <= 14
    with pytest.raises(NotImplementedError):
        frame_sample_stub(b"x", 1000)


def test_stub_propagates_through_spark(spark):
    feats = extract_media_features(generate_media_blobs(spark, 5))
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        feats.collect()
