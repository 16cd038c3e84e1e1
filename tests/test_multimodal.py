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


def test_stub_propagates_through_spark(spark):
    feats = extract_media_features(generate_media_blobs(spark, 5))
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        feats.collect()
