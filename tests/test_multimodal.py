"""Multimodal binary-column plumbing (schemas, mapInPandas batching,
stub decode) — real Spark-side machinery, fake codec."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from uncp_spark.functions.multimodal import (
    extract_features,
    frame_sample_stub,
    media_metadata,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPG = b"\xff\xd8\xff\xe0" + b"\x01" * 32
RAW = b"\x00\x01\x02\x03" * 8


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, bytearray(PNG)), (2, bytearray(JPG)), (3, bytearray(RAW))]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_media_metadata(spark, media):
    out = {r["media_id"]: r.asDict() for r in media_metadata(media).collect()}
    assert out[1]["media_type"] == "image/png"
    assert out[2]["media_type"] == "image/jpeg"
    assert out[3]["media_type"] == "application/octet-stream"
    assert out[1]["byte_len"] == len(PNG)
    assert len(out[1]["sha256"]) == 64


def test_feature_extraction_stub(spark, media):
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r["feature"]) == 16
        assert r["decoder"] == "stub-sha256-rng"
    # deterministic: same payload → same feature
    again = extract_features(media, dim=16).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in again
    }


def test_feature_extraction_real_decoder_gated(spark, media):
    with pytest.raises(Exception) as ei:
        extract_features(media, dim=16, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decoding" in str(ei.value)


def test_frame_sampling_plumbing(spark, media):
    out = frame_sample_stub(media, every_n=30).collect()
    assert all(r["frame_idx"] % 30 == 0 for r in out)
    assert {r["media_id"] for r in out} == {1, 2, 3}
