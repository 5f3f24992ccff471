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


def test_injected_codec_flows_end_to_end(spark):
    """The real-codec seam: a PIL-like callable injected into
    make_feature_extractor must be shipped with the UDF, run inside the
    executor-side Arrow batch loop, and surface its features + name —
    proving the ONLY missing piece of F13 is the library itself, not
    plumbing."""
    import numpy as np

    def tiny_codec(payload: bytes, dim: int):
        # stands in for PIL: "decode" the payload as u8 pixels and emit
        # pooled statistics, exactly the shape a real extractor returns
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        out = np.zeros(dim, dtype=np.float32)
        out[0], out[1], out[2], out[3] = arr.mean(), arr.max(), arr.min(), len(arr)
        return out

    media = spark.createDataFrame(
        [(1, bytearray([0, 10, 20])), (2, bytearray([5, 5]))],
        "media_id long, payload binary",
    )
    rows = {
        r.media_id: r
        for r in extract_features(
            media, dim=4, decoder=tiny_codec, decoder_name="tiny-codec"
        ).collect()
    }
    assert rows[1].decoder == "tiny-codec"
    assert rows[1].feature == [10.0, 20.0, 0.0, 3.0]
    assert rows[2].feature == [5.0, 5.0, 5.0, 2.0]


def test_frame_sampling_plumbing(spark, media):
    out = frame_sample_stub(media, every_n=30).collect()
    assert all(r["frame_idx"] % 30 == 0 for r in out)
    assert {r["media_id"] for r in out} == {1, 2, 3}
