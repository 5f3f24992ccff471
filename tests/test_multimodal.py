"""Multimodal binary-column plumbing (schemas, mapInPandas batching,
stub decode) — real Spark-side machinery, fake codec."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from uncp_spark.functions.multimodal import (
    extract_features,
    frame_sample_stub,
    media_dimensions,
    media_metadata,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPG = b"\xff\xd8\xff\xe0" + b"\x01" * 32
RAW = b"\x00\x01\x02\x03" * 8


def make_png(w: int, h: int, color_type: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\xf7\x00\x00"


def make_jpeg(w: int, h: int, channels: int = 3, *, app0_pad: int = 5,
              sof: int = 0xC0, fill: bool = False, dht_first: bool = False) -> bytes:
    """SOI, a variable-length APP0 (so SOF lands at a data-dependent
    offset), optionally a DHT segment and FF fill bytes, then SOF."""
    b = b"\xff\xd8"
    b += b"\xff\xe0" + (2 + app0_pad).to_bytes(2, "big") + b"\x4a" * app0_pad
    if dht_first:
        b += b"\xff\xc4" + (2 + 4).to_bytes(2, "big") + b"\x00" * 4
    if fill:
        b += b"\xff"  # fill byte before the next marker's FF
    b += bytes([0xFF, sof]) + (8 + 3 * channels).to_bytes(2, "big")
    b += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([channels])
    b += b"\x01\x11\x00" * channels
    return b


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


def test_media_dimensions_header_parsing(spark):
    """F13 real half: dimensions recovered from ACTUAL header bytes —
    PNG/GIF via pure column math, JPEG via the Arrow segment scan."""
    rows = [
        (1, bytearray(make_png(640, 480, 2))),        # RGB
        (2, bytearray(make_png(31, 77, 0))),          # greyscale
        (3, bytearray(make_png(12, 12, 6))),          # RGBA
        (4, bytearray(make_gif(320, 200))),
        (5, bytearray(make_jpeg(1920, 1080, 3))),
        (6, bytearray(make_jpeg(99, 44, 1, app0_pad=37))),   # shifted SOF
        (7, bytearray(make_jpeg(55, 66, 3, sof=0xC2))),      # progressive
        (8, bytearray(make_jpeg(10, 20, 3, dht_first=True, fill=True))),
        (9, bytearray(RAW)),                           # not media
        (10, bytearray(b"\x89PNG\r\n\x1a\n\x00\x00")),  # truncated PNG
        (11, bytearray(b"\xff\xd8\xff")),              # truncated JPEG
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r.asDict() for r in media_dimensions(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (640, 480, 3)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (31, 77, 1)
    assert (out[3]["width"], out[3]["height"], out[3]["channels"]) == (12, 12, 4)
    assert (out[4]["width"], out[4]["height"], out[4]["channels"]) == (320, 200, 3)
    assert (out[5]["width"], out[5]["height"], out[5]["channels"]) == (1920, 1080, 3)
    assert (out[6]["width"], out[6]["height"], out[6]["channels"]) == (99, 44, 1)
    assert (out[7]["width"], out[7]["height"], out[7]["channels"]) == (55, 66, 3)
    assert (out[8]["width"], out[8]["height"], out[8]["channels"]) == (10, 20, 3)
    for mid in (9, 10, 11):
        assert out[mid]["width"] is None and out[mid]["height"] is None
    assert out[9]["media_type"] == "application/octet-stream"
    assert out[10]["media_type"] == "image/png"  # sniff still reports
    assert out[11]["media_type"] == "image/jpeg"


def test_frame_sampling_plumbing(spark, media):
    out = frame_sample_stub(media, every_n=30).collect()
    assert all(r["frame_idx"] % 30 == 0 for r in out)
    assert {r["media_id"] for r in out} == {1, 2, 3}
