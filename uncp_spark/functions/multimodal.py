"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing — schemas, batch iteration, partitioning, UDF
signatures — is real and tested; the actual codec step is STUBBED
(``decode_stub=True`` gives a deterministic fake, ``False`` raises
``NotImplementedError``) because no image/audio libraries exist in this
container. Swapping in PIL/torchaudio is a one-function change inside
``_decode_batch``.

uncp declares the same ambition (perceptual image hashes via img_hash,
Cargo.toml:49) and equally never wired it (src/similarity.rs:1-7).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte sniffing as a JVM expression: hex prefix → media type
_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "494433": "audio/mpeg",
    "fff1": "audio/aac",
    "1a45dfa3": "video/webm",
    "00000018667479706d703432": "video/mp4",
}

MEDIA_META_SCHEMA = (
    "media_id long, byte_len long, media_type string, sha256 string"
)
FEATURE_SCHEMA = "media_id long, feature array<float>, decoder string"


def sniff_media_type(col) -> "F.Column":
    """Magic-bytes MIME sniff, pure column expression (uncp's
    tree_magic sniff, src/systems/discovery.rs:267-300, F2)."""
    head = F.lower(F.hex(F.substring(col, 1, 12)))
    expr = F.lit("application/octet-stream")
    for magic, mime in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        expr = F.when(head.startswith(magic.lower()), F.lit(mime)).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, id_col: str = "media_id",
                   bin_col: str = "payload") -> DataFrame:
    """Typed metadata for a binary column — all JVM-side."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.octet_length(bin_col).cast("long").alias("byte_len"),
        sniff_media_type(F.col(bin_col)).alias("media_type"),
        F.sha2(F.col(bin_col), 256).alias("sha256"),
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: hash-seeded feature
    vector with the exact shape/dtype a real extractor would produce."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    return np.random.RandomState(seed).standard_normal(dim).astype(np.float32)


def make_feature_extractor(dim: int = 16, decode_stub: bool = True,
                           decoder=None, decoder_name: str | None = None):
    """mapInPandas operator: (media_id, payload) → (media_id, feature).

    Batch shape: one Arrow batch in, one out; per-batch numpy, no
    per-row Python UDF.

    ``decoder`` is the REAL-CODEC SEAM: any callable
    ``(payload: bytes, dim: int) -> np.ndarray`` — e.g. a PIL decode +
    resize + channel-mean, a torchaudio spectrogram — is cloudpickled
    with the UDF and runs inside the Arrow batch loop on executors with
    no other change (contract-tested in tests/test_multimodal.py).
    Without one, decode_stub=True gives the deterministic fake and
    decode_stub=False raises NotImplementedError at exactly this point.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is not None:
                feats = [
                    np.asarray(decoder(bytes(p), dim), dtype=np.float32)
                    for p in pdf["payload"]
                ]
                name = decoder_name or getattr(decoder, "__name__", "injected")
            elif decode_stub:
                feats = [_fake_decode(bytes(p), dim) for p in pdf["payload"]]
                name = "stub-sha256-rng"
            else:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [f.tolist() for f in feats],
                    "decoder": name,
                }
            )

    return extract


def extract_features(df: DataFrame, dim: int = 16, decode_stub: bool = True,
                     partitions: int | None = None,
                     decoder=None, decoder_name: str | None = None) -> DataFrame:
    """Feature extraction over a binary column. Repartitions first so
    decode work spreads evenly (media blobs skew in size)."""
    src = df.select("media_id", "payload")
    if partitions:
        src = src.repartition(partitions)
    return src.mapInPandas(
        make_feature_extractor(dim, decode_stub, decoder, decoder_name),
        FEATURE_SCHEMA,
    )


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx) rows for
    a stub frame count derived from byte length — the explode pattern a
    real demuxer would feed."""
    n_frames = (F.octet_length("payload") / F.lit(1024)).cast("long") + 1
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
