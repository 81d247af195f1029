"""Multimodal binary-column plumbing: treat image/audio/video payloads
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInArrow`` kernels.

The actual media decode is STUBBED (``decode_media`` raises
``NotImplementedError`` — the image/audio libraries are not in this
container); everything Spark-side is real and tested: schema, batch
shapes, partition-parallel execution, and a deterministic fake feature
extractor (byte-histogram moments) standing in for the decoder so the
pipeline's downstream contract (fixed-width float feature vectors) is
exercised end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "key string, n_bytes long, sha256_prefix string, feature array<float>"
)


def decode_media(buf: bytes):  # pragma: no cover - by design
    """Real media decode (image/audio frame extraction). The decode
    libraries are not available in this container; the Spark-side
    plumbing uses :func:`fake_features` instead (clearly marked)."""
    raise NotImplementedError(
        "media decoding requires image/audio codecs not present in this "
        "container; use fake_features (deterministic stand-in) instead"
    )


def fake_features(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Deterministic per-row 8-dim feature from the raw bytes (byte-
    histogram moments) — vectorized stand-in with the same output
    contract a real decoder would have. Returns (n, FEATURE_DIM) f32."""
    n = len(offsets) - 1
    out = np.zeros((n, FEATURE_DIM), dtype=np.float32)
    lens = np.diff(offsets)
    row = np.repeat(np.arange(n), lens)
    if len(row):
        vals = data.astype(np.float32)
        # moments of the byte distribution per row
        sums = np.bincount(row, weights=vals, minlength=n)
        sqs = np.bincount(row, weights=vals * vals, minlength=n)
        mean = np.where(lens > 0, sums / np.maximum(lens, 1), 0)
        var = np.where(lens > 0, sqs / np.maximum(lens, 1) - mean**2, 0)
        out[:, 0] = lens
        out[:, 1] = mean
        out[:, 2] = np.sqrt(np.maximum(var, 0))
        for k, byte in enumerate((0x00, 0x20, 0x3C, 0x7F, 0xFF)):  # <=5 probes
            cnt = np.bincount(row, weights=(data == byte).astype(np.float64), minlength=n)
            out[:, 3 + k] = cnt / np.maximum(lens, 1)
    return out


def extract_features(
    df: DataFrame, key: str = "url", binary_col: str = "html"
) -> DataFrame:
    """binary column -> (key, n_bytes, sha256 prefix, feature vector).

    Arrow-batched, partition-parallel; no per-row Python except the
    (cheap, bounded) sha256 per value, matching the manifest's
    integrity hashing.
    """

    def kernel(batches):
        from ..codecs import strcol_of

        for batch in batches:
            keys = batch.column(0)
            col = strcol_of(batch.column(1))
            feats = fake_features(col.data, col.offsets)
            sha = [
                hashlib.sha256(bytes(col.data[col.offsets[i]:col.offsets[i + 1]])).hexdigest()[:16]
                for i in range(len(col))
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    keys.cast(pa.string()),
                    pa.array(np.diff(col.offsets), type=pa.int64()),
                    pa.array(sha, type=pa.string()),
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
                    ).cast(pa.list_(pa.float32())),
                ],
                names=["key", "n_bytes", "sha256_prefix", "feature"],
            )

    return df.select(key, binary_col).mapInArrow(kernel, schema=FEATURES_SCHEMA)
