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

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8
PROBE_BYTES = (0x00, 0x20, 0x3C, 0x7F, 0xFF)  # NUL, space, '<', DEL, 0xFF


def decode_media(buf: bytes):  # pragma: no cover - by design
    """Real media decode (image/audio frame extraction). The decode
    libraries are not available in this container; the Spark-side
    plumbing uses :func:`fake_features` instead (clearly marked)."""
    raise NotImplementedError(
        "media decoding requires image/audio codecs not present in this "
        "container; use fake_features (deterministic stand-in) instead"
    )


def fake_features(data: np.ndarray, offsets: np.ndarray):
    """Deterministic per-row 8-dim feature from the raw bytes (byte-
    histogram moments) — vectorized stand-in with the same output
    contract a real decoder would have.

    Returns (features: (n, FEATURE_DIM) f32,
             probe_counts: (n, len(PROBE_BYTES)) int64 — exact
             occurrence counts of the probe bytes, the integer view
             a SQL oracle can replicate)."""
    n = len(offsets) - 1
    out = np.zeros((n, FEATURE_DIM), dtype=np.float32)
    probes = np.zeros((n, len(PROBE_BYTES)), dtype=np.int64)
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
        for k, byte in enumerate(PROBE_BYTES):
            cnt = np.bincount(row, weights=(data == byte).astype(np.float64),
                              minlength=n).astype(np.int64)
            probes[:, k] = cnt
            out[:, 3 + k] = cnt / np.maximum(lens, 1)
    return out, probes


def extract_features(
    df: DataFrame, key: str = "url", binary_col: str = "html"
) -> DataFrame:
    """binary column -> (key, n_bytes, sha256, n_space, n_tag, feature).

    Arrow-batched, partition-parallel, zero per-row Python: the sha256
    is computed JVM-side (``F.sha2``) before the kernel and passes
    through untouched; the kernel emits the feature vector plus exact
    integer byte-probe counts (n_space = 0x20, n_tag = '<') so the
    whole output is replicable by a SQL oracle."""
    key_type = dict(df.dtypes)[key]
    out_schema = (
        f"key {key_type}, n_bytes long, sha256 string, "
        "n_space long, n_tag long, feature array<float>"
    )

    def kernel(batches):
        from ..codecs import strcol_of

        for batch in batches:
            keys = batch.column(0)
            col = strcol_of(batch.column(1))
            sha = batch.column(2)
            feats, probes = fake_features(col.data, col.offsets)
            yield pa.RecordBatch.from_arrays(
                [
                    keys,
                    pa.array(np.diff(col.offsets), type=pa.int64()),
                    sha,
                    pa.array(probes[:, 1], type=pa.int64()),  # 0x20
                    pa.array(probes[:, 2], type=pa.int64()),  # 0x3C '<'
                    pa.FixedSizeListArray.from_arrays(
                        pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM
                    ).cast(pa.list_(pa.float32())),
                ],
                names=["key", "n_bytes", "sha256", "n_space", "n_tag", "feature"],
            )

    prepared = df.select(
        F.col(key), F.col(binary_col),
        F.sha2(F.col(binary_col), 256).alias("_sha"),
    )
    return prepared.mapInArrow(kernel, schema=out_schema)
