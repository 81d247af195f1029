"""Hypothesis property tests: round-trip identity + size bound for
arbitrary inputs (SURVEY.md §5.2.2)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from libgiddy_spark.codecs import reference as ref
from tests.conftest import roundtrip

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(I64, max_size=300), st.sampled_from(["raw", "for", "delta", "dict", "rle", "dzbv"]))
def test_int_roundtrip_any(xs, codec):
    x = np.array(xs, dtype=np.int64)
    meta, _ = roundtrip(pa.array(x), codec)
    if codec == "for" and len(x):
        assert meta["enc_bytes"] <= ref.naive_for_bytes(x) + ref.HEADER_ALLOWANCE
    if codec == "delta" and len(x):
        assert meta["enc_bytes"] <= ref.naive_delta_bytes(x) + ref.HEADER_ALLOWANCE
    if codec == "dzbv" and len(x):
        assert meta["enc_bytes"] <= ref.naive_dzbv_bytes(x) + ref.HEADER_ALLOWANCE


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.one_of(st.none(), I64), max_size=200),
    st.sampled_from(["raw", "for", "delta", "dict", "rle", "dzbv"]),
)
def test_int_nullable_roundtrip_any(xs, codec):
    roundtrip(pa.array(xs, type=pa.int64()), codec)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.text(max_size=60), max_size=120),
    st.sampled_from(["raw", "dict", "rle", "fsst"]),
)
def test_str_roundtrip_any(xs, codec):
    roundtrip(pa.array(xs, type=pa.string()), codec)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(max_size=80), max_size=100),
    st.sampled_from(["raw", "dict", "rle", "fsst"]),
)
def test_binary_roundtrip_any(xs, codec):
    roundtrip(pa.array(xs, type=pa.binary()), codec)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=80))
def test_str_nullable_fsst(xs):
    roundtrip(pa.array(xs, type=pa.string()), "fsst")


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    from libgiddy_spark.pipeline.multimodal import decode_bmp, encode_bmp

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3),
                                              dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767),
             min_size=0, max_size=400),
    st.integers(min_value=1, max_value=192000),
)
def test_wav_roundtrip_any_samples(xs, rate):
    from libgiddy_spark.pipeline.multimodal import decode_wav, encode_wav

    s = np.array(xs, dtype=np.int16)
    r, ch, out = decode_wav(encode_wav(s, rate))
    assert (r, ch) == (rate, 1)
    assert np.array_equal(out, s)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_resize_nearest_matches_naive(w, h, ow, oh, seed):
    from libgiddy_spark.pipeline.multimodal import resize_nearest

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3),
                                              dtype=np.uint8)
    out = resize_nearest(px, ow, oh)
    naive = np.stack(
        [np.stack([px[(y * h) // oh, (x * w) // ow] for x in range(ow)])
         for y in range(oh)]
    )
    assert np.array_equal(out, naive)
