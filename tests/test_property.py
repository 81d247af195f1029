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
