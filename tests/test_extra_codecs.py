"""Round-trips for the parity codecs: DZB-fixed, incidence bitmaps,
function model (SURVEY.md §2.1 #7, #8, #10)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tests.conftest import roundtrip

EXTRA = ["dzb", "bitmap", "model", "dzbv"]


def test_dzbv_roundtrips(rng):
    for x in [
        rng.integers(0, 2**20, 3000),
        np.array([], np.int64),
        np.zeros(10, np.int64),
        rng.integers(-5, 5, 100),  # negatives -> full 8-byte class
        np.array([2**62, 0, 255, 256, 65535, 65536, 2**32 - 1, 2**32], np.int64),
        rng.integers(0, 255, 500),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max], np.int64),
    ]:
        roundtrip(pa.array(np.asarray(x, np.int64)), "dzbv")


def test_dzbv_size_bound(rng):
    from libgiddy_spark.codecs import encode_array
    from libgiddy_spark.codecs import reference as ref

    for x in [
        rng.integers(0, 200, 20_000),       # all 1-byte class
        rng.integers(0, 2**30, 20_000),     # mixed 2/4-byte classes
        rng.integers(-(2**60), 2**60, 5_000),
    ]:
        x = np.asarray(x, np.int64)
        _, meta = encode_array(pa.array(x), "dzbv")
        assert meta["enc_bytes"] <= ref.naive_dzbv_bytes(x) + ref.HEADER_ALLOWANCE


def test_dzb_roundtrips(rng):
    for x in [
        rng.integers(0, 2**20, 3000),
        np.array([], np.int64),
        np.zeros(10, np.int64),
        rng.integers(-5, 5, 100),
        np.array([2**62], np.int64),
        rng.integers(0, 255, 500),
    ]:
        roundtrip(pa.array(np.asarray(x, np.int64)), "dzb")


def test_bitmap_roundtrips(rng):
    for x in [
        rng.integers(0, 5, 4000),
        np.array([], np.int64),
        np.full(100, -7, np.int64),
        np.array([1, 2, 3], np.int64),
    ]:
        roundtrip(pa.array(np.asarray(x, np.int64)), "bitmap")
    with pytest.raises(ValueError):
        roundtrip(pa.array(np.arange(1000)), "bitmap")  # card too high


def test_model_roundtrips(rng):
    lin = (1000 + 7 * np.arange(50_000) + rng.integers(-3, 4, 50_000)).astype(np.int64)
    meta, _ = roundtrip(pa.array(lin), "model")
    assert meta["enc_bytes"] < meta["raw_bytes"] / 8  # linear data compresses hard
    for x in [
        rng.integers(-(2**62), 2**62, 3000),
        np.array([], np.int64),
        np.array([5], np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max] * 10),
        np.arange(10_000, dtype=np.int64)[::-1].copy(),
    ]:
        roundtrip(pa.array(np.asarray(x, np.int64)), "model")


@pytest.mark.parametrize("codec", EXTRA)
def test_extra_nulls(codec):
    roundtrip(pa.array([1, None, 3, None, 2] * 40), codec)


def test_model_on_timestamps(rng):
    ts = (1_704_067_200_000_000 + np.cumsum(rng.integers(700_000, 900_000, 20_000)))
    arr = pa.array(ts.astype("datetime64[us]"))
    meta, _ = roundtrip(arr, "model")
    assert meta["enc_bytes"] < meta["raw_bytes"] / 2
