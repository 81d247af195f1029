"""Compressed-size bound: production encoder <= naive reference encoder
(+ fixed container allowance) per scheme — operationalizes BASELINE.json:6
"compressed size <= the reference encoder's" (SURVEY.md §5.2.3)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from libgiddy_spark.codecs import encode_array
from libgiddy_spark.codecs import reference as ref
from libgiddy_spark.codecs.fsst import train
from libgiddy_spark.codecs.strcol import StrCol

A = ref.HEADER_ALLOWANCE


def enc_bytes(x, codec, **kw):
    payload, meta = encode_array(pa.array(x), codec, **kw)
    return meta["enc_bytes"]


@pytest.fixture(scope="module")
def int_inputs(rng=None):
    rng = np.random.default_rng(42)
    return {
        "sorted": np.arange(20_000, dtype=np.int64),
        "random_small": rng.integers(0, 1000, 20_000),
        "random_wide": rng.integers(-(2**60), 2**60, 20_000),
        "constant": np.full(20_000, 5, dtype=np.int64),
        "runs": np.repeat(rng.integers(0, 50, 200), 100),
        "ts": 1_704_067_200_000_000 + np.cumsum(rng.integers(0, 800_000, 20_000)),
        "outliers": np.where(rng.random(20_000) < 0.01, 2**59, rng.integers(0, 64, 20_000)).astype(np.int64),
    }


def test_bitpack_bound(int_inputs):
    for name, x in int_inputs.items():
        if x.min() < 0:
            continue
        assert enc_bytes(x, "bitpack") <= ref.naive_bitpack_bytes(x) + A, name


def test_for_bound(int_inputs):
    for name, x in int_inputs.items():
        assert enc_bytes(x, "for") <= ref.naive_for_bytes(x) + A, name


def test_delta_bound(int_inputs):
    for name, x in int_inputs.items():
        assert enc_bytes(x, "delta") <= ref.naive_delta_bytes(x) + A, name


def test_dict_int_bound(int_inputs):
    for name, x in int_inputs.items():
        assert enc_bytes(x, "dict") <= ref.naive_dict_int_bytes(x) + A, name


def test_rle_int_bound(int_inputs):
    for name, x in int_inputs.items():
        assert enc_bytes(x, "rle") <= ref.naive_rle_int_bytes(x) + A, name


STR_INPUTS = {
    "langs": ["en"] * 600 + ["zh"] * 120 + ["es", "de", "fr"] * 90,
    "urls": [f"https://www.site{i % 40}.org/posts/{i}?ref=feed" for i in range(3000)],
    "text": [
        " ".join(f"word{j % 97}" for j in range(i, i + 40)) for i in range(1000)
    ],
    "empties": ["", "", "x", ""] * 200,
}


def test_dict_str_bound():
    for name, items in STR_INPUTS.items():
        n = ref.naive_dict_str_bytes([s.encode() for s in items])
        assert enc_bytes(items, "dict") <= n + A, name


def test_rle_str_bound():
    for name, items in STR_INPUTS.items():
        n = ref.naive_rle_str_bytes([s.encode() for s in items])
        assert enc_bytes(items, "rle") <= n + A, name


def test_raw_str_bound():
    for name, items in STR_INPUTS.items():
        n = ref.naive_raw_str_bytes([s.encode() for s in items])
        assert enc_bytes(items, "raw") <= n + A, name


def test_fsst_bound_and_stream_identity():
    """Vectorized FSST must produce the byte-identical token stream the
    sequential reference encoder produces with the same table — strictly
    stronger than the size bound."""
    from libgiddy_spark.codecs.fsst import encode_tokens

    for name, items in STR_INPUTS.items():
        bitems = [s.encode() for s in items]
        col = StrCol.from_pylist(bitems)
        table = train(col.data)
        codes, _ = encode_tokens(col, table)
        naive_stream = ref.naive_fsst_encode(bitems, table)
        assert codes.tobytes() == naive_stream, name
        assert enc_bytes(items, "fsst", fsst_table=table) <= ref.naive_fsst_bytes(bitems, table) + A, name


def test_fsst_native_numpy_stream_identity():
    """The C fast path, the lock-step numpy path and the per-byte naive
    reference must all emit the SAME token stream."""
    import numpy as np

    from libgiddy_spark.codecs._native import native_lib
    from libgiddy_spark.codecs.fsst import (
        _encode_tokens_native,
        _encode_tokens_numpy,
    )

    lib = native_lib()
    if lib is None:
        import pytest

        pytest.skip("no C compiler on host")
    cases = list(STR_INPUTS.values()) + [
        [],
        [""] * 10,
        ["\x00\xff bin\x00ary" * 100, "", "z"],
        ["日本語のテキスト" * 300, "mixed ascii 日本語"],
        ["x" * 5000],  # multi-lane single string
    ]
    for items in cases:
        bitems = [s.encode() for s in items]
        col = StrCol.from_pylist(bitems)
        table = train(col.data)
        c_np, l_np = _encode_tokens_numpy(col, table)
        c_c, l_c = _encode_tokens_native(col, table, lib)
        assert np.array_equal(c_np, c_c)
        assert np.array_equal(l_np, l_c)
        naive = ref.naive_fsst_encode(bitems, table)
        assert c_c.tobytes() == naive
        # decode parity: native two-pass vs vectorized numpy classifier
        import libgiddy_spark.codecs._native as N
        from libgiddy_spark.codecs.fsst import decode_stream

        out_c, offs_c = decode_stream(c_c, table)
        saved = N._lib, N._tried
        N._lib, N._tried = None, True
        try:
            out_np, offs_np = decode_stream(c_c, table)
        finally:
            N._lib, N._tried = saved
        assert np.array_equal(out_c, out_np)
        assert np.array_equal(offs_c, offs_np)
        assert bytes(out_c) == b"".join(bitems)
