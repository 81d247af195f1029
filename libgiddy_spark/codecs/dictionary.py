"""Dictionary codec: small value dictionary + bit-packed per-row indices.

Decode semantics (SURVEY.md §2.1 #4, libgiddy
``src/kernels/decompression/dictionary.cuh``, public-knowledge recall):
``out[i] = D[k[i]]`` — a gather. Encode keeps first-occurrence order for
determinism. The gather itself is numpy fancy indexing (ints) /
StrCol.take (strings) — the CPU transposition of libgiddy's
gather data-layout kernel (§2.1 #12).
"""

from __future__ import annotations

import struct

import numpy as np

from . import header as H
from .bitpack import pack_bits, unpack_bits, width_of
from .intcodec import encode_int_auto
from .strcol import StrCol, pack_strcol, unpack_strcol


def encode_dict_int(x: np.ndarray, dt: int | None = None) -> bytes:
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    uniq, inv = np.unique(x, return_inverse=True) if n else (x[:0], np.zeros(0, np.int64))
    # first-occurrence order (np.unique sorts; re-order for determinism
    # independent of value distribution — matches Arrow dictionary_encode)
    first_pos = np.full(len(uniq), n, dtype=np.int64)
    np.minimum.at(first_pos, inv, np.arange(n))
    order = np.argsort(first_pos, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    dvals = uniq[order]
    idx = rank[inv].astype(np.uint64)
    iw = width_of(max(len(dvals) - 1, 0))
    nested = encode_int_auto(dvals.astype(x.dtype, copy=False), dt)
    params = struct.pack("<QB", len(dvals), iw)
    return H.pack_block(H.DICT, dt, n, [params, nested, pack_bits(idx, iw)])


def encode_dict_str(
    dvals: StrCol, indices: np.ndarray, dt: int = H.DT_UTF8
) -> bytes:
    """Dictionary for strings; caller supplies (dict values, indices) —
    typically from ``pyarrow.Array.dictionary_encode()`` (C++-vectorized)."""
    n = len(indices)
    iw = width_of(max(len(dvals) - 1, 0))
    params = struct.pack("<QB", len(dvals), iw)
    packed = pack_bits(indices.astype(np.uint64, copy=False), iw)
    return H.pack_block(H.DICT, dt, n, [params, pack_strcol(dvals), packed])


def decode_dict(sections, n: int, dt: int):
    card, iw = struct.unpack_from("<QB", sections[0], 0)
    idx = unpack_bits(sections[2], n, iw).astype(np.int64)
    if H.is_string_dt(dt):
        dvals = unpack_strcol(sections[1])
        return dvals.take(idx)
    from . import decode_payload_numpy

    dvals = decode_payload_numpy(bytes(sections[1]))
    return dvals[idx]
