"""Run-length codec: (run values, run lengths); decode = np.repeat.

Decode semantics (SURVEY.md §2.1 #5, libgiddy
``src/kernels/decompression/run_length_encoding.cuh``, public-knowledge
recall): ``out[pos(r) : pos(r)+len[r]] = value[r]`` with
``pos = exclusive_prefix_sum(len)`` — libgiddy does the prefix-sum +
ownership search on the GPU grid; ``np.repeat`` is the exact
order-preserving CPU equivalent. Run values are themselves encoded
(nested int payload / StrCol), run lengths bit-packed.
"""

from __future__ import annotations

import struct

import numpy as np

from . import header as H
from .bitpack import pack_bits, unpack_bits, width_of
from .intcodec import encode_int_auto
from .strcol import StrCol, pack_strcol, unpack_strcol


def run_starts_int(x: np.ndarray) -> np.ndarray:
    """Indices where a new run begins (index 0 always)."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate([[0], np.flatnonzero(x[1:] != x[:-1]) + 1])


def _pack_lengths(starts: np.ndarray, n: int) -> tuple[bytes, int]:
    lens = np.diff(np.append(starts, n)).astype(np.uint64)
    lw = width_of(int(lens.max())) if len(lens) else 0
    return pack_bits(lens, lw), lw


def encode_rle_int(x: np.ndarray, dt: int | None = None) -> bytes:
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    starts = run_starts_int(x)
    vals = x[starts]
    packed_lens, lw = _pack_lengths(starts, n)
    nested = encode_int_auto(vals, dt)
    params = struct.pack("<QB", len(starts), lw)
    return H.pack_block(H.RLE, dt, n, [params, nested, packed_lens])


def encode_rle_str(run_vals: StrCol, starts: np.ndarray, n: int, dt: int) -> bytes:
    """RLE for strings; caller supplies run values + start indices
    (boundary detection is done vectorized at the Arrow level)."""
    packed_lens, lw = _pack_lengths(starts, n)
    params = struct.pack("<QB", len(starts), lw)
    return H.pack_block(H.RLE, dt, n, [params, pack_strcol(run_vals), packed_lens])


def encode_rpe_int(x: np.ndarray, dt: int | None = None) -> bytes:
    """Run-Position Encoding (SURVEY.md §2.1 #6, libgiddy
    ``src/kernels/decompression/run_position_encoding.cuh``,
    public-knowledge recall): runs stored as (value, start_pos);
    ``out[i] = value[searchsorted_right(start_pos, i) - 1]``."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    starts = run_starts_int(x)
    vals = x[starts]
    pw = width_of(max(n - 1, 0))
    packed_starts = pack_bits(starts.astype(np.uint64), pw)
    nested = encode_int_auto(vals, dt)
    params = struct.pack("<QB", len(starts), pw)
    return H.pack_block(H.RPE, dt, n, [params, nested, packed_starts])


def decode_rpe(sections, n: int, dt: int):
    nruns, pw = struct.unpack_from("<QB", sections[0], 0)
    starts = unpack_bits(sections[2], nruns, pw).astype(np.int64)
    from . import decode_payload_numpy

    vals = decode_payload_numpy(bytes(sections[1]))
    if n == 0:
        return vals[:0]
    run_of = np.searchsorted(starts, np.arange(n, dtype=np.int64), side="right") - 1
    return vals[run_of]


def decode_rle(sections, n: int, dt: int):
    nruns, lw = struct.unpack_from("<QB", sections[0], 0)
    lens = unpack_bits(sections[2], nruns, lw).astype(np.int64)
    if H.is_string_dt(dt):
        vals = unpack_strcol(sections[1])
        idx = np.repeat(np.arange(nruns, dtype=np.int64), lens)
        return vals.take(idx)
    from . import decode_payload_numpy

    vals = decode_payload_numpy(bytes(sections[1]))
    return np.repeat(vals, lens)
