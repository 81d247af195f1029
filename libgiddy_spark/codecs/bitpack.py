"""Fixed-width little-endian bit-packing kernel (+ zigzag helpers).

Semantics (normative, SURVEY.md §2.1 #1, mirroring libgiddy
``src/kernels/decompression/bit_packing.cuh`` — public-knowledge recall):
values are packed at ``w`` bits each, ``w`` fixed per block;
``out[i] = bits[i*w : (i+1)*w]`` zero-extended to the element width.

Implementation: conflict-free word-gather kernels. Encode computes each
output 64-bit word independently by gathering the <=(64//w + 2) values
that overlap it (no scatter conflicts — the same reason libgiddy's
decode threads each own an output slice); decode gathers the one or two
words that hold value i's bits. All paths are whole-array numpy ops;
no Python loops over elements. This is the innermost kernel: FoR, delta,
dict and RLE all compose onto it, exactly as libgiddy's schemes feed a
common bit-unpacking stage.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_FULL_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def width_of(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (>=0). width_of(0) == 0."""
    if max_value < 0:
        raise ValueError("bit-packing requires non-negative values")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative uint64 values at ``width`` bits each, little-endian."""
    n = len(values)
    if n == 0 or width == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width == 64:
        return v.tobytes()
    nwords = (n * width + 63) // 64
    from ._native import native_lib

    lib = native_lib()
    if lib is not None:
        acc = np.zeros(nwords + 1, dtype=np.uint64)
        lib.pack_bits64(v, n, width, acc)
        return acc.tobytes()[: (n * width + 7) // 8]
    w = np.arange(nwords, dtype=np.int64)
    first = (w * 64) // width  # first value whose bits reach word w
    base_shift = first * width - w * 64  # in (-width, 0]
    acc = np.zeros(nwords, dtype=np.uint64)
    for j in range(64 // width + 2):
        if j * width - (width - 1) >= 64:  # min possible shift >= 64: done
            break
        i = first + j
        sh = base_shift + j * width
        valid = ((i < n) & (sh < 64)).astype(np.uint64)
        vv = v[np.minimum(i, n - 1)]
        lsh = np.maximum(sh, 0).astype(np.uint64)
        rsh = np.maximum(-sh, 0).astype(np.uint64)
        acc |= ((vv << lsh) >> rsh) * valid
    # trim any tail bytes beyond ceil(n*width/8)
    return acc.tobytes()[: (n * width + 7) // 8]


def unpack_bits(buf, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length ``n``."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = bytes(buf)
    if width == 64:
        return np.frombuffer(raw, dtype=np.uint64, count=n).copy()
    pad = (-len(raw)) % 8 + 8  # one spare word for the hi-part gather
    words = np.frombuffer(raw + b"\x00" * pad, dtype=np.uint64)
    from ._native import native_lib

    lib = native_lib()
    if lib is not None:
        out = np.empty(n, dtype=np.uint64)
        lib.unpack_bits64(np.ascontiguousarray(words), n, width, out)
        return out
    bitpos = np.arange(n, dtype=np.uint64) * _U64(width)
    wi = (bitpos >> _U64(6)).astype(np.int64)
    off = bitpos & _U64(63)
    lo = words[wi] >> off
    # hi bits land at positions >= 64-off; if the value fits one word they
    # exceed `width` and the final mask clears them, so no conditional.
    hi = (words[wi + 1] << ((_U64(64) - off) & _U64(63))) * (off != 0)
    return (lo | hi) & _U64((1 << width) - 1)


def zigzag(x: np.ndarray) -> np.ndarray:
    """Map signed int64 -> uint64 so small |x| gets small codes."""
    x = x.astype(np.int64, copy=False)
    return ((x << 1) ^ (x >> 63)).view(np.uint64)


def unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64, copy=False)
    return ((z >> np.uint64(1)).view(np.int64)) ^ -((z & np.uint64(1)).view(np.int64))
