"""Remaining libgiddy scheme-family codecs (SURVEY.md §2.1 #7–#10).

Not selector-preferred by default (dominated by FoR/bit-pack/dict on
our data — exactly why SURVEY marked them optional) but implemented for
full parity with the reference's decompression-scheme inventory:

- **DZB-fixed** (#8, ``discard_zero_bytes_fixed.cuh`` recall): keep only
  the ``k`` low-order bytes of each element, ``k`` fixed per block;
  decode = zero-extend. Byte-granular cousin of bit-packing.
- **DZB-variable** (#9, ``discard_zero_bytes_variable.cuh`` recall,
  streamvbyte-style): a 2-bit length code per element selecting 1/2/4/8
  significant little-endian bytes + the concatenated significant bytes;
  decode = prefix-sum over lengths + per-length-class strided gathers.
- **Incidence bitmaps** (#10, ``incidence_bitmaps.cuh`` recall): one
  bitmap per distinct value; ``out[i] = v`` where bitmap_v bit i is set.
- **Model** (#7, ``model.cuh`` recall): per-segment function model
  ``pred(i) = b + (a_fp * i) >> FP_SHIFT`` (fixed-point linear — exact
  integer arithmetic so decode is bit-deterministic) + patched
  FoR-packed zigzag residuals. FoR is the constant-model special case.
"""

from __future__ import annotations

import struct

import numpy as np

from . import header as H
from .bitpack import unzigzag, zigzag
from .intcodec import DEFAULT_SEG, _as_u64, _decode_for_u64, _for_sections, _from_u64
from .intcodec import encode_int_auto

FP_SHIFT = 20

# codec ids (extend header's table)
DZB = 8
BITMAP = 9
MODEL = 10
DZBV = 11
H.CODEC_NAMES.update({DZB: "dzb", BITMAP: "bitmap", MODEL: "model", DZBV: "dzbv"})
H.CODEC_IDS.update({"dzb": DZB, "bitmap": BITMAP, "model": MODEL, "dzbv": DZBV})


def encode_dzb(x: np.ndarray, dt: int | None = None) -> bytes:
    """Keep k low-order bytes per element (k = max significant bytes)."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    u = np.ascontiguousarray(_as_u64(x))
    if n == 0:
        return H.pack_block(DZB, dt, 0, [struct.pack("<B", 0), b""])
    k = max(int(np.ceil(int(u.max()).bit_length() / 8)), 1) if u.max() else 1
    body = u.view(np.uint8).reshape(n, 8)[:, :k].tobytes()
    return H.pack_block(DZB, dt, n, [struct.pack("<B", k), body])


def decode_dzb(sections, n: int, dt: int) -> np.ndarray:
    (k,) = struct.unpack_from("<B", sections[0], 0)
    if n == 0:
        return _from_u64(np.zeros(0, np.uint64), dt)
    mat = np.zeros((n, 8), dtype=np.uint8)
    if k:
        mat[:, :k] = np.frombuffer(sections[1], np.uint8).reshape(n, k)
    return _from_u64(mat.reshape(-1).view(np.uint64), dt)


_DZBV_LENS = np.array([1, 2, 4, 8], dtype=np.int64)
_U64_1 = np.uint64(1)


def dzbv_codes(u: np.ndarray) -> np.ndarray:
    """2-bit length-class code per u64 element: 0->1B, 1->2B, 2->4B, 3->8B."""
    return (
        (u >= _U64_1 << np.uint64(8)).astype(np.uint8)
        + (u >= _U64_1 << np.uint64(16)).astype(np.uint8)
        + (u >= _U64_1 << np.uint64(32)).astype(np.uint8)
    )


def encode_dzbv(x: np.ndarray, dt: int | None = None) -> bytes:
    """DZB-variable (SURVEY.md §2.1 #9): per-element 2-bit byte-count
    code (packed 4/byte) + concatenated significant bytes."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    u = np.ascontiguousarray(_as_u64(x))
    if n == 0:
        return H.pack_block(DZBV, dt, 0, [b"", b""])
    code = dzbv_codes(u)
    lens = _DZBV_LENS[code]
    ends = np.cumsum(lens)
    starts = ends - lens
    body = np.empty(int(ends[-1]), dtype=np.uint8)
    mat = u.view(np.uint8).reshape(n, 8)
    for cv, length in enumerate(_DZBV_LENS):
        sel = np.flatnonzero(code == cv)
        if len(sel) == 0:
            continue
        base = starts[sel]
        for k in range(int(length)):
            body[base + k] = mat[sel, k]
    pad = (-n) % 4
    c = np.concatenate([code, np.zeros(pad, np.uint8)]).reshape(-1, 4)
    packed = (c[:, 0] | (c[:, 1] << 2) | (c[:, 2] << 4) | (c[:, 3] << 6)).astype(
        np.uint8
    )
    return H.pack_block(DZBV, dt, n, [packed.tobytes(), body.tobytes()])


def decode_dzbv(sections, n: int, dt: int) -> np.ndarray:
    if n == 0:
        return _from_u64(np.zeros(0, np.uint64), dt)
    packed = np.frombuffer(sections[0], np.uint8)
    code = np.empty((len(packed), 4), dtype=np.uint8)
    code[:, 0] = packed & 3
    code[:, 1] = (packed >> 2) & 3
    code[:, 2] = (packed >> 4) & 3
    code[:, 3] = (packed >> 6) & 3
    code = code.reshape(-1)[:n]
    lens = _DZBV_LENS[code]
    ends = np.cumsum(lens)
    starts = ends - lens
    body = np.frombuffer(sections[1], np.uint8)
    mat = np.zeros((n, 8), dtype=np.uint8)
    for cv, length in enumerate(_DZBV_LENS):
        sel = np.flatnonzero(code == cv)
        if len(sel) == 0:
            continue
        base = starts[sel]
        for k in range(int(length)):
            mat[sel, k] = body[base + k]
    return _from_u64(mat.reshape(-1).view(np.uint64), dt)


def encode_bitmap(x: np.ndarray, dt: int | None = None, max_card: int = 64) -> bytes:
    """One incidence bitmap per distinct value (low-cardinality ints)."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    uniq = np.unique(x) if n else x[:0]
    if len(uniq) > max_card:
        raise ValueError(f"bitmap codec needs cardinality <= {max_card}")
    nested = encode_int_auto(uniq.astype(x.dtype, copy=False), dt)
    bitmaps = b"".join(
        np.packbits(x == v, bitorder="little").tobytes() for v in uniq
    )
    params = struct.pack("<H", len(uniq))
    return H.pack_block(BITMAP, dt, n, [params, nested, bitmaps])


def decode_bitmap(sections, n: int, dt: int) -> np.ndarray:
    (card,) = struct.unpack_from("<H", sections[0], 0)
    from . import decode_payload_numpy

    uniq = decode_payload_numpy(bytes(sections[1]))
    out = np.zeros(n, dtype=uniq.dtype if len(uniq) else H.np_of(dt))
    stride = (n + 7) // 8
    raw = np.frombuffer(sections[2], np.uint8)
    for j in range(card):
        bits = np.unpackbits(raw[j * stride : (j + 1) * stride],
                             bitorder="little", count=n).astype(bool)
        out[bits] = uniq[j]
    return out


def encode_model(
    x: np.ndarray, dt: int | None = None, seg_len: int = DEFAULT_SEG
) -> bytes:
    """Per-segment fixed-point linear model + patched packed residuals."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    u = _as_u64(x)
    if n == 0:
        return H.pack_block(
            MODEL, dt, 0,
            [struct.pack("<I", seg_len), b"", b""] + _for_sections(u, False, 1),
        )
    nseg = (n + seg_len - 1) // seg_len
    a_fp = np.zeros(nseg, dtype=np.int64)
    b = np.zeros(nseg, dtype=np.int64)
    pred = np.zeros(n, dtype=np.uint64)
    xi = u.view(np.int64).astype(np.float64)
    for s in range(nseg):
        lo, hi = s * seg_len, min((s + 1) * seg_len, n)
        seg = xi[lo:hi]
        m = hi - lo
        if m > 1:
            i = np.arange(m, dtype=np.float64)
            slope = ((i * seg).mean() - i.mean() * seg.mean()) / max(
                (i * i).mean() - i.mean() ** 2, 1e-9
            )
            if not np.isfinite(slope):
                slope = 0.0
            slope = float(np.clip(slope, -(2**40), 2**40))
        else:
            slope = 0.0
        a_fp[s] = int(round(slope * (1 << FP_SHIFT)))
        b[s] = u[lo : lo + 1].view(np.int64)[0]
        i64 = np.arange(m, dtype=np.int64)
        p = b[s] + ((a_fp[s] * i64) >> FP_SHIFT)
        pred[lo:hi] = p.view(np.uint64)
    resid = zigzag((u - pred).view(np.int64))
    inner = _for_sections(resid, signed=False, seg_len=max(n, 1))
    return H.pack_block(
        MODEL, dt, n,
        [struct.pack("<I", seg_len), a_fp.tobytes(), b.tobytes(), *inner],
    )


def decode_model(sections, n: int, dt: int) -> np.ndarray:
    (seg_len,) = struct.unpack_from("<I", sections[0], 0)
    if n == 0:
        return _from_u64(np.zeros(0, np.uint64), dt)
    a_fp = np.frombuffer(sections[1], np.int64)
    b = np.frombuffer(sections[2], np.int64)
    zz = _decode_for_u64(sections[3:], n)
    resid = unzigzag(zz).view(np.uint64)
    nseg = len(a_fp)
    starts = np.arange(nseg) * seg_len
    seg_sizes = np.diff(np.append(starts, n))
    within = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_sizes)
    pred = np.repeat(b, seg_sizes) + (
        (np.repeat(a_fp, seg_sizes) * within) >> FP_SHIFT
    )
    return _from_u64(pred.view(np.uint64) + resid, dt)
