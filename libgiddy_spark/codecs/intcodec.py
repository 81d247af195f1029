"""Integer codec pipelines: BITPACK, FoR(+bit-pack, patched), DELTA.

Decode semantics are normative per SURVEY.md §2.1 (#1 bit-packing,
#2 frame-of-reference, #3 delta, #11 patching — public-knowledge recall
of libgiddy src/kernels/decompression/{bit_packing,frame_of_reference,
delta}.cuh and its PFOR-style exception mechanism):

- FoR: block split into fixed segments of ``seg_len``; per-segment
  reference = segment min; ``out[i] = ref[seg(i)] + offset[i]`` with the
  offsets bit-packed at one per-block width. Arithmetic is modular
  uint64 on the raw bit pattern, so any int64/uint64 input round-trips
  bit-exactly (including full-range min..max).
- Patching: offsets too wide for the chosen width go to an exception
  list ``(pos, val)`` scattered over the decoded output — this lets the
  width cover ~p99 instead of the max (SURVEY.md §2.1 #11).
- Delta: per-segment anchor ``anchor[s] = x[s*seg_len]``; in-segment
  deltas are zigzagged and fed to the FoR+bit-pack stage; decode is a
  segmented cumsum seeded by the anchors, so segments decode
  independently — the exact trick libgiddy uses to make delta decode
  grid-parallel, transposed here to numpy blocks inside one Spark task.

Every encoder returns a complete self-describing block payload
(header.pack_block), so payloads nest (RLE run-values reuse these).
"""

from __future__ import annotations

import struct

import numpy as np

from . import header as H
from .bitpack import pack_bits, unpack_bits, unzigzag, width_of, zigzag

DEFAULT_SEG = 4096

_U64 = np.uint64


def bit_lengths(v: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length() over a uint64 array."""
    from ._native import native_lib

    lib = native_lib()
    if lib is not None:
        out = np.empty(len(v), dtype=np.uint8)
        lib.bit_lengths64(np.ascontiguousarray(v, dtype=np.uint64), len(v), out)
        return out
    w = np.zeros(len(v), dtype=np.uint8)
    vv = v.astype(np.uint64, copy=True)
    for k in (32, 16, 8, 4, 2, 1):
        m = vv >= (_U64(1) << _U64(k))
        w[m] += k
        vv[m] >>= _U64(k)
    w += (vv > 0).astype(np.uint8)
    return w


def _as_u64(x: np.ndarray) -> np.ndarray:
    """Raw bit pattern of an integer array, widened to uint64."""
    if x.dtype.kind == "u":
        return x.astype(np.uint64, copy=False)
    return x.astype(np.int64, copy=False).view(np.uint64)


_STORAGE_DT = {H.DT_FLOAT32: np.dtype(np.int32), H.DT_FLOAT64: np.dtype(np.int64)}


def _from_u64(u: np.ndarray, dt: int) -> np.ndarray:
    """Back to the storage dtype. Floats stay as int bit patterns; the
    Arrow boundary (codecs.decode_array) views them back to float."""
    np_dt = _STORAGE_DT.get(dt) or H.np_of(dt)
    if np_dt.kind == "u":
        return u.astype(np_dt, copy=False)
    return u.view(np.int64).astype(np_dt, copy=False)


def choose_width(
    offsets_u64: np.ndarray, pos_bits: int, bl: np.ndarray | None = None
) -> tuple[int, int]:
    """Pick the packed width minimizing total bits incl. patched exceptions.

    Returns (width, exc_width). Exception cost = pos_bits + exc_width per
    exception (PFOR-style: narrow base width + outlier list).
    """
    n = len(offsets_u64)
    if n == 0:
        return 0, 0
    if bl is None:
        bl = bit_lengths(offsets_u64)
    counts = np.bincount(bl, minlength=1).astype(np.int64)
    return choose_width_from_counts(counts, n, pos_bits)


def choose_width_from_counts(
    counts: np.ndarray, n: int, pos_bits: int
) -> tuple[int, int]:
    """``choose_width`` from a bit-length histogram (the fused C
    pre-pass emits one, so no per-value array is needed)."""
    if n == 0:
        return 0, 0
    nz = np.flatnonzero(counts)
    max_w = int(nz[-1]) if len(nz) else 0
    counts = counts[: max_w + 1]
    # exceptions(w) = # values with bit_length > w
    exc = np.cumsum(counts[::-1])[::-1]  # exc[w] = count(bl >= w)
    n_exc = np.zeros(max_w + 1, dtype=np.int64)
    n_exc[:-1] = exc[1:]  # bl > w
    widths = np.arange(max_w + 1)
    cost = n * widths + n_exc * (pos_bits + max_w)
    w = int(widths[np.argmin(cost)])
    return w, max_w


def _pack_exc_native(
    vals: np.ndarray, n: int, w: int, n_exc: int, lib
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """(packed base bytes, exc_pos u64, exc_val u64) via the fused C
    PFOR pack — one read of ``vals`` replaces numpy's mask / where /
    flatnonzero passes plus the separate pack pass."""
    nwords = (n * w + 63) // 64 if w else 0
    outw = np.zeros(nwords + 1, dtype=np.uint64)
    exc_pos = np.empty(n_exc, dtype=np.int64)
    exc_val = np.empty(n_exc, dtype=np.uint64)
    ne = lib.pack_exc64(
        np.ascontiguousarray(vals, dtype=np.uint64), n, w,
        outw, exc_pos, exc_val)
    assert ne == n_exc, (ne, n_exc)
    # byte-for-byte the pack_bits convention: trim to ceil(bits/8)
    packed = outw.tobytes()[: (n * w + 7) // 8] if (w and n) else b""
    return packed, exc_pos.astype(np.uint64), exc_val


def encode_bitpack(x: np.ndarray, dt: int | None = None) -> bytes:
    """Plain fixed-width bit-packing; requires non-negative values."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    u = _as_u64(x)
    if n and x.dtype.kind != "u" and x.astype(np.int64, copy=False).min() < 0:
        raise ValueError("bitpack requires non-negative input; use 'for'")
    w = int(bit_lengths(u).max()) if n else 0
    sec0 = struct.pack("<B", w)
    return H.pack_block(H.BITPACK, dt, n, [sec0, pack_bits(u, w)])


def _decode_bitpack(sections, n: int, dt: int) -> np.ndarray:
    (w,) = struct.unpack_from("<B", sections[0], 0)
    return _from_u64(unpack_bits(sections[1], n, w), dt)


def _for_sections(
    u: np.ndarray, signed: bool, seg_len: int
) -> list[bytes]:
    """FoR+bit-pack+patch section list for a uint64 bit-pattern array.
    Shared by the FOR block and (inlined) by the DELTA block."""
    n = len(u)
    if n == 0:
        return [struct.pack("<IBQBB", seg_len, 0, 0, 0, 0), b"", b"", b"", b""]
    nseg = (n + seg_len - 1) // seg_len
    starts = np.arange(nseg) * seg_len
    # per-segment reference = min in the value domain (signed vs unsigned)
    if signed:
        refs_u = np.minimum.reduceat(u.view(np.int64), starts).view(np.uint64)
    else:
        refs_u = np.minimum.reduceat(u, starts)
    seg_sizes = np.diff(np.append(starts, n))
    offsets = u - np.repeat(refs_u, seg_sizes)  # modular; always "non-negative"
    pos_bits = width_of(max(n - 1, 0))
    bl = bit_lengths(offsets)
    counts = np.bincount(bl, minlength=1).astype(np.int64)
    w, exc_w = choose_width_from_counts(counts, n, pos_bits)
    from ._native import native_lib

    lib = native_lib()
    if lib is not None:
        n_exc = int(counts[w + 1:].sum())
        base_packed, exc_pos, exc_val = _pack_exc_native(
            offsets, n, w, n_exc, lib)
    else:
        exc_mask = bl > w
        exc_pos = np.flatnonzero(exc_mask).astype(np.uint64)
        exc_val = offsets[exc_mask]
        base = np.where(exc_mask, _U64(0), offsets)
        base_packed = pack_bits(base, w)
    params = struct.pack("<IBQBB", seg_len, w, len(exc_pos), pos_bits, exc_w)
    return [
        params,
        refs_u.tobytes(),
        base_packed,
        pack_bits(exc_pos, pos_bits),
        pack_bits(exc_val, exc_w),
    ]


def encode_for(
    x: np.ndarray, dt: int | None = None, seg_len: int = DEFAULT_SEG
) -> bytes:
    """Frame-of-reference + bit-packing with PFOR-style patching."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    signed = x.dtype.kind != "u"
    return H.pack_block(H.FOR, dt, len(x), _for_sections(_as_u64(x), signed, seg_len))


def _decode_for_u64(sections, n: int) -> np.ndarray:
    seg_len, w, n_exc, pos_bits, exc_w = struct.unpack_from("<IBQBB", sections[0], 0)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    refs_u = np.frombuffer(sections[1], dtype=np.uint64)
    offsets = unpack_bits(sections[2], n, w)
    if n_exc:
        exc_pos = unpack_bits(sections[3], n_exc, pos_bits).astype(np.int64)
        exc_val = unpack_bits(sections[4], n_exc, exc_w)
        offsets[exc_pos] = exc_val
    nseg = len(refs_u)
    starts = np.arange(nseg) * seg_len
    seg_sizes = np.diff(np.append(starts, n))
    return offsets + np.repeat(refs_u, seg_sizes)


def _decode_for(sections, n: int, dt: int) -> np.ndarray:
    return _from_u64(_decode_for_u64(sections, n), dt)


def encode_delta(
    x: np.ndarray, dt: int | None = None, seg_len: int = DEFAULT_SEG
) -> bytes:
    """Delta with periodic anchors; zigzag deltas -> FoR+bit-pack."""
    dt = H.dt_of(x.dtype) if dt is None else dt
    n = len(x)
    u = _as_u64(x)
    nseg = (n + seg_len - 1) // seg_len
    starts = np.arange(nseg) * seg_len
    anchors = u[starts] if n else np.zeros(0, dtype=np.uint64)
    params = struct.pack("<I", seg_len)
    from ._native import native_lib

    lib = native_lib()
    if lib is not None and n:
        # FUSED pre-pass (VERDICT r4 #5, the np.diff memory hotspot):
        # one C read of u emits the anchor-zeroed zigzag deltas AND
        # their bit-length histogram; one more read packs them with
        # exceptions. Replaces the numpy diff + zigzag + subtract +
        # bit_lengths + bincount + where + pack chain (~7 full-column
        # passes -> 2). Stream is bit-identical to the numpy path
        # (tests assert): the inner FoR has one segment whose ref is
        # always 0 because zz[0] = 0 by the anchor rule.
        zz = np.empty(n, dtype=np.uint64)
        hist = np.zeros(65, dtype=np.int64)
        lib.delta_zigzag_hist64(
            np.ascontiguousarray(u), n, seg_len, zz, hist)
        pos_bits = width_of(n - 1)
        w, exc_w = choose_width_from_counts(hist, n, pos_bits)
        n_exc = int(hist[w + 1:].sum())
        base_packed, exc_pos, exc_val = _pack_exc_native(
            zz, n, w, n_exc, lib)
        inner = [
            struct.pack("<IBQBB", max(n, 1), w, n_exc, pos_bits, exc_w),
            np.zeros(1, dtype=np.uint64).tobytes(),  # single ref = 0
            base_packed,
            pack_bits(exc_pos, pos_bits),
            pack_bits(exc_val, exc_w),
        ]
        return H.pack_block(H.DELTA, dt, n,
                            [params, anchors.tobytes(), *inner])
    d = np.zeros(n, dtype=np.uint64)
    if n > 1:
        d[1:] = u[1:] - u[:-1]  # modular uint64 diff == wrapping int64 diff
    if n:
        d[starts] = 0  # anchor positions carry no delta
    zz = zigzag(d.view(np.int64))
    # delta inlines the FoR sections for its zigzag deltas (no nested
    # header). One inner segment: zz[anchor]=0 makes every per-segment min
    # 0, so per-segment refs would be dead weight; patching still handles
    # outlier deltas.
    inner = _for_sections(zz, signed=False, seg_len=max(n, 1))
    return H.pack_block(H.DELTA, dt, n, [params, anchors.tobytes(), *inner])


def _decode_delta(sections, n: int, dt: int) -> np.ndarray:
    (seg_len,) = struct.unpack_from("<I", sections[0], 0)
    if n == 0:
        return _from_u64(np.zeros(0, dtype=np.uint64), dt)
    anchors = np.frombuffer(sections[1], dtype=np.uint64)
    zz = _decode_for_u64(sections[2:], n)
    d = unzigzag(zz).view(np.uint64)
    nseg = len(anchors)
    starts = np.arange(nseg) * seg_len
    seg_sizes = np.diff(np.append(starts, n))
    d[starts] = 0
    c = np.cumsum(d, dtype=np.uint64)  # modular cumsum
    base = anchors - c[starts]
    return _from_u64(c + np.repeat(base, seg_sizes), dt)


def estimate_sizes(x: np.ndarray) -> dict[str, int]:
    """Cheap per-scheme size estimates (bytes) used by the auto-selector."""
    n = len(x)
    if n == 0:
        return {"bitpack": 64, "for": 64, "delta": 64}
    u = _as_u64(x)
    pos_bits = width_of(n - 1)
    out: dict[str, int] = {}
    signed = x.dtype.kind != "u"
    xm = u.view(np.int64) if signed else u
    if int(xm.min()) >= 0 or not signed:
        out["bitpack"] = n * int(bit_lengths(u).max()) // 8 + 48
    # FoR estimate: single-block width chooser on offsets from global min
    ref_u = np.array([xm.min()], dtype=xm.dtype).view(np.uint64)[0]
    offs = u - ref_u
    w, exc_w = choose_width(offs, pos_bits)
    n_exc = int((bit_lengths(offs) > w).sum())
    out["for"] = (n * w + n_exc * (pos_bits + exc_w)) // 8 + 96
    d = np.zeros(n, dtype=np.uint64)
    d[1:] = u[1:] - u[:-1]
    zz = zigzag(d.view(np.int64))
    wd, exc_wd = choose_width(zz, pos_bits)
    n_excd = int((bit_lengths(zz) > wd).sum())
    out["delta"] = (n * wd + n_excd * (pos_bits + exc_wd)) // 8 + 128
    return out


def encode_int_auto(x: np.ndarray, dt: int | None = None) -> bytes:
    """Encode with whichever of for/delta estimates smallest."""
    sizes = estimate_sizes(x)
    best = min(("for", "delta"), key=lambda k: sizes[k])
    return encode_for(x, dt) if best == "for" else encode_delta(x, dt)
