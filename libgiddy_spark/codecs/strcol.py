"""String/binary column representation shared by dict / RLE / FSST / raw.

A string column is ``(offsets: int64[n+1], data: uint8[...])`` — the
Arrow variable-length layout. The packed wire form used inside block
sections is ``lengths bit-packed at bits(max_len) | data bytes`` which is
never larger than Arrow's 4-byte-per-offset layout (the naive reference
encoder's). Mirrors how libgiddy leaves string handling to the host DBMS
but keeps columns as flat buffers (SURVEY.md §1.1).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .bitpack import pack_bits, unpack_bits, width_of


@dataclass
class StrCol:
    offsets: np.ndarray  # int64, len n+1, offsets[0] == 0
    data: np.ndarray  # uint8

    def __len__(self) -> int:
        return len(self.offsets) - 1

    @property
    def nbytes(self) -> int:
        return int(self.offsets[-1])

    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def take(self, idx: np.ndarray) -> "StrCol":
        """Gather rows by index (used by dict/RLE decode)."""
        from ._native import native_lib

        lib = native_lib()
        if lib is not None:
            # two fused C passes (offsets, then one memcpy per row) —
            # the numpy fallback below builds three int64 index arrays
            # of one entry per output BYTE
            idx64 = np.ascontiguousarray(idx, dtype=np.int64)
            offs_c = np.ascontiguousarray(self.offsets)
            out_offs = np.empty(len(idx64) + 1, dtype=np.int64)
            lib.take_offsets(offs_c, idx64, len(idx64), out_offs)
            out = np.empty(int(out_offs[-1]), dtype=np.uint8)
            lib.gather_str_idx(offs_c, np.ascontiguousarray(self.data),
                               idx64, out_offs, len(idx64), out)
            return StrCol(out_offs, out)
        lens = self.lengths()[idx]
        offs = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        starts = self.offsets[:-1][idx]
        # gather bytes: out[offs[i]:offs[i+1]] = data[starts[i]:starts[i]+lens[i]]
        pos = np.arange(offs[-1], dtype=np.int64)
        src = np.repeat(starts - offs[:-1], lens) + pos
        return StrCol(offs, self.data[src])

    @classmethod
    def from_pylist(cls, items: list[bytes]) -> "StrCol":
        lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=len(items))
        offs = np.zeros(len(items) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        return cls(offs, np.frombuffer(b"".join(items), dtype=np.uint8).copy())

    def to_pylist(self) -> list[bytes]:
        buf = self.data.tobytes()
        o = self.offsets
        return [buf[o[i] : o[i + 1]] for i in range(len(self))]


def pack_strcol(col: StrCol) -> bytes:
    """-> n:u64 | width:u8 | packed lengths | data bytes."""
    n = len(col)
    lens = col.lengths().astype(np.uint64)
    w = width_of(int(lens.max())) if n else 0
    packed = pack_bits(lens, w)
    return (
        struct.pack("<QBQ", n, w, len(packed)) + packed + col.data.tobytes()
    )


def unpack_strcol(buf) -> StrCol:
    mv = memoryview(buf)
    n, w, plen = struct.unpack_from("<QBQ", mv, 0)
    head = struct.calcsize("<QBQ")
    lens = unpack_bits(mv[head : head + plen], n, w).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    data = np.frombuffer(mv[head + plen :], dtype=np.uint8).copy()
    return StrCol(offs, data)
