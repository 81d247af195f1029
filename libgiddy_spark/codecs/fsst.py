"""FSST-style string symbol table codec (scope addition per BASELINE.json:6).

Based on the published FSST design (Boncz, Neumann, Leis — "FSST: Fast
Random Access String Compression", VLDB 2020), simplified:

- a static table of <=255 symbols, each 1..8 bytes, trained on a sample
  by BPE-like *generations*: encode the sample with the current table,
  count adjacent token-pair concatenations, keep the top symbols by
  gain = count * length;
- encode = greedy longest-match over each string's bytes; a byte with no
  match is emitted as ESCAPE (255) + the literal byte;
- decode = per-code-byte table lookup + concatenate.

Vectorization strategy (no per-row Python, BASELINE.json:15): encode runs
one *lane per string*, all lanes advancing in lock-step — each iteration
does whole-array gathers/compares for every active lane, the CPU
transposition of a GPU warp where each thread owns one string. Decode is
a single whole-stream pass: escape positions fall out of run-parity over
runs of 255-bytes, then output bytes are one big gather from the symbol
matrix.
"""

from __future__ import annotations

import struct

import numpy as np

from . import header as H
from .bitpack import pack_bits, unpack_bits, width_of
from .strcol import StrCol

ESCAPE = 255
MAX_SYMBOLS = 255  # codes 0..254
MAX_SYM_LEN = 8

_U64 = np.uint64
_MASKS = np.array([(1 << (8 * l)) - 1 if l < 8 else 0xFFFFFFFFFFFFFFFF
                   for l in range(9)], dtype=np.uint64)


class SymbolTable:
    """Immutable trained table. ``symbols`` is a list[bytes], each 1..8 B."""

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        self.lens = np.array([len(s) for s in symbols], dtype=np.int64)
        # (n_sym, 8) byte matrix for decode gather
        self.matrix = np.zeros((max(len(symbols), 1), MAX_SYM_LEN), dtype=np.uint8)
        for i, s in enumerate(symbols):
            self.matrix[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        # per-length sorted lookup (masked u64 value -> code)
        self.by_len: list[tuple[np.ndarray, np.ndarray]] = [
            (np.zeros(0, np.uint64), np.zeros(0, np.int64)) for _ in range(9)
        ]
        vals64 = np.zeros(len(symbols), dtype=np.uint64)
        for i, s in enumerate(symbols):
            vals64[i] = int.from_bytes(s.ljust(8, b"\0"), "little")
        for l in range(1, 9):
            sel = np.flatnonzero(self.lens == l)
            v = vals64[sel] & _MASKS[l]
            order = np.argsort(v)
            self.by_len[l] = (v[order], sel[order].astype(np.int64))

    def serialize(self) -> bytes:
        lens = bytes(self.lens.astype(np.uint8).tobytes())
        return struct.pack("<B", len(self.symbols)) + lens + b"".join(self.symbols)

    @classmethod
    def deserialize(cls, buf) -> "SymbolTable":
        mv = memoryview(buf)
        (n,) = struct.unpack_from("<B", mv, 0)
        lens = np.frombuffer(mv[1 : 1 + n], dtype=np.uint8)
        syms, off = [], 1 + n
        for l in lens:
            syms.append(bytes(mv[off : off + l]))
            off += int(l)
        return cls(syms)


def _read8(data_padded: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian u64 window at each position (8 byte-gathers)."""
    w = data_padded[pos].astype(np.uint64)
    for k in range(1, 8):
        w |= data_padded[pos + k].astype(np.uint64) << _U64(8 * k)
    return w


def encode_tokens(col: StrCol, table: SymbolTable):
    """Greedy longest-match tokenize every string, lanes in lock-step.

    Returns (codes: uint8 stream incl. escapes+literals,
             out_lens: int64 encoded byte count per string).
    """
    n = len(col)
    data = np.concatenate([col.data, np.zeros(MAX_SYM_LEN, np.uint8)])
    cursor = col.offsets[:-1].copy()
    end = col.offsets[1:].copy()
    lanes_all = np.arange(n, dtype=np.int64)
    active = np.flatnonzero(cursor < end)
    chunks_lane: list[np.ndarray] = []
    chunks_tok: list[np.ndarray] = []  # uint16: code<<8 | literal (if escape)
    have_syms = len(table.symbols) > 0
    while len(active):
        pos = cursor[active]
        rem = end[active] - pos
        w = _read8(data, pos)
        match_code = np.full(len(active), -1, dtype=np.int64)
        match_len = np.ones(len(active), dtype=np.int64)
        if have_syms:
            unmatched = np.ones(len(active), dtype=bool)
            for l in range(MAX_SYM_LEN, 0, -1):
                vals, codes = table.by_len[l]
                if len(vals) == 0:
                    continue
                cand = unmatched & (rem >= l)
                if not cand.any():
                    continue
                mv = w & _MASKS[l]
                j = np.searchsorted(vals, mv)
                j = np.minimum(j, len(vals) - 1)
                hit = cand & (vals[j] == mv)
                match_code[hit] = codes[j[hit]]
                match_len[hit] = l
                unmatched &= ~hit
        is_esc = match_code < 0
        lit = (w & _U64(0xFF)).astype(np.uint16)
        tok = np.where(
            is_esc,
            (np.uint16(ESCAPE) << np.uint16(8)) | lit,
            match_code.astype(np.uint16) << np.uint16(8),
        ).astype(np.uint16)
        # high byte = code (255 = escape), low byte = literal (escapes only)
        chunks_lane.append(active.copy())
        chunks_tok.append(tok)
        cursor[active] = pos + match_len
        active = active[match_len < rem]
    if not chunks_lane:
        return np.zeros(0, np.uint8), np.zeros(n, np.int64)
    all_lane = np.concatenate(chunks_lane)
    all_tok = np.concatenate(chunks_tok)
    order = np.argsort(all_lane, kind="stable")  # lane-major, iter order kept
    all_lane = all_lane[order]
    all_tok = all_tok[order]
    code_hi = (all_tok >> np.uint16(8)).astype(np.uint8)
    is_esc = code_hi == ESCAPE
    nbytes_tok = np.where(is_esc, 2, 1).astype(np.int64)
    out_total = int(nbytes_tok.sum())
    offs = np.zeros(len(all_tok) + 1, dtype=np.int64)
    np.cumsum(nbytes_tok, out=offs[1:])
    out = np.empty(out_total, dtype=np.uint8)
    out[offs[:-1]] = code_hi
    esc_idx = np.flatnonzero(is_esc)
    out[offs[:-1][esc_idx] + 1] = (all_tok[esc_idx] & np.uint16(0xFF)).astype(np.uint8)
    out_lens = np.bincount(all_lane, weights=nbytes_tok, minlength=n).astype(np.int64)
    return out, out_lens


def decode_stream(codes: np.ndarray, table: SymbolTable):
    """Decode a code stream (escape pairs must be intact).

    Returns (out_bytes: uint8 array, offs: int64[m+1] — decoded output
    offset before each code position; escapes contribute 0 bytes).
    """
    m = len(codes)
    if m == 0:
        return np.zeros(0, np.uint8), np.zeros(1, np.int64)
    is255 = codes == ESCAPE
    # runs of 255: even offsets inside a run are escapes
    d = np.diff(is255.astype(np.int8))
    run_starts = np.flatnonzero(d == 1) + 1
    if is255[0]:
        run_starts = np.concatenate([[0], run_starts])
    run_ends = np.flatnonzero(d == -1) + 1
    if is255[-1]:
        run_ends = np.concatenate([run_ends, [m]])
    run_lens = run_ends - run_starts
    n_esc_per_run = (run_lens + 1) // 2
    total_esc = int(n_esc_per_run.sum())
    if total_esc:
        rep_starts = np.repeat(run_starts, n_esc_per_run)
        eoffs = np.zeros(total_esc + 1, dtype=np.int64)
        np.cumsum(n_esc_per_run, out=eoffs[1 : len(n_esc_per_run) + 1])
        within = np.arange(total_esc) - np.repeat(eoffs[: len(n_esc_per_run)], n_esc_per_run)
        esc_pos = rep_starts + 2 * within
    else:
        esc_pos = np.zeros(0, dtype=np.int64)
    lit_pos = esc_pos + 1  # always < m: encoder never emits dangling escape
    kind = np.zeros(m, dtype=np.uint8)  # 0 = normal symbol code
    kind[esc_pos] = 1
    kind[lit_pos] = 2
    sym_lens = table.lens if len(table.symbols) else np.zeros(1, np.int64)
    safe_codes = np.minimum(codes.astype(np.int64), max(len(table.symbols) - 1, 0))
    out_len = np.where(kind == 0, sym_lens[safe_codes], np.int64(0))
    out_len = np.where(kind == 2, np.int64(1), out_len)
    total = int(out_len.sum())
    offs = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(out_len, out=offs[1:])
    src = np.repeat(np.arange(m, dtype=np.int64), out_len)
    within = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], out_len)
    kind_rep = kind[src]
    code_rep = codes[src].astype(np.int64)
    out = np.where(
        kind_rep == 2,
        code_rep.astype(np.uint8),
        table.matrix[np.minimum(code_rep, len(table.matrix) - 1), within],
    ).astype(np.uint8)
    return out, offs


def train(sample: np.ndarray, generations: int = 4) -> SymbolTable:
    """Train a symbol table on a byte sample (uint8 array), BPE-style.

    Deterministic: ties broken by (gain desc, value asc, len asc).
    """
    sample = sample[: 1 << 18]  # cap 256 KiB for training cost
    if len(sample) == 0:
        return SymbolTable([])
    # split into many lanes so the lock-step encoder stays parallel; the
    # few lost cross-chunk matches are irrelevant for frequency counting
    chunk = 256
    offs = np.arange(0, len(sample) + chunk, chunk, dtype=np.int64)
    offs[-1] = len(sample)
    col = StrCol(offs, sample)
    table = SymbolTable([])
    for _ in range(generations):
        codes, _ = encode_tokens(col, table)
        # token spans over the sample: reconstruct (start, len) per token
        tok_val, tok_len = _token_values(codes, table, sample)
        if len(tok_val) == 0:
            break
        cand_val = [tok_val]
        cand_len = [tok_len]
        pair_len = tok_len[:-1] + tok_len[1:]
        ok = pair_len <= MAX_SYM_LEN
        if ok.any():
            pv = tok_val[:-1][ok] | (tok_val[1:][ok] << (tok_len[:-1][ok] * 8).astype(np.uint64))
            cand_val.append(pv)
            cand_len.append(pair_len[ok])
        v = np.concatenate(cand_val)
        l = np.concatenate(cand_len)
        key = np.stack([v, l.astype(np.uint64)], axis=1)
        uniq, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
        gain = counts * uniq[:, 1]  # count * length
        order = np.lexsort((uniq[:, 1], uniq[:, 0], -gain.astype(np.int64)))
        top = order[:MAX_SYMBOLS]
        syms = []
        for row in top:
            val, ln = int(uniq[row, 0]), int(uniq[row, 1])
            syms.append(val.to_bytes(8, "little")[:ln])
        table = SymbolTable(syms)
    return table


def _token_values(codes: np.ndarray, table: SymbolTable, sample: np.ndarray):
    """(u64 value, byte length) per token of an encoded sample stream."""
    m = len(codes)
    if m == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    # reuse decode-side classification
    out_bytes, offs = decode_stream(codes, table)
    # tokens = positions with kind 0 (symbol) or 2 (literal); their decoded
    # spans are consecutive in out_bytes == sample
    tok_mask = np.diff(offs) > 0  # escape positions contribute 0 bytes
    starts = offs[:-1][tok_mask]
    lens = np.diff(offs)[tok_mask]
    padded = np.concatenate([out_bytes, np.zeros(8, np.uint8)])
    vals = _read8(padded, starts) & _MASKS[np.minimum(lens, 8)]
    return vals, lens.astype(np.int64)


def encode_fsst(col: StrCol, dt: int, table: SymbolTable | None = None) -> bytes:
    n = len(col)
    if table is None:
        table = train(col.data)
    codes, out_lens = encode_tokens(col, table)
    lw = width_of(int(out_lens.max())) if n else 0
    params = struct.pack("<QB", n, lw)
    return H.pack_block(
        H.FSST,
        dt,
        n,
        [
            params,
            table.serialize(),
            pack_bits(out_lens.astype(np.uint64), lw),
            codes.tobytes(),
        ],
    )


def decode_fsst(sections, n: int, dt: int) -> StrCol:
    _, lw = struct.unpack_from("<QB", sections[0], 0)
    table = SymbolTable.deserialize(sections[1])
    enc_lens = unpack_bits(sections[2], n, lw).astype(np.int64)
    codes = np.frombuffer(sections[3], dtype=np.uint8)
    out_bytes, offs_tok = decode_stream(codes, table)
    # per-string decoded lengths: sum decoded bytes over each string's codes
    code_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=code_offs[1:])
    str_out_offs = offs_tok[code_offs]
    return StrCol(str_out_offs.astype(np.int64), out_bytes)
