"""Deterministic synthetic webtext generator (FIXTURES.md §1).

Produces the exact north-rule input shape (BASELINE.json:15):
``(url string, warc_ts timestamp, html binary, text string, lang string)``
as a *distributed* generator: ``spark.range(n) -> mapInArrow(batch gen)``
— every row is a pure function of its row id (splitmix-style hashing),
so the table is identical regardless of partitioning or cluster size,
and generation scales to any row count without a driver bottleneck.
All string assembly is StrCol/byte-level numpy — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs.strcol import StrCol

N_HOSTS = 1000
N_VOCAB = 5000
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
LANGS = np.array(["en", "zh", "es", "de", "fr"])
LANG_CDF = np.cumsum([0.60, 0.12, 0.10, 0.09, 0.09])

_U64 = np.uint64
GEN_VERSION = 4  # bump when generated content/layout changes (cache-busting)


def _mix(ids: np.ndarray, stream: int) -> np.ndarray:
    """splitmix64-style per-row hash; uniform uint64 per (id, stream)."""
    inc = ((stream + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ids.astype(np.uint64) + _U64(inc)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _uniform(ids: np.ndarray, stream: int) -> np.ndarray:
    return _mix(ids, stream).astype(np.float64) / 2**64


def _make_vocab(seed: int = 42) -> tuple[StrCol, StrCol, np.ndarray]:
    """(latin vocab+space, zh vocab, host names) — built once per worker."""
    rng = np.random.default_rng(seed)
    cons = list("bcdfghjklmnpqrstvwz")
    vow = list("aeiou")
    words = []
    for i in range(N_VOCAB):
        k = 2 + i % 3
        w = "".join(
            cons[int(rng.integers(len(cons)))] + vow[int(rng.integers(len(vow)))]
            for _ in range(k)
        )
        words.append((w + " ").encode())
    zh_words = []
    for i in range(800):
        k = 1 + i % 3
        w = "".join(chr(0x4E00 + int(rng.integers(0, 2000))) for _ in range(k))
        zh_words.append(w.encode())
    hosts = np.array(
        [f"www.site{i:04d}.example.{'com' if i % 3 else 'org'}" for i in range(N_HOSTS)]
    )
    return StrCol.from_pylist(words), StrCol.from_pylist(zh_words), hosts


_VOCAB_CACHE: dict[int, tuple] = {}


def _vocab(seed: int = 42):
    if seed not in _VOCAB_CACHE:
        _VOCAB_CACHE[seed] = _make_vocab(seed)
    return _VOCAB_CACHE[seed]


# Zipf CDFs (hosts s=1.2; word vocab s=1.05 per FIXTURES.md §1 —
# realistic web text is Zipfian, which is what makes FSST-style symbol
# tables effective on it)
_ZIPF_CDFS: dict[tuple[int, float], np.ndarray] = {}


def _zipf_cdf(n: int = N_HOSTS, s: float = 1.2) -> np.ndarray:
    key = (n, s)
    if key not in _ZIPF_CDFS:
        p = 1.0 / np.arange(1, n + 1) ** s
        _ZIPF_CDFS[key] = np.cumsum(p / p.sum())
    return _ZIPF_CDFS[key]


def _concat_rows(pieces: list[tuple[np.ndarray, np.ndarray]]) -> StrCol:
    """Row-wise concatenation of several (offsets, data) columns."""
    n = len(pieces[0][0]) - 1
    lens = np.zeros(n, dtype=np.int64)
    for offs, _ in pieces:
        lens += np.diff(offs)
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    out = np.empty(out_offs[-1], dtype=np.uint8)
    cursor = out_offs[:-1].copy()
    for offs, data in pieces:
        plens = np.diff(offs)
        total = int(plens.sum())
        if total == 0:
            continue
        pos = np.arange(total, dtype=np.int64)
        dst = np.repeat(cursor - np.cumsum(plens) + plens, plens) + pos
        src = np.repeat(offs[:-1] - (np.cumsum(plens) - plens), plens) + pos
        out[dst] = data[src]
        cursor += plens
    return StrCol(out_offs, out)


def _const_col(token: bytes, n: int, mask: np.ndarray | None = None) -> StrCol:
    """n rows of ``token`` (rows where mask is False become empty)."""
    L = len(token)
    lens = np.full(n, L, dtype=np.int64)
    if mask is not None:
        lens = np.where(mask, L, 0)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    tok = np.frombuffer(token, dtype=np.uint8)
    total = int(offs[-1])
    out = np.empty(total, dtype=np.uint8)
    pos = np.arange(total, dtype=np.int64)
    out = tok[pos - np.repeat(offs[:-1], lens)]
    return StrCol(offs, out)


def _ascii_col(strs_u: np.ndarray) -> StrCol:
    """Vectorized '<U' numpy string array -> StrCol (ascii only)."""
    n = len(strs_u)
    s = strs_u.astype("S")
    width = s.dtype.itemsize
    mat = s.view(np.uint8).reshape(n, width) if width else np.zeros((n, 0), np.uint8)
    lens = np.char.str_len(strs_u).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    total = int(offs[-1])
    pos = np.arange(total, dtype=np.int64)
    within = pos - np.repeat(offs[:-1], lens)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    return StrCol(offs, mat[rows, within])


def _words_text(ids: np.ndarray, n_words: np.ndarray, vocab: StrCol, stream: int) -> StrCol:
    """Per-row word salad: n_words[i] words drawn by hash, space-joined."""
    total = int(n_words.sum())
    row_rep = np.repeat(ids, n_words)
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_words) - n_words, n_words
    )
    u01 = _mix(row_rep * _U64(1315423911) + pos_in_row.astype(np.uint64), stream
               ).astype(np.float64) / 2**64
    widx = np.minimum(
        np.searchsorted(_zipf_cdf(len(vocab), 1.05), u01), len(vocab) - 1
    ).astype(np.int64)
    flat = vocab.take(widx)  # each vocab entry carries its trailing space
    word_lens = flat.lengths()
    row_bytes = np.zeros(len(ids), dtype=np.int64)
    if total:
        np.add.at(row_bytes, np.repeat(np.arange(len(ids)), n_words), word_lens)
    offs = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(row_bytes, out=offs[1:])
    return StrCol(offs, flat.data)


def generate_batch(ids: np.ndarray, seed: int = 42) -> pa.RecordBatch:
    vocab, zh_vocab, hosts = _vocab(seed)
    n = len(ids)
    u = ids.astype(np.uint64)

    host_idx = np.searchsorted(_zipf_cdf(), _uniform(u, 1))
    host_idx = np.minimum(host_idx, N_HOSTS - 1)
    # lang is a property of the host (site-level language -> runs after
    # sorting by url) with a per-host categorical draw
    lang_u = _uniform(_mix(host_idx.astype(np.uint64), 99), 2)
    lang_idx = np.searchsorted(LANG_CDF, lang_u)
    lang_idx = np.minimum(lang_idx, len(LANGS) - 1)
    lang = LANGS[lang_idx]

    # urls: https://{host}/{slug}-{slug}/{id}
    s1 = (_mix(u, 3) % _U64(N_VOCAB)).astype(np.int64)
    s2 = (_mix(u, 4) % _U64(N_VOCAB)).astype(np.int64)
    slug1 = _slice_col(vocab.take(s1), vocab.lengths()[s1] - 1)  # drop space
    slug2 = _slice_col(vocab.take(s2), vocab.lengths()[s2] - 1)
    pre = _const_col(b"https://", n)
    hostc = _ascii_col(hosts[host_idx])
    sep1 = _const_col(b"/", n)
    dash = _const_col(b"-", n)
    idtail = _ascii_col(np.char.add("/p", ids.astype(np.int64).astype("U20")))
    url = _concat_rows([
        (pre.offsets, pre.data), (hostc.offsets, hostc.data),
        (sep1.offsets, sep1.data), (slug1.offsets, slug1.data),
        (dash.offsets, dash.data), (slug2.offsets, slug2.data),
        (idtail.offsets, idtail.data),
    ])

    # warc_ts: near-monotone in id, ~800ms mean gap, 1% out-of-order
    gap_jitter = (_mix(u, 5) % _U64(1_600_000)).astype(np.int64)
    ts = BASE_TS_US + ids * 800_000 + gap_jitter
    ooo = _uniform(u, 6) < 0.01
    ts = np.where(ooo, ts - 10_000_000, ts)

    # text: word salad; zh rows use the zh vocab; 0.2% empty; 0.5% x100 tail
    base_words = 5 + (_mix(u, 7) % _U64(120)).astype(np.int64)
    heavy = _uniform(u, 8) < 0.005
    n_words = np.where(heavy, base_words * 100, base_words)
    empty = _uniform(u, 9) < 0.002
    n_words = np.where(empty, 0, n_words)
    is_zh = lang == "zh"
    text_latin = _words_text(u, np.where(is_zh, 0, n_words), vocab, 10)
    text_zh = _words_text(u, np.where(is_zh, n_words, 0), zh_vocab, 11)
    text = _concat_rows([
        (text_latin.offsets, text_latin.data), (text_zh.offsets, text_zh.data)
    ])

    # html: boilerplate wrap; 5% rows get NUL/high bytes in a comment
    hpre = _const_col(b"<html><head><title>t</title></head><body><p>", n)
    noise = _uniform(u, 12) < 0.05
    hmid = _const_col(b"<!--\x00\xfe\xff-->", n, mask=noise)
    hpost = _const_col(b"</p></body></html>", n)
    html = _concat_rows([
        (hpre.offsets, hpre.data), (hmid.offsets, hmid.data),
        (text.offsets, text.data), (hpost.offsets, hpost.data),
    ])

    def _str_arr(col: StrCol) -> pa.Array:
        return pa.Array.from_buffers(
            pa.large_string(), len(col),
            [None, pa.py_buffer(col.offsets.tobytes()), pa.py_buffer(col.data.tobytes())],
        ).cast(pa.string())

    def _bin_arr(col: StrCol) -> pa.Array:
        return pa.Array.from_buffers(
            pa.large_binary(), len(col),
            [None, pa.py_buffer(col.offsets.tobytes()), pa.py_buffer(col.data.tobytes())],
        ).cast(pa.binary())

    return pa.RecordBatch.from_arrays(
        [
            _str_arr(url),
            pa.array(ts.astype("datetime64[us]")),
            _bin_arr(html),
            _str_arr(text),
            pa.array(lang),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def _slice_col(col: StrCol, new_lens: np.ndarray) -> StrCol:
    """Truncate each row to new_lens[i] bytes (vectorized)."""
    new_lens = np.maximum(new_lens, 0)
    offs = np.zeros(len(col) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=offs[1:])
    total = int(offs[-1])
    pos = np.arange(total, dtype=np.int64)
    src = np.repeat(col.offsets[:-1] - offs[:-1], new_lens) + pos
    return StrCol(offs, col.data[src])


WEBTEXT_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def webtext_df(spark, n_rows: int, seed: int = 42, slices: int | None = None):
    """Distributed deterministic webtext DataFrame."""
    rdd_df = spark.range(0, n_rows, numPartitions=slices or max(n_rows // 50_000, 4))

    def gen(iterator):
        for batch in iterator:
            ids = batch.column("id").to_numpy()
            yield generate_batch(ids, seed)

    return rdd_df.mapInArrow(gen, schema=WEBTEXT_SCHEMA)


def write_webtext(spark, path: str, n_rows: int, seed: int = 42) -> None:
    webtext_df(spark, n_rows, seed).write.mode("overwrite").parquet(path)
