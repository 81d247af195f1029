"""Encoded-blocks dataset: schema + the Arrow group encode/decode kernels.

One row per (partition, salt, column, block): SURVEY.md §1.2. The encode
kernel runs under ``GroupedData.applyInArrow`` — the whole (part_id,
salt) group arrives as one ``pyarrow.Table`` with zero pandas
conversion, the per-column codecs run as numpy kernels, and block rows
stream back as Arrow. No per-row Python anywhere (BASELINE.json:15).

Scale note: the group is the encode unit by design — upstream
partitioning (plus skew salting, skew.py) bounds it to one task's
memory, exactly how libgiddy sizes a device buffer per kernel launch.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bloom as bloom_mod
from .codecs import SymbolTable, decode_array, encode_array
from .codecs import fsst as fsst_mod
from .codecs import header as H
from .codecs import strcol_of
from .selector import select_codec

BLOCK_ROWS = 65536

BLOCKS_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("salt", pa.int32()),
        ("block_seq", pa.int32()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("codec_params", pa.string()),
        ("n_values", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("payload", pa.binary()),
        ("sha256", pa.string()),
        # zone map: sort-key min/max of the block's row range (groups are
        # sorted by the sort key, so block i's range = [first, last value
        # of its slice]); null when the sort key isn't integral/timestamp.
        # Written into parquet column stats -> a key-range decode prunes
        # whole row groups before any payload byte is read.
        ("key_lo", pa.int64()),
        ("key_hi", pa.int64()),
        # STRING zone map: same min/max idea for string sort keys (url!),
        # truncation-safe (a too-long bound becomes null = never pruned).
        # The Iceberg data-file lower/upper-bounds pattern.
        ("key_lo_s", pa.string()),
        ("key_hi_s", pa.string()),
        # per-block Bloom filter over the sort-key values (bloom.py),
        # stored ONLY on the sort-key column's block rows: point lookups
        # prune blocks the zone maps keep (equality probes, string keys)
        ("key_bloom", pa.binary()),
    ]
)

BLOCKS_DDL = (
    "part_id int, salt int, block_seq int, column string, codec string, "
    "codec_params string, n_values long, raw_bytes long, enc_bytes long, "
    "payload binary, sha256 string, key_lo long, key_hi long, "
    "key_lo_s string, key_hi_s string, key_bloom binary"
)

# string zone bounds longer than this are truncated (Iceberg's truncate
# transform): the LOWER bound keeps the plain prefix (prefix <= value,
# always valid), the UPPER bound keeps the prefix with its last code
# point incremented (> any string extending the prefix). If no code
# point can be incremented, the bound is null = never pruned.
MAX_ZONE_STR = 120


def _trunc_bound_lo(s: str) -> str:
    return s if len(s) <= MAX_ZONE_STR else s[:MAX_ZONE_STR]


def _trunc_bound_hi(s: str) -> str | None:
    if len(s) <= MAX_ZONE_STR:
        return s
    p = s[:MAX_ZONE_STR]
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i]) + 1
        if 0xD800 <= c <= 0xDFFF:
            c = 0xE000  # skip the surrogate gap (invalid in UTF-8)
        if c <= 0x10FFFF:
            return p[:i] + chr(c)
    return None  # every prefix char was U+10FFFF: give up, keep block


def _normalize(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = (
                pa.concat_arrays(arr.chunks)
                if arr.num_chunks != 1
                else arr.chunk(0)
            ) if arr.num_chunks else pa.array([], type=arr.type)
    if pa.types.is_timestamp(arr.type) and (arr.type.unit != "us" or arr.type.tz):
        arr = arr.cast(pa.timestamp("us"))
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    if pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.binary())
    return arr


def encode_group(
    table: pa.Table,
    part_id: int,
    salt: int,
    columns: list[str] | None = None,
    sort_key: str | None = None,
    forced_codecs: dict[str, str] | None = None,
    block_rows: int = BLOCK_ROWS,
    selector_cache: dict | None = None,
    zone_key: str | None = None,
) -> pa.Table:
    """Encode one (part_id, salt) group of source rows into block rows.

    ``selector_cache`` (keyed on column name; the caller scopes it to
    one part_id) reuses the codec choice AND the trained FSST symbol
    table across the salt slices of a partition — a heavily-salted part
    would otherwise re-train the same column's table once per slice
    (VERDICT r2 finding 3). FSST's escape path keeps any byte sequence
    encodable, so a table trained on one slice is correct for all."""
    if sort_key is not None and sort_key in table.column_names:
        table = table.sort_by(sort_key)
    cols = columns or [c for c in table.column_names if c not in ("part_id", "salt")]
    out: dict[str, list] = {name: [] for name in BLOCKS_SCHEMA.names}
    n = table.num_rows
    # per-block zone map from the (sorted) sort key: lo/hi = the slice's
    # first/last value; None when the key isn't an ordered integer type.
    # String keys get string bounds (key_lo_s/key_hi_s) instead; both
    # flavors also feed a per-block Bloom filter for point lookups.
    zone_vals = None
    zone_strs = None
    zone_valid = None  # per-row validity; None == all rows valid
    key_hashes = None
    key_domain = bloom_mod.DOMAIN_INT
    if zone_key is not None and zone_key in table.column_names and n:
        zk = _normalize(table.column(zone_key))
        if pa.types.is_timestamp(zk.type):
            zk = zk.cast(pa.int64())
        if pa.types.is_integer(zk.type):
            # nullable keys still get zone maps over the NON-NULL range:
            # range/point probes can never match a NULL row (SQL ternary
            # logic), so pruning on non-null bounds loses nothing, while
            # the old null_count==0 gate de-zoned a whole block for one
            # null row. uint64 above int64.max degrades to unzoned
            # (over-include is always safe) instead of failing encode.
            try:
                zi = zk.cast(pa.int64())
            except (pa.ArrowInvalid, OverflowError):
                zi = None
            if zi is not None:
                if zi.null_count:
                    zone_valid = ~np.asarray(zi.is_null())
                    zi = zi.fill_null(0)
                zone_vals = zi.to_numpy(zero_copy_only=False)
                key_hashes = bloom_mod.hash_int_array(zone_vals)
        elif pa.types.is_string(zk.type):
            zone_strs = zk  # keeps nulls: pc.min_max skips them
            if zk.null_count:
                zone_valid = ~np.asarray(zk.is_null())
                zk = zk.fill_null("")
            key_hashes = bloom_mod.hash_string_array(zk)
            key_domain = bloom_mod.DOMAIN_BYTES
    for col_name in cols:
        arr = _normalize(table.column(col_name))
        cached = selector_cache.get(col_name) if selector_cache is not None else None
        if cached is not None:
            codec, stats, fsst_table = cached
        else:
            forced = (forced_codecs or {}).get(col_name)
            artifacts: dict = {}
            if forced:
                codec, stats = forced, {"forced": True}
            else:
                codec, stats, artifacts = select_codec(arr, col_name)
            fsst_table: SymbolTable | None = artifacts.get("fsst_table")
            if codec == "fsst" and fsst_table is None:
                # train on a bounded HEAD sample, not the whole column:
                # training is O(bytes) and the auto-select path already
                # uses a trial-sample table (selector) / 16K-row sample
                # (plan_one_file) — a forced-fsst encode of a fat
                # column was the one path still paying a full-column
                # training per group. FSST's escape byte keeps any
                # input encodable under a sampled table.
                dense = arr.drop_null() if arr.null_count else arr
                if len(dense) > 16384:
                    dense = dense.slice(0, 16384)
                fsst_table = fsst_mod.train(strcol_of(dense).data)
            if selector_cache is not None:
                # the manifest aggregates codec_params with first():
                # mark that any slice's recorded stats were sampled on
                # ONE salt slice, so n/min/max aren't read as whole-part
                stats = {**stats, "stats_scope": "first-salt-slice-sample"}
                selector_cache[col_name] = (codec, stats, fsst_table)
        params = json.dumps({"stats": stats}, separators=(",", ":"))
        for seq, start in enumerate(range(0, max(n, 1), block_rows)):
            chunk = arr.slice(start, block_rows)
            if len(chunk) == 0 and n > 0:
                break
            payload, meta = encode_array(chunk, codec, fsst_table=fsst_table)
            out["part_id"].append(part_id)
            out["salt"].append(salt)
            out["block_seq"].append(seq)
            out["column"].append(col_name)
            out["codec"].append(codec)
            out["codec_params"].append(params if seq == 0 else "{}")
            out["n_values"].append(meta["n_values"])
            out["raw_bytes"].append(meta["raw_bytes"])
            out["enc_bytes"].append(meta["enc_bytes"])
            out["payload"].append(payload)
            out["sha256"].append(hashlib.sha256(payload).hexdigest())
            end = min(start + block_rows, n)
            vslice = zone_valid[start:end] if zone_valid is not None else None
            if zone_vals is not None and len(chunk):
                # true min/max of the slice (not first/last): correct even
                # if a caller ever passes zone_key over unsorted data.
                # Nulls are masked out: bounds cover the non-null range
                # (an all-null slice stays unzoned -> always decoded).
                zslice = zone_vals[start:end]
                if vslice is not None:
                    zslice = zslice[vslice]
                if len(zslice):
                    out["key_lo"].append(int(zslice.min()))
                    out["key_hi"].append(int(zslice.max()))
                else:
                    out["key_lo"].append(None)
                    out["key_hi"].append(None)
            else:
                out["key_lo"].append(None)
                out["key_hi"].append(None)
            lo_s = hi_s = None
            if zone_strs is not None and len(chunk):
                mm = pc.min_max(zone_strs.slice(start, end - start))
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                if mx is not None:  # None == all-null slice: stay unzoned
                    lo_s = _trunc_bound_lo(mn)
                    hi_s = _trunc_bound_hi(mx)
                if hi_s is None:
                    lo_s = None  # keep bounds paired for the null-keep rule
            out["key_lo_s"].append(lo_s)
            out["key_hi_s"].append(hi_s)
            if key_hashes is not None and col_name == zone_key and len(chunk):
                hs = key_hashes[start:end]
                if vslice is not None:
                    hs = hs[vslice]  # bloom holds only real key values
                bloom = bloom_mod.build_bloom(hs, key_domain) if len(hs) else None
            else:
                bloom = None
            out["key_bloom"].append(bloom)
            if n == 0:
                break
    return pa.table(out, schema=BLOCKS_SCHEMA)


def make_encode_stream(
    columns: list[str],
    sort_key: str | None = None,
    forced_codecs: dict[str, str] | None = None,
    block_rows: int = BLOCK_ROWS,
    zone_key: str | None = None,
):
    """Streaming per-task encoder for ``mapInArrow`` over data that was
    range-repartitioned and sorted by (part_id, salt, sort_key).

    The range partitioner sends every row of a (part_id, salt) group to
    one task and the JVM sort makes groups contiguous, so ONE shuffle
    feeds the encoder (the groupBy/applyInArrow formulation would add a
    second hash exchange on top of the range repartition). Groups are
    detected by key change across the record-batch stream.
    """

    def encode_stream(batches):
        buf: list[pa.RecordBatch] = []
        cur: tuple[int, int] | None = None
        # per-PART codec choice + FSST table reuse across salt slices;
        # groups arrive part-ordered (the range exchange + JVM sort), so
        # the cache is cleared when the part advances and stays tiny
        part_cache: dict = {}

        def flush():
            if not buf:
                return
            tbl = pa.Table.from_batches(buf)
            out = encode_group(
                tbl.drop_columns([c for c in ("part_id", "salt") if c in tbl.column_names]),
                cur[0],
                cur[1],
                columns=columns,
                sort_key=None,  # already sorted JVM-side
                forced_codecs=forced_codecs,
                block_rows=block_rows,
                selector_cache=part_cache,
                zone_key=zone_key,  # rows arrive sorted by it (JVM sort)
            )
            yield from out.to_batches()

        for batch in batches:
            pids = batch.column("part_id").to_numpy(zero_copy_only=False)
            salts = batch.column("salt").to_numpy(zero_copy_only=False)
            keys = pids.astype(np.int64) * (1 << 20) + salts.astype(np.int64)
            bounds = np.concatenate(
                [[0], np.flatnonzero(keys[1:] != keys[:-1]) + 1, [len(keys)]]
            )
            for s, e in zip(bounds[:-1], bounds[1:]):
                if s == e:
                    continue
                key = (int(pids[s]), int(salts[s]))
                if key != cur:
                    yield from flush()
                    buf.clear()
                    if cur is None or key[0] != cur[0]:
                        part_cache.clear()
                    cur = key
                buf.append(batch.slice(s, e - s))
        yield from flush()

    return encode_stream


PLAN_DDL = "part_id int, column string, codec string, params string, fsst binary"

_PLAN_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("params", pa.string()),
        ("fsst", pa.binary()),
    ]
)


def make_plan_sampler(
    columns: list[str],
    forced_codecs: dict[str, str] | None = None,
    sample_rows: int = 16384,
):
    """Per-PART codec-plan kernel for the direct path: one tiny task per
    part reads a bounded sample (head of the first row group), runs the
    codec selector per column, and trains the FSST symbol table ONCE —
    the plan is then reused by every salt slice of the part, exactly
    what the range path's per-part selector cache achieves. Without
    this, 64 slices of a part would re-train the same tables 64x
    (measured ~0.3 s per training on webtext text)."""

    def plan_stream(batches):
        for batch in batches:
            for row in batch.to_pylist():
                cols = plan_one_file(row["path"], columns,
                                     forced_codecs=forced_codecs,
                                     sample_rows=sample_rows)
                if not cols:
                    continue
                out = {k: [] for k in
                       ("part_id", "column", "codec", "params", "fsst")}
                for col_name, codec, params, ft_bytes in cols:
                    out["part_id"].append(row["part_id"])
                    out["column"].append(col_name)
                    out["codec"].append(codec)
                    out["params"].append(params)
                    out["fsst"].append(ft_bytes)
                yield pa.RecordBatch.from_pydict(out, schema=_PLAN_SCHEMA)

    return plan_stream


def plan_one_file(
    path: str,
    columns: list[str],
    forced_codecs: dict[str, str] | None = None,
    sample_rows: int = 16384,
) -> list[tuple[str, str, str, bytes | None]]:
    """Codec plan for one data file: (column, codec, params_json,
    serialized_fsst_table|None) per column. Shared by the plan-sampler
    Spark job and the driver-side small-chunk fast path (a one-task
    Spark job costs ~1 s of scheduling for a KB-sized table)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    if pf.metadata.num_row_groups == 0:
        return []
    # stream just the first sample_rows out of row group 0 instead of
    # materializing the whole (8-128 MB) group. A zero-row first group
    # yields no batches (None) -> no plan, same as an empty file.
    first = next(iter(pf.iter_batches(
        batch_size=sample_rows, row_groups=[0],
        columns=columns, use_threads=False,
    )), None)
    if first is None:
        return []
    tbl = pa.Table.from_batches([first])
    if tbl.num_rows > sample_rows:
        tbl = tbl.slice(0, sample_rows)
    out: list[tuple[str, str, str, bytes | None]] = []
    for col_name in columns:
        arr = _normalize(tbl.column(col_name))
        forced = (forced_codecs or {}).get(col_name)
        if forced:
            codec, stats, artifacts = forced, {"forced": True}, {}
        else:
            codec, stats, artifacts = select_codec(arr, col_name)
        ft = artifacts.get("fsst_table")
        if codec == "fsst" and ft is None:
            dense = arr.drop_null() if arr.null_count else arr
            ft = fsst_mod.train(strcol_of(dense).data)
        out.append((
            col_name, codec,
            json.dumps({**stats, "stats_scope": "part-head-sample"}),
            ft.serialize() if ft else None,
        ))
    return out


def make_direct_encoder(
    columns: list[str],
    sort_key: str | None = None,
    forced_codecs: dict[str, str] | None = None,
    block_rows: int = BLOCK_ROWS,
    plan: dict | None = None,
):
    """Shuffle-free encode kernel for ``mapInArrow`` over a TASK LIST
    (part_id, salt, rg_lo, rg_hi, path): each task reads its contiguous
    parquet row-group slice with pyarrow, sorts it in Arrow, and
    encodes the whole slice as one (part_id, salt) group — the decode
    side's one-task-per-file pattern mirrored onto encode, so no row
    ever crosses an exchange (engine.encode_files exchange='direct')."""

    def encode_tasks(batches):
        import pyarrow.parquet as pq

        for batch in batches:
            for row in batch.to_pylist():
                rgs = list(range(row["rg_lo"], row["rg_hi"]))
                if not rgs:
                    continue
                pf = pq.ParquetFile(row["path"])
                row_lo = row.get("row_lo", -1)
                if row_lo is not None and row_lo >= 0:
                    # row-range fallback slice (file had fewer row
                    # groups than its fan-out): stream batches and STOP
                    # at the task's upper bound instead of materializing
                    # the whole covering span — the parquet streaming
                    # reader decodes pages incrementally, so task i of k
                    # only decodes rows [0, hi_i), cutting the total
                    # redundant decode across a k-way fan-out from k x
                    # to (k+1)/2 x (leading rows before row_lo must
                    # still be decoded — page skipping can't jump into
                    # the middle of a column chunk)
                    row_hi = int(row["row_hi"])
                    kept: list[pa.RecordBatch] = []
                    start = seen = 0
                    for b in pf.iter_batches(
                        batch_size=65536, row_groups=rgs,
                        columns=columns, use_threads=False,
                    ):
                        b_lo, seen = seen, seen + b.num_rows
                        if seen <= row_lo:
                            continue
                        if not kept:
                            start = b_lo
                        kept.append(b)
                        if seen >= row_hi:
                            break
                    # task build guarantees row_lo < row_hi within the
                    # span, so at least one batch is always kept
                    tbl = pa.Table.from_batches(kept).slice(
                        row_lo - start, row_hi - row_lo
                    )
                else:
                    tbl = pf.read_row_groups(
                        rgs, columns=columns, use_threads=False
                    )
                cache = None
                part_plan = plan.get(int(row["part_id"])) if plan else None
                if part_plan:
                    # per-part codec plan (make_plan_sampler): seed the
                    # selector cache so no slice re-selects or re-trains
                    cache = {
                        col: (codec, json.loads(params),
                              SymbolTable.deserialize(ft)
                              if ft is not None else None)
                        for col, (codec, params, ft) in part_plan.items()
                    }
                out = encode_group(
                    tbl,
                    int(row["part_id"]),
                    int(row["salt"]),
                    columns=columns,
                    sort_key=sort_key,  # Arrow sort inside the task
                    forced_codecs=forced_codecs,
                    block_rows=block_rows,
                    selector_cache=cache,
                    zone_key=sort_key,
                )
                yield from out.to_batches()

    return encode_tasks


# one row per (written file, part, column): the encode task's own
# aggregate of its blocks' metadata — what _chunk_metrics_rows used to
# re-read from the written footers, now returned through the job itself
TASK_META_DDL = (
    "file string, part_id int, column string, codec string, "
    "codec_params string, n_values long, raw_bytes long, enc_bytes long, "
    "n_blocks long, key_lo long, key_hi long, key_lo_s string, "
    "key_hi_s string, n_unzoned long, n_unzoned_s long"
)

_TASK_META_SCHEMA = pa.schema(
    [
        ("file", pa.string()),
        ("part_id", pa.int32()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("codec_params", pa.string()),
        ("n_values", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("n_blocks", pa.int64()),
        ("key_lo", pa.int64()),
        ("key_hi", pa.int64()),
        ("key_lo_s", pa.string()),
        ("key_hi_s", pa.string()),
        ("n_unzoned", pa.int64()),
        ("n_unzoned_s", pa.int64()),
    ]
)


def make_task_writer(encode_fn, out_dir: str,
                     row_group_bytes: int = 32 << 20):
    """Wrap a block-producing mapInArrow kernel so each TASK writes its
    own block parquet file with pyarrow and yields only per-(part,
    column) METADATA rows (TASK_META_DDL) back to the JVM.

    Why: routing the encoded payloads through the JVM writer serializes
    every payload byte across the Arrow boundary and pays the JVM
    parquet writer on top — measured ~0.3 s of a 0.9 s webtext encode
    job (guide §4.1: control how many bytes cross; here ~100 MB of
    payload drops to ~KB of metadata). The decode side already reads
    block files with pyarrow inside tasks; this mirrors it onto write.

    Commit safety: file names are attempt-unique (uuid); the DRIVER
    commits exactly the returned file set (engine writes a _FILES
    marker and removes stray files before renaming the chunk dir), so
    a failed/retried attempt's leftovers are never read back. Row
    groups are flushed every ~row_group_bytes of payload so the
    streaming decoder's peak stays one row group (same 32 MB policy as
    the old JVM writer)."""

    def write_tasks(batches):
        import os as _os
        import uuid

        import pyarrow.parquet as _pq

        name = f"task-{uuid.uuid4().hex}.parquet"
        path = _os.path.join(out_dir, name)
        writer = None
        pend: list[pa.RecordBatch] = []
        pend_bytes = 0
        # running per-(part, column) aggregate across this task's blocks
        agg: dict[tuple[int, str], dict] = {}

        def note(batch: pa.RecordBatch) -> None:
            cols = batch.column(3).to_pylist()      # column
            codecs = batch.column(4).to_pylist()    # codec
            params = batch.column(5).to_pylist()    # codec_params
            nv = batch.column(6).to_pylist()
            rb = batch.column(7).to_pylist()
            eb = batch.column(8).to_pylist()
            klo = batch.column(11).to_pylist()
            khi = batch.column(12).to_pylist()
            klos = batch.column(13).to_pylist()
            khis = batch.column(14).to_pylist()
            pids = batch.column(0).to_pylist()
            for i in range(batch.num_rows):
                a = agg.setdefault((int(pids[i]), cols[i]), {
                    "codec": codecs[i], "codec_params": "{}",
                    "n_values": 0, "raw_bytes": 0, "enc_bytes": 0,
                    "n_blocks": 0, "key_lo": None, "key_hi": None,
                    "key_lo_s": None, "key_hi_s": None,
                    "n_unzoned": 0, "n_unzoned_s": 0,
                })
                if a["codec_params"] == "{}" and params[i] not in ("", "{}"):
                    a["codec_params"] = params[i]
                a["n_values"] += int(nv[i])
                a["raw_bytes"] += int(rb[i])
                a["enc_bytes"] += int(eb[i])
                a["n_blocks"] += 1
                if klo[i] is None:
                    a["n_unzoned"] += 1
                else:
                    a["key_lo"] = (klo[i] if a["key_lo"] is None
                                   else min(a["key_lo"], klo[i]))
                    a["key_hi"] = (khi[i] if a["key_hi"] is None
                                   else max(a["key_hi"], khi[i]))
                if klos[i] is None:
                    a["n_unzoned_s"] += 1
                else:
                    a["key_lo_s"] = (klos[i] if a["key_lo_s"] is None
                                     else min(a["key_lo_s"], klos[i]))
                    a["key_hi_s"] = (khis[i] if a["key_hi_s"] is None
                                     else max(a["key_hi_s"], khis[i]))

        def flush_rg():
            nonlocal pend, pend_bytes, writer
            if not pend:
                return
            if writer is None:
                writer = _pq.ParquetWriter(
                    path, BLOCKS_SCHEMA, compression="none",
                    use_dictionary=False,
                )
            writer.write_table(pa.Table.from_batches(pend))
            pend, pend_bytes = [], 0

        for batch in encode_fn(batches):
            note(batch)
            pend.append(batch)
            pend_bytes += batch.nbytes
            if pend_bytes >= row_group_bytes:
                flush_rg()
        flush_rg()
        if writer is None:
            return  # empty task: no file, no metadata
        writer.close()
        out = {k: [] for k in _TASK_META_SCHEMA.names}
        for (pid, col), a in sorted(agg.items()):
            out["file"].append(name)
            out["part_id"].append(pid)
            out["column"].append(col)
            for k in ("codec", "codec_params", "n_values", "raw_bytes",
                      "enc_bytes", "n_blocks", "key_lo", "key_hi",
                      "key_lo_s", "key_hi_s", "n_unzoned", "n_unzoned_s"):
                out[k].append(a[k])
        yield pa.RecordBatch.from_pydict(out, schema=_TASK_META_SCHEMA)

    return write_tasks


def decode_group(table: pa.Table, schema: pa.Schema,
                 column_map: dict[str, str] | None = None) -> pa.Table:
    """Decode one (part_id, salt) group of block rows back to source rows.

    Blocks are ordered by (column, block_seq); per-column decoded chunks
    concatenate into full columns whose row alignment is guaranteed by
    identical chunking at encode time. ``column_map`` translates a
    block's PHYSICAL column name to its current logical name (schema
    RENAME evolution: renames never rewrite data, so blocks written
    before one keep the old name).
    """
    table = table.sort_by([("column", "ascending"), ("block_seq", "ascending")])
    cols_present = table.column("column").to_pylist()
    payloads = table.column("payload").to_pylist()
    wanted = {f.name for f in schema}
    by_col: dict[str, list[pa.Array]] = {}
    for name, payload in zip(cols_present, payloads):
        if column_map is not None:
            name = column_map.get(name, name)
        if name not in wanted:  # projection: don't decode dropped columns
            continue
        by_col.setdefault(name, []).append(decode_array(payload))
    decoded: dict[str, pa.Array] = {}
    n = 0
    for field in schema:
        if field.name not in by_col:
            continue
        chunks = by_col[field.name]
        arr = chunks[0] if len(chunks) == 1 else pa.concat_arrays(chunks)
        typ = field.type
        if pa.types.is_timestamp(typ):
            # Spark's Arrow exchange wants tz-aware micros; engine
            # convention is session timeZone=UTC so values pass through
            typ = pa.timestamp("us", tz="UTC")
        decoded[field.name] = arr.cast(typ)
        n = len(arr)
    if not decoded and table.num_rows and "n_values" in table.column_names:
        # SCHEMA EVOLUTION, all-post-evolution projection: none of the
        # requested columns exist in this part's blocks, but the part
        # still has rows — derive the row count from any stored
        # column's n_values metadata so the null rows are emitted
        # (silently skipping the part would be row loss).
        first_col = cols_present[0]
        n = sum(
            nv
            for name, nv in zip(cols_present,
                                table.column("n_values").to_pylist())
            if name == first_col
        )
    arrays, names = [], []
    for field in schema:
        if field.name in decoded:
            arrays.append(decoded[field.name])
        elif n or decoded:
            # SCHEMA EVOLUTION: a column added to the table after this
            # part was encoded doesn't exist in its blocks — decode it
            # as nulls (Iceberg add-column read semantics).
            typ = field.type
            if pa.types.is_timestamp(typ):
                typ = pa.timestamp("us", tz="UTC")
            arrays.append(pa.nulls(n, type=typ))
        else:
            continue
        names.append(field.name)
    pid = table.column("part_id")[0].as_py() if table.num_rows else -1
    arrays.append(pa.array(np.full(n, pid, dtype=np.int32)))
    names.append("part_id")
    return pa.table(arrays, names=names)
