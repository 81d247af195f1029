"""Encode / decode / verify job orchestration (SURVEY.md §3.2).

Encode lifecycle::

    register files -> resume filter (manifest)           [driver, metadata]
    -> per-chunk: footer byte stats -> salt fan-out      [driver, footers]
    -> repartitionByRange(part_id, salt)                 [the ONE shuffle]
    -> sortWithinPartitions(part_id, salt, sort_key)     [JVM sort]
    -> mapInArrow(streaming group encoder)               [numpy/C kernels]
    -> blocks parquet (temp dir + atomic rename)         [executors write]
    -> manifest lines per partition                      [driver commit point]

Decode is shuffle-free: one task per block file streams whole
(part_id, salt) groups through the kernels (see decode_blocks).
Everything driver-side touches only metadata (file registry, byte
stats, manifest lines) — no row data is ever collected.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .blocks import BLOCKS_DDL, decode_group, make_encode_stream
from .manifest import Manifest
from .skew import apply_salting, footer_byte_stats, salt_factors
from .table_io import list_parquet_files, load_part_files, snapshot_id_of


# Direct-path task-slicing knobs (see encode_files). Env-overridable so
# a deployment can tune them without code changes; the defaults are
# sized by measured per-task overhead vs kernel throughput — they are
# NOT cluster-size dependent (a slice worth <30 ms of encode is pure
# overhead on any cluster, and row-range re-decode amplification costs
# the same bytes everywhere).
_SLICE_FLOOR = int(os.environ.get(
    "LIBGIDDY_SPARK_SLICE_FLOOR_BYTES", str(4 << 20)))
_RG_AMP_CAP = int(os.environ.get("LIBGIDDY_SPARK_RG_AMP_CAP", "8"))


def _source_files(path: str) -> list[dict]:
    return [{"path": p, "bytes": s} for p, s in list_parquet_files(path)]


def _balanced_bounds(sizes: list[int], k: int) -> list[tuple[int, int]]:
    """Split indices 0..len(sizes) into <=k contiguous [lo, hi) runs of
    roughly equal total size (greedy by the running target). Used to
    map salt slices onto parquet row groups driver-side."""
    n = len(sizes)
    k = max(1, min(k, n))
    total = max(sum(sizes), 1)
    target = total / k
    bounds: list[tuple[int, int]] = []
    start, acc = 0, 0
    for i, sz in enumerate(sizes):
        acc += sz
        remaining = k - len(bounds) - 1
        # cut when the slice reached its share — or when the elements
        # left are exactly enough to give every remaining slice one
        # (otherwise a slightly-late first cut starves all later cuts)
        if remaining > 0 and (acc >= target or (n - i - 1) == remaining):
            bounds.append((start, i + 1))
            start, acc = i + 1, 0
    bounds.append((start, n))
    return bounds


def encode_snapshot(
    spark: SparkSession,
    source_path: str,
    out_dir: str,
    key_col: str,
    **kw,
) -> dict:
    """Resumable chunked encode of every data file under the snapshot;
    partition = source data file. See :func:`encode_files`."""
    return encode_files(
        spark, source_path, list_parquet_files(source_path), out_dir, key_col, **kw
    )


def encode_files(
    spark: SparkSession,
    source_path: str,
    files: list[tuple[str, int]],
    out_dir: str,
    key_col: str,
    chunk_parts: int = 64,
    fat_columns: tuple[str, ...] = ("html", "text"),
    forced_codecs: dict[str, str] | None = None,
    sort_key: str | None = None,
    target_salt_bytes: int = 128 << 20,
    block_rows: int = 65536,
    columns: list[str] | None = None,
    min_slices: int | None = None,
    exchange: str = "range",
    commit_status: str = "done",
    wap_staged: bool = False,
    **_compat,
) -> dict:
    """Resumable chunked encode of the given (relpath, bytes) data
    files; partition = source data file, with STABLE part ids from the
    manifest's file registry — already-committed files are skipped, so
    the same call is a resume, an incremental snapshot append, or a
    streaming micro-batch step, depending only on what's in ``files``.

    Returns a summary dict. ``min_slices`` guarantees a minimum salt
    fan-out per chunk so even a single giant file parallelizes across
    the cluster (skew.py does the splitting).

    One out_dir = one (table, column subset): done-ness is per FILE,
    so resuming the same out_dir with a different ``columns`` selection
    would skip files encoded under the old selection — use a fresh
    out_dir per selection.

    ``exchange`` picks how rows reach the encoder:

    - ``"range"`` (default): the north-rule shape — salt skewed
      partitions, ONE ``repartitionByRange`` on (part_id, salt), JVM
      sort, streaming Arrow encoder. Rows move once through the
      shuffle; works for any source Spark can scan.
    - ``"direct"``: ZERO row shuffle. One task per (part, salt) where a
      salt slice is a contiguous run of parquet ROW GROUPS (sliced
      driver-side from footers — same zero-scan metadata the salting
      already reads); each task reads its row groups with pyarrow,
      sorts in Arrow, and encodes. The only exchange in the plan is a
      round-robin of the tiny task list — the decode pattern mirrored
      onto encode. At 100 TB this skips rewriting the whole table
      through shuffle storage; skew handling is identical (footer-driven
      fan-out), but a file's split granularity is its row-group count,
      so single-row-group monster files can't fan out (writers should
      emit many row groups — Iceberg defaults do).
    """
    t_start = time.time()
    snapshot_id = snapshot_id_of(source_path)
    if not files:
        return {"snapshot_id": snapshot_id, "num_parts": 0,
                "skipped_done": 0, "encoded_parts": 0, "secs": 0.0}
    num_parts = len(files)
    manifest = Manifest(out_dir)
    if wap_staged:
        # a staged ATTEMPT gets its own snapshot id (content id + -wapK):
        # the same source may be re-staged (or plainly re-encoded) after
        # an aborted audit, and those are distinct snapshots — reusing
        # the content id would attach the retry's parts to the aborted
        # header, hiding them at HEAD forever. An open (staged,
        # unpublished, unaborted) attempt is resumed, Iceberg-style.
        entries = manifest.read()
        hdrs = {e["snapshot_id"]: e for e in entries
                if e.get("kind") == "snapshot"}
        closed = {e.get("snapshot_id") for e in entries
                  if e.get("kind") == "publish"}
        k = 0
        while True:
            cand = f"{snapshot_id}-wap{k}"
            if cand not in hdrs or (hdrs[cand].get("staged")
                                    and cand not in closed):
                snapshot_id = cand
                break
            k += 1
    else:
        # re-encoding a source whose content snapshot was ROLLED BACK
        # would resume its done parts under the hidden header — data
        # invisible at HEAD forever. Roll forward instead (one line,
        # no re-encode). Index+tail read: headers/rollbacks are indexed.
        entries = _manifest_entries(out_dir)
        if any(e.get("kind") == "snapshot"
               and e.get("snapshot_id") == snapshot_id for e in entries):
            stv = _branch_replay(entries)
            if (snapshot_id in stv.parent
                    and snapshot_id not in set(stv.visible())):
                raise ValueError(
                    f"snapshot {snapshot_id!r} for this source exists "
                    "but was undone by a rollback — use "
                    f"rollback({out_dir!r}, {snapshot_id!r}) to roll "
                    "forward to it instead of re-encoding")
    # record/extend the TABLE SCHEMA registry (schema_evo) BEFORE the
    # header, so this snapshot reads under the schema it was written
    # with; a grown source's new columns register as add-column
    # evolution. Skipped columns (projection encode) stay unregistered.
    import pyarrow.parquet as _pq

    from .schema_evo import ensure_schema_baseline
    from .table_io import abs_file_of as _abs_of

    _src_schema = _pq.read_schema(_abs_of(source_path, files[0][0]))
    if columns is not None:
        _src_schema = pa.schema(
            [_src_schema.field(c) for c in _src_schema.names
             if c in set(columns)])
    ensure_schema_baseline(out_dir, _src_schema)
    manifest.write_snapshot_header(
        snapshot_id, source_path, _source_files(source_path), num_parts,
        staged=wap_staged,
    )
    # part_id = STABLE file identity from the manifest's file registry
    # (first-seen order, monotonic). A snapshot that grew by N files
    # therefore re-encodes ONLY those files — incremental append for
    # free, exactly how Iceberg data files accrue across snapshots.
    registry = manifest.file_registry()
    next_pid = max(registry.values(), default=-1) + 1
    newly_seen: list[tuple[str, int, str]] = []
    rel_of: dict[int, str] = {}
    for rel, size in files:
        fid = f"{rel}:{size}"
        if fid not in registry:
            registry[fid] = next_pid
            newly_seen.append((fid, next_pid, rel))
            next_pid += 1
        rel_of[registry[fid]] = rel
    if newly_seen:
        manifest.register_files(newly_seen)
    blocks_root = os.path.join(out_dir, "blocks")
    os.makedirs(blocks_root, exist_ok=True)
    done = manifest.done_parts()
    # resume sweep: drop uncommitted temp dirs AND any renamed chunk dir
    # whose parts never reached the manifest (crash between rename and
    # append) — each chunk dir carries a _PARTS marker listing its parts
    for d in os.listdir(blocks_root):
        full = os.path.join(blocks_root, d)
        if d.startswith("_tmp_"):
            shutil.rmtree(full, ignore_errors=True)
            continue
        marker = os.path.join(full, "_PARTS")
        if os.path.isdir(full) and os.path.exists(marker):
            with open(marker) as f:
                parts_in_dir = [int(x) for x in f.read().split() if x]
            if any(p not in done for p in parts_in_dir):
                shutil.rmtree(full, ignore_errors=True)
    pending = sorted(p for p in rel_of if p not in done)
    import pyarrow.parquet as pq

    from .table_io import abs_file_of

    schema = pq.read_schema(abs_file_of(source_path, files[0][0]))
    data_cols = [c for c in (columns or schema.names)]
    sort_key = sort_key or key_col
    min_slices = min_slices or spark.sparkContext.defaultParallelism
    encoded_parts = 0

    if exchange == "direct":
        # the range path fails loudly when the sort key isn't among the
        # encoded columns (sortWithinPartitions references it); match
        # that instead of silently encoding unsorted, zone-less blocks
        if sort_key not in data_cols:
            raise ValueError(
                f"direct encode: sort key {sort_key!r} must be in the "
                f"encoded columns {data_cols!r} (zone maps, blooms and "
                "block ordering derive from it)"
            )
    else:
        encode_fn = make_encode_stream(
            data_cols, forced_codecs=forced_codecs, block_rows=block_rows,
            zone_key=sort_key,
        )

    prof = os.environ.get("SPARK_GRAFT_PROFILE") == "1"
    _pt = time.time()

    def _mark(label: str) -> None:
        nonlocal _pt
        if prof:
            now = time.time()
            print(f"[lgs-prof] {label}: {now - _pt:.3f}s", file=sys.stderr)
            _pt = now

    for lo in range(0, len(pending), chunk_parts):
        chunk = pending[lo : lo + chunk_parts]
        _mark("chunk_setup")
        # read ONLY this chunk's files (no table re-scan per chunk)
        chunk_files = [(p, rel_of[p]) for p in chunk]
        # salt fan-out from parquet footers: zero scans, zero Spark jobs
        stats = footer_byte_stats(source_path, chunk_files, list(fat_columns))
        total_b = max(sum(stats.values()), 1)
        # slice floor: a tiny table must not be confettied into
        # min_slices near-empty tasks — per-task overhead (worker
        # roundtrip, parquet open, output commit: ~10-150 ms) would
        # dwarf its encode (a 4 MB slice encodes in ~30 ms, so slices
        # below that are >50% overhead; measured on the sf0.1 events
        # table, 32 near-empty tasks cost ~0.5 s of pure task churn).
        # Explicitly smaller target_salt_bytes still wins (the min),
        # so tests that force fine slicing keep it.
        eff_target = min(
            target_salt_bytes, max(total_b // min_slices, _SLICE_FLOOR)
        )
        factors = salt_factors(stats, target_bytes=eff_target)
        nslices = max(sum(factors.values()), 1)
        fanout: dict[int, int] = {}  # actual per-part task count
        _mark("footer_stats")
        if exchange == "direct":
            # ZERO-row-shuffle path: a salt slice = a contiguous run of
            # row groups, balanced by footer byte sizes (driver-side
            # metadata only); one task reads+sorts+encodes its slice.
            # The only exchange is a round-robin of this tiny task list.
            # Files with FEWER row groups than their wanted fan-out
            # (e.g. one giant row group) fall back to ROW-RANGE slices:
            # each task reads the row groups covering its row span and
            # slices locally — bounded read amplification instead of a
            # skew-bound single task.
            tasks: list[tuple[int, int, int, int, int, int, str]] = []
            for p in chunk:
                path = abs_file_of(source_path, rel_of[p])
                md = pq.ParquetFile(path).metadata
                nrg = md.num_row_groups
                if nrg == 0:
                    continue
                want = max(1, int(factors.get(int(p), 1)))
                if nrg < want <= 2 * nrg:
                    # snap to whole row groups: a row-range slice must
                    # DECODE every covering row group and keep only its
                    # span, so fanning a 2-row-group file into 3 slices
                    # reads ~1.5x the bytes for no extra parallelism
                    # worth the amplification — at <=2x the rg count,
                    # one task per row group is strictly cheaper
                    want = nrg
                if nrg >= want:
                    sizes = [
                        md.row_group(i).total_byte_size for i in range(nrg)
                    ]
                    for s, (alo, ahi) in enumerate(
                        _balanced_bounds(sizes, want)
                    ):
                        tasks.append((int(p), s, alo, ahi, -1, -1, path))
                else:
                    # row-range fallback (file has fewer row groups than
                    # its wanted fan-out): every slice re-decodes its
                    # covering row group, so fan-out here multiplies the
                    # READ work by ~want/nrg. Cap the amplification —
                    # beyond it the redundant decode outweighs the extra
                    # encode parallelism (measured encode/read cost
                    # ratio is ~2-4x on the bench tables). A truly
                    # monstrous single-row-group file still gets
                    # _RG_AMP_CAP-way parallelism; writers should emit
                    # many row groups (Iceberg defaults do). A
                    # size-growing cap (16 slices on a 470 MB
                    # single-rg file) was measured: it doubles DECODE
                    # throughput (more block files = more decode
                    # tasks) but halves encode throughput (amp), net
                    # worse end-to-end — rejected.
                    want = min(want, max(_RG_AMP_CAP, 2 * nrg))
                    rg_rows = [md.row_group(i).num_rows for i in range(nrg)]
                    offs = [0]
                    for r in rg_rows:
                        offs.append(offs[-1] + r)
                    total_rows = offs[-1]
                    want = min(want, max(total_rows, 1))
                    import bisect

                    for s in range(want):
                        rlo = s * total_rows // want
                        rhi = (s + 1) * total_rows // want
                        if rlo >= rhi:
                            continue
                        glo = bisect.bisect_right(offs, rlo) - 1
                        ghi = bisect.bisect_left(offs, rhi)
                        if offs[ghi] < rhi:
                            ghi += 1
                        tasks.append(
                            (int(p), s, glo, ghi,
                             rlo - offs[glo], rhi - offs[glo], path)
                        )
            for t in tasks:
                fanout[t[0]] = fanout.get(t[0], 0) + 1
            if tasks:
                from .blocks import PLAN_DDL, make_direct_encoder, make_plan_sampler

                # per-part codec-plan job: one tiny task per part samples
                # the file head, selects codecs, trains FSST ONCE; the
                # collected plan (codec names + <=2 KiB symbol tables —
                # codec METADATA, not row data) seeds every slice's
                # selector cache so salt fan-out never re-trains
                sample_tasks = sorted({(p, path) for p, _s, *_r, path in tasks})
                plan: dict[int, dict] = {}
                if len(sample_tasks) <= 2 or total_b < (32 << 20):
                    # small chunk: plan DRIVER-side — a one-task Spark
                    # job costs ~1 s of scheduling for a KB-sized table
                    from .blocks import plan_one_file

                    for pid, path in sample_tasks:
                        for col, codec, params, ft in plan_one_file(
                            path, data_cols, forced_codecs=forced_codecs
                        ):
                            plan.setdefault(int(pid), {})[col] = (
                                codec, params, ft
                            )
                else:
                    # pack parts into ~1 task per core slot (plan work
                    # is near-uniform per part) and slice the list
                    # driver-side: parallelize() partitions in place,
                    # where createDataFrame().repartition(n) added a
                    # round-robin EXCHANGE just to shuffle a <1 KiB list
                    nplan = max(1, min(
                        len(sample_tasks),
                        spark.sparkContext.defaultParallelism,
                    ))
                    sdf = spark.createDataFrame(
                        spark.sparkContext.parallelize(sample_tasks, nplan),
                        "part_id int, path string",
                    )
                    for r in sdf.mapInArrow(
                        make_plan_sampler(data_cols, forced_codecs=forced_codecs),
                        schema=PLAN_DDL,
                    ).collect():
                        plan.setdefault(int(r["part_id"]), {})[r["column"]] = (
                            r["codec"], r["params"], r["fsst"]
                        )
                _mark("plan_job")
                direct_fn = make_direct_encoder(
                    data_cols, sort_key=sort_key,
                    forced_codecs=forced_codecs, block_rows=block_rows,
                    plan=plan,
                )
                # logical slicing (salt groups) is independent of the
                # physical task count: pack ~2 tasks per core and let
                # each task stream several groups through one Python
                # worker — per-task overhead (worker roundtrip, Arrow
                # init, output file commit) costs ~0.15 s each, which
                # at 64 single-group tasks on local[1] added ~40% wall
                ntasks = max(1, min(
                    len(tasks), spark.sparkContext.defaultParallelism * 2
                ))
                # slices are byte-balanced by construction, so a plain
                # contiguous parallelize() split stays balanced — and
                # skips the round-robin EXCHANGE stage that
                # .repartition(ntasks) added just to shuffle a tiny
                # task list (~0.3 s fixed cost per job)
                tdf = spark.createDataFrame(
                    spark.sparkContext.parallelize(tasks, ntasks),
                    "part_id int, salt int, rg_lo int, rg_hi int, "
                    "row_lo long, row_hi long, path string",
                )
            # every file empty -> tasks == [], handled at the write step
        else:
            sub = load_part_files(spark, source_path, chunk_files)
            if columns:
                sub = sub.select(*columns, "part_id")
            # the ONE wide op: range exchange on (part_id, salt); the JVM
            # sort makes groups contiguous so mapInArrow streams them with
            # no second shuffle (SURVEY.md §3.2)
            salted = apply_salting(sub, factors, key_col, shuffle_parts=nslices)
            blocks = salted.sortWithinPartitions(
                "part_id", "salt", sort_key
            ).mapInArrow(encode_fn, schema=BLOCKS_DDL)
        _mark("task_build")
        tmp = os.path.join(blocks_root, f"_tmp_{chunk[0]}_{chunk[-1]}")
        final = os.path.join(blocks_root, f"chunk-{chunk[0]:05d}-{chunk[-1]:05d}")
        if os.path.exists(final):  # crashed between rename and manifest append
            shutil.rmtree(final)
        t0 = time.time()
        mdf = None
        if exchange == "direct":
            # each TASK writes its own block parquet file with pyarrow
            # and returns only per-(part, column) metadata rows: the
            # encoded payloads never cross the Arrow->JVM boundary and
            # the JVM parquet writer is skipped entirely (measured
            # ~0.3 s of a 0.9 s webtext encode job; guide §4.1 — pass
            # only the bytes the other side needs). Commit protocol:
            # attempt-unique file names, the driver keeps exactly the
            # returned file set (stray failed-attempt files are removed
            # here), records it in a _FILES marker that decode trusts,
            # then atomically renames the chunk dir — the same
            # write-unique/commit-by-list pattern as Spark's own output
            # protocol, with the manifest line as the commit point.
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp, exist_ok=True)
            meta_rows: list[dict] = []
            if tasks:
                from .blocks import TASK_META_DDL, make_task_writer

                meta_rows = [r.asDict() for r in tdf.mapInArrow(
                    make_task_writer(direct_fn, tmp), schema=TASK_META_DDL
                ).collect()]
            committed = {r["file"] for r in meta_rows}
            for f in os.listdir(tmp):
                if f.endswith(".parquet") and f not in committed:
                    os.remove(os.path.join(tmp, f))
            with open(os.path.join(tmp, "_FILES"), "w") as f:
                f.write("\n".join(sorted(committed)))
            mdf = _merge_task_meta(meta_rows)
        else:
            # payloads are already codec-compressed; parquet-level
            # snappy on top costs CPU both directions for ~no size win
            # — and parquet's dictionary encoding must be OFF: building
            # dictionary pages over MB-sized unique payload blobs costs
            # ~13x the write time for zero size win (measured 12.7 s ->
            # 0.9 s on 790 MB of blocks)
            (blocks.write.mode("overwrite")
             .option("compression", "none")
             .option("parquet.enable.dictionary", "false")
             # 32 MB row groups: the streaming decoder's peak memory is
             # one row group + one logical group, so finer row groups
             # keep decode tasks inside the warm allocator arena
             # (default 128 MB quadruples that for zero read-side
             # benefit — payloads are opaque blobs, no intra-row-group
             # stats matter)
             .option("parquet.block.size", str(32 * 1024 * 1024))
             .parquet(tmp))
        with open(os.path.join(tmp, "_PARTS"), "w") as f:
            f.write(" ".join(str(int(p)) for p in chunk))
        os.rename(tmp, final)  # atomic commit of the chunk's data
        _mark("write_job")
        if mdf is None:
            # per-part metrics from the written files' METADATA columns
            # (payload never read). Driver-side threaded pyarrow read —
            # a chunk holds O(cores) task files, so this replaces a
            # whole second Spark job (scan + shuffle + collect,
            # ~0.5-1 s fixed cost per chunk; VERDICT r3 #8) with
            # milliseconds of footer work. (The direct path returns the
            # same rows through the encode job itself — zero extra
            # reads.) Chunks beyond the file-count guard fall back to
            # the distributed aggregation.
            mdf = _chunk_metrics_rows(spark, final)
        _mark("metrics")
        per_part: dict[int, dict] = {
            int(p): {
                "part_id": int(p),
                "chunk_dir": os.path.basename(final),
                "salts": int(fanout.get(int(p))
                             or factors.get(int(p), 1)),
                "input_bytes_est": int(stats.get(int(p), 0)),
                "encode_secs": round(time.time() - t0, 3),
                "columns": {},
            }
            for p in chunk
        }
        for r in mdf:
            e = per_part[int(r["part_id"])]
            # part-level zone map in the manifest: lets a key-range
            # decode prune whole PARTS/chunk dirs driver-side, before
            # any file listing or footer read (the Iceberg-manifest
            # data-skipping pattern). Set only when every block of the
            # part is zoned; one unzoned block poisons the whole part
            # (over-inclusion, never silent loss).
            if int(r["n_unzoned"] or 0) > 0:
                e["key_lo"] = e["key_hi"] = None
                e["_zone_poisoned"] = True
            elif r["key_lo"] is not None and not e.get("_zone_poisoned"):
                e["key_lo"], e["key_hi"] = int(r["key_lo"]), int(r["key_hi"])
            # string part bounds: same poisoning rule, separate flag
            if int(r["n_unzoned_s"] or 0) > 0:
                e["key_lo_s"] = e["key_hi_s"] = None
                e["_zone_poisoned_s"] = True
            elif r["key_lo_s"] is not None and not e.get("_zone_poisoned_s"):
                e["key_lo_s"], e["key_hi_s"] = r["key_lo_s"], r["key_hi_s"]
            e["columns"][r["column"]] = {
                "codec": r["codec"],
                "n_values": int(r["n_values"]) ,
                "raw_bytes": int(r["raw_bytes"]),
                "enc_bytes": int(r["enc_bytes"]),
                "n_blocks": int(r["n_blocks"]),
                "codec_params": r["codec_params"],
            }
        for e in per_part.values():
            e.pop("_zone_poisoned", None)
            e.pop("_zone_poisoned_s", None)
        entries = [e for e in per_part.values() if e["columns"]]
        # empty parts inherit commit_status too: a hard-coded "done"
        # would leak a staged purge's empty part live before its txn
        empty = [
            {**per_part[p], "status": commit_status, "empty": True}
            for p in per_part
            if not per_part[p]["columns"]
        ]
        manifest.mark_done(snapshot_id, entries + empty,
                           status=commit_status)
        _mark("manifest")
        encoded_parts += len(chunk)
    return {
        "snapshot_id": snapshot_id,
        "num_parts": num_parts,
        "skipped_done": len(done & set(rel_of)),
        "encoded_parts": encoded_parts,
        "secs": round(time.time() - t_start, 3),
    }


def blocks_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """LIVE block rows at HEAD, manifest-driven: after a compaction the
    replaced dirs still exist on disk (for time travel, until vacuum),
    so a raw recursive directory read would double-count rows."""
    files = _committed_block_files(out_dir)
    if not files:
        # No committed chunks at HEAD (crashed first encode, or a fully
        # retired table awaiting vacuum). A directory fallback here
        # would surface staged/retired files, contradicting the LIVE
        # contract — the honest answer is the empty block frame.
        return spark.createDataFrame([], BLOCKS_DDL)
    return spark.read.option("mergeSchema", "true").parquet(*files)


def compact_blocks(
    spark: SparkSession,
    out_dir: str,
    target_file_bytes: int = 256 << 20,
    min_dirs: int = 2,
) -> dict:
    """Iceberg-style small-file COMPACTION (rewrite_data_files): bin-pack
    whole small chunk dirs into consolidated block files, commit a
    manifest ``rewrite`` entry, leave the old dirs on disk for time
    travel until :func:`vacuum_blocks`.

    Streaming ingestion naturally produces one chunk dir per micro-batch
    — thousands of KB-sized files at 100 TB — and decode task count /
    listing cost follow file count, so compaction is the operational
    twin of the streaming encode path. Row order inside every source
    file is preserved and files are concatenated whole, so the
    (part_id, salt) group-contiguity invariant the shuffle-free decoder
    relies on survives (two chunks never share a part id: parts are
    committed by exactly one chunk). One Spark task per output bin
    streams source files through a parquet writer — same uncompressed,
    dictionary-off layout as the encode sink."""
    blocks_root = os.path.join(out_dir, "blocks")
    m = Manifest(out_dir)
    entries = m.read()
    # HEAD = last VISIBLE main-branch snapshot: the rewrite entry must
    # commit under a snapshot id HEAD readers accept — never an
    # unpublished WAP-staged header, nor a rolled-back commit
    hvis = _branch_replay(entries).visible()
    head_snapshot = hvis[-1] if hvis else None
    if head_snapshot is None:
        return {"bins": 0, "files_before": 0, "files_after": 0}
    live = _committed_block_files(out_dir)
    by_dir: dict[str, list[str]] = {}
    for f in live:
        rel = os.path.relpath(f, blocks_root)
        by_dir.setdefault(rel.split(os.sep)[0], []).append(f)
    sizes = {
        d: sum(os.path.getsize(f) for f in fs) for d, fs in by_dir.items()
    }
    small = sorted(d for d, sz in sizes.items() if sz < target_file_bytes)
    # greedy bin-pack consecutive small dirs up to the target size
    bins: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for d in small:
        if cur and acc + sizes[d] > target_file_bytes:
            bins.append(cur)
            cur, acc = [], 0
        cur.append(d)
        acc += sizes[d]
    if cur:
        bins.append(cur)
    bins = [b for b in bins if len(b) >= min_dirs]
    if not bins:
        return {"bins": 0, "files_before": len(live),
                "files_after": len(live)}
    seq = sum(1 for e in entries if e.get("kind") == "rewrite")
    plan_rows: list[tuple[str, list[str]]] = []
    bin_meta: list[tuple[str, str, list[str]]] = []  # (new_dir, tmp, dirs)
    for i, bin_dirs in enumerate(bins):
        new_dir = f"compact-{seq + i:05d}"
        tmp = os.path.join(blocks_root, f"_tmp_{new_dir}")
        shutil.rmtree(tmp, ignore_errors=True)
        src_files = [f for d in bin_dirs for f in sorted(by_dir[d])]
        plan_rows.append((os.path.join(tmp, "bin-0.parquet"), src_files))
        bin_meta.append((new_dir, tmp, bin_dirs))

    def copy_bin(batches):
        import pyarrow.parquet as pq

        for batch in batches:
            for row in batch.to_pylist():
                os.makedirs(os.path.dirname(row["dest"]), exist_ok=True)
                # union schema across files (pre/post zone-map
                # upgrades may differ); absent columns null-fill
                schemas = [pq.read_schema(s) for s in row["srcs"]]
                names: list[str] = []
                fields = {}
                for sch in schemas:
                    for fld in sch:
                        if fld.name not in fields:
                            fields[fld.name] = fld
                            names.append(fld.name)
                union = pa.schema([fields[n] for n in names])
                with pq.ParquetWriter(
                    row["dest"], union, compression="none",
                    use_dictionary=False,
                ) as w:
                    for s in row["srcs"]:
                        pf = pq.ParquetFile(s)
                        for rg in range(pf.metadata.num_row_groups):
                            t = pf.read_row_group(rg, use_threads=False)
                            cols = []
                            for n in names:
                                if n in t.column_names:
                                    cols.append(t.column(n))
                                else:
                                    cols.append(
                                        pa.nulls(t.num_rows,
                                                 fields[n].type)
                                    )
                            # one output row group per source row group
                            # keeps the streaming decoder's bounded
                            # peak-memory property on compacted files
                            w.write_table(
                                pa.table(cols, schema=union),
                                row_group_size=1 << 30,
                            )
                yield pa.RecordBatch.from_pydict(
                    {"dest": pa.array([row["dest"]]),
                     "n_src": pa.array([len(row["srcs"])],
                                       pa.int64())}
                )

    tdf = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(d, list(s)) for d, s in plan_rows], len(plan_rows)
        ),
        "dest string, srcs array<string>",
    )
    tdf.mapInArrow(copy_bin, "dest string, n_src long").collect()
    results = []
    for new_dir, tmp, bin_dirs in bin_meta:
        final = os.path.join(blocks_root, new_dir)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # atomic physical commit
        m.append_rewrite(head_snapshot, new_dir, bin_dirs)  # logical commit
        results.append({"new_chunk": new_dir, "replaced": bin_dirs})
    return {
        "bins": len(bins),
        "files_before": len(live),
        "files_after": len(_committed_block_files(out_dir)),
        "rewrites": results,
    }


def vacuum_blocks(
    out_dir: str,
    retain_last: int = 1,
    older_than: float | None = None,
) -> dict:
    """Physically remove chunk dirs no longer LIVE at HEAD (replaced by
    compaction rewrites) — Iceberg's expire-snapshots/delete-orphans
    step. After vacuum, time travel to snapshots that needed the removed
    dirs raises a clear error instead of silently losing rows. Assumes
    the engine's single-writer model (no encode in flight).

    Retention (Iceberg ``expire_snapshots`` analogue): a snapshot is
    RETAINED — its files survive vacuum, time travel to it keeps
    working — if it is within the newest ``retain_last`` snapshot
    headers (default 1 = HEAD only, the historical behaviour), OR its
    commit timestamp is >= ``older_than`` (i.e. only snapshots strictly
    older than the cutoff expire), OR a named ref points at it. The two
    knobs compose as a union, matching Iceberg's
    ``retain_last``/``older_than``."""
    blocks_root = os.path.join(out_dir, "blocks")
    if not os.path.isdir(blocks_root):
        return {"removed": [], "expired_staged": []}
    live_dirs = set()
    for f in _committed_block_files(out_dir):
        live_dirs.add(os.path.relpath(f, blocks_root).split(os.sep)[0])
    removed = []
    m = Manifest(out_dir)
    all_entries = m.read()
    # RETAINED snapshots pin their files exactly like named refs
    # (Iceberg branch retention): dirs and delete files a retained
    # snapshot still needs survive vacuum; age out of the retention
    # window (or drop the ref) to expire them on the next vacuum.
    bstate = _branch_replay(all_entries)
    chain = bstate.chain
    ts_of = {e["snapshot_id"]: e.get("ts", 0.0)
             for e in all_entries if e.get("kind") == "snapshot"}
    # retention window counts MAIN-BRANCH snapshots (publish order);
    # unpublished WAP-staged snapshots are pinned unconditionally —
    # they are awaiting audit, not aging out. Aborted ones are swept.
    # After a rollback the CURRENT snapshot may sit outside the
    # newest-N window — it is always retained (Iceberg never expires
    # the current snapshot).
    retained = set(chain[-max(1, int(retain_last)):])
    if bstate.current is not None:
        retained.add(bstate.current)
    if older_than is not None:
        retained |= {sid for sid in chain
                     if ts_of.get(sid, 0.0) >= older_than}
    retained |= set(list_refs(out_dir).values())
    staged_hdrs = {e["snapshot_id"] for e in all_entries
                   if e.get("kind") == "snapshot" and e.get("staged")}
    wap_aborted = {e["snapshot_id"] for e in all_entries
                   if e.get("kind") == "publish" and e.get("abort")}
    retained |= staged_hdrs - set(chain) - wap_aborted
    pinned_dirs: set[str] = set()
    pinned_deletes: set[str] = set()
    for sid in sorted(retained):
        try:
            pinned_dirs |= _dirs_needed_at(all_entries, sid)
            pinned_deletes |= {
                os.path.relpath(f, out_dir)
                for f, _k, _n, _s in _accepted_deletes(out_dir, sid)
            }
        except ValueError:
            continue  # e.g. a ref left pointing at an aborted WAP snap
    replaced: set[str] = set()
    for e in all_entries:
        if e.get("kind") == "rewrite":
            replaced.update(e.get("replaces", ()))
    for d in sorted(replaced):
        if d in live_dirs or d in pinned_dirs:
            continue  # still live at HEAD, or pinned by a ref
        full = os.path.join(blocks_root, d)
        if os.path.isdir(full):
            shutil.rmtree(full)
            removed.append(d)
    # delete files already MATERIALIZED by a purge serve only time
    # travel — expire them with the dirs, same Iceberg-expire contract
    cleared: set[str] = set()
    for e in all_entries:
        if e.get("kind") == "delete_clear":
            cleared.update(e.get("files", ()))
    for rel in sorted(cleared - pinned_deletes):
        full = os.path.join(out_dir, rel)
        if os.path.isfile(full):
            os.remove(full)
            removed.append(rel)
        elif os.path.isdir(full):
            # upsert tombstones are written distributed (a parquet
            # DIRECTORY) — expire them the same way
            shutil.rmtree(full)
            removed.append(rel)
    purge_src = os.path.join(out_dir, "_purge_src")
    if os.path.isdir(purge_src):
        shutil.rmtree(purge_src)
        removed.append("_purge_src")
    # Orphaned STAGED entries (a purge that crashed between its staged
    # encode and its txn, then was retried under a new snapshot id):
    # sweep any leftover staged chunk dirs and mark the snapshot ids
    # expired in ONE line, so the dead staged lines are declared — not
    # re-examined — by every later maintenance pass. (Reuses the one
    # manifest parse from above — the manifest is O(parts) lines.)
    entries = all_entries
    promoted = {e.get("snapshot_id") for e in entries
                if e.get("kind") == "part" and e.get("status") == "done"}
    expired: set[str] = set()
    for e in entries:
        if e.get("kind") == "staged_expire":
            expired.update(e.get("snapshot_ids", ()))
    orphans: dict[str, set[str]] = {}
    for e in entries:
        if (e.get("kind") == "part" and e.get("status") == "staged"
                and e.get("snapshot_id") not in promoted
                and e.get("snapshot_id") not in expired):
            dirs = orphans.setdefault(e["snapshot_id"], set())
            if e.get("chunk_dir"):
                dirs.add(e["chunk_dir"])
    for _sid, dirs in sorted(orphans.items()):
        for d in sorted(dirs):
            full = os.path.join(blocks_root, d)
            if d not in live_dirs and os.path.isdir(full):
                shutil.rmtree(full)
                removed.append(d)
    # ABORTED WAP snapshots: their data never joined the main branch
    # and never will — sweep their chunk dirs (idempotent: a second
    # vacuum finds them already gone)
    if wap_aborted:
        for e in entries:
            if (e.get("kind") in ("part", "chunk")
                    and e.get("snapshot_id") in wap_aborted
                    and e.get("chunk_dir")):
                d = e["chunk_dir"]
                full = os.path.join(blocks_root, d)
                if (d not in live_dirs and d not in pinned_dirs
                        and os.path.isdir(full)):
                    shutil.rmtree(full)
                    removed.append(d)
    if removed or orphans:
        entry = {"kind": "vacuum", "removed": removed, "ts": time.time()}
        lines = [entry]
        if orphans:
            lines.append({"kind": "staged_expire",
                          "snapshot_ids": sorted(orphans),
                          "ts": time.time()})
        m.append(lines)
    return {"removed": removed, "expired_staged": sorted(orphans)}


def remove_orphan_files(out_dir: str, grace_s: float = 3600.0) -> dict:
    """Iceberg ``remove_orphan_files``: delete on-disk files NO manifest
    entry references — debris of crashed jobs (``_tmp_*`` encode/compact
    staging, chunk dirs renamed but never committed, ``_tmp-delete-*``
    tombstone staging, delete files whose manifest append was lost).

    Referenced-ness is the only criterion: every ``chunk_dir`` named by
    any part/chunk/rewrite entry (including ``replaces`` — vacuum owns
    replaced-dir expiry, not this op) and every delete ``file`` stay
    untouched, so HEAD reads, time travel and WAP audits are unaffected
    by construction. ``grace_s`` guards racing an in-flight writer:
    only files idle longer than the grace window are swept (pass 0 in
    tests / single-writer maintenance windows)."""
    m = Manifest(out_dir)
    entries = m.read()
    referenced: set[str] = set()
    for e in entries:
        for k in ("chunk_dir", "new_chunk"):
            if e.get(k):
                referenced.add(e[k])
        referenced.update(e.get("replaces", ()) or ())
        if e.get("kind") == "delete" and e.get("file"):
            referenced.add(os.path.basename(e["file"]))
    now = time.time()

    def _idle(path: str) -> bool:
        # judge idleness by the NEWEST mtime in the whole tree, not the
        # top dir's: a file written continuously inside an old dir keeps
        # the dir mtime stale, and sweeping it mid-write would race the
        # writer (ADVICE r5). Missing entries (concurrent delete) count
        # as active — skip, never sweep on uncertainty.
        try:
            newest = os.path.getmtime(path)
            for root, _dirs, fs in os.walk(path):
                for f in fs:
                    newest = max(newest,
                                 os.path.getmtime(os.path.join(root, f)))
            return now - newest >= grace_s
        except OSError:
            return False

    removed: list[str] = []
    blocks_root = os.path.join(out_dir, "blocks")
    if os.path.isdir(blocks_root):
        for d in sorted(os.listdir(blocks_root)):
            full = os.path.join(blocks_root, d)
            if not os.path.isdir(full) or d in referenced:
                continue
            if not _idle(full):
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed.append(os.path.join("blocks", d))
    ddir = os.path.join(out_dir, "deletes")
    if os.path.isdir(ddir):
        for f in sorted(os.listdir(ddir)):
            full = os.path.join(ddir, f)
            if f in referenced or not _idle(full):
                continue
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                os.remove(full)
            removed.append(os.path.join("deletes", f))
    return {"removed": removed}


def _snap_chain(
    entries: list[dict], as_of: str | None = None,
) -> tuple[list[str], set[str] | None]:
    """Main-branch snapshot CHAIN (commit order) and the accepted set
    for a read, WAP-aware (Iceberg write-audit-publish).

    A normal snapshot joins the chain at its header; a WAP-STAGED
    snapshot (header ``staged: true``) joins at its ``publish`` entry
    — the Iceberg cherry-pick ordering — so time travel to snapshots
    committed between stage and publish never sees the staged rows.
    Aborted staged snapshots never join.

    Returns ``(chain, accepted)``:

    - ``chain``: ordered main-branch snapshot ids; a part/delete's
      Iceberg sequence number is its snapshot's index here.
    - ``accepted``: snapshot ids whose data entries a read at
      ``as_of`` may see, or None = "everything in the manifest" (the
      zero-overhead fast path, only when nothing is staged and no
      ``as_of``). ``as_of`` may also name an UNPUBLISHED staged
      snapshot — the AUDIT read: the main chain as of the stage point
      plus the staged snapshot itself.
    """
    st = _branch_replay(entries)
    if as_of is None:
        dirty = st.staged_parent or st.aborted or st.has_rollback
        accepted = set(st.visible()) if dirty else None
        return st.chain, accepted
    if as_of in st.staged_parent:  # audit read: unpublished staged snap
        return st.chain, set(st.vis_at(st.staged_parent[as_of])) | {as_of}
    if as_of in st.aborted:
        raise ValueError(
            f"snapshot {as_of!r} was a WAP-staged snapshot that was "
            "aborted — its data never joined the table")
    if as_of not in st.parent:
        raise ValueError(f"unknown snapshot id for time travel: {as_of!r}")
    return st.chain, set(st.vis_at(as_of))


class _BranchState:
    """Replayed manifest branch state (see :func:`_branch_replay`).

    Visibility is stored as PARENT POINTERS: when a snapshot joins the
    branch, its parent is whatever snapshot was current then, so the
    visible set at any snapshot is its parent path — O(1) per commit
    regardless of how many rollbacks the manifest holds."""

    __slots__ = ("chain", "parent", "current", "staged_parent",
                 "aborted", "has_rollback")

    def __init__(self) -> None:
        self.chain: list[str] = []        # full commit order (seq nums)
        self.parent: dict[str, str | None] = {}
        self.current: str | None = None   # last visible commit (HEAD)
        self.staged_parent: dict[str, str | None] = {}  # unpublished WAP
        self.aborted: set[str] = set()
        self.has_rollback = False

    def vis_at(self, sid: str | None) -> list[str]:
        """Visible snapshot list right after ``sid`` joined (commit
        order): sid's parent path. ``None`` = empty table."""
        out: list[str] = []
        while sid is not None:
            out.append(sid)
            sid = self.parent[sid]
        out.reverse()
        return out

    def visible(self) -> list[str]:
        """Commits a HEAD read sees, in commit order."""
        return self.vis_at(self.current)


def _branch_replay(entries: list[dict]) -> _BranchState:
    """Replay snapshot/publish/rollback entries into branch state.

    ``chain`` is the FULL main-branch commit order — a part/delete's
    Iceberg sequence number stays its position here even after a
    rollback hides it. A ``rollback`` entry to snapshot S makes S the
    current snapshot (visible set = S's parent path — the state when S
    joined), so rolling back and rolling FORWARD to a previously
    rolled-back snapshot (Iceberg ``set_current_snapshot``) are the
    same operation; later commits chain onto S."""
    st = _BranchState()
    seen: set[str] = set()

    def _join(sid: str) -> None:
        st.chain.append(sid)
        st.parent[sid] = st.current
        st.current = sid

    for e in entries:
        k = e.get("kind")
        if k == "snapshot":
            sid = e["snapshot_id"]
            if sid in seen:
                continue
            seen.add(sid)
            if e.get("staged"):
                st.staged_parent[sid] = st.current
            else:
                _join(sid)
        elif k == "publish":
            sid = e.get("snapshot_id")
            if sid not in st.staged_parent or sid in st.aborted:
                continue  # unknown / double entry: writer-validated
            if e.get("abort"):
                st.aborted.add(sid)
            else:
                _join(sid)
            st.staged_parent.pop(sid)
        elif k == "rollback":
            to = e.get("to")
            if to in st.parent:
                st.current = to
                st.has_rollback = True
            # else: writer-validated; a reader skips a bad entry
    return st


def _committed_block_files(
    out_dir: str,
    part_ids: list[int] | None = None,
    key_range: tuple[int, int] | None = None,
    key_range_s: tuple[str, str] | None = None,
    as_of: str | None = None,
) -> list[str]:
    """Block parquet files belonging to COMMITTED chunks, from the
    manifest. A part-id filter drops whole chunk dirs before listing
    (each chunk dir's manifest lines name its parts); a key_range
    (int sort keys) or key_range_s (string sort keys) drops parts whose
    MANIFEST-level zone map doesn't overlap — the Iceberg-manifest
    data-skipping layer above the per-block zone maps (parts without a
    recorded zone map are always kept). ``as_of`` = a snapshot id for
    TIME TRAVEL: only parts committed under snapshots up to and
    including it (manifest header order) are visible — the Iceberg
    snapshot-isolation read pattern over our append-only manifest.
    Hidden paths (``_``/``.`` prefixes: Spark ``_temporary`` task dirs,
    ``_PARTS`` markers) are excluded as defense-in-depth even inside
    committed dirs."""
    blocks_root = os.path.join(out_dir, "blocks")
    m = Manifest(out_dir)
    idx = m.read_index()
    if idx is not None:
        # chunk-granular index (Iceberg manifest-list analogue): the
        # driver parses O(chunks) summary lines — part lists + chunk
        # key ranges — plus only the manifest TAIL past the index's
        # covered byte offset (chunks whose summary append was lost to
        # a crash, in-flight registry lines). Chunk-level key pruning
        # is coarser than per-part (a key gap inside a kept chunk
        # over-includes), but the per-block zone maps inside each file
        # still prune those reads — over-inclusive only, never loss.
        index_entries, covered = idx
        entries = index_entries + m.read_tail(covered)
    else:  # pre-index manifest: full O(parts) read, identical result
        entries = m.read()
    _chain, accepted = _snap_chain(entries, as_of)

    def _in_range(e: dict) -> bool:
        if accepted is not None and e.get("snapshot_id") not in accepted:
            return False  # committed after the as_of snapshot
        if key_range is not None and e.get("key_lo") is not None:
            if e["key_hi"] < key_range[0] or e["key_lo"] > key_range[1]:
                return False  # wholly out of range
        if key_range_s is not None and e.get("key_lo_s") is not None:
            if e["key_hi_s"] < key_range_s[0] or e["key_lo_s"] > key_range_s[1]:
                return False  # wholly out of string range
        return True

    chunk_parts: dict[str, set[int]] = {}
    rewrites: list[dict] = []
    for e in entries:
        kind = e.get("kind")
        if kind == "chunk" and e.get("chunk_dir"):
            if _in_range(e):
                chunk_parts.setdefault(e["chunk_dir"], set()).update(
                    int(p) for p in e.get("parts", ())
                )
        elif kind == "part" and e.get("status") == "done" and e.get("chunk_dir"):
            if _in_range(e):
                chunk_parts.setdefault(e["chunk_dir"], set()).add(int(e["part_id"]))
        elif kind == "rewrite":
            if accepted is None or e.get("snapshot_id") in accepted:
                rewrites.append(e)
    # COMPACTION rewrites, in commit order: the new chunk dir serves the
    # union of its replaced dirs' parts. A rewrite whose replaced dirs
    # were ALL pruned (key range / part filter) stays pruned — the new
    # file holds exactly their rows.
    for rw in rewrites:
        moved: set[int] = set()
        for d in rw.get("replaces", ()):
            moved |= chunk_parts.pop(d, set())
        if moved and rw.get("new_chunk"):
            chunk_parts.setdefault(rw["new_chunk"], set()).update(moved)
        # new_chunk=None: RETIRE — the purge's replacement chunks were
        # committed with their own part entries, nothing to remap
    wanted = {int(p) for p in part_ids} if part_ids is not None else None
    files: list[str] = []
    for d, parts in sorted(chunk_parts.items()):
        if wanted is not None and not (parts & wanted):
            continue
        full = os.path.join(blocks_root, d)
        if not os.path.isdir(full):
            if as_of is not None:
                # time travel must fail loudly when its snapshot's files
                # were vacuumed — silence here would be silent row loss
                raise ValueError(
                    f"time travel to {as_of!r} needs chunk dir {d!r}, "
                    "which was removed (vacuumed/expired)"
                )
            continue  # chunk pruned by a later resume sweep
        marker = os.path.join(full, "_FILES")
        if os.path.exists(marker):
            # chunk committed by the task-side writer: the marker IS
            # the committed file set (write-unique/commit-by-list), so
            # a zombie task attempt's leftover file can never be read.
            # A listed-but-missing file is corruption — fail loudly,
            # silence would be silent row loss.
            with open(marker) as fh:
                names = [x.strip() for x in fh.read().splitlines()
                         if x.strip()]
            for f in names:
                p = os.path.join(full, f)
                if not os.path.isfile(p):
                    raise ValueError(
                        f"chunk dir {d!r} commit list names {f!r}, "
                        "which is missing on disk (partial vacuum or "
                        "external deletion?)")
                files.append(p)
            continue
        for root, dirs, fs in os.walk(full):
            dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
            for f in fs:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    files.append(os.path.join(root, f))
    return sorted(files)


_METRIC_COLS = [
    "part_id", "column", "codec", "n_values", "raw_bytes", "enc_bytes",
    "codec_params", "key_lo", "key_hi", "key_lo_s", "key_hi_s",
]


def _merge_task_meta(meta_rows: list[dict]) -> list[dict]:
    """Merge the encode tasks' per-(file, part, column) metadata rows
    (blocks.TASK_META_DDL) into one row per (part, column) — the same
    shape _chunk_metrics_rows derives from written footers, computed
    from the job's own return value instead of a re-read."""
    agg: dict[tuple[int, str], dict] = {}
    for r in meta_rows:
        key = (int(r["part_id"]), r["column"])
        a = agg.get(key)
        if a is None:
            agg[key] = a = {
                "part_id": int(r["part_id"]), "column": r["column"],
                "codec": r["codec"], "codec_params": "{}",
                "n_values": 0, "raw_bytes": 0, "enc_bytes": 0,
                "n_blocks": 0, "key_lo": None, "key_hi": None,
                "key_lo_s": None, "key_hi_s": None,
                "n_unzoned": 0, "n_unzoned_s": 0,
            }
        if a["codec_params"] == "{}" and r["codec_params"] not in ("", "{}"):
            a["codec_params"] = r["codec_params"]
        a["n_values"] += int(r["n_values"])
        a["raw_bytes"] += int(r["raw_bytes"])
        a["enc_bytes"] += int(r["enc_bytes"])
        a["n_blocks"] += int(r["n_blocks"])
        a["n_unzoned"] += int(r["n_unzoned"])
        a["n_unzoned_s"] += int(r["n_unzoned_s"])
        if r["key_lo"] is not None:
            a["key_lo"] = (int(r["key_lo"]) if a["key_lo"] is None
                           else min(a["key_lo"], int(r["key_lo"])))
            a["key_hi"] = (int(r["key_hi"]) if a["key_hi"] is None
                           else max(a["key_hi"], int(r["key_hi"])))
        if r["key_lo_s"] is not None:
            a["key_lo_s"] = (r["key_lo_s"] if a["key_lo_s"] is None
                             else min(a["key_lo_s"], r["key_lo_s"]))
            a["key_hi_s"] = (r["key_hi_s"] if a["key_hi_s"] is None
                             else max(a["key_hi_s"], r["key_hi_s"]))
    return [agg[k] for k in sorted(agg)]


def _chunk_metrics_rows(spark: SparkSession, final: str) -> list[dict]:
    """Per-(part, column) metric rows for one committed chunk dir,
    aggregated from the block files' metadata columns (payload bytes
    never touched). Threaded pyarrow in the driver for the normal
    O(cores)-files case; a chunk with very many files (huge clusters)
    falls back to the distributed groupBy so driver work stays
    bounded."""
    import concurrent.futures as cf

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(final, f)
        for f in os.listdir(final)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if len(files) > 512:
        rows = (
            spark.read.parquet(final)
            .groupBy("part_id", "column")
            .agg(
                F.first("codec").alias("codec"),
                F.sum("n_values").alias("n_values"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("enc_bytes").alias("enc_bytes"),
                F.count("*").alias("n_blocks"),
                F.first("codec_params").alias("codec_params"),
                F.min("key_lo").alias("key_lo"),
                F.max("key_hi").alias("key_hi"),
                F.min("key_lo_s").alias("key_lo_s"),
                F.max("key_hi_s").alias("key_hi_s"),
                F.sum(F.when(F.col("key_lo").isNull(), 1).otherwise(0))
                .alias("n_unzoned"),
                F.sum(F.when(F.col("key_lo_s").isNull(), 1).otherwise(0))
                .alias("n_unzoned_s"),
            )
        ).collect()
        return [r.asDict() for r in rows]

    def rd(p: str) -> pa.Table:
        f = pq.ParquetFile(p)
        have = set(f.schema_arrow.names)
        return f.read(columns=[c for c in _METRIC_COLS if c in have])

    if not files:
        return []
    with cf.ThreadPoolExecutor(min(16, len(files))) as ex:
        tables = [t for t in ex.map(rd, files) if t.num_rows]
    if not tables:
        return []
    df = pa.concat_tables(tables, promote_options="default").to_pandas()
    out: list[dict] = []
    for (pid, col), sub in df.groupby(["part_id", "column"], sort=False):
        # codec is constant per (part, column); the real codec_params
        # live on each salt slice's block_seq-0 row, the rest are "{}"
        params = next(
            (p for p in sub["codec_params"] if p and p != "{}"), "{}"
        )
        klo = sub["key_lo"].dropna()
        khi = sub["key_hi"].dropna()
        klo_s = sub["key_lo_s"].dropna()
        khi_s = sub["key_hi_s"].dropna()
        out.append(
            {
                "part_id": int(pid),
                "column": col,
                "codec": sub["codec"].iloc[0],
                "n_values": int(sub["n_values"].sum()),
                "raw_bytes": int(sub["raw_bytes"].sum()),
                "enc_bytes": int(sub["enc_bytes"].sum()),
                "n_blocks": int(len(sub)),
                "codec_params": params,
                "key_lo": int(klo.min()) if len(klo) else None,
                "key_hi": int(khi.max()) if len(khi) else None,
                "key_lo_s": klo_s.min() if len(klo_s) else None,
                "key_hi_s": khi_s.max() if len(khi_s) else None,
                "n_unzoned": int(sub["key_lo"].isna().sum()),
                "n_unzoned_s": int(sub["key_lo_s"].isna().sum()),
            }
        )
    return out


def delete_rows(out_dir: str, key_col: str, keys: list) -> dict:
    """EQUALITY DELETE (Iceberg merge-on-read): write a delete file of
    key values and commit a manifest ``delete`` entry — no data file is
    touched. Every subsequent :func:`decode_blocks` anti-joins the
    tombstoned keys out at read time; time travel to snapshots BEFORE
    the delete still sees the rows. Semantics are Iceberg
    SEQUENCE-SCOPED (round 5): the delete applies only to rows whose
    part committed strictly before it, so a key re-ingested afterwards
    (an upsert) survives; delete again after re-ingest for the
    GDPR-purge shape.

    Driver-side by design: delete batches are key lists (bounded
    metadata), not row data. At 100 TB the delete FILES stay small
    while the anti-join distributes with the decode."""
    import pyarrow.parquet as pq

    import hashlib

    m = Manifest(out_dir)
    entries = m.read()
    if not any(e.get("kind") == "snapshot" for e in entries):
        raise ValueError(f"no snapshots in {out_dir}: nothing to delete from")
    ddir = os.path.join(out_dir, "deletes")
    os.makedirs(ddir, exist_ok=True)
    seq = sum(1 for e in entries if e.get("kind") == "delete")
    rel = os.path.join("deletes", f"delete-{seq:05d}.parquet")
    tmp = os.path.join(out_dir, rel + ".tmp")
    tbl = pa.table({key_col: pa.array(keys)})
    pq.write_table(tbl, tmp)
    target = os.path.join(out_dir, rel)
    if os.path.exists(target):
        # debris of a crashed writer (e.g. an upsert that renamed its
        # tombstone DIR but died before its manifest txn): the manifest
        # entry is the commit point, so an existing unreferenced target
        # is always safe to replace — without this, every later delete
        # wedges on IsADirectoryError forever
        if os.path.isdir(target):
            shutil.rmtree(target)
        else:
            os.remove(target)
    os.rename(tmp, target)
    # a delete is its OWN snapshot (Iceberg: every delete commit makes a
    # new snapshot): time travel to any earlier snapshot must not see it
    with open(os.path.join(out_dir, rel), "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    snap_id = f"snap-delete-{seq:05d}-{digest}"
    m.write_snapshot_header(snap_id, out_dir, [], 0)
    m.append_delete(snap_id, rel, key_col, len(keys))
    return {"file": rel, "key_col": key_col, "n": len(keys),
            "snapshot_id": snap_id}


# Largest tombstone list applied as a broadcast anti-join at decode;
# above this the anti-join shuffles instead (see
# _apply_evolution_and_deletes). ~8 MB of int64 keys — well under any
# sane spark.sql.autoBroadcastJoinThreshold, far below executor heap.
DELETE_BROADCAST_MAX_KEYS = 1_000_000


def upsert_rows(
    spark: SparkSession, out_dir: str, key_col: str, df: DataFrame,
) -> dict:
    """Row-level UPSERT / MERGE (Iceberg ``MERGE INTO ... WHEN MATCHED
    THEN UPDATE WHEN NOT MATCHED THEN INSERT`` analogue): atomically
    replace the table's rows whose ``key_col`` appears in ``df`` with
    df's rows, and insert the rest. ONE new snapshot: the new parts
    and a SEQUENCE-SCOPED tombstone of df's keys (applying only to
    parts committed before this snapshot — the new rows themselves are
    exempt by seq) commit in a single manifest txn, so a reader sees
    the pre-upsert or the post-upsert table, never a mix; time travel
    before it sees the old rows; the changelog emits delete-of-old +
    insert-of-new, the standard CDC update shape.

    Scale: df's rows flow through the normal distributed encode; the
    tombstone key file is also written DISTRIBUTED (a parquet
    directory), so upsert batches are not driver-bounded, and past
    ``DELETE_BROADCAST_MAX_KEYS`` decode's anti-join shuffles instead
    of broadcasting — same guard as plain deletes. ``df`` must carry
    the full table schema (column subsets would null-fill on decode)."""
    m = Manifest(out_dir)
    pre_entries = m.read()  # one parse: guard + delete seq (the staged
    # encode below appends no delete entries, so the seq stays valid)
    if not any(e.get("kind") == "snapshot" for e in pre_entries):
        raise ValueError(f"no snapshots in {out_dir}: encode first")
    if key_col not in df.columns:
        raise ValueError(f"upsert df lacks key column {key_col!r}")
    # stage the new rows (same pattern as purge: staged part lines are
    # invisible until the txn flips them)
    src = os.path.join(out_dir, "_upsert_src")
    shutil.rmtree(src, ignore_errors=True)
    (df.write.mode("overwrite")
     .option("parquet.block.size", 8 * 1024 * 1024)
     .parquet(src))
    summary = encode_files(
        spark, src, list_parquet_files(src), out_dir, key_col,
        commit_status="staged",
    )
    # distributed tombstone of the upserted keys, staged + atomic rename
    dnum = sum(1 for e in pre_entries if e.get("kind") == "delete")
    rel = os.path.join("deletes", f"delete-{dnum:05d}.parquet")
    os.makedirs(os.path.join(out_dir, "deletes"), exist_ok=True)
    tmp = os.path.join(out_dir, "deletes", f"_tmp-delete-{dnum:05d}")
    shutil.rmtree(tmp, ignore_errors=True)
    keys = spark.read.parquet(src).select(key_col).distinct()
    keys.write.mode("overwrite").parquet(tmp)
    n_keys = spark.read.parquet(tmp).count()
    final = os.path.join(out_dir, rel)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    staged = [
        e for e in m.read()
        if e.get("kind") == "part" and e.get("status") == "staged"
        and e.get("snapshot_id") == summary["snapshot_id"]
    ]
    promoted = [{**e, "status": "done"} for e in staged]
    m.commit_txn(promoted + [{
        "kind": "delete",
        "snapshot_id": summary["snapshot_id"],
        "file": rel,
        "key_col": key_col,
        "n": int(n_keys),
        "ts": time.time(),
    }])
    shutil.rmtree(src, ignore_errors=True)
    return {"snapshot_id": summary["snapshot_id"],
            "upserted_keys": int(n_keys),
            "encoded_parts": summary["encoded_parts"]}


def _accepted_deletes(
    out_dir: str, as_of: str | None = None
) -> list[tuple[str, str, int, int]]:
    """(abs delete file, key_col, n_keys, commit_seq) for delete
    entries visible at ``as_of`` (or HEAD), via the chunk index +
    manifest tail. n_keys comes from the manifest entry — no file
    scan. commit_seq is the delete snapshot's 0-based position in the
    manifest's snapshot order — the Iceberg sequence number the delete
    is scoped by (it applies only to parts with a smaller seq)."""
    m = Manifest(out_dir)
    idx = m.read_index()
    if idx is not None:
        entries = idx[0] + m.read_tail(idx[1])
    else:
        entries = m.read()
    chain, accepted = _snap_chain(entries, as_of)
    seq_of = {s: i for i, s in enumerate(chain)}
    cleared: set[str] = set()
    for e in entries:
        if e.get("kind") != "delete_clear":
            continue
        if accepted is not None and e.get("snapshot_id") not in accepted:
            continue  # time travel before the purge: deletes still apply
        cleared.update(e.get("files", ()))
    out = []
    for e in entries:
        if e.get("kind") != "delete":
            continue
        if accepted is not None and e.get("snapshot_id") not in accepted:
            continue
        if e["file"] in cleared:
            continue  # materialized by a purge rewrite
        out.append((os.path.join(out_dir, e["file"]), e["key_col"],
                    int(e.get("n", 0)),
                    seq_of.get(e.get("snapshot_id"), 0)))
    return out


def _part_seq_map(out_dir: str, as_of: str | None = None) -> dict[int, int]:
    """part_id -> 0-based commit-snapshot position (the part's Iceberg
    sequence number), from the chunk index + tail. Compaction preserves
    a part's ORIGINAL seq (rewrites add no part entries), so delete
    applicability never changes across storage maintenance; purge
    re-encodes under fresh part ids at the purge snapshot's seq.
    A WAP-staged snapshot's parts take their sequence from the PUBLISH
    position (cherry-pick ordering); during an AUDIT read
    (``as_of`` = the unpublished staged id) they take the sequence
    they'd receive if published now — above every visible delete, so
    pre-stage tombstones never erase freshly staged rows."""
    entries = _manifest_entries(out_dir)
    chain, accepted = _snap_chain(entries, as_of)
    seq_of = {s: i for i, s in enumerate(chain)}
    if (as_of is not None and as_of not in seq_of
            and accepted is not None):
        # audit read of an unpublished staged snap: the sequence it
        # would receive if published NOW — the end of the full chain,
        # above every visible part and delete. (Not len(accepted)-1:
        # after a rollback, visible commits can hold chain positions
        # far beyond the visible COUNT, and a delete among them would
        # out-sequence — i.e. erase — the freshly staged rows.)
        seq_of[as_of] = len(chain)
    out: dict[int, int] = {}
    for e in entries:
        k = e.get("kind")
        if k == "chunk" and e.get("snapshot_id") in seq_of:
            for p in e.get("parts", ()):
                out.setdefault(int(p), seq_of[e["snapshot_id"]])
        elif (k == "part" and e.get("status") == "done"
                and e.get("snapshot_id") in seq_of
                and e.get("part_id") is not None):
            out.setdefault(int(e["part_id"]), seq_of[e["snapshot_id"]])
    return out


def _staged_full_rewrite(
    spark: SparkSession,
    out_dir: str,
    schema: pa.Schema,
    key_col: str,
    deletes: list[tuple[str, str, int, int]],
    cluster: bool = False,
    target_part_bytes: int = 128 << 20,
    chunk_parts: int = 64,
) -> tuple[dict, list[str]]:
    """Shared full-table rewrite: decode the LIVE rows (tombstones
    applied by decode), re-encode them as a fresh snapshot via the
    RANGE path (repartitionByRange on ``key_col`` → clustered, sorted
    parts), RETIRE every previous chunk dir, and clear any pending
    delete files — all in one manifest txn.

    STAGED encode: part lines commit with status=staged — invisible
    to listing/resume, dirs swept if we crash here — then ONE txn
    line flips everything at once (promote to done + retire old dirs
    + clear deletes). No reader can ever see old and new rows
    together, and a crash at any point leaves a consistent table
    (before the txn: pre-rewrite state; after: rewritten state).
    Returns (encode summary, retired dirs)."""
    m = Manifest(out_dir)
    blocks_root = os.path.join(out_dir, "blocks")
    old_dirs = sorted(
        {
            os.path.relpath(f, blocks_root).split(os.sep)[0]
            for f in _committed_block_files(out_dir)
        }
    )
    dec = decode_blocks(spark, out_dir, schema).drop("part_id")
    if cluster:
        # parts = staging files, and each part's manifest zone map is
        # its file's key range — so global clustering must happen HERE:
        # range-partition on the key (disjoint ranges per file), sized
        # ~target_part_bytes of source bytes per part so part count
        # tracks table size on a cluster
        live_bytes = sum(
            os.path.getsize(f) for f in _committed_block_files(out_dir))
        n_parts = max(1, -(-live_bytes // target_part_bytes))
        dec = dec.repartitionByRange(n_parts, key_col)
    src = os.path.join(out_dir, "_purge_src")
    shutil.rmtree(src, ignore_errors=True)
    (dec.write.mode("overwrite")
     .option("parquet.block.size", 8 * 1024 * 1024)
     .parquet(src))
    # the staged files already hold the final row placement (the
    # clustering repartitionByRange above, or the original part rows
    # for an unclustered purge), so the re-encode needs no row
    # exchange: the DIRECT path slices the staged files' row groups
    # per task and Arrow-sorts within the slice — one shuffle fewer
    # than re-running the range exchange over data that is already
    # ranged (guide §2.4)
    summary = encode_files(
        spark, src, list_parquet_files(src), out_dir, key_col,
        chunk_parts=chunk_parts,
        exchange="direct",
        commit_status="staged",
    )
    staged = [
        e for e in m.read()
        if e.get("kind") == "part" and e.get("status") == "staged"
        and e.get("snapshot_id") == summary["snapshot_id"]
    ]
    promoted = [{**e, "status": "done"} for e in staged]
    txn = promoted + [{
        "kind": "rewrite",
        "snapshot_id": summary["snapshot_id"],
        "new_chunk": None,
        "replaces": sorted(old_dirs),
        "ts": time.time(),
    }]
    if deletes:
        txn.append({
            "kind": "delete_clear",
            "snapshot_id": summary["snapshot_id"],
            "files": sorted(
                os.path.relpath(f, out_dir) for f, _k, _n, _s in deletes
            ),
            "ts": time.time(),
        })
    m.commit_txn(txn)
    return summary, old_dirs


def purge_deletes(
    spark: SparkSession, out_dir: str, schema: pa.Schema, key_col: str,
) -> dict:
    """MATERIALIZE equality deletes (the GDPR-purge / Iceberg
    rewrite-with-delete-compaction step): decode the live table minus
    tombstones, re-encode it as a fresh snapshot, RETIRE every previous
    chunk dir via a rewrite entry, and mark the delete files cleared.
    Afterwards reads pay no anti-join; time travel before the purge
    still sees the original rows + applies the original deletes (until
    :func:`vacuum_blocks` removes the retired dirs). ``schema`` must be
    the FULL table schema — a purge rewrites every column."""
    deletes = _accepted_deletes(out_dir)
    if not deletes:
        return {"purged_files": 0, "rewritten": False}
    summary, old_dirs = _staged_full_rewrite(
        spark, out_dir, schema, key_col, deletes)
    return {
        "purged_files": len(deletes),
        "rewritten": True,
        "snapshot_id": summary["snapshot_id"],
        "retired_dirs": old_dirs,
        "encoded_parts": summary["encoded_parts"],
    }


def rewrite_sorted(
    spark: SparkSession, out_dir: str, schema: pa.Schema, key_col: str,
    target_part_bytes: int = 128 << 20,
    chunk_parts: int = 64,
) -> dict:
    """SORT-ORDER compaction (Iceberg rewrite_data_files with a sort
    strategy): re-cluster the whole table by ``key_col``. Appends and
    streaming micro-batches interleave key ranges across chunks, so
    zone maps overlap and a key-range decode touches every chunk;
    after a sorted rewrite each part owns a tight disjoint key range —
    manifest-level pruning drops whole chunks again and runs/deltas
    re-tighten for RLE/delta/FoR. Implemented as a full staged rewrite
    through the RANGE encode path (repartitionByRange + per-part Arrow
    sort); any pending equality deletes are materialized on the way
    (the rewrite decodes live rows, so keeping the tombstone files
    would double-apply history). Old dirs stay for time travel until
    :func:`vacuum_blocks`."""
    deletes = _accepted_deletes(out_dir)
    summary, old_dirs = _staged_full_rewrite(
        spark, out_dir, schema, key_col, deletes, cluster=True,
        target_part_bytes=target_part_bytes, chunk_parts=chunk_parts)
    return {
        "sorted_by": key_col,
        "snapshot_id": summary["snapshot_id"],
        "retired_dirs": old_dirs,
        "encoded_parts": summary["encoded_parts"],
        "materialized_deletes": len(deletes),
    }


def _manifest_entries(out_dir: str) -> list[dict]:
    """Index + tail when available (O(chunks)), else full read."""
    m = Manifest(out_dir)
    idx = m.read_index()
    if idx is not None:
        return idx[0] + m.read_tail(idx[1])
    return m.read()


def list_refs(out_dir: str) -> dict[str, str]:
    """Named refs (Iceberg branch/tag analogue): last entry per name
    wins; dropped refs (snapshot_id None) disappear."""
    refs: dict[str, str] = {}
    for e in _manifest_entries(out_dir):
        if e.get("kind") == "ref":
            if e.get("snapshot_id") is None:
                refs.pop(e["name"], None)
            else:
                refs[e["name"]] = e["snapshot_id"]
    return refs


def create_ref(out_dir: str, name: str,
               snapshot_id: str | None = None) -> dict:
    """Create/update a named ref to ``snapshot_id`` (None = current
    HEAD snapshot). Refs resolve anywhere ``as_of`` is accepted
    (decode, changelog, CLI) and PIN their snapshot's files against
    vacuum — the Iceberg branch-retention behaviour."""
    entries = _manifest_entries(out_dir)
    snaps = [e["snapshot_id"] for e in entries
             if e.get("kind") == "snapshot"]
    if not snaps:
        raise ValueError(f"no snapshots in {out_dir}")
    if snapshot_id is None:
        # HEAD = the last VISIBLE main-branch snapshot: an unpublished
        # WAP header or a rolled-back commit must never become the
        # implicit ref target
        vis = _branch_replay(entries).visible()
        if not vis:
            raise ValueError(f"no published snapshots in {out_dir}")
        snapshot_id = vis[-1]
    elif snapshot_id not in snaps:
        raise ValueError(f"unknown snapshot {snapshot_id!r}")
    if name in snaps:
        raise ValueError(
            f"ref name {name!r} collides with a snapshot id")
    Manifest(out_dir).append_ref(name, snapshot_id)
    return {"name": name, "snapshot_id": snapshot_id}


def drop_ref(out_dir: str, name: str) -> None:
    if name not in list_refs(out_dir):
        raise ValueError(f"unknown ref {name!r}")
    Manifest(out_dir).append_ref(name, None)


def _wap_state(out_dir: str, snapshot_or_ref: str) -> tuple[str, str]:
    """Resolve to a snapshot id and classify its WAP state:
    'unstaged' | 'staged' | 'published' | 'aborted'."""
    sid = _resolve_as_of(out_dir, snapshot_or_ref)
    entries = _manifest_entries(out_dir)
    hdr = next((e for e in entries if e.get("kind") == "snapshot"
                and e.get("snapshot_id") == sid), None)
    if hdr is None:
        raise ValueError(f"unknown snapshot {snapshot_or_ref!r}")
    if not hdr.get("staged"):
        return sid, "unstaged"
    for e in entries:
        if e.get("kind") == "publish" and e.get("snapshot_id") == sid:
            return sid, ("aborted" if e.get("abort") else "published")
    return sid, "staged"


def publish_snapshot(out_dir: str, snapshot_or_ref: str) -> dict:
    """PUBLISH a WAP-staged snapshot (Iceberg cherry-pick /
    fast-forward): after this, HEAD reads include its data, and its
    main-branch position — hence its parts' Iceberg sequence number —
    is the publish point, not the stage point. The write-audit-publish
    workflow: ``encode_files(..., wap_staged=True)`` → audit the result
    with ``as_of=<staged id>`` (decode, quality checks, row counts) →
    ``publish_snapshot`` on success or :func:`abort_snapshot` on
    failure. Audits run on the REAL encoded files — publish moves no
    bytes, it appends one manifest line."""
    sid, state = _wap_state(out_dir, snapshot_or_ref)
    if state == "unstaged":
        raise ValueError(f"snapshot {sid!r} was not staged (WAP)")
    if state == "published":
        raise ValueError(f"snapshot {sid!r} is already published")
    if state == "aborted":
        raise ValueError(f"snapshot {sid!r} was aborted; cannot publish")
    Manifest(out_dir).append_publish(sid)
    return {"snapshot_id": sid, "published": True}


def abort_snapshot(out_dir: str, snapshot_or_ref: str) -> dict:
    """ABORT a WAP-staged snapshot that failed its audit: it never
    joins the main branch, audit reads of it start raising, and
    :func:`vacuum_blocks` reclaims its files."""
    sid, state = _wap_state(out_dir, snapshot_or_ref)
    if state == "unstaged":
        raise ValueError(f"snapshot {sid!r} was not staged (WAP)")
    if state == "published":
        raise ValueError(f"snapshot {sid!r} is already published; "
                         "use delete/purge to remove its rows")
    if state == "aborted":
        return {"snapshot_id": sid, "aborted": True}  # idempotent
    Manifest(out_dir).append_publish(sid, abort=True)
    return {"snapshot_id": sid, "aborted": True}


def rollback(out_dir: str, snapshot_or_ref: str) -> dict:
    """Iceberg ``rollback_to`` / ``set_current_snapshot``: make the
    given snapshot (or ref target) the CURRENT snapshot. HEAD reads —
    decode, compaction, upsert parents, refs-at-HEAD — rewind to the
    exact state when it committed; the undone snapshots stay in the
    manifest for time travel (their files are never rewrite-replaced,
    so vacuum does not reclaim them) and the table history keeps every
    commit. Rolling FORWARD to a snapshot a previous rollback hid is
    the same operation. One manifest line, no data movement.

    :func:`read_changes` windows follow the target snapshot's LINEAGE,
    so commits made after the rollback stay readable; a consumer whose
    checkpoint was itself undone gets a loud off-lineage error (the
    changelog cannot express un-inserts) and must reset to a snapshot
    at or before the rollback target."""
    sid = _resolve_as_of(out_dir, snapshot_or_ref)
    entries = _manifest_entries(out_dir)
    st = _branch_replay(entries)
    if sid in st.staged_parent:
        raise ValueError(
            f"snapshot {sid!r} is WAP-staged and unpublished — publish "
            "or abort it; rollback targets main-branch commits only")
    if sid in st.aborted:
        raise ValueError(f"snapshot {sid!r} was aborted; its data "
                         "never joined the table")
    if sid not in st.parent:
        raise ValueError(f"unknown snapshot {snapshot_or_ref!r}")
    if st.current == sid:
        return {"current_snapshot": sid, "changed": False}
    before = st.visible()
    after = st.vis_at(sid)
    Manifest(out_dir).append_rollback(sid)
    return {
        "current_snapshot": sid,
        "changed": True,
        "hidden": [s for s in before if s not in set(after)],
        "restored": [s for s in after if s not in set(before)],
    }


def _resolve_as_of(out_dir: str, as_of: str | None) -> str | None:
    """Translate a ref name to its snapshot id; snapshot ids (and
    None) pass through."""
    if as_of is None:
        return None
    return list_refs(out_dir).get(as_of, as_of)


def _dirs_needed_at(entries: list[dict], as_of: str) -> set[str]:
    """Chunk dirs a read at snapshot ``as_of`` lists (rewrites applied)
    — existence not required. Mirrors _committed_block_files' visibility
    rules with all pruning filters off; used by vacuum to honour
    ref-pinned snapshots."""
    chain, accepted = _snap_chain(entries, as_of)
    if accepted is None:  # defensive: as_of is always given here
        accepted = set(chain)
    dirs: set[str] = set()
    for e in entries:
        k = e.get("kind")
        if (k in ("part", "chunk") and e.get("chunk_dir")
                and e.get("status", "done") == "done"
                and e.get("snapshot_id", as_of) in accepted):
            dirs.add(e["chunk_dir"])
    for e in entries:
        if (e.get("kind") == "rewrite"
                and e.get("snapshot_id") in accepted):
            replaced = set(e.get("replaces", ())) & dirs
            dirs -= replaced
            if replaced and e.get("new_chunk"):
                dirs.add(e["new_chunk"])
    return dirs


def read_changes(
    spark: SparkSession,
    out_dir: str,
    schema: pa.Schema,
    since_snapshot: str | None,
    to_snapshot: str | None = None,
) -> DataFrame:
    """Iceberg-style incremental / CDC read: the LOGICAL row changes
    committed strictly after ``since_snapshot`` (None = since table
    creation) up to ``to_snapshot`` (None = HEAD), as the table columns
    plus ``_change_type`` ('insert' | 'delete') and ``_commit_seq``
    (1-based position of the committing snapshot within the window).

    Everything derives from the manifest's append-only history — no
    data diffing:

    - INSERTS: part entries committed by window snapshots, decoded
      shuffle-free with the part-id filter, ``as_of`` their own
      snapshot (so earlier global tombstones apply exactly as a reader
      at that snapshot saw them).
    - DELETES: equality-delete entries in the window, emitted as FULL
      rows — the live rows at the delete's parent snapshot matching
      the tombstoned keys (the Iceberg changelog-view shape). Key
      lists past DELETE_BROADCAST_MAX_KEYS join shuffled, same guard
      as decode.
    - Storage maintenance is invisible by construction: compaction
      rewrites add no part entries, purge rewrites promote re-encoded
      parts under a retire-style rewrite snapshot (``new_chunk=None``)
      which is excluded here, vacuum only removes expired files (a
      changelog window whose files were vacuumed raises the same
      loud expired error as time travel).

    A row inserted and later deleted inside the window yields BOTH
    entries (a strict changelog, not a net diff) — consumers fold by
    (key, max _commit_seq) when they want net state. Window bounds
    also accept NAMED REFS (:func:`create_ref`)."""
    since_snapshot = _resolve_as_of(out_dir, since_snapshot)
    to_snapshot = _resolve_as_of(out_dir, to_snapshot)
    m = Manifest(out_dir)
    entries = m.read()
    bstate = _branch_replay(entries)  # main branch only: a WAP-staged
    # snapshot enters the changelog at its PUBLISH position
    snaps = bstate.chain
    if not snaps:
        raise ValueError(f"no snapshots in {out_dir}")
    if to_snapshot is None:
        vis = bstate.visible()
        if not vis:
            raise ValueError(f"no visible snapshots in {out_dir}")
        to_snapshot = vis[-1]
    if to_snapshot not in snaps:
        raise ValueError(f"unknown to_snapshot {to_snapshot!r}")
    # the window walks to_snapshot's LINEAGE (its parent path), not the
    # raw commit chain: snapshots a rollback undid are not ancestors of
    # `to`, so their inserts never replay, and commits made AFTER a
    # rollback (which sit past the undone ones in raw chain order but
    # chain directly onto the rollback target) stay readable. A `since`
    # off that lineage means the consumer's checkpoint was undone — the
    # changelog cannot express un-inserts, so fail loud and reset.
    lineage = bstate.vis_at(to_snapshot)
    if since_snapshot is None:
        window = lineage
    else:
        if since_snapshot not in snaps:
            raise ValueError(f"unknown since_snapshot {since_snapshot!r}")
        if since_snapshot not in lineage:
            raise ValueError(
                f"since_snapshot {since_snapshot!r} is not on the "
                f"lineage of {to_snapshot!r} (undone by a rollback, or "
                "later than it) — reset the consumer to a snapshot at "
                "or before the rollback target")
        i0 = lineage.index(since_snapshot)
        window = lineage[i0 + 1:]
    seq_of = {s: i + 1 for i, s in enumerate(window)}
    purge_snaps = {
        e.get("snapshot_id") for e in entries
        if e.get("kind") == "rewrite" and e.get("new_chunk") is None
    }
    tcols = [f.name for f in schema]
    ddl = ", ".join(
        [f"`{f.name}` {_spark_type_of(f.type)}" for f in schema]
        + ["`_change_type` string", "`_commit_seq` int"]
    )
    parts_by_snap: dict[str, set[int]] = {}
    for e in entries:
        if (e.get("kind") == "part" and e.get("status") == "done"
                and e.get("snapshot_id") in seq_of
                and e.get("snapshot_id") not in purge_snaps
                and not e.get("empty")):
            parts_by_snap.setdefault(
                e["snapshot_id"], set()).add(int(e["part_id"]))
    pieces: list[DataFrame] = []
    for s in window:
        pids = parts_by_snap.get(s)
        if pids:
            ins = decode_blocks(
                spark, out_dir, schema, part_ids=sorted(pids), as_of=s)
            pieces.append(
                ins.select(*tcols)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_seq",
                            F.lit(seq_of[s]).cast("int")))
    bcast_max = int(os.environ.get(
        "LGS_DELETE_BROADCAST_MAX_KEYS", DELETE_BROADCAST_MAX_KEYS))
    for e in entries:
        if e.get("kind") != "delete" or e.get("snapshot_id") not in seq_of:
            continue
        dfile = os.path.join(out_dir, e["file"])
        if not os.path.exists(dfile):
            raise ValueError(
                f"changelog window needs delete file {e['file']!r}, "
                "which was removed (vacuumed/expired)")
        # LINEAGE parent, not raw chain order: a delete committed
        # after a rollback chains onto the rollback target — decoding
        # "rows live just before the delete" against the chain
        # predecessor would read undone (rolled-back) table state and
        # emit delete rows that were never inserted on this lineage
        parent = bstate.parent[e["snapshot_id"]]
        if parent is None:
            # delete as the very first main-branch commit (possible
            # when only WAP-staged data existed): nothing was live
            # before it, so it deletes nothing — as_of=None here would
            # wrongly decode HEAD
            continue
        keys = spark.read.parquet(dfile).select(
            F.col(e["key_col"])).distinct()
        if int(e.get("n", 0)) > bcast_max:
            keys = keys.hint("shuffle_hash")
        else:
            keys = F.broadcast(keys)
        rows = decode_blocks(spark, out_dir, schema, as_of=parent)
        pieces.append(
            rows.join(keys, e["key_col"], "left_semi")
            .select(*tcols)
            .withColumn("_change_type", F.lit("delete"))
            .withColumn("_commit_seq",
                        F.lit(seq_of[e["snapshot_id"]]).cast("int")))
    if not pieces:
        return spark.createDataFrame([], ddl)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def _evolution_null_parts(
    out_dir: str,
    wanted_cols: set[str],
    part_ids: list[int] | None = None,
    as_of: str | None = None,
) -> list[tuple[int, int]]:
    """(part_id, n_rows) for committed parts that have NONE of the
    projected columns — an all-post-evolution projection over parts
    encoded before the add-column. Their block files contain no
    matching ``column`` rows, so the scan-side projection filter would
    silently drop them; the manifest's per-column ``n_values`` carries
    the row count so decode can emit the all-null rows instead (Iceberg
    add-column read semantics, no row loss).

    Runs off the CHUNK INDEX when available — chunk lines carry the
    column union + per-part row counts — so the per-decode driver cost
    stays O(chunks) like the listing; only pre-index manifests (or
    chunk lines predating the columns field) pay the full O(parts)
    read."""
    m = Manifest(out_dir)
    idx = m.read_index()
    entries: list[dict]
    if idx is not None:
        index_entries, covered = idx
        chunk_lines = [e for e in index_entries if e.get("kind") == "chunk"]
        if all("columns" in e for e in chunk_lines):
            entries = index_entries + m.read_tail(covered)
        else:  # pre-upgrade chunk lines: full read for correctness
            entries = m.read()
    else:
        entries = m.read()
    _chain, accepted = _snap_chain(entries, as_of)
    wanted_p = {int(p) for p in part_ids} if part_ids is not None else None
    # parts whose chunk dir was RETIRED (purge rewrite, new_chunk=None)
    # are dead — their rows live under the purge's own new parts, so
    # emitting evolution nulls for them would duplicate rows. A normal
    # compaction rewrite keeps its parts live (rows moved, not replaced).
    retired: set[str] = set()
    for e in entries:
        if (
            e.get("kind") == "rewrite"
            and not e.get("new_chunk")
            and (accepted is None or e.get("snapshot_id") in accepted)
        ):
            retired.update(e.get("replaces", ()))
    out: list[tuple[int, int]] = []
    # chunk lines first, UNIONED per chunk_dir (a healed line and a
    # regular line for the same dir must merge like the listing does,
    # never first-wins-shadow), tail part lines after
    by_cdir: dict[str, dict] = {}
    for e in entries:
        if e.get("kind") != "chunk" or not e.get("chunk_dir"):
            continue
        cdir = e["chunk_dir"]
        if cdir in retired:
            continue
        if accepted is not None and e.get("snapshot_id") not in accepted:
            continue
        agg = by_cdir.setdefault(cdir, {"columns": set(), "part_rows": {}})
        agg["columns"].update(e.get("columns") or ())
        agg["part_rows"].update(e.get("part_rows") or {})
    seen_chunks = set(by_cdir)
    for agg in by_cdir.values():
        if not agg["columns"] or agg["columns"] & wanted_cols:
            continue  # normal decode path covers these parts
        for pid_s, n in agg["part_rows"].items():
            pid = int(pid_s)
            if wanted_p is not None and pid not in wanted_p:
                continue
            if n:
                out.append((pid, int(n)))
    for e in entries:
        kind = e.get("kind")
        if kind != "part" or e.get("status") != "done":
            continue
        if e.get("chunk_dir") in retired or e.get("chunk_dir") in seen_chunks:
            continue
        pid = int(e["part_id"])
        if wanted_p is not None and pid not in wanted_p:
            continue
        if accepted is not None and e.get("snapshot_id") not in accepted:
            continue
        cols = e.get("columns") or {}
        if not cols or set(cols) & wanted_cols:
            continue  # normal decode path covers this part
        n = next(
            (int(c["n_values"]) for c in cols.values() if "n_values" in c), 0
        )
        if n:
            out.append((pid, n))
    return out


def _apply_evolution_and_deletes(
    spark: SparkSession,
    result: DataFrame,
    out_dir: str,
    schema: pa.Schema,
    wanted_cols: set[str],
    part_ids,
    as_of,
    may_have_rows: bool,
    column_map: dict[str, str] | None = None,
) -> DataFrame:
    """Shared decode tail: union schema-evolution null rows, then apply
    equality-delete anti-joins. One definition for both the normal and
    the fully-pruned-listing paths, so their semantics cannot drift."""
    evo = _evolution_null_parts(out_dir, wanted_cols, part_ids, as_of)
    for pid, n in evo:
        nulls = spark.range(n).select(
            *[
                F.lit(None).cast(_spark_type_of(f.type)).alias(f.name)
                for f in schema
            ],
            F.lit(pid).cast("int").alias("part_id"),
        )
        result = result.unionByName(nulls)
    if not (may_have_rows or evo):
        # provably zero rows: tombstones cannot apply, and raising on a
        # projection-excluded delete key here would fail calls whose
        # result is the empty frame either way
        return result
    # EQUALITY DELETES (merge-on-read): anti-join tombstoned keys out.
    # Bounded key lists -> broadcast anti-join, no shuffle of decoded
    # rows. A GDPR-scale purge wave (10^8+ keys) would OOM a broadcast,
    # so past the threshold the anti-join runs as a SHUFFLE_HASH join
    # instead (the key count is in the manifest entry — decided without
    # scanning the delete file); purge_deletes remains the way to stop
    # paying it entirely. Time travel to a snapshot before the delete
    # never sees its entry (_accepted_deletes filters by as_of).
    bcast_max = int(os.environ.get(
        "LGS_DELETE_BROADCAST_MAX_KEYS", DELETE_BROADCAST_MAX_KEYS))
    deletes = _accepted_deletes(out_dir, as_of)
    if not deletes:
        return result
    # SEQUENCE SCOPING (Iceberg delete ordering): a delete applies only
    # to rows whose part committed STRICTLY BEFORE the delete's
    # snapshot, so keys re-ingested after it survive — the semantics
    # upsert_rows needs. The common case (no append after any pending
    # delete) is detected from manifest metadata alone and keeps the
    # historical key-only anti-join: zero extra plan nodes.
    part_seq = _part_seq_map(out_dir, as_of)
    min_dseq = min(d[3] for d in deletes)
    scoped = any(s >= min_dseq for s in part_seq.values())
    orig_cols = result.columns
    if scoped:
        # bounded metadata: one small (part_id, seq) broadcast join
        # tags every row with its part's sequence number
        pseq_df = spark.createDataFrame(
            sorted(part_seq.items()), "part_id int, _part_seq int")
        result = result.join(F.broadcast(pseq_df), "part_id", "left")
    for dfile, dkey, n_keys, dseq in deletes:
        # a delete written before a RENAME tombstones under the old
        # name: its file column stays dkey, the decoded frame carries
        # the logical name
        res_key = (column_map or {}).get(dkey, dkey)
        if not os.path.exists(dfile):
            # time travel between a delete and its purge after vacuum
            # removed the cleared delete file: fail with the same loud
            # error the missing-chunk-dir case raises, not a raw Spark
            # path-not-found
            raise ValueError(
                f"time travel to {as_of!r} needs delete file "
                f"{os.path.basename(dfile)!r}, which was removed "
                "(vacuumed/expired)"
            )
        if res_key not in orig_cols:
            raise ValueError(
                f"equality-delete file {dfile!r} tombstones on column "
                f"{res_key!r}, which the projection excludes — include "
                "it so merge-on-read can apply (or purge deletes first)"
            )
        if scoped:
            tomb = spark.read.parquet(dfile).select(
                F.col(dkey).alias("_tomb_key")).distinct()
            tomb = (tomb.hint("shuffle_hash") if n_keys > bcast_max
                    else F.broadcast(tomb))
            cond = ((F.col(res_key) == F.col("_tomb_key"))
                    & (F.col("_part_seq") < F.lit(int(dseq))))
            result = result.join(tomb, cond, "left_anti")
        else:
            tomb = spark.read.parquet(dfile).select(
                F.col(dkey).alias(res_key)).distinct()
            tomb = (tomb.hint("shuffle_hash") if n_keys > bcast_max
                    else F.broadcast(tomb))
            result = result.join(tomb, res_key, "left_anti")
    if scoped:
        result = result.select(*orig_cols)
    return result


def decode_blocks(
    spark: SparkSession,
    out_dir: str,
    schema: pa.Schema,
    part_ids: list[int] | None = None,
    key_range: tuple[int, int] | None = None,
    key_range_s: tuple[str, str] | None = None,
    key_point=None,
    as_of: str | None = None,
    column_map: dict[str, str] | None = None,
) -> DataFrame:
    """Blocks -> original rows (+ part_id), SHUFFLE-FREE.

    ``column_map`` (physical block-column name -> logical output name)
    serves schema RENAME evolution (schema_evo.read_table builds it):
    blocks keep the name they were encoded under; the block filter
    matches physical names and decode_group emits logical ones.

    Every encode task writes exactly one parquet file holding whole,
    contiguous (part_id, salt) groups (range exchange + JVM sort at
    encode time), so decode never needs the hash exchange of encoded
    payloads that a groupBy/applyInArrow formulation would add: one
    task per block FILE streams its groups through the numpy decoder.
    The only exchange in the plan is a round-robin of the tiny file-
    path list (metadata, not payload bytes). File reads go through
    pyarrow, which handles local, HDFS and S3 URIs alike in
    production.

    Block files are listed from the MANIFEST's committed chunk-dir
    entries, not a filesystem walk: uncommitted ``_tmp_*`` dirs and
    in-flight task files are invisible by construction (the manifest
    line is the commit point), a part-id filter prunes whole chunk
    dirs before any listing happens, and at 100 TB the driver never
    enumerates the full blocks tree to decode one part.

    ``key_range=(lo, hi)`` (inclusive, sort-key values as int64) prunes
    via the per-block ZONE MAPS (key_lo/key_hi columns): overlapping
    blocks only, skipped at parquet row-group level before any payload
    byte is read. Blocks WITHOUT zone maps (non-integral sort key, or a
    group whose key column contains nulls) always decode — pruning only
    ever over-includes, never silently drops rows. Block-granular —
    callers apply the exact row predicate on the decoded frame. The
    range prunes at TWO levels: manifest part zone maps (driver-side,
    before any listing) and per-block zone maps (parquet row-group
    stats inside each task).

    ``key_range_s=(lo, hi)`` is the same pruning for STRING sort keys
    via the ``key_lo_s/key_hi_s`` bounds (truncation-unsafe bounds were
    stored as null = never pruned). ``key_point`` = a single probe
    value (int or str): sets the matching range to ``(v, v)`` AND
    additionally tests each candidate block's Bloom filter (bloom.py)
    in a metadata-only first read, so in-range blocks that provably
    don't contain the probe skip their payload read and decode
    entirely. ``as_of`` = snapshot id for time travel (see
    :func:`_committed_block_files`). All pruning is block-granular and
    over-inclusive only — callers apply the exact row predicate on the
    decoded frame. ``as_of`` also accepts a NAMED REF (branch/tag,
    :func:`create_ref`), resolved to its snapshot here."""
    as_of = _resolve_as_of(out_dir, as_of)
    probe_hash = probe_domain = None
    if key_point is not None:
        from . import bloom as bloom_mod

        if isinstance(key_point, str):
            if key_range_s is None:
                key_range_s = (key_point, key_point)
        else:
            if key_range is None:
                key_range = (int(key_point), int(key_point))
        probe_hash = bloom_mod.hash_value(key_point)
        probe_domain = bloom_mod.domain_of(key_point)
    krange0 = (
        (int(key_range[0]), int(key_range[1])) if key_range is not None else None
    )
    files = _committed_block_files(out_dir, part_ids, krange0, key_range_s, as_of)
    out_fields = ", ".join(
        f"`{f.name}` {_spark_type_of(f.type)}" for f in schema
    )
    ddl = out_fields + ", part_id int"
    wanted_cols_set = (set(column_map) if column_map
                       else {f.name for f in schema})
    if not files:
        # a fully-pruned listing must still honor schema evolution and
        # deletes — the same shared tail as the main path
        return _apply_evolution_and_deletes(
            spark, spark.createDataFrame([], ddl), out_dir, schema,
            wanted_cols_set, part_ids, as_of, may_have_rows=False,
            column_map=column_map,
        )
    wanted = sorted(int(p) for p in part_ids) if part_ids is not None else None
    krange = (int(key_range[0]), int(key_range[1])) if key_range is not None else None
    krange_s = (str(key_range_s[0]), str(key_range_s[1])) if key_range_s is not None else None

    wanted_cols = sorted(wanted_cols_set)

    def decode_stream(batches):
        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from . import bloom as bloom_mod

        for batch in batches:
            for path in batch.column(0).to_pylist():
                # predicate + projection pushdown into the block scan:
                # only the requested parts' and columns' payload bytes
                # are read from the file (row-group pruning). Files
                # written BEFORE the string-zone/bloom columns existed
                # must over-include, never crash: gate each clause on
                # the file actually having its columns (footer names).
                file_cols = set(pq.ParquetFile(path).schema_arrow.names)
                zflt = None  # part/zone clauses, column-independent
                if wanted is not None:
                    zflt = pc.field("part_id").isin(wanted)
                if krange is not None and "key_lo" in file_cols:
                    # zone-map pruning: keep blocks whose sort-key range
                    # overlaps [lo, hi] — and ALWAYS keep null zone maps
                    # (non-integral sort keys, or a group containing a
                    # null key): over-inclusion is correct, silent
                    # pruning of unzoned blocks would lose rows
                    overlap = (pc.field("key_hi") >= krange[0]) & (
                        pc.field("key_lo") <= krange[1]
                    )
                    clause = overlap | pc.field("key_lo").is_null()
                    zflt = clause if zflt is None else zflt & clause
                if krange_s is not None and "key_lo_s" in file_cols:
                    # string zone maps: same overlap + null-keep rule
                    overlap_s = (pc.field("key_hi_s") >= krange_s[0]) & (
                        pc.field("key_lo_s") <= krange_s[1]
                    )
                    clause = overlap_s | pc.field("key_lo_s").is_null()
                    zflt = clause if zflt is None else zflt & clause
                flt = pc.field("column").isin(wanted_cols)
                if zflt is not None:
                    flt = flt & zflt
                if probe_hash is not None and "key_bloom" in file_cols:
                    # metadata-only first read (no payload column):
                    # test each candidate block's Bloom filter; blocks
                    # whose filter PROVES the probe absent skip their
                    # payload read + decode. Blocks without a bloom row
                    # (unkeyed encodes, non-key columns only) stay.
                    # Keyed by the FULL (part_id, salt, block_seq): a
                    # block file holds several parts' groups (tasks are
                    # packed), and salt/block_seq alone would let one
                    # part's bloom prune another part's blocks.
                    meta = pq.read_table(
                        path,
                        columns=["part_id", "salt", "block_seq", "key_bloom"],
                        filters=zflt,
                        use_threads=False,
                    )
                    trips: set[tuple[int, int, int]] = set()
                    blooms: dict[tuple[int, int, int], bytes] = {}
                    for p_, s_, q_, kb in zip(
                        meta.column("part_id").to_pylist(),
                        meta.column("salt").to_pylist(),
                        meta.column("block_seq").to_pylist(),
                        meta.column("key_bloom").to_pylist(),
                    ):
                        trips.add((p_, s_, q_))
                        if kb is not None:
                            blooms[(p_, s_, q_)] = kb
                    survivors = sorted(
                        t
                        for t in trips
                        if t not in blooms
                        or bloom_mod.bloom_might_contain(
                            blooms[t], probe_hash, probe_domain
                        )
                    )
                    if not survivors:
                        continue
                    if len(survivors) < len(trips):
                        by_group: dict[tuple[int, int], list[int]] = {}
                        for p_, s_, q_ in survivors:
                            by_group.setdefault((p_, s_), []).append(q_)
                        sel = None
                        for (p_, s_), qs in sorted(by_group.items()):
                            clause = (
                                (pc.field("part_id") == p_)
                                & (pc.field("salt") == s_)
                                & pc.field("block_seq").isin(qs)
                            )
                            sel = clause if sel is None else sel | clause
                        flt = flt & sel
                # STREAM row groups instead of materializing the whole
                # block file: task peak memory = one parquet row group
                # + one logical (part, salt) group, independent of file
                # size — a decode task over a multi-GB block file stays
                # inside the warm allocator arena (this host faults
                # fresh pages at ~10 MB/s, and at 100 TB per-task
                # memory must not scale with file size). The predicate
                # runs as a vectorized mask over the (tiny, one row per
                # BLOCK) metadata columns of each row group.
                need_cols = ["part_id", "salt", "block_seq", "column",
                             "payload"]
                if krange is not None and "key_lo" in file_cols:
                    need_cols += ["key_lo", "key_hi"]
                if krange_s is not None and "key_lo_s" in file_cols:
                    need_cols += ["key_lo_s", "key_hi_s"]
                out_cols = ["part_id", "salt", "block_seq", "column",
                            "payload"]
                pf = pq.ParquetFile(path)

                def _split(buf: pa.Table):
                    pids = buf.column("part_id").to_numpy()
                    salts = buf.column("salt").to_numpy()
                    keys = (pids.astype(np.int64) * (1 << 20)
                            + salts.astype(np.int64))
                    return np.concatenate(
                        [[0], np.flatnonzero(keys[1:] != keys[:-1]) + 1,
                         [len(keys)]]
                    )

                meta_cols = [c for c in need_cols if c != "payload"]
                pend = None  # trailing, possibly-incomplete group
                for rg in range(pf.metadata.num_row_groups):
                    # metadata-first: evaluate the whole predicate on
                    # the tiny non-payload columns (one row per BLOCK),
                    # and only read the rg's payload bytes if any block
                    # survives — a pruned or projected decode skips
                    # entire row groups' payload I/O, not just rows
                    meta = pf.read_row_group(rg, columns=meta_cols,
                                             use_threads=False)
                    keep_idx = meta.append_column(
                        "_i", pa.array(range(meta.num_rows), pa.int64())
                    ).filter(flt).column("_i").to_pylist()
                    if not keep_idx:
                        continue
                    t = pf.read_row_group(rg, columns=need_cols,
                                          use_threads=False)
                    if len(keep_idx) < meta.num_rows:
                        t = t.take(pa.array(keep_idx, pa.int64()))
                    t = t.select(out_cols)
                    buf = t if pend is None else pa.concat_tables([pend, t])
                    bounds = _split(buf)
                    # decode every COMPLETE group; the trailing group may
                    # continue into the next row group, so hold it back
                    for s, e in zip(bounds[:-2], bounds[1:-1]):
                        out = decode_group(buf.slice(s, e - s), schema,
                                           column_map)
                        yield from out.to_batches()
                    pend = buf.slice(bounds[-2]).combine_chunks()
                if pend is not None and pend.num_rows:
                    out = decode_group(pend, schema, column_map)
                    yield from out.to_batches()

    # one TASK may stream several block files (the loop above): cap the
    # physical task count at ~2 per core so per-task overhead doesn't
    # dominate when there are many small block files. Round-robin the
    # file list across tasks DRIVER-side (one list per partition via
    # parallelize) — equivalent balance to .repartition(ntasks) without
    # its exchange stage, so the decode plan has ZERO exchanges.
    ntasks = max(1, min(len(files), spark.sparkContext.defaultParallelism * 2))
    groups = [[(p,) for p in files[i::ntasks]] for i in range(ntasks)]
    pdf = spark.createDataFrame(
        spark.sparkContext.parallelize(groups, len(groups)).flatMap(lambda g: g),
        "path string",
    )
    result = pdf.mapInArrow(decode_stream, schema=ddl)
    return _apply_evolution_and_deletes(
        spark, result, out_dir, schema, set(wanted_cols), part_ids,
        as_of, may_have_rows=True, column_map=column_map,
    )


_SPARK_TYPES = {
    pa.int8(): "byte",
    pa.int16(): "short",
    pa.int32(): "int",
    pa.int64(): "long",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "string",
    pa.large_string(): "string",
    pa.binary(): "binary",
    pa.large_binary(): "binary",
    pa.timestamp("us"): "timestamp",
}


def _spark_type_of(t: pa.DataType) -> str:
    if t in _SPARK_TYPES:
        return _SPARK_TYPES[t]
    if pa.types.is_timestamp(t):
        return "timestamp"
    raise TypeError(f"unsupported type {t}")


def roundtrip_df(
    spark: SparkSession,
    source_path: str,
    key_col: str,
    columns: list[str] | None = None,
    forced_codecs: dict[str, str] | None = None,
    num_parts: int = 8,
    out_dir: str | None = None,
    exchange: str = "range",
) -> DataFrame:
    """Encode source -> blocks -> decode; returns the decoded DataFrame.

    The driver-contract queries use this to prove end-to-end round-trip
    identity per scheme against a DuckDB oracle reading the raw source.
    """
    import atexit
    import tempfile

    import pyarrow.parquet as pq

    out = out_dir
    if out is None:
        # the returned DataFrame reads these blocks lazily, so the dir
        # must outlive this call — reclaim it at process exit instead
        # of leaking a full encoded copy of the table under /tmp
        out = tempfile.mkdtemp(prefix="lgs_rt_")
        atexit.register(shutil.rmtree, out, ignore_errors=True)
    if os.path.exists(os.path.join(out, "manifest.jsonl")):
        shutil.rmtree(out)
    schema = pq.read_schema(source_path)
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    encode_snapshot(
        spark,
        source_path,
        out,
        key_col=key_col,
        num_parts=num_parts,
        forced_codecs=forced_codecs,
        columns=columns,
        exchange=exchange,
    )
    dec = decode_blocks(spark, out, schema)
    keep = columns or [f.name for f in schema]
    return dec.select(*keep)


def verify_roundtrip(
    source: DataFrame, decoded: DataFrame, key_col: str, columns: list[str] | None = None
) -> dict:
    """Join decoded rows to the source on the key and count per-column
    mismatches (null-safe equality; bytes compared exactly). All-zero
    result = bit-identical round-trip (BASELINE.json:15)."""
    cols = columns or [c for c in source.columns if c not in ("part_id",)]
    s = source.select([F.col(c).alias(f"s_{c}") for c in cols])
    d = decoded.select([F.col(c).alias(f"d_{c}") for c in cols])
    j = s.join(d, F.col(f"s_{key_col}") == F.col(f"d_{key_col}"), "full_outer")
    aggs = [
        F.sum(
            F.when(~F.col(f"s_{c}").eqNullSafe(F.col(f"d_{c}")), 1).otherwise(0)
        ).alias(c)
        for c in cols
    ]
    row = j.agg(*aggs).collect()[0]
    mismatches = {c: int(row[c] or 0) for c in cols}
    n_source = source.count()
    n_decoded = decoded.count()
    return {
        "rows_source": n_source,
        "rows_decoded": n_decoded,
        "mismatches": mismatches,
        "ok": n_source == n_decoded and all(v == 0 for v in mismatches.values()),
    }
