"""Shuffle-free direct encode path (engine.encode_files
exchange='direct'): correctness vs the range path, skew fan-out via
row-group slicing, plan shape, resume."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import (
    _balanced_bounds,
    blocks_df,
    decode_blocks,
    encode_snapshot,
    verify_roundtrip,
)

SF = "/root/testdata/sf0.001"


def test_balanced_bounds():
    assert _balanced_bounds([1, 1, 1, 1], 2) == [(0, 2), (2, 4)]
    assert _balanced_bounds([10, 1, 1, 1], 2) == [(0, 1), (1, 4)]
    assert _balanced_bounds([5], 4) == [(0, 1)]
    assert _balanced_bounds([1, 1], 5) == [(0, 1), (1, 2)]
    b = _balanced_bounds([3, 1, 4, 1, 5, 9, 2, 6], 3)
    assert [lo for lo, _ in b] == [0] + [hi for _, hi in b[:-1]]
    assert b[-1][1] == 8 and len(b) == 3


@pytest.mark.parametrize("table,key", [("documents", "doc_id"),
                                       ("events", "event_id")])
def test_direct_roundtrip_bit_identical(spark, tmp_path, table, key):
    src = f"{SF}/{table}.parquet"
    out = str(tmp_path / f"d_{table}")
    encode_snapshot(spark, src, out, key_col=key, exchange="direct")
    dec = decode_blocks(spark, out, pq.read_schema(src))
    rep = verify_roundtrip(spark.read.parquet(src), dec, key)
    assert rep["ok"], rep


def test_direct_matches_range_blocks_semantics(spark, tmp_path):
    """Both paths produce decodable, bit-identical tables with zone
    maps and blooms; compressed size is equivalent (same codecs)."""
    src = f"{SF}/documents.parquet"
    sizes = {}
    for mode in ("range", "direct"):
        out = str(tmp_path / mode)
        encode_snapshot(spark, src, out, key_col="doc_id", exchange=mode)
        b = blocks_df(spark, out)
        assert b.filter(F.col("key_lo").isNotNull()).count() > 0
        assert b.filter(F.col("key_bloom").isNotNull()).count() > 0
        sizes[mode] = int(b.agg(F.sum("enc_bytes")).collect()[0][0])
        dec = decode_blocks(spark, out, pq.read_schema(src))
        assert verify_roundtrip(spark.read.parquet(src), dec, "doc_id")["ok"]
    # direct's salt slices are CONTIGUOUS row-group runs, range's are
    # hash-interleaved — so direct preserves run structure and should
    # never compress materially worse (measured: 20%+ smaller here)
    assert sizes["direct"] <= sizes["range"] * 1.02, sizes


def test_direct_skew_fans_out_row_groups(spark, tmp_path):
    """A file bigger than the salt target splits into multiple
    (part, salt) tasks along row-group boundaries."""
    src_dir = str(tmp_path / "rg_src")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # many small row groups so the slicer has boundaries to use
    (docs.coalesce(1).write.option("parquet.block.size", 16 * 1024)
     .parquet(src_dir))
    out = str(tmp_path / "rg_out")
    encode_snapshot(spark, src_dir, out, key_col="doc_id",
                    exchange="direct", target_salt_bytes=16 * 1024)
    b = blocks_df(spark, out)
    n_salts = b.select("salt").distinct().count()
    assert n_salts > 1  # actually fanned out
    dec = decode_blocks(spark, out, pq.read_schema(f"{SF}/documents.parquet"))
    assert verify_roundtrip(spark.read.parquet(src_dir), dec, "doc_id")["ok"]


def test_direct_row_slice_fallback_single_row_group(spark, tmp_path):
    """A file with ONE giant row group still fans out: tasks take
    row-range slices of the covering row group (bounded read
    amplification instead of one skew-bound task)."""
    src = f"{SF}/documents.parquet"  # single file, single row group
    md = pq.ParquetFile(src).metadata
    assert md.num_row_groups == 1  # precondition for the fallback path
    out = str(tmp_path / "rows")
    encode_snapshot(spark, src, out, key_col="doc_id",
                    exchange="direct", target_salt_bytes=16 * 1024)
    b = blocks_df(spark, out)
    assert b.select("salt").distinct().count() > 1
    dec = decode_blocks(spark, out, pq.read_schema(src))
    rep = verify_roundtrip(spark.read.parquet(src), dec, "doc_id")
    assert rep["ok"], rep


def test_row_range_stream_slice_exact(tmp_path):
    """The row-range fallback's streaming read (early stop at the
    task's upper bound) must yield exactly rows [row_lo, row_hi) of
    the covering span, for ranges NOT aligned to reader batch or
    row-group boundaries — the offset math slices the first kept
    batch, not the file head."""
    import pyarrow as pa

    from libgiddy_spark.blocks import make_direct_encoder, plan_one_file

    n = 1000
    src = str(tmp_path / "t.parquet")
    tbl = pa.table({"k": pa.array(range(n), pa.int64())})
    pq.write_table(tbl, src, row_group_size=300)  # 4 row groups
    pf = pq.ParquetFile(src)
    plan = {0: {c: (codec, params, ft)
                for c, codec, params, ft in plan_one_file(src, ["k"])}}
    enc = make_direct_encoder(["k"], sort_key="k", plan=plan)
    # spans chosen to start/end mid-row-group (rg bounds: 300/600/900)
    for rg_lo, rg_hi, rlo, rhi in [(0, 4, 123, 877), (1, 3, 50, 599),
                                   (0, 1, 0, 300), (3, 4, 1, 99)]:
        base = sum(pf.metadata.row_group(g).num_rows for g in range(rg_lo))
        task = pa.RecordBatch.from_pydict({
            "part_id": [0], "salt": [0], "rg_lo": [rg_lo],
            "rg_hi": [rg_hi], "row_lo": [rlo], "row_hi": [rhi],
            "path": [src]})
        outs = list(enc(iter([task])))
        nv = sum(v for b in outs
                 for c, v in zip(b.column(3).to_pylist(),
                                 b.column(6).to_pylist()) if c == "k")
        assert nv == rhi - rlo, (rg_lo, rg_hi, rlo, rhi, nv)
        # zone map pins the exact rows, not just the count
        klo = min(v for b in outs for v in b.column(11).to_pylist()
                  if v is not None)
        khi = max(v for b in outs for v in b.column(12).to_pylist()
                  if v is not None)
        assert (klo, khi) == (base + rlo, base + rhi - 1)


def test_direct_plan_moves_no_source_rows(spark):
    """The direct encode plan's only exchange is the round-robin of the
    tiny task list — no scan of the source table feeds an exchange
    (mirrors the decode-side shuffle-free plan guard)."""
    from libgiddy_spark.blocks import BLOCKS_DDL, make_direct_encoder

    src = f"{SF}/documents.parquet"
    tasks = [(0, 0, 0, 1, src)]
    tdf = spark.createDataFrame(
        tasks, "part_id int, salt int, rg_lo int, rg_hi int, path string"
    ).repartition(len(tasks))
    enc = tdf.mapInArrow(
        make_direct_encoder(["doc_id", "text"], sort_key="doc_id"),
        schema=BLOCKS_DDL,
    )
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    # the input side is a local task list, not a parquet scan
    assert "FileScan" not in plan and "parquet" not in plan.lower(), plan


def test_direct_resume_skips_done_parts(spark, tmp_path):
    src_dir = str(tmp_path / "multi")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.repartition(4).write.parquet(src_dir)
    out = str(tmp_path / "resume")
    s1 = encode_snapshot(spark, src_dir, out, key_col="doc_id",
                         exchange="direct")
    assert s1["encoded_parts"] == 4
    s2 = encode_snapshot(spark, src_dir, out, key_col="doc_id",
                         exchange="direct")
    assert s2["encoded_parts"] == 0 and s2["skipped_done"] == 4
    dec = decode_blocks(spark, out, pq.read_schema(f"{SF}/documents.parquet"))
    assert dec.count() == docs.count()


def test_direct_commit_by_list(spark, tmp_path):
    """r6 task-side writes: the chunk dir's _FILES marker IS the
    committed file set — a stray parquet file planted in the dir (a
    zombie task attempt's leftover) is invisible to decode, and a
    listed-but-missing file fails loudly instead of silently losing
    rows."""
    src = f"{SF}/documents.parquet"
    out = str(tmp_path / "cbl")
    encode_snapshot(spark, src, out, key_col="doc_id", exchange="direct")
    schema = pq.read_schema(src)
    n = decode_blocks(spark, out, schema).count()
    blocks = os.path.join(out, "blocks")
    chunk = next(d for d in os.listdir(blocks) if d.startswith("chunk-"))
    cdir = os.path.join(blocks, chunk)
    listed = sorted(
        x.strip()
        for x in open(os.path.join(cdir, "_FILES")).read().splitlines()
        if x.strip()
    )
    on_disk = sorted(f for f in os.listdir(cdir) if f.endswith(".parquet"))
    assert listed == on_disk  # driver committed exactly the task set
    # 1) stray file (duplicate payload!) is ignored by decode
    import shutil as _sh

    _sh.copy(os.path.join(cdir, listed[0]),
             os.path.join(cdir, "task-deadbeef-zombie.parquet"))
    assert decode_blocks(spark, out, schema).count() == n
    # 2) a listed file missing on disk = corruption -> loud error
    os.remove(os.path.join(cdir, listed[0]))
    with pytest.raises(ValueError, match="missing on disk"):
        decode_blocks(spark, out, schema).count()
