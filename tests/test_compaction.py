"""Compaction (Iceberg rewrite_data_files analogue) + vacuum: small
chunk dirs merge into consolidated block files with full row fidelity,
old dirs stay for time travel until vacuumed."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import (
    blocks_df,
    compact_blocks,
    decode_blocks,
    encode_snapshot,
    vacuum_blocks,
    verify_roundtrip,
)
from libgiddy_spark.manifest import Manifest

SF = "/root/testdata/sf0.001"


def _encode_many_chunks(spark, tmp_path, n_files=6):
    src = str(tmp_path / "src")
    spark.read.parquet(f"{SF}/documents.parquet").repartition(
        n_files
    ).write.parquet(src)
    out = str(tmp_path / "enc")
    # chunk_parts=1 -> one chunk dir per source file (streaming shape)
    encode_snapshot(spark, src, out, key_col="doc_id", chunk_parts=1)
    return src, out


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    src, out = _encode_many_chunks(spark, tmp_path)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    before = decode_blocks(spark, out, schema)
    n_before = before.count()
    files_before = len(glob.glob(out + "/blocks/chunk-*/*.parquet"))
    res = compact_blocks(spark, out, target_file_bytes=64 << 20)
    assert res["bins"] >= 1
    assert res["files_after"] < res["files_before"]
    after = decode_blocks(spark, out, schema)
    assert after.count() == n_before
    rep = verify_roundtrip(spark.read.parquet(src), after, "doc_id")
    assert rep["ok"], rep
    # live blocks view is manifest-driven: no double counting while the
    # replaced dirs still exist on disk
    assert os.path.isdir(glob.glob(out + "/blocks/chunk-*")[0])
    total_vals = (
        blocks_df(spark, out).groupBy("column")
        .agg(F.sum("n_values").alias("n"))
        .collect()
    )
    assert all(r["n"] == n_before for r in total_vals)


def test_compact_time_travel_and_vacuum(spark, tmp_path):
    src, out = _encode_many_chunks(spark, tmp_path)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    snap = [e["snapshot_id"] for e in Manifest(out).read()
            if e.get("kind") == "snapshot"][-1]
    compact_blocks(spark, out, target_file_bytes=64 << 20)
    # HEAD as_of sees the compacted layout; it still equals the data
    dec = decode_blocks(spark, out, schema, as_of=snap)
    assert dec.count() == 500
    vac = vacuum_blocks(out)
    assert vac["removed"]  # replaced dirs physically gone
    # head decode still works from the compacted files
    assert decode_blocks(spark, out, schema).count() == 500
    # the rewrite is visible at HEAD snapshot, so as_of=snap uses the
    # compacted dir and still works post-vacuum
    assert decode_blocks(spark, out, schema, as_of=snap).count() == 500


def test_vacuumed_time_travel_raises_not_loses_rows(spark, tmp_path):
    """A snapshot that NEEDS vacuumed dirs must raise, never silently
    return fewer rows: encode snapshot A (chunked), append snapshot B,
    compact ALL, vacuum, then as_of=A -- A's chunks were replaced by a
    rewrite committed under B's snapshot, so A cannot use the compacted
    file and must fail loudly."""
    src = str(tmp_path / "grow")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.filter(F.col("doc_id") < 250).repartition(3).write.parquet(src)
    out = str(tmp_path / "enc")
    encode_snapshot(spark, src, out, key_col="doc_id", chunk_parts=1)
    snap_a = [e["snapshot_id"] for e in Manifest(out).read()
              if e.get("kind") == "snapshot"][-1]
    docs.filter(F.col("doc_id") >= 250).repartition(2).write.mode(
        "append").parquet(src)
    encode_snapshot(spark, src, out, key_col="doc_id", chunk_parts=1)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    assert decode_blocks(spark, out, schema, as_of=snap_a).count() == 250
    compact_blocks(spark, out, target_file_bytes=64 << 20)
    vacuum_blocks(out)
    assert decode_blocks(spark, out, schema).count() == 500
    with pytest.raises(ValueError, match="vacuum|removed"):
        decode_blocks(spark, out, schema, as_of=snap_a).count()


def test_compact_pruned_decode_still_prunes(spark, tmp_path):
    """Zone-map pruned decode through a compacted file: per-block zone
    maps travel with the rows, so key-range decode stays exact."""
    src, out = _encode_many_chunks(spark, tmp_path)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    compact_blocks(spark, out, target_file_bytes=64 << 20)
    dec = decode_blocks(spark, out, schema, key_range=(100, 120))
    got = dec.filter(F.col("doc_id").between(100, 120)).count()
    assert got == 21
    assert decode_blocks(spark, out, schema,
                         key_range=(10**9, 2 * 10**9)).count() == 0


def test_streaming_microbatches_then_compact(spark, tmp_path):
    """The operational story end-to-end: micro-batch streaming encode
    (one chunk dir per batch), compaction bin-packs them, decode stays
    bit-identical — compaction is the companion of streaming ingestion."""
    import shutil

    from libgiddy_spark.streaming import encode_stream

    src = str(tmp_path / "arrivals")
    os.makedirs(src)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # four "arrivals"
    staged = str(tmp_path / "staged")
    docs.repartition(4).write.parquet(staged)
    for i, f in enumerate(sorted(
            x for x in os.listdir(staged) if x.endswith(".parquet"))):
        shutil.copy(os.path.join(staged, f), os.path.join(src, f"a{i}.parquet"))
    out = str(tmp_path / "enc")
    q = encode_stream(spark, src, out, key_col="doc_id",
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      max_files_per_trigger=1, chunk_parts=1)
    q.awaitTermination()
    n_dirs = len(glob.glob(out + "/blocks/chunk-*"))
    assert n_dirs == 4  # one chunk dir per micro-batch file
    res = compact_blocks(spark, out, target_file_bytes=64 << 20)
    assert res["bins"] >= 1 and res["files_after"] < res["files_before"]
    schema = pq.read_schema(f"{SF}/documents.parquet")
    dec = decode_blocks(spark, out, schema)
    rep = verify_roundtrip(docs, dec, "doc_id")
    assert rep["ok"], rep
    vacuum_blocks(out)
    rep2 = verify_roundtrip(docs, decode_blocks(spark, out, schema), "doc_id")
    assert rep2["ok"], rep2
