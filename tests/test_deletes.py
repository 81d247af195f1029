"""Equality deletes (Iceberg merge-on-read), purge materialization, and
their interaction with time travel and vacuum."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import (
    decode_blocks,
    delete_rows,
    encode_snapshot,
    purge_deletes,
    vacuum_blocks,
    verify_roundtrip,
)
from libgiddy_spark.manifest import Manifest

SF = "/root/testdata/sf0.001"


def _encode_docs(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.read.parquet(f"{SF}/documents.parquet").repartition(
        3).write.parquet(src)
    out = str(tmp_path / "enc")
    encode_snapshot(spark, src, out, key_col="doc_id")
    return src, out, pq.read_schema(f"{SF}/documents.parquet")


def test_merge_on_read_delete(spark, tmp_path):
    src, out, schema = _encode_docs(spark, tmp_path)
    snap = [e["snapshot_id"] for e in Manifest(out).read()
            if e.get("kind") == "snapshot"][-1]
    gone = [5, 17, 123, 499]
    delete_rows(out, "doc_id", gone)
    dec = decode_blocks(spark, out, schema)
    assert dec.count() == 500 - len(gone)
    assert dec.filter(F.col("doc_id").isin(gone)).count() == 0
    # surviving rows still bit-identical
    srcdf = spark.read.parquet(src).filter(~F.col("doc_id").isin(gone))
    rep = verify_roundtrip(srcdf, dec, "doc_id")
    assert rep["ok"], rep
    # time travel BEFORE the delete sees all rows (tombstone-free read)
    assert decode_blocks(spark, out, schema, as_of=snap).count() == 500


def test_delete_on_unprojected_key_raises(spark, tmp_path):
    import pyarrow as pa

    src, out, schema = _encode_docs(spark, tmp_path)
    delete_rows(out, "doc_id", [1])
    proj = pa.schema([schema.field("text")])  # excludes doc_id
    with pytest.raises(ValueError, match="tombstones on column"):
        decode_blocks(spark, out, proj).count()


def test_large_delete_set_shuffles_not_broadcasts(spark, tmp_path):
    """Past LGS_DELETE_BROADCAST_MAX_KEYS the tombstone anti-join must
    NOT broadcast (a GDPR-scale purge wave would OOM the driver and
    every executor) — the plan shifts to a shuffled hash anti-join,
    rows stay exact (VERDICT r4 #3)."""
    src, out, schema = _encode_docs(spark, tmp_path)
    gone = [3, 77, 200, 404]
    delete_rows(out, "doc_id", gone)
    os.environ["LGS_DELETE_BROADCAST_MAX_KEYS"] = "2"
    try:
        dec = decode_blocks(spark, out, schema)
        plan = dec._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan, plan
        assert dec.count() == 500 - len(gone)
        assert dec.filter(F.col("doc_id").isin(gone)).count() == 0
        srcdf = spark.read.parquet(src).filter(~F.col("doc_id").isin(gone))
        assert verify_roundtrip(srcdf, dec, "doc_id")["ok"]
        # below the threshold the broadcast path is kept
        os.environ["LGS_DELETE_BROADCAST_MAX_KEYS"] = "1000000"
        plan_small = decode_blocks(spark, out, schema)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastExchange" in plan_small, plan_small
    finally:
        del os.environ["LGS_DELETE_BROADCAST_MAX_KEYS"]


def test_purge_materializes_and_vacuum_expires(spark, tmp_path):
    src, out, schema = _encode_docs(spark, tmp_path)
    pre_snap = [e["snapshot_id"] for e in Manifest(out).read()
                if e.get("kind") == "snapshot"][-1]
    gone = list(range(0, 500, 7))
    delete_rows(out, "doc_id", gone)
    res = purge_deletes(spark, out, schema, key_col="doc_id")
    assert res["rewritten"] and res["purged_files"] == 1
    # post-purge read: no anti-join needed, same surviving rows,
    # projection excluding the key now works again
    dec = decode_blocks(spark, out, schema)
    assert dec.count() == 500 - len(gone)
    import pyarrow as pa

    proj = pa.schema([schema.field("text")])
    assert decode_blocks(spark, out, proj).count() == 500 - len(gone)
    srcdf = spark.read.parquet(src).filter(~F.col("doc_id").isin(gone))
    rep = verify_roundtrip(srcdf, dec, "doc_id")
    assert rep["ok"], rep
    # time travel: before the delete -> all rows from the retired dirs
    assert decode_blocks(spark, out, schema, as_of=pre_snap).count() == 500
    vac = vacuum_blocks(out)
    assert vac["removed"]
    # post-vacuum HEAD still fine; pre-purge time travel raises loudly
    assert decode_blocks(spark, out, schema).count() == 500 - len(gone)
    with pytest.raises(ValueError):
        decode_blocks(spark, out, schema, as_of=pre_snap).count()


def test_time_travel_to_vacuumed_delete_raises_clearly(spark, tmp_path):
    """Time travel to the delete snapshot (between delete and purge)
    after vacuum removed the cleared delete file must raise the same
    explicit vacuumed/expired ValueError as the missing-chunk-dir case,
    not a raw Spark path-not-found."""
    src, out, schema = _encode_docs(spark, tmp_path)
    d = delete_rows(out, "doc_id", [1, 2, 3])
    purge_deletes(spark, out, schema, key_col="doc_id")
    vacuum_blocks(out)
    with pytest.raises(ValueError, match="vacuumed/expired"):
        decode_blocks(spark, out, schema, as_of=d["snapshot_id"]).count()


def test_vacuum_expires_orphaned_staged_purge(spark, tmp_path):
    """A purge that crashed after its staged encode (simulated: a
    staged encode_files with no promoting txn) leaves staged part
    entries + chunk dirs. vacuum_blocks sweeps the dirs and marks the
    snapshot expired in one staged_expire line; reads never change."""
    from libgiddy_spark.engine import encode_files
    from libgiddy_spark.table_io import list_parquet_files

    src, out, schema = _encode_docs(spark, tmp_path)
    # simulate the crashed purge's staged encode: different source dir
    # (like _purge_src) so parts are new registry entries
    src2 = str(tmp_path / "crashed_purge_src")
    spark.read.parquet(src).filter(F.col("doc_id") < 100).coalesce(
        1).write.parquet(src2)
    summary = encode_files(spark, src2, list_parquet_files(src2), out,
                           "doc_id", commit_status="staged")
    staged_dirs = {
        e["chunk_dir"] for e in Manifest(out).read()
        if e.get("kind") == "part" and e.get("status") == "staged"
        and e.get("chunk_dir")
    }
    assert staged_dirs
    assert decode_blocks(spark, out, schema).count() == 500  # invisible
    vac = vacuum_blocks(out)
    assert summary["snapshot_id"] in vac["expired_staged"]
    for d in staged_dirs:
        assert not os.path.isdir(os.path.join(out, "blocks", d))
    assert any(e.get("kind") == "staged_expire"
               for e in Manifest(out).read())
    assert decode_blocks(spark, out, schema).count() == 500
    # idempotent: a second vacuum does not re-mark
    assert vacuum_blocks(out)["expired_staged"] == []


def test_blocks_df_empty_when_nothing_committed(spark, tmp_path):
    """blocks_df must honour its LIVE-at-HEAD contract when the
    committed listing is empty (crashed first encode): empty frame,
    never a raw directory scan that could surface staged files."""
    from libgiddy_spark.engine import blocks_df

    out = str(tmp_path / "empty_tbl")
    os.makedirs(os.path.join(out, "blocks", "stray"))
    # a stray uncommitted block file must stay invisible
    spark.range(1).select(
        F.lit(1).alias("part_id")).write.parquet(
        os.path.join(out, "blocks", "stray", "junk"))
    bdf = blocks_df(spark, out)
    assert bdf.count() == 0
    assert "payload" in bdf.columns


def test_delete_then_append_sequence_scoped(spark, tmp_path):
    """Iceberg sequence scoping (round 5): a delete applies only to
    parts committed strictly before it, so a key re-ingested AFTER the
    delete survives — and a second delete after the re-ingest removes
    it again."""
    src, out, schema = _encode_docs(spark, tmp_path)
    delete_rows(out, "doc_id", [7])
    assert decode_blocks(spark, out, schema).count() == 499
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.filter(F.col("doc_id") == 7).coalesce(1).write.mode(
        "append").parquet(src)
    encode_snapshot(spark, src, out, key_col="doc_id")
    dec = decode_blocks(spark, out, schema)
    assert dec.filter(F.col("doc_id") == 7).count() == 1
    assert dec.count() == 500
    # other pre-delete keys stay deleted by the same tombstone
    delete_rows(out, "doc_id", [7])
    dec2 = decode_blocks(spark, out, schema)
    assert dec2.filter(F.col("doc_id") == 7).count() == 0
    assert dec2.count() == 499


def test_purge_crash_before_txn_is_invisible(spark, tmp_path, monkeypatch):
    """Atomicity: if purge crashes after the staged re-encode but BEFORE
    the commit txn, readers see exactly the pre-purge state (old rows,
    deletes still applied) — never doubled rows — and a re-run purge
    completes cleanly."""
    from libgiddy_spark import engine as E
    from libgiddy_spark.manifest import Manifest

    src, out, schema = _encode_docs(spark, tmp_path)
    gone = [1, 2, 3]
    delete_rows(out, "doc_id", gone)

    orig = Manifest.commit_txn

    def dying_txn(self, entries):
        raise RuntimeError("simulated crash before purge txn")

    monkeypatch.setattr(Manifest, "commit_txn", dying_txn)
    with pytest.raises(RuntimeError):
        purge_deletes(spark, out, schema, key_col="doc_id")
    monkeypatch.setattr(Manifest, "commit_txn", orig)
    # pre-purge state intact: no duplicates, deletes still merge-on-read
    dec = decode_blocks(spark, out, schema)
    assert dec.count() == 497
    assert dec.filter(F.col("doc_id").isin(gone)).count() == 0
    # re-run completes and the table stays exact
    res = purge_deletes(spark, out, schema, key_col="doc_id")
    assert res["rewritten"]
    dec2 = decode_blocks(spark, out, schema)
    assert dec2.count() == 497
    srcdf = spark.read.parquet(src).filter(~F.col("doc_id").isin(gone))
    rep = verify_roundtrip(srcdf, dec2, "doc_id")
    assert rep["ok"], rep
