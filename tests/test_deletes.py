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


def test_delete_then_append_still_tombstoned(spark, tmp_path):
    """Global-tombstone semantics: a re-ingested key stays deleted
    until a purge clears the tombstone (documented divergence from
    Iceberg sequence scoping — strictly conservative)."""
    src, out, schema = _encode_docs(spark, tmp_path)
    delete_rows(out, "doc_id", [7])
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.filter(F.col("doc_id") == 7).coalesce(1).write.mode(
        "append").parquet(src)
    encode_snapshot(spark, src, out, key_col="doc_id")
    dec = decode_blocks(spark, out, schema)
    assert dec.filter(F.col("doc_id") == 7).count() == 0
    assert dec.count() == 499


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
