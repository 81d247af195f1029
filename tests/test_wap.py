"""Write-Audit-Publish (WAP) staged snapshots — the Iceberg
stage/cherry-pick workflow over the manifest: encode off-branch,
audit the real encoded files via as_of, then publish (fast-forward)
or abort (vacuum reclaims)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import (
    abort_snapshot,
    create_ref,
    decode_blocks,
    delete_rows,
    encode_snapshot,
    publish_snapshot,
    read_changes,
    vacuum_blocks,
)
from libgiddy_spark.manifest import Manifest

SF = "/root/testdata/sf0.001"


def _snaps(out):
    seen = []
    for e in Manifest(out).read():
        if e.get("kind") == "snapshot" and e["snapshot_id"] not in seen:
            seen.append(e["snapshot_id"])
    return seen


def _append_file(spark, docs, src, tmp_path, name, lo, hi):
    stage = str(tmp_path / f"_stage_{name}")
    docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)) \
        .coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.rename(os.path.join(stage, part), os.path.join(src, name))


def _base_table(spark, tmp_path, n=250):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") < n).coalesce(1).write.parquet(src)
    out = str(tmp_path / "enc")
    encode_snapshot(spark, src, out, key_col="doc_id")
    return docs, src, out, pq.read_schema(f"{SF}/documents.parquet")


def test_wap_stage_audit_publish(spark, tmp_path):
    docs, src, out, schema = _base_table(spark, tmp_path)
    _append_file(spark, docs, src, tmp_path, "b.parquet", 250, 500)
    encode_snapshot(spark, src, out, key_col="doc_id", wap_staged=True)
    base, staged = _snaps(out)
    # HEAD excludes the staged snapshot until publish
    assert decode_blocks(spark, out, schema).count() == 250
    # the audit read sees base + staged rows — on the real encoded files
    audit = decode_blocks(spark, out, schema, as_of=staged)
    assert audit.count() == 500
    assert audit.agg(F.countDistinct("doc_id")).first()[0] == 500
    # default-HEAD ref while staged: points at the main branch, not
    # the staged header
    assert create_ref(out, "pre")["snapshot_id"] == base
    publish_snapshot(out, staged)
    assert decode_blocks(spark, out, schema).count() == 500
    # time travel to the base snapshot still works post-publish
    assert decode_blocks(spark, out, schema, as_of=base).count() == 250


def test_wap_cherry_pick_ordering(spark, tmp_path):
    """A snapshot committed BETWEEN stage and publish never sees the
    staged rows, and the changelog reports the staged insert at its
    publish position — Iceberg cherry-pick semantics."""
    docs, src, out, schema = _base_table(spark, tmp_path)
    _append_file(spark, docs, src, tmp_path, "b.parquet", 250, 375)
    encode_snapshot(spark, src, out, key_col="doc_id", wap_staged=True)
    _append_file(spark, docs, src, tmp_path, "c.parquet", 375, 500)
    encode_snapshot(spark, src, out, key_col="doc_id")  # published now
    base, staged, mid = _snaps(out)
    # mid committed after the stage, before publish: no staged rows
    assert decode_blocks(spark, out, schema, as_of=mid).count() == 375
    publish_snapshot(out, staged)
    assert decode_blocks(spark, out, schema).count() == 500
    assert decode_blocks(spark, out, schema, as_of=mid).count() == 375
    # audit-position reads are gone once published: as_of=staged now
    # means "main chain up to the publish point" = everything
    assert decode_blocks(spark, out, schema, as_of=staged).count() == 500
    # changelog: staged insert appears in the window AFTER mid
    ch = read_changes(spark, out, schema, mid)
    assert ch.count() == 125
    assert set(r[0] for r in ch.select("_change_type").distinct().collect()) \
        == {"insert"}
    lo, hi = ch.agg(F.min("doc_id"), F.max("doc_id")).first()
    assert (lo, hi) == (250, 374)


def test_wap_abort_and_vacuum(spark, tmp_path):
    docs, src, out, schema = _base_table(spark, tmp_path)
    _append_file(spark, docs, src, tmp_path, "b.parquet", 250, 500)
    encode_snapshot(spark, src, out, key_col="doc_id", wap_staged=True)
    base, staged = _snaps(out)
    staged_dirs = {
        e["chunk_dir"] for e in Manifest(out).read()
        if e.get("kind") in ("part", "chunk")
        and e.get("snapshot_id") == staged and e.get("chunk_dir")
    }
    assert staged_dirs
    # vacuum BEFORE abort must not touch the staged files (pinned)
    vacuum_blocks(out)
    for d in staged_dirs:
        assert os.path.isdir(os.path.join(out, "blocks", d))
    assert decode_blocks(spark, out, schema, as_of=staged).count() == 500
    assert abort_snapshot(out, staged) == {
        "snapshot_id": staged, "aborted": True}
    assert abort_snapshot(out, staged)["aborted"] is True  # idempotent
    with pytest.raises(ValueError, match="aborted"):
        decode_blocks(spark, out, schema, as_of=staged).count()
    with pytest.raises(ValueError, match="aborted"):
        publish_snapshot(out, staged)
    assert decode_blocks(spark, out, schema).count() == 250
    removed = vacuum_blocks(out)["removed"]
    assert staged_dirs <= set(removed)
    for d in staged_dirs:
        assert not os.path.isdir(os.path.join(out, "blocks", d))
    assert decode_blocks(spark, out, schema).count() == 250


def test_wap_reencode_after_abort(spark, tmp_path):
    """An aborted snapshot's source files become re-encodable again —
    done-ness must not survive the abort, or the rows would be lost
    forever (file skipped as done, data invisible at HEAD)."""
    docs, src, out, schema = _base_table(spark, tmp_path)
    _append_file(spark, docs, src, tmp_path, "b.parquet", 250, 500)
    encode_snapshot(spark, src, out, key_col="doc_id", wap_staged=True)
    staged = _snaps(out)[1]
    abort_snapshot(out, staged)
    # same source files, normal encode: b.parquet must re-encode
    summary = encode_snapshot(spark, src, out, key_col="doc_id")
    assert summary["encoded_parts"] == 1
    head = decode_blocks(spark, out, schema)
    assert head.count() == 500
    assert head.agg(F.countDistinct("doc_id")).first()[0] == 500


def test_wap_errors(spark, tmp_path):
    docs, src, out, schema = _base_table(spark, tmp_path)
    base = _snaps(out)[0]
    with pytest.raises(ValueError, match="not staged"):
        publish_snapshot(out, base)
    with pytest.raises(ValueError, match="not staged"):
        abort_snapshot(out, base)
    with pytest.raises(ValueError, match="unknown snapshot"):
        publish_snapshot(out, "nope")
    _append_file(spark, docs, src, tmp_path, "b.parquet", 250, 500)
    encode_snapshot(spark, src, out, key_col="doc_id", wap_staged=True)
    staged = _snaps(out)[1]
    publish_snapshot(out, staged)
    with pytest.raises(ValueError, match="already published"):
        publish_snapshot(out, staged)
    with pytest.raises(ValueError, match="already published"):
        abort_snapshot(out, staged)


def test_wap_sequence_scoping_of_deletes(spark, tmp_path):
    """A tombstone committed BEFORE the stage never erases the staged
    snapshot's freshly written rows (Iceberg sequence ordering), in
    both the audit read and the published table."""
    docs, src, out, schema = _base_table(spark, tmp_path)
    # tombstone keys 250-299 — rows that don't exist yet, but will be
    # (re)ingested by the staged append
    delete_rows(out, "doc_id", list(range(250, 300)))
    _append_file(spark, docs, src, tmp_path, "b.parquet", 250, 500)
    encode_snapshot(spark, src, out, key_col="doc_id", wap_staged=True)
    staged = _snaps(out)[-1]
    audit = decode_blocks(spark, out, schema, as_of=staged)
    assert audit.count() == 500  # staged rows survive the older delete
    publish_snapshot(out, staged)
    head = decode_blocks(spark, out, schema)
    assert head.count() == 500
    assert head.filter(F.col("doc_id").between(250, 299)).count() == 50
