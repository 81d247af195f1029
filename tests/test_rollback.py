"""Rollback / set-current-snapshot (Iceberg rollback_to analogue):
HEAD rewind, roll-forward, history preservation, maintenance + CDC
interaction."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import (
    compact_blocks,
    create_ref,
    decode_blocks,
    delete_rows,
    encode_snapshot,
    list_refs,
    read_changes,
    rollback,
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


def _grow(spark, tmp_path, out, src, lo, hi, name):
    """Append documents rows [lo, hi) to src and encode a snapshot."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stage = str(tmp_path / f"stage_{name}")
    docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)) \
        .coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.rename(os.path.join(stage, part),
              os.path.join(src, f"{name}.parquet"))
    encode_snapshot(spark, src, out, key_col="doc_id")


def _three_snapshot_table(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") < 200).coalesce(1).write.parquet(src)
    out = str(tmp_path / "enc")
    encode_snapshot(spark, src, out, key_col="doc_id")
    _grow(spark, tmp_path, out, src, 200, 350, "b")
    _grow(spark, tmp_path, out, src, 350, 500, "c")
    return out, src, pq.read_schema(f"{SF}/documents.parquet")


def test_rollback_head_and_history(spark, tmp_path):
    out, _src, schema = _three_snapshot_table(spark, tmp_path)
    s1, s2, s3 = _snaps(out)
    assert decode_blocks(spark, out, schema).count() == 500

    res = rollback(out, s1)
    assert res["current_snapshot"] == s1 and res["changed"]
    assert set(res["hidden"]) == {s2, s3}
    # HEAD rewinds; history stays exact
    assert decode_blocks(spark, out, schema).count() == 200
    assert decode_blocks(spark, out, schema, as_of=s2).count() == 350
    assert decode_blocks(spark, out, schema, as_of=s3).count() == 500
    # idempotent no-op at the target
    assert rollback(out, s1) == {"current_snapshot": s1, "changed": False}


def test_roll_forward(spark, tmp_path):
    out, _src, schema = _three_snapshot_table(spark, tmp_path)
    s1, s2, s3 = _snaps(out)
    rollback(out, s1)
    res = rollback(out, s3)  # set_current_snapshot forward again
    assert res["current_snapshot"] == s3
    assert set(res["restored"]) == {s2, s3}
    assert decode_blocks(spark, out, schema).count() == 500


def test_commits_after_rollback_chain_onto_target(spark, tmp_path):
    out, src, schema = _three_snapshot_table(spark, tmp_path)
    s1, s2, s3 = _snaps(out)
    rollback(out, s2)
    # new snapshot after the rollback: HEAD = state(s2) + new rows
    _grow(spark, tmp_path, out, src, 400, 450, "d")
    s4 = _snaps(out)[-1]
    ids = {r["doc_id"] for r in
           decode_blocks(spark, out, schema).select("doc_id").collect()}
    assert ids == set(range(350)) | set(range(400, 450))
    # time travel: s4 sees its own lineage (not s3's rows); s3 intact
    assert decode_blocks(spark, out, schema, as_of=s4).count() == 400
    assert decode_blocks(spark, out, schema, as_of=s3).count() == 500


def test_rollback_undoes_delete(spark, tmp_path):
    out, _src, schema = _three_snapshot_table(spark, tmp_path)
    _s1, s2, s3 = _snaps(out)
    delete_rows(out, "doc_id", [5, 6, 7])
    assert decode_blocks(spark, out, schema).count() == 497
    rollback(out, s3)  # s3 predates the delete snapshot
    assert decode_blocks(spark, out, schema).count() == 500


def test_rollback_validation(spark, tmp_path):
    out, _src, _schema = _three_snapshot_table(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown snapshot"):
        rollback(out, "nope")
    # refs resolve as targets
    s1 = _snaps(out)[0]
    create_ref(out, "v1", s1)
    assert rollback(out, "v1")["current_snapshot"] == s1


def test_head_consumers_after_rollback(spark, tmp_path):
    out, _src, schema = _three_snapshot_table(spark, tmp_path)
    s1, s2, s3 = _snaps(out)
    rollback(out, s2)
    # create_ref default HEAD = the rollback target, not s3
    assert create_ref(out, "head_now")["snapshot_id"] == s2
    # compaction commits its rewrite under a visible snapshot id
    res = compact_blocks(out_dir=out, spark=spark, min_dirs=2,
                         target_file_bytes=1 << 30)
    assert decode_blocks(spark, out, schema).count() == 350
    # vacuum never reclaims the rolled-back snapshots' (unreplaced)
    # dirs, and HEAD + history still decode afterwards
    vacuum_blocks(out, retain_last=1)
    assert decode_blocks(spark, out, schema).count() == 350
    assert decode_blocks(spark, out, schema, as_of=s3).count() == 500


def test_changelog_follows_lineage_across_rollback(spark, tmp_path):
    out, src, schema = _three_snapshot_table(spark, tmp_path)
    s1, s2, s3 = _snaps(out)
    rollback(out, s1)
    _grow(spark, tmp_path, out, src, 400, 450, "d")
    s4 = _snaps(out)[-1]
    # window s1 -> s4 follows s4's LINEAGE: the undone s2/s3 inserts
    # never replay, the post-rollback commit stays readable
    ch = read_changes(spark, out, schema, s1, s4)
    ids = {r["doc_id"] for r in ch.collect()}
    assert ids == set(range(400, 450))
    assert ch.count() == 50
    # a checkpoint that was itself undone must reset — loud error
    with pytest.raises(ValueError, match="lineage"):
        read_changes(spark, out, schema, s2, s4)
    # pre-rollback windows on still-visible lineage stay exact
    ch = read_changes(spark, out, schema, None, s1)
    assert ch.count() == 200


def test_wap_audit_seq_above_deletes_after_rollback(spark, tmp_path):
    """A WAP audit read after rollback + post-rollback delete: the
    staged parts' sequence must sit ABOVE the visible delete (chain
    end), or the tombstone would erase the freshly staged rows."""
    from libgiddy_spark.engine import encode_files
    from libgiddy_spark.table_io import list_parquet_files

    out, src, schema = _three_snapshot_table(spark, tmp_path)
    s1, s2, s3 = _snaps(out)
    rollback(out, s1)
    _grow(spark, tmp_path, out, src, 400, 450, "d")      # s4 (seq 3)
    delete_rows(out, "doc_id", [5])                      # s5 (seq 4)
    assert decode_blocks(spark, out, schema).count() == 249
    # stage a source that re-adds doc_id 5
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wsrc = str(tmp_path / "wap_src")
    docs.filter(F.col("doc_id").isin([5])).coalesce(1) \
        .write.parquet(wsrc)
    encode_files(spark, wsrc, list_parquet_files(wsrc), out,
                 key_col="doc_id", wap_staged=True)
    staged = next(e["snapshot_id"] for e in
                  reversed(list(_manifest_entries_list(out)))
                  if e.get("kind") == "snapshot" and e.get("staged"))
    audit = decode_blocks(spark, out, schema, as_of=staged)
    ids = [r["doc_id"] for r in audit.collect()]
    assert ids.count(5) == 1  # staged row survives the older tombstone


def _manifest_entries_list(out):
    from libgiddy_spark.manifest import Manifest

    return Manifest(out).read()


def test_changelog_delete_parent_follows_lineage(spark, tmp_path):
    """A delete committed DIRECTLY after a rollback: its changelog
    delete rows must decode against the lineage parent (the rollback
    target), never the raw-chain predecessor (undone state) — else
    keys live only in rolled-back snapshots replay as phantom
    deletes."""
    out, _src, schema = _three_snapshot_table(spark, tmp_path)
    s1, s2, s3 = _snaps(out)
    rollback(out, s1)                       # live rows: doc_id < 200
    delete_rows(out, "doc_id", [5, 250])    # 250 lived only in s2/s3
    dsnap = _snaps(out)[-1]
    ch = read_changes(spark, out, schema, s1, dsnap)
    dels = {r["doc_id"] for r in
            ch.where(F.col("_change_type") == "delete").collect()}
    assert dels == {5}  # no phantom delete for the rolled-back 250


def test_reencode_of_rolled_back_source_raises(spark, tmp_path):
    out, src, schema = _three_snapshot_table(spark, tmp_path)
    s1, _s2, s3 = _snaps(out)
    rollback(out, s1)
    # identical source => identical content snapshot id, which is
    # hidden: encode must fail loud with the roll-forward hint
    with pytest.raises(ValueError, match="roll forward"):
        encode_snapshot(spark, src, out, key_col="doc_id")
    # the hint works
    rollback(out, s3)
    assert decode_blocks(spark, out, schema).count() == 500
