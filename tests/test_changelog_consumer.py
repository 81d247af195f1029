"""Exactly-once changelog consumer: checkpointed poll/commit over
read_changes, crash replay re-emits the same window under the same
epoch, and the epoch-dir parquet sink turns replays into overwrites so
the end-to-end materialized changelog has no duplicates."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.changelog import ChangelogConsumer, parquet_epoch_sink
from libgiddy_spark.engine import delete_rows, encode_snapshot

SF = "/root/testdata/sf0.001"


def _table(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(src)
    out = str(tmp_path / "enc")
    encode_snapshot(spark, src, out, key_col="doc_id")
    return docs, src, out, pq.read_schema(f"{SF}/documents.parquet")


def _append(spark, docs, src, out, lo, hi, name):
    stage = src + "_stage_" + name
    docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)) \
        .coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    os.rename(os.path.join(stage, part),
              os.path.join(src, name + ".parquet"))
    encode_snapshot(spark, src, out, key_col="doc_id")


def _changes(df):
    return sorted((r["doc_id"], r["_change_type"])
                  for r in df.select("doc_id", "_change_type").collect())


def test_poll_commit_advances(spark, tmp_path):
    docs, src, out, schema = _table(spark, tmp_path)
    c = ChangelogConsumer(out, schema, str(tmp_path / "ckpt"))
    df, token = c.poll(spark)
    assert _changes(df) == [(i, "insert") for i in range(250)]
    c.commit(token)
    assert c.poll(spark) is None  # checkpoint at HEAD
    _append(spark, docs, src, out, 250, 400, "b")
    delete_rows(out, "doc_id", [0, 1])
    df2, token2 = c.poll(spark)
    got = _changes(df2)
    assert got == sorted([(i, "insert") for i in range(250, 400)]
                         + [(0, "delete"), (1, "delete")])
    c.commit(token2)
    assert c.poll(spark) is None


def test_crash_replay_same_window_same_epoch(spark, tmp_path):
    docs, src, out, schema = _table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    c = ChangelogConsumer(out, schema, ckpt)
    df, token = c.poll(spark)
    first = _changes(df)
    # crash before commit: a NEW consumer over the same checkpoint
    # re-emits the identical window under the identical epoch
    c2 = ChangelogConsumer(out, schema, ckpt)
    df2, token2 = c2.poll(spark)
    assert _changes(df2) == first
    assert token2 == token
    c2.commit(token2)
    assert c2.poll(spark) is None


def test_stale_token_rejected(spark, tmp_path):
    docs, src, out, schema = _table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    c = ChangelogConsumer(out, schema, ckpt)
    _df, token = c.poll(spark)
    c.commit(token)
    with pytest.raises(ValueError, match="stale"):
        c.commit(token)  # epoch already advanced


def test_epoch_sink_exactly_once_through_replay(spark, tmp_path):
    docs, src, out, schema = _table(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    dest = str(tmp_path / "sink")
    sink = parquet_epoch_sink(dest)
    c = ChangelogConsumer(out, schema, ckpt)
    # epoch 0: sink runs but the commit is "lost" (crash)
    df, token = c.poll(spark)
    sink(df, token["epoch"])
    # replay: run_once re-sinks epoch 0 (overwrite), then commits
    st = c.run_once(spark, sink)
    assert st["epoch"] == 1
    # epoch 1: append + delete, clean cycle
    _append(spark, docs, src, out, 250, 300, "b")
    delete_rows(out, "doc_id", [5])
    assert c.run_once(spark, sink)["epoch"] == 2
    assert c.run_once(spark, sink) is None
    # the materialized changelog holds every change exactly once
    all_rows = spark.read.parquet(os.path.join(dest, "epoch-*"))
    got = _changes(all_rows)
    assert got == sorted([(i, "insert") for i in range(300)]
                         + [(5, "delete")])
    assert all_rows.groupBy("doc_id", "_change_type").count() \
        .filter(F.col("count") > 1).count() == 0


def test_poll_head_is_visible_branch_not_raw_headers(spark, tmp_path):
    """WAP cherry-pick flow: stage S, append B, publish S. Raw header
    order ends at B, but S joins the branch AT ITS PUBLISH — the
    consumer must deliver S's rows after publish, not park at B
    forever."""
    from libgiddy_spark.engine import encode_files, publish_snapshot
    from libgiddy_spark.table_io import list_parquet_files

    docs, src, out, schema = _table(spark, tmp_path)

    # a staged, unpublished snapshot must not break polling either
    wsrc = str(tmp_path / "wap_src")
    docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 450)) \
        .coalesce(1).write.parquet(wsrc)
    encode_files(spark, wsrc, list_parquet_files(wsrc), out,
                 key_col="doc_id", wap_staged=True)
    c = ChangelogConsumer(out, schema, str(tmp_path / "ckpt"))
    assert c.poll(spark) is None or True  # staged head never errors

    # consume up to the current visible head (the base snapshot)
    got = c.poll(spark)
    if got is not None:
        c.commit(got[1])

    # append B (normal commit), then publish S (joins AFTER B)
    _append(spark, docs, src, out, 250, 300, "b")
    from libgiddy_spark.manifest import Manifest

    staged = next(
        e["snapshot_id"] for e in Manifest(out).read()
        if e.get("kind") == "snapshot" and e.get("staged"))
    df, tok = c.poll(spark)
    assert {r["doc_id"] for r in df.collect()} == set(range(250, 300))
    c.commit(tok)
    publish_snapshot(out, staged)
    df2, tok2 = c.poll(spark)  # S's rows arrive at the publish point
    assert {r["doc_id"] for r in df2.collect()} == set(range(400, 450))
    c.commit(tok2)
    assert c.poll(spark) is None


def test_delete_rows_selfheals_orphan_tombstone_dir(spark, tmp_path):
    """A crashed upsert can leave an orphan tombstone DIRECTORY at the
    next delete seq's target path; delete_rows must replace it, not
    wedge on IsADirectoryError forever."""
    import os as _os

    from libgiddy_spark.engine import decode_blocks

    _docs, _src, out, schema = _table(spark, tmp_path)
    orphan = _os.path.join(out, "deletes", "delete-00000.parquet")
    _os.makedirs(orphan)  # unreferenced: no manifest delete entry
    open(_os.path.join(orphan, "part-0.parquet"), "w").write("junk")
    res = delete_rows(out, "doc_id", [7])
    assert res["n"] == 1
    assert decode_blocks(spark, out, schema).count() == 249
