"""remove_orphan_files: unreferenced-only sweep, grace window, and
read-surface invariance."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from libgiddy_spark.engine import (
    compact_blocks,
    decode_blocks,
    delete_rows,
    encode_snapshot,
    remove_orphan_files,
)

SF = "/root/testdata/sf0.001"


def _table(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    out = str(tmp_path / "enc")
    encode_snapshot(spark, src, out, key_col="doc_id")
    return out, pq.read_schema(f"{SF}/documents.parquet")


def _age(path, secs=7200):
    old = time.time() - secs
    os.utime(path, (old, old))


def test_sweeps_only_unreferenced_debris(spark, tmp_path):
    out, schema = _table(spark, tmp_path)
    delete_rows(out, "doc_id", [1])
    blocks = os.path.join(out, "blocks")
    before = decode_blocks(spark, out, schema).count()

    # plant crashed-job debris: a _tmp_ staging dir, a renamed-but-
    # never-committed chunk dir, a stale tombstone staging dir and an
    # unreferenced delete parquet
    for d in ("_tmp_0_3", "chunk-99999-zz"):
        p = os.path.join(blocks, d)
        os.makedirs(p)
        open(os.path.join(p, "junk.parquet"), "w").write("x")
        # idleness is judged by the NEWEST mtime in the tree (a fresh
        # file inside an old dir means an active writer): age the
        # contents too, as real abandoned debris would be
        _age(os.path.join(p, "junk.parquet"))
        _age(p)
    dd = os.path.join(out, "deletes")
    os.makedirs(os.path.join(dd, "_tmp-delete-00099"))
    _age(os.path.join(dd, "_tmp-delete-00099"))
    open(os.path.join(dd, "delete-00099.parquet"), "w").write("x")
    _age(os.path.join(dd, "delete-00099.parquet"))

    res = remove_orphan_files(out, grace_s=3600)
    assert sorted(res["removed"]) == [
        "blocks/_tmp_0_3",
        "blocks/chunk-99999-zz",
        "deletes/_tmp-delete-00099",
        "deletes/delete-00099.parquet",
    ]
    # referenced chunk dirs and the live delete file survive; the read
    # surface is bit-identical
    assert decode_blocks(spark, out, schema).count() == before
    assert any(f.startswith("delete-") for f in os.listdir(dd))


def test_grace_window_spares_fresh_files(spark, tmp_path):
    out, _schema = _table(spark, tmp_path)
    blocks = os.path.join(out, "blocks")
    fresh = os.path.join(blocks, "_tmp_9_9")
    os.makedirs(fresh)
    assert remove_orphan_files(out, grace_s=3600)["removed"] == []
    assert os.path.isdir(fresh)
    assert remove_orphan_files(out, grace_s=0)["removed"] == [
        "blocks/_tmp_9_9"
    ]


def test_stale_dir_with_active_writer_is_spared(spark, tmp_path):
    """A dir whose TOP-LEVEL mtime is old but which holds a freshly
    written file (a long-running writer that created the dir hours ago)
    must not be swept mid-write (ADVICE r5): idleness = newest mtime in
    the whole tree."""
    out, _schema = _table(spark, tmp_path)
    blocks = os.path.join(out, "blocks")
    p = os.path.join(blocks, "_tmp_7_7")
    os.makedirs(p)
    open(os.path.join(p, "inflight.parquet"), "w").write("x")  # fresh
    _age(p)  # dir LOOKS idle by its own mtime
    assert remove_orphan_files(out, grace_s=3600)["removed"] == []
    assert os.path.isdir(p)


def test_replaced_dirs_are_not_orphans(spark, tmp_path):
    out, schema = _table(spark, tmp_path)
    compact_blocks(spark, out, min_dirs=1, target_file_bytes=1 << 30)
    # replaced dirs (time-travel history, vacuum's job) are referenced
    # by the rewrite entry — orphan sweep must keep them even when old
    assert remove_orphan_files(out, grace_s=0)["removed"] == []
    assert decode_blocks(spark, out, schema).count() == 500
