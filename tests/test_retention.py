"""Snapshot retention on vacuum (Iceberg expire_snapshots analogue):
``retain_last`` keeps the newest N snapshots' files through vacuum so
time travel to them keeps working; ``older_than`` expires only
snapshots before a cutoff; both union with named-ref pins."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import (
    compact_blocks,
    decode_blocks,
    encode_snapshot,
    vacuum_blocks,
)
from libgiddy_spark.manifest import Manifest

SF = "/root/testdata/sf0.001"


def _grow_table(spark, tmp_path):
    """Two appends -> snapshots A (250 rows) and B (500 rows), then a
    full compaction whose rewrite retires A's and B's chunk dirs."""
    src = str(tmp_path / "grow")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.filter(F.col("doc_id") < 250).repartition(3).write.parquet(src)
    out = str(tmp_path / "enc")
    encode_snapshot(spark, src, out, key_col="doc_id", chunk_parts=1)
    snap_a = _snaps(out)[-1]
    docs.filter(F.col("doc_id") >= 250).repartition(2).write.mode(
        "append").parquet(src)
    encode_snapshot(spark, src, out, key_col="doc_id", chunk_parts=1)
    snap_b = _snaps(out)[-1]
    compact_blocks(spark, out, target_file_bytes=64 << 20)
    return out, snap_a, snap_b


def _snaps(out):
    return [e["snapshot_id"] for e in Manifest(out).read()
            if e.get("kind") == "snapshot"]


def _snap_ts(out, sid):
    return [e["ts"] for e in Manifest(out).read()
            if e.get("kind") == "snapshot"
            and e["snapshot_id"] == sid][0]


def test_retain_last_keeps_time_travel_working(spark, tmp_path):
    out, snap_a, snap_b = _grow_table(spark, tmp_path)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    # retain both snapshots: time travel to A and B still works (the
    # compaction rewrite commits under B's id, so B's PRE-compaction
    # chunks are unreachable from any as_of and may still be swept)
    vac = vacuum_blocks(out, retain_last=2)
    assert decode_blocks(spark, out, schema, as_of=snap_a).count() == 250
    assert decode_blocks(spark, out, schema, as_of=snap_b).count() == 500
    assert decode_blocks(spark, out, schema).count() == 500
    # tighten to HEAD-only: A's chunks now expire
    vac = vacuum_blocks(out, retain_last=1)
    assert vac["removed"]
    assert decode_blocks(spark, out, schema, as_of=snap_b).count() == 500
    assert decode_blocks(spark, out, schema).count() == 500
    with pytest.raises(ValueError, match="vacuum|removed"):
        decode_blocks(spark, out, schema, as_of=snap_a).count()


def test_retain_last_default_is_head_only(spark, tmp_path):
    out, snap_a, snap_b = _grow_table(spark, tmp_path)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    vacuum_blocks(out)
    assert decode_blocks(spark, out, schema).count() == 500
    # snap_b is HEAD (the compaction rewrite committed under its id),
    # so it survives; only the older snapshot expires
    assert decode_blocks(spark, out, schema, as_of=snap_b).count() == 500
    with pytest.raises(ValueError, match="vacuum|removed"):
        decode_blocks(spark, out, schema, as_of=snap_a).count()


def test_older_than_expires_only_before_cutoff(spark, tmp_path):
    out, snap_a, snap_b = _grow_table(spark, tmp_path)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    # cutoff between A and B: A expires, B (and later) retained
    cutoff = _snap_ts(out, snap_b)
    vac = vacuum_blocks(out, older_than=cutoff)
    assert vac["removed"]
    assert decode_blocks(spark, out, schema, as_of=snap_b).count() == 500
    with pytest.raises(ValueError, match="vacuum|removed"):
        decode_blocks(spark, out, schema, as_of=snap_a).count()


def test_retention_unions_with_refs(spark, tmp_path):
    from libgiddy_spark.engine import create_ref

    out, snap_a, snap_b = _grow_table(spark, tmp_path)
    schema = pq.read_schema(f"{SF}/documents.parquet")
    create_ref(out, "audit", snap_a)
    # HEAD-only retention, but the ref pins A through the vacuum
    vacuum_blocks(out, retain_last=1)
    assert decode_blocks(spark, out, schema, as_of=snap_a).count() == 250
    assert decode_blocks(spark, out, schema, as_of="audit").count() == 250
