"""CSV / JSON-lines ingestion: explicit-schema staging -> encode ->
bit-identical decode."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import decode_blocks
from libgiddy_spark.ingest import ingest_snapshot

SF = "/root/testdata/sf0.001"
DDL = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.mark.parametrize("fmt", ["csv", "jsonl"])
def test_ingest_roundtrip(spark, tmp_path, fmt):
    docs = _docs(spark)
    if fmt == "csv":
        # CSV cannot carry embedded newlines losslessly without quoting
        # games — flatten them (the format's own limitation, not ours)
        docs = docs.withColumn(
            "text", F.regexp_replace("text", "\n", " "))
        src = str(tmp_path / "src_csv")
        docs.coalesce(1).write.option("header", "true").csv(src)
    else:
        src = str(tmp_path / "src_jsonl")
        docs.coalesce(1).write.json(src)
    out = str(tmp_path / "enc")
    res = ingest_snapshot(spark, src, fmt, DDL, out, key_col="doc_id")
    assert res["encoded_parts"] >= 1 and res["format"] == fmt

    dec = decode_blocks(
        spark, out, pq.read_schema(f"{SF}/documents.parquet")
    ).drop("part_id")
    assert dec.count() == 500
    assert dec.exceptAll(docs).count() == 0
    assert docs.exceptAll(dec).count() == 0


def test_ingest_resume_skips_staged(spark, tmp_path):
    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.json(src)
    out = str(tmp_path / "enc")
    r1 = ingest_snapshot(spark, src, "jsonl", DDL, out, key_col="doc_id")
    r2 = ingest_snapshot(spark, src, "jsonl", DDL, out, key_col="doc_id")
    assert r2["staging_dir"] == r1["staging_dir"]
    assert r2["encoded_parts"] == 0  # same staged content = full resume
    assert r2["skipped_done"] >= 1


def test_partial_staging_raises(spark, tmp_path):
    """A crashed staging write (dir without _SUCCESS) must fail loud,
    never be silently encoded as a partial snapshot."""
    import os

    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.json(src)
    out = str(tmp_path / "enc")
    staging = os.path.join(out, "_staging", "src")
    os.makedirs(staging)  # exists, no _SUCCESS marker
    with pytest.raises(ValueError, match="_SUCCESS"):
        ingest_snapshot(spark, src, "jsonl", DDL, out, key_col="doc_id")


def test_ingest_stale_staging_raises(spark, tmp_path):
    """A 'complete' staging dir whose SOURCE changed since staging must
    refuse, not silently encode stale rows (ADVICE r5)."""
    import os
    import time

    docs = _docs(spark)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.json(src)
    out = str(tmp_path / "enc")
    ingest_snapshot(spark, src, "jsonl", DDL, out, key_col="doc_id")
    # mutate the source (append one more file) after staging
    time.sleep(0.01)
    docs.limit(1).coalesce(1).write.mode("append").json(src)
    with pytest.raises(ValueError, match="different version"):
        ingest_snapshot(spark, src, "jsonl", DDL, out, key_col="doc_id")


def test_ingest_rejects_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        ingest_snapshot(spark, str(tmp_path), "xml", DDL,
                        str(tmp_path / "o"), key_col="doc_id")
