"""decode_job CLI probe typing (ADVICE r3): timestamp keys need typed
literals for the row predicate, string keys must route --key-range to
the string zone maps, and both must return exactly the probed rows."""

from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import functions as F

from libgiddy_spark.engine import encode_snapshot
from libgiddy_spark.jobs import decode_job

SF = "/root/testdata/sf0.001"


def _run_cli(monkeypatch, argv: list[str]) -> None:
    monkeypatch.setattr(sys, "argv", ["decode_job.py", *argv])
    decode_job.main()


def test_cli_timestamp_point_and_range(spark, tmp_path, monkeypatch, capsys):
    """--key-point / --key-range over a TIMESTAMP sort key build typed
    literals (timestamp == bigint is an AnalysisException in Spark)."""
    src = f"{SF}/events.parquet"
    out = str(tmp_path / "enc_ts")
    encode_snapshot(spark, src, out, key_col="ts", block_rows=256)
    ev = spark.read.parquet(src)
    probe = ev.agg(F.min("ts")).collect()[0][0]
    micros = int(probe.timestamp() * 1_000_000)
    n_exp = ev.filter(F.col("ts") == F.timestamp_micros(F.lit(micros))).count()
    assert n_exp >= 1
    _run_cli(monkeypatch, ["--encoded", out, "--source", src,
                           "--key-col", "ts", "--key-point", str(micros),
                           "--verify"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["rows_decoded"] == n_exp
    lo, hi = micros, micros + 3_600_000_000  # one hour window
    n_rng = ev.filter(
        (F.col("ts") >= F.timestamp_micros(F.lit(lo)))
        & (F.col("ts") <= F.timestamp_micros(F.lit(hi)))
    ).count()
    _run_cli(monkeypatch, ["--encoded", out, "--source", src,
                           "--key-col", "ts",
                           "--key-range", f"{lo},{hi}", "--verify"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["rows_decoded"] == n_rng


def test_cli_string_key_range(spark, tmp_path, monkeypatch, capsys):
    """--key-range over a STRING sort key routes to the string zone maps
    instead of crashing on int() (ADVICE r3 low)."""
    src = f"{SF}/documents.parquet"
    out = str(tmp_path / "enc_s")
    encode_snapshot(spark, src, out, key_col="text", block_rows=64)
    docs = spark.read.parquet(src)
    lo, hi = "a", "m"
    n_exp = docs.filter(F.col("text").between(lo, hi)).count()
    _run_cli(monkeypatch, ["--encoded", out, "--source", src,
                           "--key-col", "text",
                           "--key-range", f"{lo},{hi}", "--verify"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"] and rep["rows_decoded"] == n_exp
