"""Sketch operators: deterministic HyperLogLog registers and a
count-min sketch, both md5-derived so every output row is exactly
reproducible by an ANSI-SQL oracle (no engine-random hashing).

The HLL query emits the REGISTER TABLE (bucket, max rho) — the
mergeable sketch state a distributed engine materializes and unions
across partitions/snapshots; the float estimate is a driver-side
helper (:func:`hll_estimate`), accuracy-tested against true distinct
counts. The count-min sketch is exact integer state end to end.

Scale shape: both sketches are single narrow aggregations
(groupBy on a derived bucket; d x w cells for CMS) — the classic
sub-linear-state pattern for 100 TB cardinality/frequency questions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HLL_M = 64        # registers (2^6); std err ~ 1.04/sqrt(64) = 13%
CMS_D = 4         # count-min rows
CMS_W = 64        # count-min buckets per row


def _hex_int(col, start: int, length: int):
    """Integer value of a hex substring (1-indexed), <= 15 digits."""
    return F.conv(F.substring(col, start, length), 16, 10).cast("long")


def hll_registers(df: DataFrame, col: str, m: int = HLL_M) -> DataFrame:
    """(bucket, rho_max): deterministic HLL register table over the
    column's value set. bucket = first-2-hex-digits(md5) % m; rho =
    1 + leading zero bits of the next 60 bits (15 hex digits).
    Empty buckets are absent (the estimator treats them as rho=0)."""
    h = F.md5(F.col(col).cast("string"))
    bucket = _hex_int(h, 1, 2) % m
    tail = F.substring(h, 3, 15)
    stripped = F.regexp_replace(tail, "^0+", "")
    lz_hex = F.lit(15) - F.length(stripped)
    dv = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
    bitlen = (
        F.when(dv >= 8, 4).when(dv >= 4, 3).when(dv >= 2, 2).otherwise(1)
    )
    rho = F.when(F.length(stripped) == 0, F.lit(61)).otherwise(
        lz_hex * 4 + (F.lit(4) - bitlen) + 1
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(registers: list[tuple[int, int]], m: int = HLL_M) -> float:
    """Standard HLL estimate from (bucket, rho_max) rows (driver-side,
    float — the sketch itself stays integer-exact). Includes the
    small-range linear-counting correction."""
    import math

    regs = [0] * m
    for b, r in registers:
        regs[int(b)] = int(r)
    s = sum(2.0 ** -r for r in regs)
    alpha = 0.7213 / (1 + 1.079 / m)  # standard alpha_m (m >= 64)
    est = alpha * m * m / s
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)  # linear counting
    return est


def cms_sketch(df: DataFrame, col: str, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Count-min sketch state: (d_row, bucket, cnt), d x w cells.
    Row i's bucket for value v = first-6-hex-digits(md5(v || '#i')) % w.
    Exact integer state — unions/merges are cell-wise sums. ONE source
    scan: the d derived buckets explode from an array per row (a d-way
    union would re-read the source d times)."""
    buckets = F.array(*[
        _hex_int(F.md5(F.concat(F.col(col).cast("string"), F.lit(f"#{i}"))),
                 1, 6) % w
        for i in range(d)
    ])
    return (
        df.select(F.posexplode(buckets).alias("d_row", "bucket"))
        .groupBy("d_row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_point_estimate(
    df: DataFrame, col: str, probe: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """One row: (probe, est_count, true_count). est = min over the d
    rows of the probe's cell — always >= true (count-min guarantee),
    both integers, both exactly SQL-reproducible."""
    import hashlib

    sk = cms_sketch(df, col, d, w)
    conds = None
    for i in range(d):
        b = int(hashlib.md5(f"{probe}#{i}".encode()).hexdigest()[:6], 16) % w
        c = (F.col("d_row") == i) & (F.col("bucket") == b)
        conds = c if conds is None else conds | c
    est = sk.filter(conds).agg(F.min("cnt").alias("est_count"))
    true = df.filter(F.col(col).cast("string") == probe).agg(
        F.count("*").alias("true_count")
    )
    return est.crossJoin(true).select(
        F.lit(probe).alias("probe"), "est_count", "true_count"
    )
