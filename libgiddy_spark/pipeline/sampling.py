"""Deterministic corpus sampling / mixing operators.

Training-data pipelines rarely train on the raw crawl: they mix strata
(languages, domains, quality buckets) at target rates. The sampler here
is HASH-threshold based — keep a row iff ``md5(key) % denom < rate`` —
which gives (a) exact reproducibility (same corpus -> same sample, no
RNG state), (b) consistency under reruns and appends (a kept doc stays
kept), and (c) an exact ANSI-SQL oracle. This is the standard
deterministic-sampling trick (hash-mod bucketing), not Bernoulli
sampling: per-stratum proportions are exact in distribution over the
hash, and any stratum's sample is a stable subset of a larger rate's.

Scale shape: a single JVM-side filter over the scan — no shuffle, no
UDF, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hash_bucket(key_col, denom: int):
    """md5-derived bucket in [0, denom): identical in Spark
    (conv(hex,16,10)) and DuckDB (CAST('0x'||hex AS BIGINT))."""
    h = F.conv(F.substring(F.md5(key_col.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(denom))


def _rate_expr(strata_col: str, rates: dict[str, int], default_rate: int):
    """The ONE definition of the per-stratum rate — the sampler and its
    audit report both derive from it, so they cannot drift."""
    rate = F.lit(default_rate)
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(r)).otherwise(rate)
    return rate


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    key: str = "doc_id",
    rates: dict[str, int] | None = None,
    default_rate: int = 200,
    denom: int = 1000,
) -> DataFrame:
    """Keep each row iff its stable hash bucket falls under its
    stratum's rate (per-mille by default). ``rates`` maps stratum value
    -> kept buckets out of ``denom``; unlisted strata get
    ``default_rate``. Returns the kept rows plus the bucket for
    auditability."""
    rates = rates if rates is not None else {"en": 500, "zh": 300}
    bucket = _hash_bucket(F.col(key), denom)
    rate = _rate_expr(strata_col, rates, default_rate)
    return (
        df.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
    )


def mix_report(
    df: DataFrame,
    strata_col: str = "lang",
    key: str = "doc_id",
    rates: dict[str, int] | None = None,
    default_rate: int = 200,
    denom: int = 1000,
) -> DataFrame:
    """Corpus-mixing audit: per stratum, input count, kept count under
    the stratified sampler, and the configured rate — the table a
    pipeline operator reads before committing a mixture."""
    rates = rates if rates is not None else {"en": 500, "zh": 300}
    bucket = _hash_bucket(F.col(key), denom)
    rate = _rate_expr(strata_col, rates, default_rate)
    # single-pass aggregation (no total-vs-kept join, which would drop a
    # NULL stratum's kept count — null keys never join)
    kept_flag = F.when(bucket < rate, 1).otherwise(0)
    # max(rate) + a min==max guard, not first(rate): the rate is
    # stratum-derived today, but if someone adds a non-key-derived term
    # later, first() would silently return an arbitrary row's value —
    # raise_error makes the mixed stratum loud instead
    rate_agg = F.when(
        F.min(rate) == F.max(rate), F.max(rate)
    ).otherwise(F.raise_error(F.concat(
        F.lit("mix_report: non-constant rate within stratum "),
        F.min(F.col(strata_col)).cast("string"))))
    return (
        df.groupBy(strata_col)
        .agg(
            F.count("*").alias("n_input"),
            F.sum(kept_flag).cast("long").alias("n_kept"),
            rate_agg.cast("int").alias("rate_per_mille"),
        )
    )
