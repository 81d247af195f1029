"""Deduplication operators: exact, MinHash signatures + LSH banding,
near-dup candidate verification (word-set Jaccard), SimHash.

All hashing is md5 (bit-identical hex in Spark and DuckDB) and every
ratio is floor-scaled to an integer, so each operator has an exact
ANSI-SQL oracle. Scale notes: signatures/bands are narrow aggregates
(shuffle keyed on doc_id / bucket); the pair-verification join is
bounded to LSH-bucket candidates — the standard way exact-quadratic
dedup becomes feasible at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import idiv

N_HASHES = 8
BAND_SIZE = 2


def exact_dedup(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text, with the
    surviving (minimum) key and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_hash"))
        .agg(F.min(key).alias("keeper"), F.count("*").alias("n_dups"))
    )


def _doc_words(df: DataFrame, key: str, text: str) -> DataFrame:
    """(key, word) pairs, distinct — MinHash/Jaccard operate on the SET."""
    return df.select(
        F.col(key), F.explode(F.array_distinct(F.split(F.col(text), " "))).alias("w")
    ).distinct()


def minhash_signatures(
    df: DataFrame, key: str = "doc_id", text: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """MinHash over the word set: signature i = min(md5(word || '#i'))."""
    words = _doc_words(df, key, text)
    aggs = [
        F.min(F.md5(F.concat(F.col("w"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return words.groupBy(key).agg(*aggs)


def lsh_buckets(
    sig_df: DataFrame, key: str = "doc_id",
    n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
) -> DataFrame:
    """Band the signature: bucket id = md5(concat of the band's rows).
    Docs sharing any (band, bucket) become near-dup candidates."""
    out = []
    for b in range(n_hashes // band_size):
        cols = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
        out.append(
            sig_df.select(
                F.col(key),
                F.lit(b).alias("band"),
                F.md5(F.concat(*cols)).alias("bucket"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res


def dedup_near_pair_stats(
    df: DataFrame, key: str = "doc_id", text: str = "text",
    jaccard_threshold_x1000: int = 700,
) -> DataFrame:
    """LSH candidates -> exact word-set Jaccard verification; returns
    one stats row (candidate pairs, verified near-dups) — the decision
    numbers a dedup pass needs."""
    sig = minhash_signatures(df, key, text)
    bands = lsh_buckets(sig, key)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(F.col(f"a.{key}").alias("ka"), F.col(f"b.{key}").alias("kb"))
        .distinct()
    )
    words = _doc_words(df, key, text)
    sizes = words.groupBy(key).agg(F.count("*").alias("n"))
    wa = words.withColumnRenamed(key, "ka")
    wb = words.withColumnRenamed(key, "kb")
    inter = (
        cand.join(wa, "ka").join(wb, ["kb", "w"])
        .groupBy("ka", "kb").agg(F.count("*").alias("n_inter"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed(key, "ka").withColumnRenamed("n", "na"), "ka")
        .join(sizes.withColumnRenamed(key, "kb").withColumnRenamed("n", "nb"), "kb")
        .withColumn("jac_x1000",
                    idiv(1000 * F.col("n_inter"),
                         F.col("na") + F.col("nb") - F.col("n_inter")))
    )
    return jac.agg(
        F.count("*").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("jac_x1000") >= jaccard_threshold_x1000, 1).otherwise(0)
              ).alias("n_near_dups"),
        F.max("jac_x1000").alias("max_jac_x1000"),
        F.min("jac_x1000").alias("min_jac_x1000"),
    )


def simhash(df: DataFrame, key: str = "doc_id", text: str = "text",
            bits: int = 16) -> DataFrame:
    """SimHash over the word set: bit i set iff the majority of words
    have hex digit i of md5(word) >= '8'."""
    words = _doc_words(df, key, text)
    h = F.md5(F.col("w"))
    terms = [
        F.sum(F.when(F.substring(h, i + 1, 1) >= "8", 1).otherwise(-1)).alias(f"s{i}")
        for i in range(bits)
    ]
    agg = words.groupBy(key).agg(*terms)
    sim = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(key), sim.alias("simhash"))
