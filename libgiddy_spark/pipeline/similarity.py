"""Similarity search over an embedding column (array<float>).

Similarity is an integer-quantized dot product (round(x*100) per
element): rankings and thresholds become exact integer arithmetic,
reproducible bit-for-bit by the DuckDB oracle (no float-summation-order
hazards). Brute-force top-k is the baseline; random-hyperplane LSH
bucketing is the scale path (bucket first, search within buckets —
at 10^12 rows the cross join is gone and each bucket is a task).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

QUANT = 100
N_PLANES = 8


def _quantized(df: DataFrame, key: str = "vec_id", emb: str = "embedding") -> DataFrame:
    # floor (not round): floor of a double is unambiguous in every
    # engine; round-half rules differ between Spark and SQL oracles
    q = F.transform(F.col(emb), lambda x: F.floor(x.cast("double") * QUANT).cast("long"))
    return df.select(F.col(key), q.alias("q"))


def _qdot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def topk_neighbors(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    k: int = 3, n_queries: int = 5,
) -> DataFrame:
    """Brute-force top-k by quantized dot product for the first
    ``n_queries`` ids; broadcast the (tiny) query side."""
    qdf = _quantized(df, key, emb)
    queries = qdf.filter(F.col(key) < n_queries).select(
        F.col(key).alias("query_id"), F.col("q").alias("qq")
    )
    pairs = qdf.crossJoin(F.broadcast(queries)).filter(F.col(key) != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col(key).alias("neighbor_id"), _qdot(F.col("qq"), F.col("q")).alias("qdot")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot")
    )


def plane_signs(dim: int, n_planes: int = N_PLANES) -> list[list[int]]:
    """Deterministic md5-derived hyperplane sign vectors (+1/-1): sign
    of dim i on plane j = first hex digit of md5(f"{i}_{j}") >= '8'.
    Materialized as literals so the Spark job and the SQL oracle consume
    identical planes."""
    return [
        [
            1 if hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0] >= "8" else -1
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def lsh_ann_buckets(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    dim: int = 64, n_planes: int = N_PLANES,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign pattern of n_planes
    projections of the quantized vector (projection = exact integer
    dot with a literal ±1 plane)."""
    qdf = _quantized(df, key, emb)
    planes = plane_signs(dim, n_planes)
    bucket = None
    for j in range(n_planes):
        plane = F.array(*[F.lit(s).cast("long") for s in planes[j]])
        proj = _qdot(F.col("q"), plane)
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return qdf.select(F.col(key), bucket.alias("bucket"))


def embedding_near_dup_stats(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    cos_threshold_x100: int = 80,
) -> DataFrame:
    """Embedding-cosine near-dup detection, exact integer test:
    dot>0 and dot^2 * 10000 >= t^2 * |a|^2 * |b|^2 (t = threshold/100).
    Bounded here by brute-force pairs (the oracle-checkable baseline);
    at scale the same predicate runs within lsh_ann_buckets buckets."""
    qdf = _quantized(df, key, emb)
    norms = qdf.select(F.col(key), F.col("q"), _qdot(F.col("q"), F.col("q")).alias("n2"))
    a = norms.select(F.col(key).alias("ka"), F.col("q").alias("qa"), F.col("n2").alias("na"))
    b = norms.select(F.col(key).alias("kb"), F.col("q").alias("qb"), F.col("n2").alias("nb"))
    pairs = a.join(b, F.col("ka") < F.col("kb"))
    dot = _qdot(F.col("qa"), F.col("qb"))
    t2 = cos_threshold_x100 * cos_threshold_x100
    hits = pairs.select(
        "ka", "kb", dot.alias("dot"), "na", "nb"
    ).filter((F.col("dot") > 0) & (F.col("dot") * F.col("dot") * 10000 >= t2 * F.col("na") * F.col("nb")))
    return hits.agg(
        F.count("*").alias("n_near_dups"),
        F.min("ka").alias("min_ka"),
        F.max("kb").alias("max_kb"),
    )
