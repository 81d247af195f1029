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
EMB_MAX_BUCKET = 1024  # per-bucket cap — degenerate-bucket skew guard
# multi-probe: own bucket + each single-bit flip (hamming<=1 recall)
PROBE_DELTAS = [0] + [1 << j for j in range(N_PLANES)]


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


def _capped_buckets(
    df: DataFrame, key: str, emb: str, dim: int, n_planes: int, max_bucket: int
) -> DataFrame:
    """(key, bucket) with oversized buckets dropped (size > max_bucket).
    One window over the bucket key — no extra shuffle beyond the
    bucketing itself."""
    b = lsh_ann_buckets(df, key, emb, dim, n_planes)
    w = Window.partitionBy("bucket")
    return (
        b.withColumn("bsz", F.count("*").over(w))
        .filter(F.col("bsz") <= max_bucket)
        .drop("bsz")
    )


def _probe_expand(bok: DataFrame, key: str, out: str = "probe") -> DataFrame:
    """Each (key, bucket) row -> 1 + n_planes probe rows (bucket XOR
    single-bit deltas). Multi-probe recovers hamming-distance-1 pairs
    that single-bucket joins miss."""
    deltas = F.array(*[F.lit(d) for d in PROBE_DELTAS])
    return bok.select(
        F.col(key), F.explode(deltas).alias("_d"), F.col("bucket")
    ).select(F.col(key), F.col("bucket").bitwiseXOR(F.col("_d")).alias(out))


def embedding_near_dups_lsh(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    dim: int = 64, n_planes: int = N_PLANES,
    cos_threshold_x100: int = 80, max_bucket: int = EMB_MAX_BUCKET,
) -> DataFrame:
    """The SCALE path for embedding near-dup detection: candidates are
    pairs within hamming distance 1 in LSH bucket space (multi-probe),
    never all pairs — the join is keyed on the bucket, so at 10^9
    vectors each bucket is an independent task and there is no
    cartesian anywhere in the plan. Same exact integer cosine predicate
    as the brute-force baseline, applied only to candidates."""
    bok = _capped_buckets(df, key, emb, dim, n_planes, max_bucket)
    probes = _probe_expand(bok, key)
    cand = (
        probes.join(bok.select(F.col(key).alias("kb"), "bucket"),
                    probes["probe"] == F.col("bucket"))
        .filter(F.col(key) < F.col("kb"))
        .select(F.col(key).alias("ka"), "kb")
        .distinct()
    )
    qdf = _quantized(df, key, emb)
    norms = qdf.select(F.col(key), F.col("q"), _qdot(F.col("q"), F.col("q")).alias("n2"))
    na = norms.select(F.col(key).alias("ka"), F.col("q").alias("qa"), F.col("n2").alias("na"))
    nb = norms.select(F.col(key).alias("kb"), F.col("q").alias("qb"), F.col("n2").alias("nb"))
    t2 = cos_threshold_x100 * cos_threshold_x100
    pairs = (
        cand.join(na, "ka").join(nb, "kb")
        .withColumn("dot", _qdot(F.col("qa"), F.col("qb")))
        .withColumn(
            "hit",
            (F.col("dot") > 0)
            & (F.col("dot") * F.col("dot") * 10000 >= t2 * F.col("na") * F.col("nb")),
        )
    )
    return pairs.agg(
        F.count("*").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_near_dups"),
        F.min(F.when(F.col("hit"), F.col("ka"))).alias("min_ka"),
        F.max(F.when(F.col("hit"), F.col("kb"))).alias("max_kb"),
    )


def topk_neighbors_lsh(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    k: int = 3, n_queries: int = 5, dim: int = 64,
    n_planes: int = N_PLANES, max_bucket: int = EMB_MAX_BUCKET,
) -> DataFrame:
    """ANN top-k through the LSH buckets: each query ranks only the
    vectors found in its multi-probe buckets (bucket-keyed join — the
    scale path that replaces the brute-force cross join)."""
    bok = _capped_buckets(df, key, emb, dim, n_planes, max_bucket)
    qprobes = _probe_expand(bok.filter(F.col(key) < n_queries), key)
    cand = (
        qprobes.select(F.col(key).alias("query_id"), "probe")
        .join(bok.select(F.col(key).alias("neighbor_id"), "bucket"),
              F.col("probe") == F.col("bucket"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qdf = _quantized(df, key, emb)
    qa = qdf.select(F.col(key).alias("query_id"), F.col("q").alias("qq"))
    qb = qdf.select(F.col(key).alias("neighbor_id"), F.col("q").alias("qn"))
    scored = (
        cand.join(F.broadcast(qa), "query_id").join(qb, "neighbor_id")
        .select("query_id", "neighbor_id", _qdot(F.col("qq"), F.col("qn")).alias("qdot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot")
    )


N_IVF_LISTS = 16
IVF_NPROBE = 2


def _centroids(qdf: DataFrame, key: str, n_lists: int) -> DataFrame:
    """Deterministic sampled centroids: the quantized vectors of the
    n_lists SMALLEST keys (IVF coarse quantizers from a data sample —
    the standard bootstrap; a k-means refinement would slot in here).
    orderBy+limit, not `key < n_lists`: a key space that doesn't
    contain 0..n_lists-1 (offset ids, string/uuid keys) would
    otherwise yield zero centroids and a silently EMPTY result.
    Tiny by construction -> always broadcast."""
    return qdf.orderBy(key).limit(n_lists).select(
        F.col(key).alias("cid"), F.col("q").alias("cq")
    )


def _ivf_rank(qdf: DataFrame, cents: DataFrame, key: str) -> DataFrame:
    """(key, cid, cdot) for every (vector, centroid) pair — the
    unavoidable IVF assignment cost, as a codegen-friendly
    explode/broadcast-join/hash-aggregate instead of a per-pair
    higher-order _qdot: Spark evaluates lambda-based array aggregates
    interpreted (CodegenFallback), ~1 µs per element, which made the
    assignment the IVF hot spot (guide §1.2 per-task work; measured
    2.6 s warm -> ~0.9 s at sf0.1, and the CPU constant is what
    multiplies at 10^9 vectors). posexplode keeps dim-rows co-located
    with their parent row, the centroid side is a tiny broadcast, and
    the (key, cid) partial aggregation collapses map-side — the only
    exchange is the narrow (key, cid, cdot) frame the caller's
    max_by/top-n needed anyway. Exact integer sums, order-independent:
    identical results."""
    qe = qdf.select(F.col(key), F.posexplode("q").alias("_d", "_v"))
    ce = cents.select(F.col("cid"), F.posexplode("cq").alias("_d", "_cv"))
    return (
        qe.join(F.broadcast(ce), "_d")
        .groupBy(key, "cid")
        .agg(F.sum(F.col("_v") * F.col("_cv")).alias("cdot"))
    )


def _assign_from(qdf: DataFrame, cents: DataFrame, key: str) -> DataFrame:
    """(key, list_id) from pre-built quantized vectors + centroids —
    shared by ivf_assign and topk_neighbors_ivf so the corpus is
    quantized and the centroids built exactly once per plan."""
    ranked = _ivf_rank(qdf, cents, key)
    return ranked.groupBy(key).agg(
        F.max_by("cid", F.struct(F.col("cdot"), -F.col("cid"))).alias("list_id")
    )


def _itdiv(num, den):
    """Exact integer division TRUNCATING toward zero (DuckDB's ``//``
    semantics — which truncates, unlike Python's floor): num may be
    negative (centroid coordinate sums), den positive. Same no-float-
    hazard construction as text.idiv."""
    q = ((F.abs(num) - F.pmod(F.abs(num), den)) / den).cast("long")
    return F.when(num < 0, -q).otherwise(q)


def _refine_from(qdf: DataFrame, cents: DataFrame, key: str, dim: int) -> DataFrame:
    """One Lloyd iteration from pre-built quantized vectors + centroids
    -> (cid, cq): new centroid = element-wise EXACT integer mean
    (truncating division) of the list's member vectors; lists that
    attracted no members drop out (the remaining centroids re-absorb
    their space on re-assignment). Element-wise sums are ``dim``
    JVM-side aggregates on the grouped frame — no explode, one shuffle
    on list_id."""
    asg = _assign_from(qdf, cents, key)
    sums = qdf.join(asg, key).groupBy("list_id").agg(
        F.count("*").alias("n"),
        *[F.sum(F.element_at("q", d + 1)).alias(f"s{d}") for d in range(dim)],
    )
    return sums.select(
        F.col("list_id").alias("cid"),
        F.array(*[_itdiv(F.col(f"s{d}"), F.col("n")) for d in range(dim)]).alias("cq"),
    )


def ivf_refine(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    n_lists: int = N_IVF_LISTS, dim: int = 64,
) -> DataFrame:
    """One Lloyd iteration on the sampled centroids -> (cid, cq)."""
    qdf = _quantized(df, key, emb)
    return _refine_from(qdf, _centroids(qdf, key, n_lists), key, dim)


def ivf_assign_refined(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    n_lists: int = N_IVF_LISTS, dim: int = 64,
) -> DataFrame:
    """IVF list assignment against the Lloyd-refined centroids
    (sampled bootstrap -> one k-means step -> re-assign): the refined
    inverted lists a production IVF index would serve from. The corpus
    is quantized and the bootstrap centroids built once, shared by the
    refinement and re-assignment subplans."""
    qdf = _quantized(df, key, emb)
    cents = _centroids(qdf, key, n_lists)
    return _assign_from(qdf, _refine_from(qdf, cents, key, dim), key)


def ivf_assign(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    n_lists: int = N_IVF_LISTS,
) -> DataFrame:
    """IVF list assignment: each vector joins the inverted list of its
    max-dot centroid (ties -> smaller cid). One broadcast join + one
    groupBy on the vector key; at 10^9 rows each list is an
    independent, joinable partition of the corpus."""
    qdf = _quantized(df, key, emb)
    return _assign_from(qdf, _centroids(qdf, key, n_lists), key)


def topk_neighbors_ivf(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    k: int = 3, n_queries: int = 5,
    n_lists: int = N_IVF_LISTS, nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """ANN top-k through IVF inverted lists: each query searches only
    the vectors assigned to its ``nprobe`` highest-affinity lists —
    the list-keyed join replaces the brute-force cross join exactly
    like the LSH path, with recall controlled by nprobe instead of
    multi-probe bit flips."""
    qdf = _quantized(df, key, emb)
    cents = _centroids(qdf, key, n_lists)
    assigned = _assign_from(qdf, cents, key)
    queries = qdf.filter(F.col(key) < n_queries)
    ranked = _ivf_rank(queries, cents, key)
    w = Window.partitionBy(key).orderBy(F.desc("cdot"), F.asc("cid"))
    probes = (
        ranked.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= nprobe)
        .select(F.col(key).alias("query_id"), F.col("cid").alias("list_id"))
    )
    cand = (
        probes.join(assigned.withColumnRenamed(key, "neighbor_id"), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # broadcast ONLY the query vectors (tiny); broadcasting the full
    # quantized corpus here would build an unbounded exchange
    qa = queries.select(F.col(key).alias("query_id"), F.col("q").alias("qq"))
    qb = qdf.select(F.col(key).alias("neighbor_id"), F.col("q").alias("qn"))
    scored = (
        cand.join(F.broadcast(qa), "query_id").join(qb, "neighbor_id")
        .select("query_id", "neighbor_id",
                _qdot(F.col("qq"), F.col("qn")).alias("qdot"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot")
    )


def embedding_near_dup_stats(
    df: DataFrame, key: str = "vec_id", emb: str = "embedding",
    cos_threshold_x100: int = 80, max_exact_rows: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-dup detection, exact integer test:
    dot>0 and dot^2 * 10000 >= t^2 * |a|^2 * |b|^2 (t = threshold/100).

    This is the BRUTE-FORCE baseline — an O(n^2) pair join kept because
    it is exactly oracle-checkable and it defines the recall reference
    for the scale path. It refuses to run above ``max_exact_rows``
    (default 100k -> ~5e9 pairs) so nobody cartesians 10^9 vectors by
    accident; use :func:`embedding_near_dups_lsh` (same predicate,
    bucket-keyed join) at scale, or pass max_exact_rows=None to force."""
    if max_exact_rows is not None:
        # limit+count reads at most max_exact_rows+1 rows — the guard
        # itself must not scan the very input it protects against
        n = df.limit(max_exact_rows + 1).count()
        if n > max_exact_rows:
            raise ValueError(
                f"embedding_near_dup_stats is the O(n^2) exact baseline; "
                f"input exceeds max_exact_rows={max_exact_rows}. "
                "Use embedding_near_dups_lsh (the scale path) or pass "
                "max_exact_rows=None to force the cartesian."
            )
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
