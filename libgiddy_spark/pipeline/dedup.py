"""Deduplication operators: exact, MinHash signatures + LSH banding,
near-dup candidate verification (word-set Jaccard), SimHash, and the
terminal ``dedup_corpus`` (exact-dedup -> LSH-verified near-dup graph
-> connected components -> keeper per component -> cleaned table).

All hashing is md5 (bit-identical hex in Spark and DuckDB) and every
ratio is floor-scaled to an integer, so each operator has an exact
ANSI-SQL oracle (the corpus oracle uses a recursive CTE for the
components). Scale notes: signatures/bands are narrow aggregates
(shuffle keyed on doc_id / bucket); the pair-verification join is
bounded to LSH-bucket candidates with a per-bucket size cap
(degenerate buckets would re-create the quadratic blow-up LSH exists
to avoid — and identical texts are collapsed by exact dedup BEFORE
LSH, so a capped bucket only ever drops genuinely-distinct colliders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import idiv

N_HASHES = 8
BAND_SIZE = 2
MAX_BUCKET = 256  # per-(band, bucket) candidate cap — skew guard


def exact_dedup(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text, with the
    surviving (minimum) key and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_hash"))
        .agg(F.min(key).alias("keeper"), F.count("*").alias("n_dups"))
    )


def _word_arrays(df: DataFrame, key: str, text: str) -> DataFrame:
    """(key, toks) with toks = the doc's DISTINCT word array. The token
    SET stays a per-row array — no explode, no shuffle; MinHash and
    Jaccard both compute from it with higher-order functions (§4.1
    built-ins; the exploded formulation shuffled ~200 rows per doc
    through every aggregation and join). Null texts (no token set) are
    dropped, matching the exploded form's semantics."""
    return df.select(
        F.col(key),
        F.array_distinct(F.split(F.col(text), " ")).alias("toks"),
    ).where(F.col("toks").isNotNull())


def _shingle_arrays(df: DataFrame, key: str, text: str, n: int = 5) -> DataFrame:
    """(key, toks) with toks = the doc's DISTINCT character-n-gram
    array (same no-explode shape as :func:`_word_arrays`). Character
    shingles are the word-boundary-free dedup signal (robust to
    tokenization and to scripts without spaces, e.g. zh). substring()
    is character-based in both Spark and DuckDB, so the oracle is
    exact on multibyte text."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text}) - {n - 1}, 1)), "
        f"i -> substring({text}, i, {n}))"
    )
    return df.select(
        F.col(key), F.array_distinct(grams).alias("toks")
    ).where(F.col("toks").isNotNull())


def _doc_words(df: DataFrame, key: str, text: str) -> DataFrame:
    """(key, word) pairs, distinct — the exploded view of
    :func:`_word_arrays` (kept for operators that aggregate per token,
    e.g. SimHash; set-style consumers use the array form directly)."""
    return df.select(
        F.col(key), F.explode(F.array_distinct(F.split(F.col(text), " "))).alias("w")
    )


def _sign_arrays(arr_df: DataFrame, key: str, n_hashes: int = N_HASHES,
                 with_size: bool = False) -> DataFrame:
    """MinHash from the per-row token ARRAY: sig i = min over the set
    of md5(w||'#i'), via array_min(transform(...)) — a narrow per-row
    projection with ZERO shuffle (the exploded groupBy formulation
    exchanged the whole token frame once per evaluation; §2.4).
    ``with_size`` piggybacks the set size (``_n``) so the Jaccard
    denominator needs no second pass."""
    def _mh(tag: str):
        # single-parameter lambda: a two-parameter one would make
        # transform() bind the second name to the ELEMENT INDEX
        return lambda x: F.md5(F.concat(x, F.lit(tag)))

    cols = [F.col(key)] + [
        F.array_min(F.transform(F.col("toks"), _mh(f"#{i}"))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    if with_size:
        cols.append(F.size("toks").alias("_n"))
    return arr_df.select(*cols)


def _capped_band_pairs(sig: DataFrame, key: str, max_bucket: int) -> DataFrame:
    """Signature -> LSH bands -> distinct candidate (ka, kb) pairs from
    buckets holding <= max_bucket docs (the degenerate-bucket guard:
    one boilerplate bucket with 10^6 docs would otherwise re-create the
    quadratic join LSH exists to avoid).

    Pair generation is a per-bucket combination EXPLODE over the
    bucket's (capped, sorted) member list, not a self-join: the
    self-join evaluated the whole signature subtree once per side
    (§2.4 duplicated subtrees — for dedup_corpus that subtree is the
    full tokenize+md5 pipeline), and its output is identical — every
    a<b pair within a surviving bucket. The window count bounds
    memory BEFORE the member lists are collected (a dropped degenerate
    bucket never materializes its list), and window + both aggregates
    share one (band, bucket) exchange."""
    bands = lsh_buckets(sig, key)
    w = Window.partitionBy("band", "bucket")
    ok = (
        bands.withColumn("bsz", F.count("*").over(w))
        .filter((F.col("bsz") <= max_bucket) & (F.col("bsz") >= 2))
        .drop("bsz")
    )
    members = ok.groupBy("band", "bucket").agg(
        F.array_sort(F.collect_list(F.col(key))).alias("_ks")
    )
    pairs = F.expr(
        "flatten(transform(_ks, (a, i) -> "
        "transform(slice(_ks, i + 2, size(_ks)), "
        "b -> named_struct('ka', a, 'kb', b))))"
    )
    return (
        members.select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.ka").alias("ka"), F.col("_p.kb").alias("kb"))
        .distinct()
    )


def _jaccard_from_arrays(arr_df: DataFrame, cand: DataFrame,
                         key: str) -> DataFrame:
    """Exact token-set Jaccard (floor-scaled x1000) for candidate
    pairs, computed as |array_intersect| of the two docs' token
    ARRAYS. The exploded formulation materialized one row per
    (pair, token-of-ka) — ~|cand| x avg-set-size rows (measured 141M
    on the sf0.1 shingle path, 31 s) probing a token hash relation;
    this shape joins each candidate pair to exactly TWO array rows and
    intersects in place (~|cand| rows, §2.3 shuffle fewer bytes /
    §3.3 explode-before-join avoided). Arrays are distinct per doc, so
    size(array_intersect) is the exact set intersection."""
    wa = arr_df.select(F.col(key).alias("ka"), F.col("toks").alias("_ta"),
                       F.size("toks").alias("na"))
    wb = arr_df.select(F.col(key).alias("kb"), F.col("toks").alias("_tb"),
                       F.size("toks").alias("nb"))
    return (
        cand.join(wa, "ka").join(wb, "kb")
        .withColumn("n_inter", F.size(F.array_intersect("_ta", "_tb")))
        .withColumn("jac_x1000",
                    idiv(1000 * F.col("n_inter"),
                         F.col("na") + F.col("nb") - F.col("n_inter")))
        .select("ka", "kb", "jac_x1000")
    )


def _jaccard_stats_row(jac: DataFrame, threshold_x1000: int) -> DataFrame:
    return jac.agg(
        F.count("*").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("jac_x1000") >= threshold_x1000, 1).otherwise(0)
              ).alias("n_near_dups"),
        F.max("jac_x1000").alias("max_jac_x1000"),
        F.min("jac_x1000").alias("min_jac_x1000"),
    )


def minhash_signatures(
    df: DataFrame, key: str = "doc_id", text: str = "text", n_hashes: int = N_HASHES
) -> DataFrame:
    """MinHash over the word set: signature i = min(md5(word || '#i'))."""
    return _sign_arrays(_word_arrays(df, key, text), key, n_hashes)


def minhash_signatures_ngram(
    df: DataFrame, key: str = "doc_id", text: str = "text",
    n: int = 5, n_hashes: int = N_HASHES,
) -> DataFrame:
    """MinHash over the character-n-gram shingle set (the
    tokenization-free variant of :func:`minhash_signatures`)."""
    return _sign_arrays(_shingle_arrays(df, key, text, n), key, n_hashes)


def ngram_jaccard_stats(
    df: DataFrame, key: str = "doc_id", text: str = "text", n: int = 5,
    jaccard_threshold_x1000: int = 700, max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """n-gram Jaccard near-dup detection: shingle MinHash -> LSH bands
    (capped) -> exact shingle-set Jaccard on candidates -> stats row.
    Same machinery as the word-set path, different token source."""
    arrs = _shingle_arrays(df, key, text, n)
    cand = _capped_band_pairs(_sign_arrays(arrs, key), key, max_bucket)
    jac = _jaccard_from_arrays(arrs, cand, key)
    return _jaccard_stats_row(jac, jaccard_threshold_x1000)


def lsh_buckets(
    sig_df: DataFrame, key: str = "doc_id",
    n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
) -> DataFrame:
    """Band the signature: bucket id = md5(concat of the band's rows).
    Docs sharing any (band, bucket) become near-dup candidates.

    Single-pass shape: one inline/explode of a per-row (band, bucket)
    array instead of a union of per-band selects — the union form
    evaluated the whole signature pipeline (explode + distinct + 8 md5
    aggregates) once PER BAND (guide §2.4: duplicated subtrees;
    measured 4x the upstream work on the sf0.1 corpus). Same rows,
    same oracle."""
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat(*[
                F.col(f"mh{b * band_size + j}") for j in range(band_size)
            ])).alias("bucket"),
        )
        for b in range(n_hashes // band_size)
    ]
    return sig_df.select(
        F.col(key), F.explode(F.array(*entries)).alias("_bb")
    ).select(F.col(key), F.col("_bb.band").alias("band"),
             F.col("_bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    df: DataFrame, key: str = "doc_id", text: str = "text",
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Distinct (ka, kb) near-dup candidates from the word-set MinHash
    bands, with the per-bucket size cap (see _capped_band_pairs)."""
    return _capped_band_pairs(minhash_signatures(df, key, text), key, max_bucket)


def jaccard_on_pairs(
    df: DataFrame, cand: DataFrame, key: str = "doc_id", text: str = "text",
) -> DataFrame:
    """Exact word-set Jaccard (floor-scaled x1000) for candidate pairs."""
    return _jaccard_from_arrays(_word_arrays(df, key, text), cand, key)


def dedup_near_pair_stats(
    df: DataFrame, key: str = "doc_id", text: str = "text",
    jaccard_threshold_x1000: int = 700,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """LSH candidates -> exact word-set Jaccard verification; returns
    one stats row (candidate pairs, verified near-dups) — the decision
    numbers a dedup pass needs."""
    arrs = _word_arrays(df, key, text)
    cand = _capped_band_pairs(_sign_arrays(arrs, key), key, max_bucket)
    jac = _jaccard_from_arrays(arrs, cand, key)
    return _jaccard_stats_row(jac, jaccard_threshold_x1000)


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def connected_components(
    nodes: DataFrame, edges: DataFrame,
    key: str = "node", src: str = "src", dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation connected components -> (node, comp).

    Integral keys propagate the key value itself (comp = component's
    minimum key). Non-integral keys (string doc ids, urls) get a
    collision-checked xxhash64 surrogate label — a silent
    ``cast('long')`` would turn string keys into all-NULL labels and
    an EMPTY result — and comp is the representative node's KEY value
    (arbitrary representative; group on it, don't order by it).

    Labels only decrease, so sum(label) is a strictly-decreasing
    convergence witness — one cheap scalar agg per round, no row data
    to the driver. localCheckpoint truncates the join lineage each
    round (the standard Spark CC shape; iterations = graph diameter,
    small for near-dup clusters). ``edges`` must be symmetric
    (both directions present). Exhausting max_iter without the
    fixpoint warns: the labels would be silently under-merged."""
    ntype = dict(nodes.dtypes)[key]
    back = None
    if ntype in _INTEGRAL_TYPES:
        labels = nodes.select(F.col(key).alias("node"),
                              F.col(key).cast("long").alias("label"))
    else:
        for seed in range(4):
            ids = nodes.select(
                F.col(key).alias("node"),
                F.xxhash64(F.col(key), F.lit(seed)).alias("nid"),
            ).localCheckpoint()
            n, nd = ids.agg(F.count("*"), F.count_distinct("nid")).first()
            if n == nd:
                break
        else:
            raise ValueError(
                "connected_components: xxhash64 surrogate ids collided on "
                "4 seeds — duplicate node keys in `nodes`?"
            )
        labels = ids.select("node", F.col("nid").alias("label"))
        back = ids
    # the edge list is re-joined EVERY round: without this, each
    # iteration re-evaluated the whole upstream edge pipeline (for
    # dedup_corpus: tokenize -> MinHash -> LSH -> Jaccard verify) —
    # measured ~90% of dedup_corpus wall at sf0.1. The verified edge
    # set is small (near-dup pairs only), so materializing it once is
    # the standard Spark CC shape (guide §5: cache only what is reused
    # AND expensive to recompute — this is both).
    edges = edges.localCheckpoint()
    prev = None
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, F.col(src) == F.col("node"))
            .select(F.col(dst).alias("node"), F.col("label"))
            .groupBy("node").agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, "node", "left")
            .select("node", F.least("label", "nbr_label").alias("label"))
            .localCheckpoint()
        )
        # decimal(38,0) sum: exact and overflow-free even for full-range
        # xxhash64 labels (ANSI mode would fail a long sum)
        s = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        if s == prev:
            converged = True
            break
        prev = s
    if not converged:
        # the witness needs one observation round AFTER the last merge:
        # a graph that stabilizes exactly at round max_iter is complete
        # but unobserved — verify with one more (cheap, rare) round
        # before accusing the result of being under-merged
        nbr = (
            edges.join(labels, F.col(src) == F.col("node"))
            .select(F.col(dst).alias("node"), F.col("label"))
            .groupBy("node").agg(F.min("label").alias("nbr_label"))
        )
        check = (
            labels.join(nbr, "node", "left")
            .select("node", F.least("label", "nbr_label").alias("label"))
        )
        s = check.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        converged = s == prev
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: no fixpoint after max_iter={max_iter} "
            "rounds — components may be under-merged; raise max_iter "
            "(needed rounds ~= graph diameter)",
            stacklevel=2,
        )
    if back is None:
        return labels.withColumnRenamed("label", "comp")
    rep = back.select(F.col("nid").alias("label"), F.col("node").alias("comp"))
    return labels.join(rep, "label").select("node", "comp")


def near_dup_edges(
    df: DataFrame, key: str = "doc_id", text: str = "text",
    jaccard_threshold_x1000: int = 700, max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Symmetric verified near-dup edge list (src, dst)."""
    arrs = _word_arrays(df, key, text)
    cand = _capped_band_pairs(_sign_arrays(arrs, key), key, max_bucket)
    hits = (_jaccard_from_arrays(arrs, cand, key)
            .filter(F.col("jac_x1000") >= jaccard_threshold_x1000))
    fwd = hits.select(F.col("ka").alias("src"), F.col("kb").alias("dst"))
    rev = hits.select(F.col("kb").alias("src"), F.col("ka").alias("dst"))
    return fwd.unionAll(rev)


def dedup_corpus(
    df: DataFrame, key: str = "doc_id", text: str = "text",
    jaccard_threshold_x1000: int = 700, max_bucket: int = MAX_BUCKET,
    max_iter: int = 25,
) -> DataFrame:
    """The terminal dedup operator: returns the CLEANED corpus.

    1. exact dedup: keep min-key doc per identical text (collapses the
       degenerate identical-text buckets before LSH ever sees them);
    2. LSH-verified near-dup edges over the exact-unique survivors;
    3. connected components (min-label propagation);
    4. keeper = min key per component; emit keepers' full rows.
    """
    keep_exact = (
        df.groupBy(F.md5(F.col(text)).alias("h"))
        .agg(F.min(key).alias(key))
        .select(key)
    )
    uniq = df.join(keep_exact, key, "left_semi")
    edges = near_dup_edges(uniq, key, text, jaccard_threshold_x1000, max_bucket)
    labels = connected_components(uniq.select(F.col(key).alias("node")), edges,
                                  max_iter=max_iter)
    # keeper = min key per component (key-type-agnostic: comp may be a
    # surrogate-representative value for string keys — group, don't trust
    # comp == node)
    keepers = (labels.groupBy("comp")
               .agg(F.min("node").alias(key))
               .select(key))
    return uniq.join(keepers, key, "left_semi")


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
