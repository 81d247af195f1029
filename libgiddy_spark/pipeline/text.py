"""Text-analysis operators: token stats, quality scoring, language-ID,
document fingerprints. All built-in Spark SQL functions (JVM-side);
floating ratios are floor-scaled to integers so results are
bit-comparable against the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "on")


def idiv(num, den):
    """Exact integer floor division for non-negative longs.

    ``num - pmod(num, den)`` is exactly divisible by ``den``, and dividing
    two exact integers whose quotient is an integer < 2^53 is exact in
    IEEE doubles — so this matches DuckDB's ``//`` bit-for-bit, with no
    float-rounding hazard (unlike ``floor(1000 * a / b)``)."""
    return ((num - F.pmod(num, den)) / den).cast("long")


def _words(text_col):
    return F.split(text_col, " ")


def unigram_surprisal(
    df: DataFrame, key: str = "doc_id", text: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Integer-exact unigram-LM quality score — the perplexity-filter
    signal of a training-data pipeline, with no float anywhere:
    surprisal(w) = floor(log2(N // c(w))) bits (N = corpus tokens,
    c = w's count; floor-log2 = binary-string length - 1, identical in
    Spark conv(...,10,2) and DuckDB bin()). Per doc: token count, total
    bits, and mean bits x1000 (floor). High mean = rare-word-heavy
    (possibly noisy) text; low = boilerplate. Corpus stats come from
    the input itself: one token explode, one groupBy(w), one broadcast
    one-row total.

    The token->count join BROADCASTS the vocab side: natural-language
    vocab grows ~O(sqrt(corpus)) (Heaps' law) and the aggregated
    (word, count) table is tiny next to the exploded token stream, while
    a shuffled join on the word key would be maximally skewed (every
    "the" to one reducer). Broadcasting removes the skewed exchange
    entirely (VERDICT r3 perf note 2). For a corpus whose raw vocab
    outgrows executor memory (1e12 web docs can reach 1e9 distinct
    junk tokens), pass ``broadcast_vocab=False`` to fall back to the
    shuffled join and rely on AQE skew-join splitting — same results,
    pinned by the same oracle."""
    toks = df.select(F.col(key), F.explode(_words(F.col(text))).alias("w"))
    counts = toks.groupBy("w").agg(F.count("*").alias("c"))
    if broadcast_vocab:
        counts = F.broadcast(counts)
    total = toks.agg(F.count("*").alias("n_total"))
    nc = idiv(F.col("n_total"), F.col("c"))
    bits = F.length(F.conv(nc.cast("string"), 10, 2)) - F.lit(1)
    scored = (
        toks.join(counts, "w")
        .crossJoin(F.broadcast(total))
        .select(F.col(key), bits.alias("bits"))
    )
    return (
        scored.groupBy(key)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("bits").alias("sum_bits"),
        )
        .withColumn("mean_bits_x1000",
                    idiv(1000 * F.col("sum_bits"), F.col("n_tokens")))
    )


def tfidf_top_terms(
    df: DataFrame, key: str = "doc_id", text: str = "text", k: int = 3,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Integer-exact TF-IDF: per doc, the top-``k`` terms by
    tf * idf_bits where idf_bits = floor(log2(N // df)) (same
    binary-string floor-log2 as :func:`unigram_surprisal` — identical
    in Spark ``conv`` and DuckDB ``bin``). Ties break by term asc, so
    the ranking is fully deterministic and oracle-checkable.

    Scale shape: one explode, one (doc, term) count, one term-level
    count; the term->df join broadcasts the vocab (Heaps' law — see
    unigram_surprisal) and the top-k is a per-doc window, never a
    global sort."""
    from pyspark.sql.window import Window

    toks = df.select(F.col(key), F.explode(_words(F.col(text))).alias("w"))
    tf = toks.groupBy(key, "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    n_docs = df.agg(F.count("*").alias("n_docs"))
    ndiv = idiv(F.col("n_docs"), F.col("df"))
    idf_bits = (F.length(F.conv(ndiv.cast("string"), 10, 2)) - F.lit(1))
    scored = (
        tf.join(dfreq, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(key), F.col("w").alias("term"), "tf",
            idf_bits.cast("int").alias("idf_bits"),
            (F.col("tf") * idf_bits).cast("long").alias("score"),
        )
    )
    w = Window.partitionBy(key).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def repetition_signals(
    df: DataFrame, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Gopher-style repetition filter signals, integer-exact: per doc,
    bigram count, the most-repeated bigram's count, and the fraction of
    bigram occurrences belonging to repeated bigrams (x1000, floor) —
    high values flag boilerplate / spam / degenerate generations.
    Documents with fewer than two tokens have no bigrams and drop out
    (same in the SQL oracle). One explode + two hash aggregations,
    all JVM-side."""
    ws = _words(F.col(text))
    # element_at is 1-based; guard <2 tokens (sequence(0,-1) DESCENDS)
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    b = df.select(F.col(key), F.explode(bigrams).alias("bg"))
    c = b.groupBy(key, "bg").agg(F.count("*").alias("n"))
    dup = F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).cast("long")
    return (
        c.groupBy(key)
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.max("n").cast("long").alias("max_bigram"),
            dup.alias("dup_bigrams"),
        )
        .withColumn(
            "dup_frac_x1000",
            idiv(1000 * F.col("dup_bigrams"), F.col("n_bigrams")),
        )
    )


# BPE-ish pre-tokenizer: alphanumeric runs or single non-space symbols
# (ASCII classes mean the same thing to Java regex and RE2 — exact oracle)
BPE_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def token_stats(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) + shape stats."""
    w = _words(F.col(text))
    return df.select(
        F.col(key),
        F.length(text).alias("n_chars"),
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_uniq_tokens"),
        F.length(F.regexp_replace(F.col(text), " ", "")).alias("n_nonspace_chars"),
        F.regexp_count(F.col(text), F.lit(BPE_RE)).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Heuristic quality components (stopword ratio, type-token ratio,
    mean token length), floor-scaled x1000 for exact comparability."""
    w = _words(F.col(text))
    n_tok = F.size(w).cast("long")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("long")
    n_uniq = F.size(F.array_distinct(w)).cast("long")
    n_nonspace = F.length(F.regexp_replace(F.col(text), " ", "")).cast("long")
    n_len = F.length(F.col(text)).cast("long")
    n_punct = n_len - F.length(
        F.regexp_replace(F.col(text), r"[.,!?;:]", "")
    ).cast("long")
    n_chars = F.greatest(n_len, F.lit(1))  # clamp denominator only
    score = (
        idiv(1000 * n_stop, n_tok).alias("stop_ratio_x1000"),
        idiv(1000 * n_uniq, n_tok).alias("ttr_x1000"),
        idiv(1000 * n_nonspace, n_tok).alias("mean_token_len_x1000"),
        idiv(1000 * n_punct, n_chars).alias("punct_ratio_x1000"),
    )
    return df.select(F.col(key), n_tok.alias("n_tokens"), *score)


def lang_id(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Charset-heuristic language ID: CJK-dominant text -> 'zh', else
    'latin'. (Printable-ASCII stripping — '[ -~]' means the same thing
    to Java regex and RE2, which is what makes the oracle exact.)"""
    non_ascii = F.length(F.regexp_replace(F.col(text), "[ -~]", ""))
    total = F.length(text)
    pred = F.when(non_ascii * 10 > total * 3, F.lit("zh")).otherwise(F.lit("latin"))
    return df.select(
        F.col(key),
        non_ascii.alias("n_non_ascii"),
        total.alias("n_chars"),
        pred.alias("lang_pred"),
    )


def fingerprints(df: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Document fingerprints: exact (md5 of lowered text) and bag-of-
    words (md5 of the sorted distinct token list) — the order-
    insensitive near-dup key."""
    w = F.array_sort(F.array_distinct(_words(F.lower(F.col(text)))))
    return df.select(
        F.col(key),
        F.md5(F.lower(F.col(text))).alias("fp_exact"),
        F.md5(F.concat_ws(" ", w)).alias("fp_bag"),
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


def redact_pii(df: DataFrame, key: str = "doc_id",
               text: str = "text") -> DataFrame:
    """PII scrub (the C4/CCNet pre-training hygiene stage): count and
    replace email addresses and IPv4 literals with typed placeholders.
    Pure JVM regexp (regexp_count/regexp_replace, whole-stage codegen);
    the patterns use only syntax Java regex and RE2 read identically,
    so the redacted text is bit-comparable to a DuckDB oracle. Counts
    are taken on the ORIGINAL text, replacement order is fixed
    (emails, then IPs)."""
    c = F.col(text)
    red = F.regexp_replace(
        F.regexp_replace(c, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>")
    return df.select(
        F.col(key),
        F.regexp_count(c, F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(c, F.lit(_IPV4_RE)).cast("int").alias("n_ips"),
        red.alias("redacted"),
    )


def line_dedup(df: DataFrame, key: str = "doc_id",
               text: str = "text") -> DataFrame:
    """Corpus-wide exact LINE deduplication (the C4 rule: a line kept
    only at its FIRST occurrence across the whole corpus — boilerplate
    headers/footers vanish from every later document). Deterministic
    keeper = the line's lexicographic-minimum (doc, position) struct,
    so the hot-line aggregation combines map-side (a million-document
    boilerplate line costs one partial per task, not a mega-group);
    there is NO join back at all: the keeper aggregate's value — the
    minimal (doc, position) — IS the surviving row, so the kept set is
    a pure projection of the (one row per distinct line) aggregate.
    The previous formulation joined the exploded lines against the
    keeper by line content, which re-shuffled every exploded line AND
    sent a line present in 10^8 docs to one reducer (the r5 skew
    finding); the rewrite removes that exchange and the join outright
    — identical output for unique doc keys (the operator's contract).
    Docs whose every line was seen before collapse to the empty string
    — the caller filters.

    Output: (key, cleaned_text, n_lines, n_kept)."""
    reserved = {"_pos", "_pos1", "_line", "_k"}
    bad = reserved & set(df.columns)
    if bad:
        raise ValueError(
            f"input columns collide with line_dedup internals: "
            f"{sorted(bad)}")
    arr = F.split(F.col(text), "\n")
    ln = df.select(F.col(key), F.posexplode(arr).alias("_pos", "_line")) \
        .withColumn("_pos1", F.col("_pos") + 1)
    # struct min = lexicographic (key, pos): type-agnostic and
    # collision-free (an int64 encoding would break on string keys and
    # collide past 10^6 lines); still combines map-side
    tag = F.struct(F.col(key), F.col("_pos1"))
    keeper = ln.groupBy("_line").agg(F.min(tag).alias("_k"))
    kept = keeper.select(
        F.col("_k").getField(key).alias(key),
        F.col("_k").getField("_pos1").alias("_pos1"),
        "_line",
    )
    reb = kept.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos1", "_line"))),
                lambda x: x["_line"],
            ),
            "\n",
        ).alias("cleaned_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.select(F.col(key), F.size(arr).alias("n_lines"))
    return base.join(reb, key, "left").select(
        F.col(key),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        F.col("n_lines"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )
