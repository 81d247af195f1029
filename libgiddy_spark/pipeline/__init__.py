"""Training-data pipeline operators over the webtext/documents tables:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language-ID, quality scoring, token stats, fingerprints) and
multimodal binary-column plumbing.

Design rules:
- Spark-first: built-in `pyspark.sql.functions` only (JVM-side,
  whole-stage codegen); the sole Python kernel is the multimodal
  feature extractor (Arrow-batched mapInArrow), mirroring the codec
  layer's vectorized-UDF discipline.
- Oracle-replicable semantics: hashing uses md5 (identical hex output
  in Spark and DuckDB) and similarity uses integer-quantized dot
  products, so every operator's results are bit-comparable against an
  ANSI-SQL oracle — the same correctness gate the codecs get.
"""

from .dedup import (  # noqa: F401
    connected_components,
    dedup_corpus,
    dedup_near_pair_stats,
    exact_dedup,
    jaccard_on_pairs,
    lsh_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_signatures_ngram,
    near_dup_edges,
    ngram_jaccard_stats,
    simhash,
)
from .similarity import (  # noqa: F401
    embedding_near_dup_stats,
    embedding_near_dups_lsh,
    ivf_assign,
    ivf_assign_refined,
    ivf_refine,
    lsh_ann_buckets,
    topk_neighbors,
    topk_neighbors_ivf,
    topk_neighbors_lsh,
)
from .sampling import mix_report, stratified_sample  # noqa: F401
from .sessions import sessionize  # noqa: F401
from .temporal import (  # noqa: F401
    asof_join,
    funnel,
    hypertable_rollup,
    range_join,
)
from .sketch import (  # noqa: F401
    cms_point_estimate,
    cms_sketch,
    hll_estimate,
    hll_registers,
)
from .text import (  # noqa: F401
    fingerprints,
    lang_id,
    line_dedup,
    quality_score,
    redact_pii,
    repetition_signals,
    tfidf_top_terms,
    token_stats,
    unigram_surprisal,
)
