#!/usr/bin/env python
"""Training-data pipeline CLI — ships via spark-submit:

    zip -r engine.zip libgiddy_spark
    spark-submit --py-files engine.zip libgiddy_spark/jobs/pipeline_job.py \
        --op dedup_corpus --source /path/docs.parquet --out /path/cleaned \
        [--key-col doc_id] [--text-col text]
    spark-submit ... --op text_stats   --source docs.parquet  --out out/
    spark-submit ... --op ann_topk     --source embs.parquet  --out out/ \
        [--key-col vec_id] [--emb-col embedding] [--k 3] [--n-queries 5] \
        [--method lsh|ivf]
    spark-submit ... --op near_dups    --source embs.parquet  --out out/
    spark-submit ... --op ivf_assign   --source embs.parquet  --out out/
    spark-submit ... --op hll|cms      --source t.parquet     --out out/ \
        [--sketch-col user_id]

Each op reads a parquet table, runs the corresponding pipeline operator
(the same implementations the driver-contract queries exercise), and
writes the result as parquet + one JSON summary line to stdout.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    # absolute import: spark-submit runs this file as a top-level script
    from libgiddy_spark.jobs.encode_job import build_spark
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--op", required=True,
                    choices=["dedup_corpus", "text_stats", "ann_topk",
                             "near_dups", "ivf_assign", "hll", "cms",
                             "sessions", "tfidf", "sample", "funnel",
                             "rollup", "line_dedup", "redact_pii"])
    ap.add_argument("--source", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--key-col", default=None)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--emb-col", default="embedding")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--n-queries", type=int, default=5)
    ap.add_argument("--method", default="lsh", choices=["lsh", "ivf"])
    ap.add_argument("--jaccard-threshold-x1000", type=int, default=700)
    ap.add_argument("--measure-col", default=None,
                    help="numeric column summed per bucket for "
                         "--op rollup (keeps --key-col meaning the "
                         "entity key everywhere else)")
    ap.add_argument("--sketch-col", default=None,
                    help="column for --op hll/cms (default: key col)")
    args = ap.parse_args()

    spark = build_spark(f"libgiddy-spark-pipeline-{args.op}")
    df = spark.read.parquet(args.source)

    if args.op == "dedup_corpus":
        from libgiddy_spark.pipeline import dedup_corpus

        key = args.key_col or "doc_id"
        res = dedup_corpus(
            df, key=key, text=args.text_col,
            jaccard_threshold_x1000=args.jaccard_threshold_x1000,
        )
    elif args.op == "text_stats":
        from libgiddy_spark.pipeline import (
            lang_id, quality_score, token_stats,
        )

        key, text = args.key_col or "doc_id", args.text_col
        res = (
            token_stats(df, key=key, text=text)
            .join(quality_score(df, key=key, text=text).drop("n_tokens"), key)
            .join(lang_id(df, key=key, text=text).drop("n_chars"), key)
        )
    elif args.op == "ann_topk":
        key = args.key_col or "vec_id"
        if args.method == "ivf":
            from libgiddy_spark.pipeline import topk_neighbors_ivf as topk
        else:
            from libgiddy_spark.pipeline import topk_neighbors_lsh as topk
        res = topk(df, key=key, emb=args.emb_col, k=args.k,
                   n_queries=args.n_queries)
    elif args.op == "ivf_assign":
        from libgiddy_spark.pipeline import ivf_assign

        res = ivf_assign(df, key=args.key_col or "vec_id", emb=args.emb_col)
    elif args.op == "tfidf":
        from libgiddy_spark.pipeline import tfidf_top_terms

        res = tfidf_top_terms(df, key=args.key_col or "doc_id",
                              text=args.text_col, k=args.k)
    elif args.op == "sample":
        from libgiddy_spark.pipeline import stratified_sample

        res = stratified_sample(df, key=args.key_col or "doc_id")
    elif args.op == "sessions":
        from libgiddy_spark.pipeline import sessionize

        res = sessionize(df, user_col=args.key_col or "user_id")
    elif args.op == "funnel":
        from libgiddy_spark.pipeline import funnel

        res = funnel(df, user=args.key_col or "user_id")
    elif args.op == "rollup":
        from libgiddy_spark.pipeline import hypertable_rollup

        res = hypertable_rollup(
            df, sum_cols=(args.measure_col or "user_id",))
    elif args.op == "line_dedup":
        from libgiddy_spark.pipeline import line_dedup

        res = line_dedup(df, key=args.key_col or "doc_id",
                         text=args.text_col)
    elif args.op == "redact_pii":
        from libgiddy_spark.pipeline import redact_pii

        res = redact_pii(df, key=args.key_col or "doc_id",
                         text=args.text_col)
    elif args.op == "hll":
        from libgiddy_spark.pipeline import hll_registers

        res = hll_registers(df, args.sketch_col or args.key_col or "doc_id")
    elif args.op == "cms":
        from libgiddy_spark.pipeline import cms_sketch

        res = cms_sketch(df, args.sketch_col or args.key_col or "doc_id")
    else:  # near_dups: the LSH scale path, never the cartesian baseline
        from libgiddy_spark.pipeline import embedding_near_dups_lsh

        res = embedding_near_dups_lsh(
            df, key=args.key_col or "vec_id", emb=args.emb_col)

    res.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"op": args.op, "out": args.out, "rows": int(n)}))


if __name__ == "__main__":
    main()
