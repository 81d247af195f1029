#!/usr/bin/env python
"""Decode / verify job CLI (SURVEY.md §3.2 entry point B):

    spark-submit --py-files engine.zip libgiddy_spark/jobs/decode_job.py \
        --encoded /path/to/encoded --source /path/to/snapshot \
        --key-col url [--out /path/to/decoded_parquet] [--verify]

With --verify, joins decoded rows back to the source on the key column
and asserts bit-identical columns (BASELINE.json:15 per-row invariant);
exits non-zero on any mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--encoded", required=True)
    ap.add_argument("--source", required=True)
    ap.add_argument("--key-col", required=True)
    ap.add_argument("--out", default=None, help="write decoded rows here")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--key-range", default=None, metavar="LO,HI",
                    help="zone-map pruned decode: only blocks whose "
                         "sort-key range overlaps [LO,HI] (integral keys)")
    ap.add_argument("--key-point", default=None, metavar="VALUE",
                    help="point-lookup pruned decode: zone maps + "
                         "per-block Bloom filters skip blocks that "
                         "provably lack VALUE (int if it parses, else "
                         "string); exact equality applied after decode")
    ap.add_argument("--as-of", default=None, metavar="SNAPSHOT_ID",
                    help="time travel: decode only parts committed up "
                         "to this manifest snapshot id")
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from libgiddy_spark.engine import decode_blocks, verify_roundtrip
    from libgiddy_spark.jobs.encode_job import build_spark
    from libgiddy_spark.table_io import list_parquet_files

    spark = build_spark("libgiddy-spark-decode")
    first_rel = list_parquet_files(args.source)[0][0]
    schema_path = (
        args.source
        if os.path.isfile(args.source)
        else os.path.join(args.source, first_rel)
    )
    schema = pq.read_schema(schema_path)
    krange = None
    if args.key_range:
        lo, hi = args.key_range.split(",")
        krange = (int(lo), int(hi))
    kpoint = None
    if args.key_point is not None:
        # probe type follows the KEY COLUMN's type, not what the text
        # happens to parse as: '0123' against a string key must stay
        # the literal string (an int would implicit-cast-match '123')
        import pyarrow as pa

        ktype = schema.field(args.key_col).type
        if pa.types.is_integer(ktype) or pa.types.is_timestamp(ktype):
            kpoint = int(args.key_point)
        else:
            kpoint = args.key_point
    dec = decode_blocks(spark, args.encoded, schema, key_range=krange,
                        key_point=kpoint, as_of=args.as_of)
    from pyspark.sql import functions as F

    # pruning is block-granular: apply the exact predicate so --out
    # and --verify see precisely the requested rows
    if krange is not None:
        dec = dec.filter(
            (F.col(args.key_col) >= krange[0])
            & (F.col(args.key_col) <= krange[1])
        )
    if kpoint is not None:
        dec = dec.filter(F.col(args.key_col) == kpoint)
    if args.out:
        dec.write.mode("overwrite").parquet(args.out)
    if args.verify:
        src = spark.read.parquet(args.source)
        if krange is not None:
            src = src.filter(
                (F.col(args.key_col) >= krange[0])
                & (F.col(args.key_col) <= krange[1])
            )
        if kpoint is not None:
            src = src.filter(F.col(args.key_col) == kpoint)
        rep = verify_roundtrip(src, dec, args.key_col)
        print(json.dumps(rep))
        if not rep["ok"]:
            sys.exit(2)
    elif not args.out:
        print(json.dumps({"rows_decoded": dec.count()}))


if __name__ == "__main__":
    main()
