#!/usr/bin/env python
"""Table-maintenance job CLI (Iceberg maintenance analogue):

    spark-submit --py-files engine.zip libgiddy_spark/jobs/maintain_job.py \
        --encoded /path/to/encoded --compact [--target-file-mb 256] \
        [--vacuum]

``--compact`` bin-packs small chunk dirs (streaming micro-batches
produce one per trigger) into consolidated block files and commits a
manifest ``rewrite`` entry; old dirs stay on disk for time travel.
``--vacuum`` physically removes replaced dirs — after it, time travel
to snapshots needing them raises instead of silently losing rows.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--encoded", required=True)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--target-file-mb", type=int, default=256)
    ap.add_argument("--vacuum", action="store_true")
    args = ap.parse_args()
    if not (args.compact or args.vacuum):
        ap.error("nothing to do: pass --compact and/or --vacuum")

    out: dict = {}
    if args.compact:
        from libgiddy_spark.engine import compact_blocks
        from libgiddy_spark.jobs.encode_job import build_spark

        spark = build_spark("libgiddy-spark-maintain")
        out["compact"] = compact_blocks(
            spark, args.encoded,
            target_file_bytes=args.target_file_mb << 20,
        )
    if args.vacuum:
        from libgiddy_spark.engine import vacuum_blocks

        out["vacuum"] = vacuum_blocks(args.encoded)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
