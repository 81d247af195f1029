#!/usr/bin/env python
"""Per-declared-query timing harness (guide §1.4/§1.5) — NOT the
driver's bench (bench.py is frozen; this file exists for optimization
evidence in OPTIMIZATION_r06.md).

Times every `__spark_entry__.queries()` entry: query construction
(which for roundtrip queries includes the eager encode) + a noop-sink
materialization of the returned DataFrame, so the computation is timed
without sink cost. Prints one line per query and a sorted summary.

Usage: python bench_extra.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def main() -> None:
    import bench
    import __spark_entry__ as entry

    spark = bench.make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    bench.warm_workers(spark, CPUS)
    reps = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "1"))
    qs = entry.queries()
    rows = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t_build = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_noop = time.time() - t0
            if best is None or t_build + t_noop < sum(best):
                best = (t_build, t_noop)
        t_build, t_noop = best
        rows.append((name, t_build, t_noop))
        print(f"{name}: build {t_build:.3f}s noop {t_noop:.3f}s",
              flush=True)
    print("\n== slowest (build + noop) ==")
    for name, tb, tn in sorted(rows, key=lambda r: -(r[1] + r[2]))[:15]:
        print(f"{tb + tn:7.3f}s  {name}  (build {tb:.3f} / noop {tn:.3f})")
    spark.stop()


if __name__ == "__main__":
    main()
