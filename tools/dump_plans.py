#!/usr/bin/env python
"""Dump .explain('formatted') for every declared query to plans/<tag>/.

Usage: python tools/dump_plans.py <suffix> [query ...]
       (suffix = e.g. r06/before -> plans/r06/<query>_before.txt)

Plans are captured at sf0.01 (plan SHAPE does not depend on scale
factor; AQE leaves isFinalPlan=false pre-execution either way).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1]  # e.g. "r06/before"
    only = set(sys.argv[2:])
    out_dir, suffix = os.path.split(tag)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", out_dir)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-dump")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            spark.sparkContext.setJobDescription(f"plan:{name}")
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # capture the failure, keep going
            plan = f"PLAN DUMP FAILED: {type(e).__name__}: {e}"
        with open(path, "w") as f:
            f.write(plan if plan.endswith("\n") else plan + "\n")
        print(f"{name}: {len(plan)} bytes", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
