#!/usr/bin/env python
"""Local mimic of the driver's Spark-vs-DuckDB correctness gate.

Runs `__spark_entry__.queries()` against `oracle_sql()` at a given SF dir
(default sf0.01), comparing row count, column names, and a value hash
(columns sorted by name, rows sorted, cells stringified — LONG 125 vs
DOUBLE 125.0 hash differently on purpose, mirroring the driver).

Usage: python tools/check_oracles.py [query ...]    (no args = all)
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _fmt(v) -> str:
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        return str(float(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(_fmt(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def norm_hash(pdf) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    rows = [
        "|".join(_fmt(r[c]) for c in cols)
        for _, r in pdf.iterrows()
    ]
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


def main(names: list[str]) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    qs = E.queries()
    oracles = E.oracle_sql()
    targets = names or list(qs)
    failed = []
    for name in targets:
        try:
            sdf = qs[name](spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows={len(spdf)} (no oracle, rows-only)")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        sn, sc, sh = norm_hash(spdf)
        on, oc, oh = norm_hash(opdf)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        status = "OK" if ok else "FAIL"
        print(f"{name}: {status} rows {sn}/{on} hash {sh[:8]}/{oh[:8]}"
              + ("" if sc == oc else f" cols {sc} vs {oc}"))
        if not ok:
            failed.append(name)
            if sn == on and sc == oc:
                # show first differing row pair for debugging
                srows = sorted("|".join(_fmt(r[c]) for c in sc)
                               for _, r in spdf.iterrows())
                orows = sorted("|".join(_fmt(r[c]) for c in oc)
                               for _, r in opdf.iterrows())
                for a, b in zip(srows, orows):
                    if a != b:
                        print(f"  spark : {a[:200]}")
                        print(f"  oracle: {b[:200]}")
                        break
    print(f"\n{len(targets) - len(failed)}/{len(targets)} green"
          + (f"; FAILED: {failed}" if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
