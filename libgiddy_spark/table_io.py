"""TableIO seam: Iceberg-style snapshot access (SURVEY.md §1.2).

Production target is an Iceberg catalog read; this sandbox has no
Iceberg runtime jar (SURVEY.md §1.2), so the sandbox backend is a
partitioned-parquet directory + our own JSON snapshot manifest — the
engine only ever addresses data through (snapshot_id, part_id), so the
backends are interchangeable. ``part_id`` is content-derived
(xxhash64 of a key column, mod num_parts): stable across runs and file
layouts, which is what makes checkpoint/resume sound.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_parquet_files(path: str) -> list[tuple[str, int]]:
    """(relative path, bytes) for every parquet file under ``path``
    (``path`` may itself be a single parquet file)."""
    if os.path.isfile(path):
        return [(os.path.basename(path), os.path.getsize(path))]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                out.append((os.path.relpath(full, path), os.path.getsize(full)))
    return sorted(out)


def snapshot_id_of(path: str) -> str:
    """Deterministic snapshot id from the source file listing (name+size)."""
    entries = [f"{p}:{s}" for p, s in list_parquet_files(path)]
    h = hashlib.sha256("\n".join(entries).encode()).hexdigest()[:16]
    return f"snap-{h}"


def load_source(
    spark: SparkSession,
    path: str,
    key_col: str,
    num_parts: int,
) -> DataFrame:
    """Read the source table and assign the stable content-derived part_id.

    The scan stays fully Catalyst-planned (parquet pushdown/pruning work
    as usual); lineage comes from ``_metadata.file_path`` when needed.
    """
    df = spark.read.parquet(path)
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_parts)).cast("int")
    )


def default_num_parts(spark: SparkSession, path: str, target_part_bytes: int = 64 << 20) -> int:
    total = sum(s for _p, s in list_parquet_files(path))
    # parquet is ~3-4x smaller than in-memory; aim each part under the target
    est_raw = total * 4
    return max(1, min(1 << 16, (est_raw + target_part_bytes - 1) // target_part_bytes))
