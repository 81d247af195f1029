from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def roundtrip(arr, codec, fsst_table=None):
    """Encode+decode one arrow array; assert bit-identity; return meta."""
    from libgiddy_spark.codecs import decode_array, encode_array

    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    payload, meta = encode_array(arr, codec, fsst_table=fsst_table)
    out = decode_array(payload)
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    out = out.cast(a.type)
    if pa.types.is_floating(a.type):
        # bit-pattern identity (NaN-safe): compare int views + validity
        w = np.int64 if a.type == pa.float64() else np.int32
        va = a.fill_null(0).to_numpy(zero_copy_only=False)
        vo = out.fill_null(0).to_numpy(zero_copy_only=False)
        assert np.array_equal(va.view(w), vo.view(w)), codec
        assert a.is_valid().equals(out.is_valid()), codec
    else:
        assert out.equals(a), f"{codec}: round-trip mismatch"
    return meta, payload


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("libgiddy-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()
