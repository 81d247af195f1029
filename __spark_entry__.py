"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full encode -> blocks -> decode round-trip
of sf0.001 ``documents`` through the libgiddy_spark engine (auto codec
selection: dict/RLE/FoR+bitpack/delta/FSST per SURVEY.md §2.1).

``queries()`` / ``oracle_sql()`` — each implemented scheme is proven
end-to-end: the Spark side encodes the source table with that codec
(forced), decodes the blocks, and returns the decoded rows; the DuckDB
oracle reads the raw parquet directly. Identical results == decoded
columns bit-identical to source (BASELINE.json north rule).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _rt(spark, sf_dir, table, key_col, columns, forced=None) -> DataFrame:
    from libgiddy_spark.engine import roundtrip_df

    return roundtrip_df(
        spark,
        f"{sf_dir}/{table}.parquet",
        key_col=key_col,
        columns=columns,
        forced_codecs=forced,
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode+decode sf0.001 documents, auto codec selection."""
    return _rt(
        spark,
        "/root/testdata/sf0.001",
        "documents",
        "doc_id",
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


# --- queries -------------------------------------------------------------


def q_roundtrip_documents(spark, sf_dir):
    return _rt(spark, sf_dir, "documents", "doc_id",
               ["doc_id", "text", "lang", "source", "n_chars"])


def q_roundtrip_dict_lang(spark, sf_dir):
    return _rt(spark, sf_dir, "documents", "doc_id", ["doc_id", "lang"],
               forced={"lang": "dict", "doc_id": "for"})


def q_roundtrip_rle_source(spark, sf_dir):
    return _rt(spark, sf_dir, "documents", "doc_id", ["doc_id", "source"],
               forced={"source": "rle", "doc_id": "bitpack"})


def q_roundtrip_fsst_text(spark, sf_dir):
    return _rt(spark, sf_dir, "documents", "doc_id", ["doc_id", "text"],
               forced={"text": "fsst", "doc_id": "delta"})


def q_roundtrip_delta_ts(spark, sf_dir):
    return _rt(spark, sf_dir, "events", "event_id", ["event_id", "ts"],
               forced={"ts": "delta", "event_id": "delta"})


def q_roundtrip_for_bitpack(spark, sf_dir):
    return _rt(spark, sf_dir, "lineitem", "l_orderkey",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
               forced={"l_orderkey": "for", "l_partkey": "for",
                       "l_suppkey": "bitpack", "l_linenumber": "for"})


def q_roundtrip_rpe_nchars(spark, sf_dir):
    return _rt(spark, sf_dir, "documents", "doc_id", ["doc_id", "n_chars"],
               forced={"n_chars": "rpe", "doc_id": "for"})


def q_roundtrip_model_ts(spark, sf_dir):
    """Function-model codec (per-segment fixed-point linear + residuals)
    on the near-linear events timestamp column."""
    return _rt(spark, sf_dir, "events", "event_id", ["event_id", "ts"],
               forced={"ts": "model", "event_id": "dzb"})


def q_roundtrip_bitmap_linenumber(spark, sf_dir):
    """Incidence-bitmaps codec on the low-cardinality l_linenumber."""
    return _rt(spark, sf_dir, "lineitem", "l_orderkey",
               ["l_orderkey", "l_linenumber"],
               forced={"l_linenumber": "bitmap", "l_orderkey": "for"})


def q_roundtrip_events(spark, sf_dir):
    return _rt(spark, sf_dir, "events", "event_id",
               ["event_id", "ts", "user_id", "event_type", "props"])


def q_codec_stats_lang(spark, sf_dir):
    """Selector input stats (cardinality drivers) computed from DECODED
    rows — proves dict decode preserves the exact value distribution."""
    dec = _rt(spark, sf_dir, "documents", "doc_id", ["doc_id", "lang"],
              forced={"lang": "dict", "doc_id": "for"})
    return (
        dec.groupBy("lang")
        .agg(F.count("*").alias("cnt"), F.count_distinct("doc_id").alias("n_docs"))
        .orderBy("lang")
    )


def q_delta_stats_events(spark, sf_dir):
    """Timestamp delta distribution (the delta-codec cost-model input),
    computed from decoded rows."""
    from pyspark.sql.window import Window

    dec = _rt(spark, sf_dir, "events", "event_id", ["event_id", "ts"],
              forced={"ts": "delta", "event_id": "delta"})
    w = Window.orderBy("event_id")
    d = dec.withColumn(
        "gap_us",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))),
    )
    return d.agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("sum_gap_us"),
    )


def q_compression_metrics(spark, sf_dir):
    """Per-column codec choice + compression totals from the blocks
    dataset + manifest path (codec-choice metrics, BASELINE.json:6).
    No SQL oracle (depends on engine internals) -> rows-only check."""
    import tempfile

    from libgiddy_spark.engine import blocks_df, encode_snapshot

    out = tempfile.mkdtemp(prefix="lgs_metrics_")
    encode_snapshot(spark, f"{sf_dir}/documents.parquet", out,
                    key_col="doc_id", num_parts=8)
    return (
        blocks_df(spark, out)
        .groupBy("column")
        .agg(
            F.first("codec").alias("codec"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sum("n_values").alias("n_values"),
        )
        .orderBy("column")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "roundtrip_documents": q_roundtrip_documents,
        "roundtrip_dict_lang": q_roundtrip_dict_lang,
        "roundtrip_rle_source": q_roundtrip_rle_source,
        "roundtrip_fsst_text": q_roundtrip_fsst_text,
        "roundtrip_delta_ts": q_roundtrip_delta_ts,
        "roundtrip_for_bitpack": q_roundtrip_for_bitpack,
        "roundtrip_rpe_nchars": q_roundtrip_rpe_nchars,
        "roundtrip_model_ts": q_roundtrip_model_ts,
        "roundtrip_bitmap_linenumber": q_roundtrip_bitmap_linenumber,
        "roundtrip_events": q_roundtrip_events,
        "codec_stats_lang": q_codec_stats_lang,
        "delta_stats_events": q_delta_stats_events,
        "compression_metrics": q_compression_metrics,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "roundtrip_documents":
            "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "roundtrip_dict_lang": "SELECT doc_id, lang FROM documents",
        "roundtrip_rle_source": "SELECT doc_id, source FROM documents",
        "roundtrip_fsst_text": "SELECT doc_id, text FROM documents",
        "roundtrip_delta_ts": "SELECT event_id, ts FROM events",
        "roundtrip_for_bitpack":
            "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem",
        "roundtrip_rpe_nchars": "SELECT doc_id, n_chars FROM documents",
        "roundtrip_model_ts": "SELECT event_id, ts FROM events",
        "roundtrip_bitmap_linenumber":
            "SELECT l_orderkey, l_linenumber FROM lineitem",
        "roundtrip_events":
            "SELECT event_id, ts, user_id, event_type, props FROM events",
        "codec_stats_lang":
            "SELECT lang, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs "
            "FROM documents GROUP BY lang ORDER BY lang",
        "delta_stats_events":
            "SELECT COUNT(gap_us) AS n_gaps, MIN(gap_us) AS min_gap_us, "
            "MAX(gap_us) AS max_gap_us, SUM(gap_us) AS sum_gap_us FROM ("
            "SELECT CAST(epoch_us(ts) - epoch_us(LAG(ts) OVER (ORDER BY event_id)) AS BIGINT) AS gap_us "
            "FROM events)",
        # compression_metrics: engine-internal; rows-only check
    }
