"""Event sessionization: gap-based session assignment per user.

The classic training-data/behavioral-analytics windowed operator: order
each user's events by event time, start a new session whenever the gap
to the previous event exceeds a threshold, and aggregate per session.

Scale shape: ONE window partitioned by ``user_id`` (fully parallel —
users are independent; no global window anywhere), then a hash
aggregation on (user_id, session_seq). Skewed users (bots) are bounded
by their own event counts; at 100 TB the user-id partitioning is the
same shuffle key the aggregation needs, so Catalyst reuses one
exchange for both the window sort and the groupBy.

Everything is integer-exact (µs gaps, running int sums) so the result
is bit-comparable to an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_US = 24 * 3600 * 1_000_000  # 24 h


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Per-(user, session) stats: session_seq is 1-based in event-time
    order; a session breaks when the gap to the previous event exceeds
    ``gap_us``. Ties in ``ts`` are ordered by ``order_tiebreak`` so the
    assignment is deterministic."""
    # parquet reads give TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    # (session tz = UTC by engine convention -> values unchanged)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    brk = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = events.withColumn("brk", brk).withColumn(
        "session_seq", F.sum("brk").over(run).cast("int")
    )
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("t_start"),
            F.max(ts_col).alias("t_end"),
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            .cast("long")
            .alias("duration_us"),
        )
    )
