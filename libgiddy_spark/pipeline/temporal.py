"""Temporal joins: as-of join and interval (range) join.

Two classic time-series operators Spark has no built-in for, each
implemented as a composition of built-in DataFrame ops (no UDF, no
cartesian product) so Catalyst/AQE keep planning them:

- :func:`asof_join` — for every left row, the most recent right row
  with ``right.ts <= left.ts`` within the same key (the kdb ``aj`` /
  pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` shape). Implemented as
  the union trick: tag the two sides, union them, and take
  ``last(right_payload, ignorenulls=True)`` over a per-key window
  ordered by (ts, side). ONE shuffle on the key — the same exchange a
  plain equi-join would need — and no join explosion at all, so it
  scales to arbitrarily many right rows per key. Per-key history must
  sort within one task (the window), which is the operator's inherent
  scale bound; for a pathological single key holding a large fraction
  of all rows, pre-bucket by coarse time and carry the last right row
  across bucket boundaries (not needed for user-keyed web events,
  where per-key cardinality is bounded).

- :func:`range_join` — join point events to intervals ``[t0, t1)``
  with NO equi-key, via bucket decomposition: explode each interval
  into the fixed-width time buckets it covers, map each point to its
  single bucket, equi-join on the bucket id, then apply the exact
  range predicate. Each matching (point, interval) pair meets in
  exactly one bucket (the point's), so no dedup pass is needed. The
  equi-join gives Catalyst a shuffle key — the plan is a hash join,
  never a BroadcastNestedLoopJoin/cartesian — and the explode factor
  is ``ceil(interval_len / bucket)``, so pick ``bucket_us`` near the
  typical interval length.

Both are integer-exact (µs arithmetic) so results are bit-comparable
to DuckDB oracles (``ASOF LEFT JOIN`` / ``BETWEEN`` join).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "funnel", "hypertable_rollup", "range_join"]


def _as_micros(col: Column, dtype: str) -> Column:
    """Epoch-µs long view of a timestamp/long column (integer-exact).
    TIMESTAMP_NTZ is cast through TIMESTAMP first (unix_micros rejects
    it); under a UTC session both give wall-clock epoch µs, matching
    DuckDB's epoch_us over naive timestamps."""
    if dtype == "timestamp_ntz":
        col = col.cast("timestamp")
    elif not dtype.startswith("timestamp"):
        return col.cast("long")
    return F.unix_micros(col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    by: str = "user_id",
    right_cols: Sequence[str] = ("event_id",),
    prefix: str = "prev_",
    tolerance_us: int | None = None,
    bucket_us: int | None = None,
) -> DataFrame:
    """As-of LEFT join: every ``left`` row, plus ``right_cols`` from the
    most recent ``right`` row with ``right.ts <= left.ts`` and equal
    NON-NULL ``by`` key (nulls when the key is null, no such row
    exists, or it is older than ``tolerance_us``). Null keys never
    match — SQL ASOF/equi-join semantics (the per-key window would
    otherwise group null keys together and match them to each other).

    Determinism: when several right rows share an exact (key, ts), the
    lexicographically greatest ``right_cols`` tuple wins (a group-by
    max — mirror it in any oracle).

    ``bucket_us`` — HOT-KEY decomposition (guide §2.5: a window
    partitioned only by key serializes one key's entire history into
    one task; bot-traffic keys holding 10^6+ rows straggle the stage).
    When set, rows are windowed within (key, floor(ts/bucket_us)) —
    fully parallel across buckets — and the last right row of each
    earlier bucket is carried across the boundary via a per-(key,
    bucket) summary frame (one row per bucket, tiny) joined back on
    the same (key, bucket) partitioning the window just established,
    so the heavy frame is exchanged ONCE either way. Identical output
    to the unbucketed path; pick bucket_us so a hot key's rows spread
    over ~100-10000 buckets.

    Output = all ``left`` columns + ``{prefix}{c}`` for each right col
    + ``{prefix}ts_us`` (epoch µs of the matched right row, null when
    unmatched).
    """
    reserved = {"_side", "_r", "_rf", "_m", "_pay",
                "_us", "_bkt", "_rf0", "_rb", "_cr"}
    bad = reserved & set(left.columns)
    if bad:
        raise ValueError(f"left columns collide with asof_join "
                         f"internals: {sorted(bad)}")
    ts_l = dict(left.dtypes)[ts]
    ts_r = dict(right.dtypes)[ts]

    rpay = right.groupBy(by, ts).agg(
        F.max(F.struct(*right_cols)).alias("_pay")
    ).select(
        F.col(by),
        F.col(ts),
        F.struct(
            _as_micros(F.col(ts), ts_r).alias("_rts_us"), F.col("_pay")
        ).alias("_r"),
        F.lit(0).alias("_side"),
    )
    lhs = left.withColumn("_side", F.lit(1))
    u = rpay.unionByName(lhs, allowMissingColumns=True)

    if bucket_us is None:
        # Right rows sort BEFORE left rows at equal ts, so ties satisfy
        # the <= contract; rowsBetween makes last() a running value.
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.withColumn("_rf", F.last("_r", ignorenulls=True).over(w))
    else:
        b = int(bucket_us)
        if b <= 0:
            raise ValueError(f"bucket_us must be positive, got {bucket_us}")
        ts_u = dict(u.dtypes)[ts]
        u = u.withColumn("_us", _as_micros(F.col(ts), ts_u)) \
             .withColumn("_bkt", F.expr(f"_us div {b}"))
        # intra-bucket running last: same semantics as the single
        # window, parallel across (key, bucket)
        wb = (
            Window.partitionBy(by, "_bkt")
            .orderBy(F.col(ts).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        intra = u.withColumn("_rf0", F.last("_r", ignorenulls=True).over(wb))
        # per-(key, bucket) summary: the bucket's LAST right row (max
        # of the (_rts_us, payload) struct = latest ts, max payload on
        # ties — the same winner the running last picks); null for
        # buckets holding only left rows so the carry skips them
        summary = u.groupBy(by, "_bkt").agg(
            F.max(F.when(F.col("_side") == 0, F.col("_r"))).alias("_rb")
        )
        wc = (
            Window.partitionBy(by)
            .orderBy(F.col("_bkt").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = summary.withColumn(
            "_cr", F.last("_rb", ignorenulls=True).over(wc)
        ).select(by, "_bkt", "_cr")
        # join on the (key, bucket) partitioning the window installed:
        # the heavy frame reuses its exchange, only the per-bucket
        # summary frame (one row per key x bucket) is re-shuffled
        filled = (
            intra.join(carry, [by, "_bkt"], "left")
            .withColumn("_rf", F.coalesce("_rf0", "_cr"))
        )

    match = F.col("_rf")
    if tolerance_us is not None:
        age = _as_micros(F.col(ts), ts_l) - F.col("_rf._rts_us")
        match = F.when(age <= F.lit(int(tolerance_us)), F.col("_rf"))
    # null keys never match (SQL ASOF/equi-join semantics); without
    # this the window groups nulls together and matches them
    match = F.when(F.col(by).isNotNull(), match)

    out = (
        filled.where(F.col("_side") == 1)
        .withColumn("_m", match)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col(f"_m._pay.{c}").alias(f"{prefix}{c}")
                for c in right_cols
            ],
            F.col("_m._rts_us").alias(f"{prefix}ts_us"),
        )
    )
    return out


def funnel(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each user, the EARLIEST time of
    step k occurring STRICTLY AFTER that user's step k-1 time (the
    sequential-pattern semantics product analytics means by "funnel" —
    a purchase before the first view does not count).

    Shape: one filtered min-aggregation per step plus a user-keyed
    join against the previous step's times — every exchange is on the
    same user key, so Catalyst reuses one shuffle layout across all k
    stages, each step's type filter pushes into the scan, and no step
    ever materializes more than one row per user. len(steps) is small
    and fixed; the data passes are k filtered scans, never a per-user
    sort or window over the full event stream.

    Output: (user, t_1_us .. t_k_us epoch-µs longs — null once the
    user fell out — and stage_reached)."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    bad = {"_et", "_tu"} & set(events.columns)
    if bad:
        raise ValueError(
            f"input columns collide with funnel internals: {sorted(bad)}")
    ts_ty = dict(events.dtypes)[ts]
    ev = events.select(
        F.col(user), F.col(type_col).alias("_et"),
        _as_micros(F.col(ts), ts_ty).alias("_tu"),
    )
    out = (
        ev.where(F.col("_et") == steps[0])
        .groupBy(user).agg(F.min("_tu").alias("t_1_us"))
    )
    for k, st in enumerate(steps[1:], start=2):
        prev = f"t_{k - 1}_us"
        nxt = (
            ev.where(F.col("_et") == st)
            .join(out.select(user, prev), user)
            .where(F.col("_tu") > F.col(prev))
            .groupBy(user).agg(F.min("_tu").alias(f"t_{k}_us"))
        )
        out = out.join(nxt, user, "left")
    reached = F.lit(1)
    for k in range(2, len(steps) + 1):
        reached = reached + F.col(f"t_{k}_us").isNotNull().cast("int")
    return out.withColumn("stage_reached", reached)


def hypertable_rollup(
    df: DataFrame,
    ts: str = "ts",
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    levels_us: Sequence[int] = (900_000_000, 3_600_000_000,
                                86_400_000_000),
) -> DataFrame:
    """Multi-resolution time-bucket rollup (the TimescaleDB
    hypertable / continuous-aggregate cascade): aggregate raw rows
    into the FINEST bucket width once, then derive every coarser level
    by re-aggregating the finer level's partials — count, sum, min and
    max all compose, so each coarser level costs O(buckets of the
    previous level), never a second scan of the raw table. At 100 TB
    the raw scan happens exactly once; the hour/day/month levels
    aggregate a frame that is already orders of magnitude smaller
    (and in production would be the materialized finest rollup).

    ``levels_us`` must be ascending and each level an exact multiple
    of the previous one, so bucket floors compose exactly
    (``floor(floor(t/L0)*L0 / L) == floor(t/L)`` when ``L0 | L``).

    Output: one row per (level_us, bucket_us) with ``n_events`` +
    ``sum_/min_/max_`` columns — integer-exact, oracle-comparable.
    """
    lv = [int(x) for x in levels_us]
    if sorted(lv) != lv:
        raise ValueError("levels_us must be ascending")
    # each level re-aggregates the PREVIOUS one, so it must be an
    # exact multiple of it for bucket floors to compose
    for fine_w, coarse_w in zip(lv, lv[1:]):
        if coarse_w % fine_w:
            raise ValueError(
                f"level {coarse_w} is not a multiple of {fine_w}"
            )

    ts_ty = dict(df.dtypes)[ts]
    base = df.withColumn("_tu", _as_micros(F.col(ts), ts_ty))

    fine = (
        base.groupBy(
            (F.floor(F.col("_tu") / lv[0]) * lv[0]).alias("bucket_us")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
            *[F.min(c).alias(f"min_{c}") for c in min_cols],
            *[F.max(c).alias(f"max_{c}") for c in max_cols],
        )
    )
    out = fine.select(F.lit(lv[0]).alias("level_us"), "*")
    prev = fine
    for width in lv[1:]:
        prev = (
            prev.groupBy(
                (F.floor(F.col("bucket_us") / width) * width)
                .alias("bucket_us")
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
                *[F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols],
                *[F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols],
            )
        )
        out = out.unionByName(
            prev.select(F.lit(width).alias("level_us"), "*")
        )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    t0: str = "t0",
    t1: str = "t1",
    bucket_us: int = 1_800_000_000,  # 30 min
) -> DataFrame:
    """Interval join with no equi-key: all (point, interval) pairs with
    ``t0 <= point.ts < t1`` (half-open). Timestamp or epoch-µs long
    columns both accepted. Empty/inverted intervals (``t1 <= t0``)
    match nothing. Output = point columns + interval columns.
    """
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(
            f"points and intervals share column names {sorted(dup)} — "
            "rename one side (the output carries both frames' columns)")
    reserved = {"_bk", "_ts_us", "_t0_us", "_t1_us"}
    bad = reserved & (set(points.columns) | set(intervals.columns))
    if bad:
        raise ValueError(
            f"input columns collide with range_join internals: "
            f"{sorted(bad)}")
    b = int(bucket_us)
    pt_ty = dict(points.dtypes)[ts]
    iv_ty0 = dict(intervals.dtypes)[t0]
    iv_ty1 = dict(intervals.dtypes)[t1]

    pts = points.withColumn("_ts_us", _as_micros(F.col(ts), pt_ty))
    iv = (
        intervals.withColumn("_t0_us", _as_micros(F.col(t0), iv_ty0))
        .withColumn("_t1_us", _as_micros(F.col(t1), iv_ty1))
        .where(F.col("_t1_us") > F.col("_t0_us"))
        # floor-divide is exact for negative epochs too (pre-1970)
        .withColumn(
            "_bk",
            F.explode(
                F.sequence(
                    F.floor(F.col("_t0_us") / b),
                    F.floor((F.col("_t1_us") - 1) / b),
                )
            ),
        )
    )
    pts = pts.withColumn("_bk", F.floor(F.col("_ts_us") / b))
    joined = pts.join(iv, "_bk").where(
        (F.col("_ts_us") >= F.col("_t0_us"))
        & (F.col("_ts_us") < F.col("_t1_us"))
    )
    return joined.select(
        *[F.col(c) for c in points.columns],
        *[F.col(c) for c in intervals.columns],
    )
