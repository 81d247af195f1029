"""As-of join and bucket-decomposed range join: semantics + plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from libgiddy_spark.pipeline import asof_join, hypertable_rollup, range_join

US = 1_000_000
T0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * US


def _ts(us):
    return dt.datetime.fromtimestamp((T0 + us) / US, dt.timezone.utc).replace(
        tzinfo=None
    )


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts(100 * US)),   # matches right @100 (tie, <=)
            (2, 10, _ts(250 * US)),   # matches right @200
            (3, 10, _ts(50 * US)),    # before any right -> null
            (4, 11, _ts(500 * US)),   # key with no right rows -> null
            (5, 12, _ts(10_000 * US)),  # match far in the past
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (900, 10, _ts(100 * US)),
            (901, 10, _ts(200 * US)),
            (902, 10, _ts(300 * US)),   # later than every left -> unused
            (903, 12, _ts(0)),
            (904, 12, _ts(0)),          # duplicate (key, ts): max wins
        ],
        "event_id long, user_id long, ts timestamp",
    )
    return left, right


def test_asof_join_semantics(frames):
    left, right = frames
    out = asof_join(left, right, ts="ts", by="user_id",
                    right_cols=("event_id",))
    got = {r["event_id"]: r["prev_event_id"]
           for r in out.collect()}
    assert got == {1: 900, 2: 901, 3: None, 4: None, 5: 904}
    # all left columns survive; matched ts is reported in micros
    row = {r["event_id"]: r for r in out.collect()}
    assert row[2]["prev_ts_us"] == T0 + 200 * US
    assert row[3]["prev_ts_us"] is None


def test_asof_join_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, ts="ts", by="user_id",
                    right_cols=("event_id",), tolerance_us=60 * US)
    got = {r["event_id"]: r["prev_event_id"] for r in out.collect()}
    # event 2 is 50s after right@200 (within 60s); event 5 is 10000s
    # after right@0 (outside) -> nulled
    assert got == {1: 900, 2: 901, 3: None, 4: None, 5: None}


def test_asof_join_single_exchange(frames):
    left, right = frames
    out = asof_join(left, right)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union trick: no join operator at all, one exchange for the window
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides


def test_asof_join_bucketed_matches_unbucketed(frames):
    left, right = frames
    base = asof_join(left, right, ts="ts", by="user_id",
                     right_cols=("event_id",))
    for b_us in (60 * US, 1000 * US):
        bkt = asof_join(left, right, ts="ts", by="user_id",
                        right_cols=("event_id",), bucket_us=b_us)
        assert sorted(map(tuple, bkt.collect())) == sorted(
            map(tuple, base.collect()))


def test_asof_join_null_keys_never_match(spark):
    left = spark.createDataFrame(
        [(1, None, _ts(100 * US)), (2, 10, _ts(100 * US))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(900, None, _ts(50 * US)), (901, 10, _ts(50 * US))],
        "event_id long, user_id long, ts timestamp",
    )
    for b_us in (None, 60 * US):
        out = asof_join(left, right, ts="ts", by="user_id",
                        right_cols=("event_id",), bucket_us=b_us)
        got = {r["event_id"]: r["prev_event_id"] for r in out.collect()}
        # SQL ASOF semantics: the null-key left row matches nothing
        assert got == {1: None, 2: 901}


def test_asof_join_hot_key_bucketed(spark):
    """One key holding ~1M rows: the bucketed path partitions its
    history across (key, bucket) tasks and carries matches over bucket
    boundaries; results equal a local reference on a sampled check."""
    n = 1_000_000
    left = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.lit(7).alias("user_id"),
        (F.lit(T0) + F.col("id") * US).alias("ts"),
    )
    # one right row every 1000s: left row id matches right floor(id/1000)
    right = spark.range(n // 1000).select(
        (F.col("id") * 1000).alias("event_id"),
        F.lit(7).alias("user_id"),
        (F.lit(T0) + F.col("id") * 1000 * US).alias("ts"),
    )
    out = asof_join(left, right, ts="ts", by="user_id",
                    right_cols=("event_id",), bucket_us=100 * US)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the heavy window runs per (key, bucket), not per key
    assert "_bkt" in plan
    got = {r["event_id"]: r["prev_event_id"]
           for r in out.where(F.col("event_id") % 99_991 == 0).collect()}
    assert got == {i: (i // 1000) * 1000
                   for i in range(0, n, 99_991)}, "carry across buckets"


def test_range_join_semantics(spark):
    points = spark.createDataFrame(
        [(i, T0 + i * US) for i in range(0, 100, 10)],
        "pid long, ts long",
    )
    intervals = spark.createDataFrame(
        [
            (1, T0 + 5 * US, T0 + 35 * US),    # catches 10,20,30
            (2, T0 + 30 * US, T0 + 30 * US),   # empty [t,t) -> nothing
            (3, T0 + 90 * US, T0 + 91 * US),   # half-open: 90 in, 91 out
            (4, T0 + 200 * US, T0 + 100 * US),  # inverted -> nothing
        ],
        "iid long, t0 long, t1 long",
    )
    out = range_join(points, intervals, ts="ts", bucket_us=7 * US)
    pairs = sorted((r["iid"], r["pid"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 20), (1, 30), (3, 90)]


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # one interval spanning MANY buckets must still emit each pair once
    points = spark.createDataFrame([(1, T0 + 50 * US)], "pid long, ts long")
    intervals = spark.createDataFrame(
        [(1, T0, T0 + 1000 * US)], "iid long, t0 long, t1 long"
    )
    out = range_join(points, intervals, bucket_us=3 * US)
    assert out.count() == 1


def test_hypertable_rollup_cascade_matches_direct(spark):
    # 1000 events over ~3 days; cascade (10s -> 60s -> 3600s) must be
    # IDENTICAL to grouping the raw rows directly at each level
    rows = [(i, (i * 7919) % 100, T0 + i * 250 * US) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_id long, uid long, ts long")
    lv = (10 * US, 60 * US, 3600 * US)
    out = hypertable_rollup(
        df, ts="ts", sum_cols=("uid",), min_cols=("event_id",),
        max_cols=("event_id",), levels_us=lv,
    )
    got = {(r["level_us"], r["bucket_us"]):
           (r["n_events"], r["sum_uid"], r["min_event_id"],
            r["max_event_id"])
           for r in out.collect()}
    import collections
    for width in lv:
        direct = collections.defaultdict(lambda: [0, 0, None, None])
        for eid, uid, ts in rows:
            b = (ts // width) * width
            d = direct[b]
            d[0] += 1
            d[1] += uid
            d[2] = eid if d[2] is None else min(d[2], eid)
            d[3] = eid if d[3] is None else max(d[3], eid)
        for b, d in direct.items():
            assert got[(width, b)] == tuple(d), (width, b)
    assert len(got) == sum(
        len({(ts // w) * w for _, _, ts in rows}) for w in lv
    )


def test_hypertable_rollup_rejects_bad_levels(spark):
    df = spark.createDataFrame([(1, T0)], "event_id long, ts long")
    with pytest.raises(ValueError):
        hypertable_rollup(df, levels_us=(10 * US, 25 * US))
    with pytest.raises(ValueError):
        hypertable_rollup(df, levels_us=(60 * US, 10 * US))


def test_range_join_timestamp_columns_and_plan(spark):
    points = spark.createDataFrame(
        [(i, _ts(i * 60 * US)) for i in range(60)], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(k, _ts(k * 600 * US), _ts((k + 1) * 600 * US)) for k in range(6)],
        "iid long, t0 timestamp, t1 timestamp",
    )
    out = range_join(points, intervals, bucket_us=600 * US)
    assert out.count() == 60
    per = {r["iid"]: r["cnt"] for r in
           out.groupBy("iid").agg(F.count("*").alias("cnt")).collect()}
    assert per == {k: 10 for k in range(6)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_strict_ordering(spark):
    from libgiddy_spark.pipeline import funnel

    rows = [
        # user 1: full ordered funnel
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # user 2: purchase BEFORE the first view -> stage 2 only
        (2, "purchase", 50), (2, "view", 100), (2, "click", 150),
        # user 3: click only after view, no purchase
        (3, "view", 100), (3, "click", 110),
        # user 4: never viewed -> absent from the funnel
        (4, "click", 10), (4, "purchase", 20),
        # user 5: simultaneous click (ts == view) does NOT count
        (5, "view", 100), (5, "click", 100),
    ]
    ev = spark.createDataFrame(
        [(u, t, T0 + s * US) for u, t, s in rows],
        "user_id long, event_type string, ts long",
    )
    got = {r["user_id"]: r for r in funnel(ev).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["stage_reached"] == 3
    assert got[1]["t_3_us"] == T0 + 300 * US
    assert got[2]["stage_reached"] == 2 and got[2]["t_3_us"] is None
    assert got[3]["stage_reached"] == 2
    assert got[5]["stage_reached"] == 1  # strict 'after', ties drop
