"""Funnel conversion + cohort retention (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt


def _ts(day: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + day, 12, 0) + dt.timedelta(minutes=minute)


def test_funnel_strict_order_and_rates(spark):
    from database2ogr_spark.operators.funnel import funnel_conversion

    rows = [
        # u1 completes the whole funnel in order
        (1, "view", _ts(0, 0)),
        (1, "click", _ts(0, 5)),
        (1, "purchase", _ts(0, 9)),
        # u2 views then clicks, never purchases
        (2, "view", _ts(0, 0)),
        (2, "click", _ts(0, 1)),
        # u3 clicks BEFORE viewing -> click must not count
        (3, "click", _ts(0, 0)),
        (3, "view", _ts(0, 2)),
        # u4 purchase before click -> only view+click reached
        (4, "view", _ts(0, 0)),
        (4, "purchase", _ts(0, 1)),
        (4, "click", _ts(0, 2)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r.step: r
        for r in funnel_conversion(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert out[1].users == 4 and out[1].event_type == "view"
    assert out[2].users == 3  # u1, u2, u4 (u3's click precedes its view)
    assert out[3].users == 1  # only u1
    assert out[1].conv_from_first == 1.0 and out[1].conv_from_prev == 1.0
    assert out[2].conv_from_first == 0.75 and out[2].conv_from_prev == 0.75
    assert out[3].conv_from_first == 0.25
    assert abs(out[3].conv_from_prev - round(1 / 3, 6)) < 1e-9


def test_funnel_equal_timestamp_does_not_advance(spark):
    from database2ogr_spark.operators.funnel import funnel_conversion

    ev = spark.createDataFrame(
        [(1, "view", _ts(0)), (1, "click", _ts(0))],
        "user_id long, event_type string, ts timestamp",
    )
    out = {
        r.step: r.users
        for r in funnel_conversion(ev, ["view", "click"]).collect()
    }
    assert out[1] == 1
    assert out.get(2) is None  # strict >: same-instant click doesn't count


def test_retention_cohorts_hand_computed(spark):
    from database2ogr_spark.operators.funnel import retention_cohorts

    rows = [
        # u1 first active day 0, returns day 8 (offset bucket 1)
        (1, _ts(0)),
        (1, _ts(8)),
        # u2 first active day 0 only
        (2, _ts(0)),
        # u3 first active day 9 (different weekly cohort), returns day 10
        # (same offset-0 bucket: day-anchored offsets)
        (3, _ts(9)),
        (3, _ts(10)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_bucket, r.offset): r
        for r in retention_cohorts(ev, bucket_days=7).collect()
    }
    # epoch day of 2024-01-01 -> cohort buckets are absolute epoch-weeks;
    # compare relatively: two distinct cohorts, correct sizes and rates
    cohorts = sorted({c for c, _ in out})
    assert len(cohorts) == 2
    c0, c1 = cohorts
    assert out[(c0, 0)].active_users == 2
    assert out[(c0, 1)].active_users == 1
    assert out[(c0, 1)].retention == 0.5
    assert out[(c1, 0)].active_users == 1
    assert out[(c1, 0)].retention == 1.0
    assert (c1, 1) not in out  # day-10 return is inside u3's offset-0 week


def test_transition_matrix_hand_computed(spark):
    from database2ogr_spark.operators.funnel import transition_matrix

    # user 1: a -> b -> a ; user 2: a -> b  (same ts pair broken by id)
    rows = [
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "a"),
        (4, 2, "2024-01-01 00:00:00", "a"),
        (5, 2, "2024-01-01 00:00:00", "b"),  # ties with id 4 -> a first
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    out = {(r.cur_type, r.next_type): r for r in transition_matrix(df).collect()}
    # transitions: u1 a->b, b->a; u2 a->b  => a->b n=2 prob 1.0, b->a n=1 prob 1.0
    assert out[("a", "b")].n == 2 and out[("a", "b")].prob == 1.0
    assert out[("b", "a")].n == 1 and out[("b", "a")].prob == 1.0
    assert set(out) == {("a", "b"), ("b", "a")}


def test_transition_matrix_rows_sum_to_one(spark):
    from pyspark.sql import functions as F

    from database2ogr_spark.operators.funnel import transition_matrix

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    m = transition_matrix(df)
    sums = m.groupBy("cur_type").agg(F.sum("prob").alias("s")).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-4, r


def test_funnel_max_gap_windowed(spark):
    from database2ogr_spark.operators.funnel import funnel_conversion

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:00:30", "click"),    # within 60s -> counts
        (3, 2, "2024-01-01 00:00:00", "view"),
        (4, 2, "2024-01-01 01:00:00", "click"),    # 1h later -> out of window
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    unbounded = {r.step: r.users for r in funnel_conversion(df, ["view", "click"]).collect()}
    windowed = {r.step: r.users for r in funnel_conversion(
        df, ["view", "click"], max_gap_seconds=60
    ).collect()}
    assert unbounded == {1: 2, 2: 2}
    assert windowed == {1: 2, 2: 1}


def test_audience_overlap_hand_values(spark):
    from pyspark.sql import functions as F

    from database2ogr_spark.operators.funnel import audience_overlap

    # users: view {1,2,3}, click {2,3}, buy {9} (disjoint from both)
    rows = [
        (1, 1, "view"), (2, 2, "view"), (3, 3, "view"), (4, 2, "view"),
        (5, 2, "click"), (6, 3, "click"),
        (7, 9, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).withColumn("ts", F.current_timestamp())
    out = {(r.type_a, r.type_b): r for r in audience_overlap(df).collect()}
    assert len(out) == 3  # all pairs, including the disjoint one
    r = out[("click", "view")]
    assert (r.n_a, r.n_b, r.n_both) == (2, 3, 2)
    assert abs(r.jaccard - 2 / 3) < 1e-6
    rb = out[("buy", "click")]
    assert rb.n_both == 0 and rb.jaccard == 0.0


def test_conversion_latency_hand_values(spark):
    from database2ogr_spark.operators.funnel import conversion_latency

    rows = [
        # user 1: view at 0, purchase at 100 -> 100s
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:40", "purchase"),
        # user 2: view at 0, purchase at 300 -> 300s
        (3, 2, "2024-01-01 00:00:00", "view"),
        (4, 2, "2024-01-01 00:05:00", "purchase"),
        # user 3: purchase BEFORE view -> not converted
        (5, 3, "2024-01-01 00:05:00", "view"),
        (6, 3, "2024-01-01 00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
    r = conversion_latency(df, ["view", "purchase"]).collect()[0]
    assert r.n_converted == 2
    assert abs(r.p50 - 200.0) < 1e-6   # interpolated median of {100, 300}
    assert abs(r.p25 - 150.0) < 1e-6
    import pytest as _p
    with _p.raises(ValueError):
        conversion_latency(df, ["view"])


def test_churn_weekly_hand_values(spark):
    from database2ogr_spark.operators.funnel import churn_weekly

    # week 0: users {1,2,3}; week 1: {2,3,4}; week 2: {9}
    rows = []
    eid = 0
    for w, users in [(0, [1, 2, 3]), (1, [2, 3, 4]), (2, [9])]:
        for u in users:
            rows.append((eid, w * 7 * 86400 + 50, u)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, sec long, user_id long"
    ).selectExpr("event_id", "CAST(sec AS TIMESTAMP) AS ts", "user_id")
    out = {r.week: r for r in churn_weekly(df).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_prev, out[1].n_retained, out[1].n_churned) == (3, 2, 1)
    assert abs(out[1].churn_rate - 1 / 3) < 1e-6
    assert (out[2].n_prev, out[2].n_retained, out[2].n_churned) == (3, 0, 3)
    assert out[2].churn_rate == 1.0


def test_churn_weekly_gap_week_null_rate(spark):
    from database2ogr_spark.operators.funnel import churn_weekly

    # activity in weeks 0 and 2 only: week 1 churns everyone, week 2's
    # base (week 1) is empty -> NULL rate
    rows = [(1, 50, 7), (2, 2 * 7 * 86400 + 50, 8)]
    df = spark.createDataFrame(
        rows, "event_id long, sec long, user_id long"
    ).selectExpr("event_id", "CAST(sec AS TIMESTAMP) AS ts", "user_id")
    out = {r.week: r for r in churn_weekly(df).collect()}
    assert out[1].n_prev == 1 and out[1].churn_rate == 1.0
    assert out[2].n_prev == 0 and out[2].churn_rate is None


def test_session_stats_hand_values(spark):
    import pytest as _p

    from database2ogr_spark.operators.funnel import session_stats

    rows = [
        # user 1: events at 0s, 10s (one session, 10s), then 5000s (new)
        (1, 1, 0), (2, 1, 10), (3, 1, 5000),
        # user 2: single event
        (4, 2, 100),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long"
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts")
    r = session_stats(df, gap_seconds=1800).collect()[0]
    assert r.n_sessions == 3 and r.n_users == 2
    assert r.single_event_sessions == 2
    assert abs(r.mean_events - 4 / 3) < 1e-6
    # durations: {10, 0, 0} -> p50 = 0
    assert r.p50_duration_s == 0.0
    with _p.raises(ValueError):
        session_stats(df, gap_seconds=0)


def test_top_journeys_hand_values(spark):
    from database2ogr_spark.operators.funnel import top_journeys

    rows = [
        (1, 1, 0, "a"), (2, 1, 1, "b"), (3, 1, 2, "c"),   # a>b>c
        (4, 2, 0, "a"), (5, 2, 1, "b"), (6, 2, 2, "c"),   # a>b>c
        (7, 3, 0, "x"), (8, 3, 1, "y"), (9, 3, 2, "z"), (10, 3, 3, "w"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string"
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type")
    out = top_journeys(df, length=3, top_n=10).collect()
    assert out[0].path == "a>b>c" and out[0].n == 2
    # user 3 contributes two overlapping windows: x>y>z and y>z>w
    got = {r.path: r.n for r in out}
    assert got["x>y>z"] == 1 and got["y>z>w"] == 1
    # never crosses users: total paths = 2 + 2
    assert sum(got.values()) == 4


def test_cohort_value_hand_values(spark):
    from database2ogr_spark.operators.funnel import cohort_value

    rows = [
        # user 1 first active day 0: 1.50 on day 0, 2.25 on day 8 (offset 1)
        (1, 1, 0, 1.50), (2, 1, 8 * 86400, 2.25),
        # user 2 first active day 1 (same cohort bucket 0): 0.75 on day 1
        (3, 2, 86400, 0.75),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, value double"
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts", "value")
    out = {(r.cohort_bucket, r.offset): r for r in cohort_value(df).collect()}
    assert out[(0, 0)].value_sum == 2.25   # 1.50 + 0.75
    assert out[(0, 1)].value_sum == 2.25
    assert out[(0, 1)].cum_value == 4.50
    assert out[(0, 0)].n_events == 2


def test_rfm_segments_balance_and_determinism(spark):
    import pytest as _p

    from database2ogr_spark.operators.funnel import rfm_segments

    rows = []
    eid = 0
    for u in range(50):
        for k in range(u % 7 + 1):              # frequency varies 1..7
            rows.append((eid, u, (u % 11) * 86400 + k, float(u)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, value double"
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts", "value")
    out = rfm_segments(df, n_buckets=5).collect()
    total = sum(r.n_users for r in out)
    assert total == 50
    for r in out:
        assert 0 <= r.r_bucket < 5 and 0 <= r.f_bucket < 5 and 0 <= r.m_bucket < 5
    again = rfm_segments(df.repartition(9), n_buckets=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    with _p.raises(ValueError):
        rfm_segments(df, n_buckets=1)


def test_repeat_interval_hand_values(spark):
    from database2ogr_spark.operators.funnel import repeat_interval

    rows = [
        # user 1 purchases on days 0, 2, 3 -> gaps 2d, 1d
        (1, 1, 0, "purchase"), (2, 1, 2 * 86400, "purchase"),
        (3, 1, 3 * 86400, "purchase"),
        # user 2 purchases once -> no interval; views ignored
        (4, 2, 0, "purchase"), (5, 2, 86400, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string"
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type")
    r = repeat_interval(df, "purchase").collect()[0]
    assert r.n_users_repeating == 1 and r.n_intervals == 2
    assert abs(r.p50_days - 1.5) < 1e-6
    assert abs(r.mean_days - 1.5) < 1e-6


def test_user_features_hand_values(spark):
    from database2ogr_spark.operators.funnel import user_features

    rows = [
        # user 1: days 0 and 2 (max day overall = 2); 2 views 1 click;
        # values 1.00 + 2.00 + 3.50
        (1, 1, 0, "view", 1.00),
        (2, 1, 0, "view", 2.00),
        (3, 1, 2 * 86400, "click", 3.50),
        # user 2: one event on day 2
        (4, 2, 2 * 86400 + 5, "view", 0.25),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string, value double"
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type", "value")
    out = {r.user_id: r for r in user_features(df, half_life_days=2.0).collect()}
    u1 = out[1]
    assert (u1.first_day, u1.last_day, u1.tenure_days) == (0, 2, 2)
    assert u1.n_events == 3 and u1.n_active_days == 2 and u1.n_types == 2
    assert u1.top_type == "view"           # 2 views beat 1 click
    assert abs(u1.total_value - 6.50) < 1e-9
    # decay (half-life 2d, max day 2): day0 events weight .5 each, day2 = 1
    assert abs(u1.decay_score - (0.5 + 0.5 + 1.0)) < 1e-6
    assert out[2].top_type == "view" and out[2].tenure_days == 0
    # tie on counts -> lexically larger type wins (documented)
    tie = spark.createDataFrame(
        [(1, 9, 0, "a", 0.0), (2, 9, 10, "b", 0.0)],
        "event_id long, user_id long, sec long, event_type string, value double",
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type", "value")
    assert user_features(tie).collect()[0].top_type == "b"


def test_u_shaped_attribution_hand_values(spark):
    from database2ogr_spark.operators.funnel import u_shaped_attribution

    rows = [
        # user 1: view, click, view, view then purchase ->
        # weights .4 (view), .2 (click, middle of 4? n=4: middle two get
        # .1 each), ... sequence: v c v v -> first v .4, last v .4,
        # middle c .1, middle v .1
        (1, 1, 0, "view"), (2, 1, 10, "click"), (3, 1, 20, "view"),
        (4, 1, 30, "view"), (5, 1, 40, "purchase"),
        # user 2: single click then purchase -> click gets 1.0
        (6, 2, 0, "click"), (7, 2, 5, "purchase"),
        # user 3: touches AFTER purchase don't count
        (8, 3, 10, "purchase"), (9, 3, 20, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, sec long, event_type string"
    ).selectExpr("event_id", "user_id", "CAST(sec AS TIMESTAMP) AS ts", "event_type")
    out = {r.event_type: r for r in u_shaped_attribution(df).collect()}
    # views: .4 + .1 + .4 = .9 ; clicks: .1 + 1.0 = 1.1
    assert abs(out["view"].credit - 0.9) < 1e-6
    assert abs(out["click"].credit - 1.1) < 1e-6
    assert out["view"].n_touches == 3 and out["click"].n_touches == 2
    # total credit = number of converting users with >=1 touch
    assert abs(out["view"].credit + out["click"].credit - 2.0) < 1e-6
