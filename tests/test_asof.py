"""As-of join operator semantics on crafted timelines."""

from __future__ import annotations

import datetime as dt

from database2ogr_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(10)), (3, 10, _ts(2)), (4, 11, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(3), "v1"), (10, _ts(10), "v2"), (11, _ts(6), "v3")],
        "user_id long, ts timestamp, state string",
    )
    out = {
        r.event_id: r.asof_state
        for r in asof_join(left, right, key="user_id").collect()
    }
    assert out[1] == "v1"  # 05 → latest prior update 03
    assert out[2] == "v2"  # equal timestamps are inclusive (at-or-before)
    assert out[3] is None  # 02 → no prior update
    assert out[4] is None  # user 11's update is later (06 > 05)


def test_asof_latest_row_wins_even_with_null_field(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(9))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(1), "old"), (10, _ts(5), None)],
        "user_id long, ts timestamp, state string",
    )
    out = asof_join(left, right, key="user_id").collect()[0]
    # the newest right ROW carries, even though its field is NULL —
    # struct-carry semantics, not per-column last-non-null
    assert out.asof_state is None


def test_asof_multiple_value_cols(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(9))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(1), "a", 7)],
        "user_id long, ts timestamp, state string, version long",
    )
    out = asof_join(
        left, right, key="user_id", value_cols=["state", "version"]
    ).collect()[0]
    assert (out.asof_state, out.asof_version) == ("a", 7)


def test_asof_join_tolerance_nulls_stale_matches(spark):
    from database2ogr_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 100.0), (2, 1000.0)], "id long, ts double"
    ).select("id", F.col("ts"))
    right = spark.createDataFrame(
        [(1, 50.0, "fresh"), (2, 100.0, "stale")], "id long, ts double, state string"
    )
    out = {
        r.id: r.asof_state
        for r in asof_join(
            left, right, key="id", value_cols=["state"], tolerance_seconds=200
        ).collect()
    }
    assert out[1] == "fresh"   # age 50 <= 200
    assert out[2] is None      # age 900 > 200 -> degraded to no-match
    # without tolerance the stale match is kept
    out2 = {
        r.id: r.asof_state
        for r in asof_join(left, right, key="id", value_cols=["state"]).collect()
    }
    assert out2 == {1: "fresh", 2: "stale"}
