"""One-plan product-analytics dashboard over the event stream.

The batch twin of what a product team pins to a wall: volume, reach,
engagement, the conversion funnel, trend, and level-shift — composed
entirely from this repo's verified building blocks (funnel_conversion,
trend_slope, changepoint_cusum) and emitted LONG-FORM as (metric, value)
so one hashable scalar table carries every number. The reference has no
analytics dashboard; this is part of the beyond-reference training/ops
tier (SURVEY.md "beyond" scope), same family as dataset_datasheet —
which is the wide-form corpus-side sibling.

Scale: each constituent keeps its own documented envelope (the funnel's
shrinking user-keyed stages, the day-spine aggregates' #days-row work);
the dashboard unions their 1-row summaries, so composition adds no new
shuffle class. The corpus is scanned once per constituent family; at
100 TB persist the narrow (user_id, event_type, ts) projection and run
all branches off it (the multi-branch contract of dataset_datasheet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_dashboard(
    events: DataFrame,
    funnel_steps: list[str] = ("view", "click", "purchase"),
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(metric, value) rows: n_events, n_users, n_days,
    events_per_user, funnel_users_<step> per step,
    funnel_conversion (last step / first step), trend_slope
    (daily volume OLS), changepoint_strength (normalized CUSUM).
    Values are doubles rounded 6 where fractional; counts exact.
    """
    from database2ogr_spark.operators.funnel import funnel_conversion
    from database2ogr_spark.operators.timeseries import (
        changepoint_cusum,
        trend_slope,
    )

    # ONE domain guard at the plan's ingestion so the raw count metrics
    # and the composed operators (which guard internally) see the same
    # corpus (cleaning.TIME_DOMAIN — the event-time ingestion contract)
    from database2ogr_spark.operators.cleaning import within_time_domain

    events = within_time_domain(events, ts_col)
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast("long")
    base = events.agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.countDistinct(user_col).cast("double").alias("n_users"),
        F.countDistinct(day).cast("double").alias("n_days"),
    )
    core = base.select(
        F.explode(
            F.map_from_arrays(
                F.array(
                    F.lit("n_events"), F.lit("n_users"), F.lit("n_days"),
                    F.lit("events_per_user"),
                ),
                F.array(
                    F.col("n_events"), F.col("n_users"), F.col("n_days"),
                    # NULL (not a DIVIDE_BY_ZERO crash) on an empty stream
                    F.round(F.try_divide(F.col("n_events"), F.col("n_users")), 6),
                ),
            )
        ).alias("metric", "value")
    )
    fun = funnel_conversion(
        events, list(funnel_steps), user_col=user_col, type_col=type_col,
        ts_col=ts_col,
    )
    fun_users = fun.select(
        F.concat(F.lit("funnel_users_"), F.col("event_type")).alias("metric"),
        F.col("users").cast("double").alias("value"),
    )
    fun_conv = (
        fun.orderBy(F.col("step").desc())
        .limit(1)
        .select(
            F.lit("funnel_conversion").alias("metric"),
            F.col("conv_from_first").alias("value"),
        )
    )
    slope = trend_slope(
        events.withColumn("__all", F.lit("all")), ts_col=ts_col,
        group_col="__all",
    ).select(
        F.lit("trend_slope").alias("metric"), F.col("slope").alias("value")
    )
    shift = changepoint_cusum(events, ts_col=ts_col).select(
        F.lit("changepoint_strength").alias("metric"),
        F.col("normalized").alias("value"),
    )
    return core.unionAll(fun_users).unionAll(fun_conv).unionAll(slope).unionAll(shift)
