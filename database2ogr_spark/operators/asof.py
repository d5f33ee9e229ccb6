"""As-of join — for each left row, the latest right row with the same key and
``right.time <= left.time``. Spark has no native ASOF JOIN (DuckDB/Polars do);
the training-pipeline use case is joining events to the latest prior state
(model version, user profile, feature snapshot) without an exploding range
join.

Implementation is the scalable union+window shape, not a theta join:

1. tag and union both sides (narrow),
2. one shuffle+sort per key: window ``last(row_struct, ignorenulls=True)``
   over rows ordered by (time, side) carries the most recent right-side ROW
   forward — a whole struct per right row, so a legitimately-NULL field in
   the latest right row is not overridden by an older non-null one. Right
   rows sort *before* left rows at equal timestamps, giving inclusive
   at-or-before semantics,
3. keep left rows, expand the carried struct.

Cost: a single hash shuffle on the key + per-partition sort — the same price
as any co-grouped operation, vs. the O(|L|·|R|) blowup of an inequality join.
Skewed keys (one user with millions of events) are split by AQE; at 100 TB,
pre-bucketing both sides by key makes this shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: all left columns plus ``asof_<c>`` for each of the
    right side's ``value_cols`` — the value from the latest right row
    at-or-before the left row's time (NULL when no prior right row exists).

    ``tolerance_seconds`` bounds how stale the carried state may be (the
    pandas ``merge_asof`` tolerance semantics): a match older than the
    tolerance yields NULLs, exactly like no match — the guard against
    joining events to a feature snapshot from last month. Implemented on
    the carried struct (which records the matched right-row time), so the
    plan cost is unchanged: same single shuffle+sort.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_time)]

    # As-of semantics are undefined without a time or a key: a NULL time
    # cannot be ordered (and engines disagree on where nulls sort in the
    # carrying window), and a NULL key must NOT match other NULL-key rows
    # (SQL join semantics — DuckDB's ASOF JOIN never matches NULL keys,
    # but a partitionBy window would lump them into one group). Timestamp
    # inputs additionally pass the engine-wide plausible-time domain
    # (cleaning.TIME_DOMAIN — pre-1970 epochs expose truncation-vs-floor
    # divergence in every epoch projection of the result); numeric time
    # columns only need the not-null contract. NULL-key left rows survive
    # with the no-match NULLs.
    from database2ogr_spark.operators.cleaning import plausible_time

    def _time_ok(col_name: str, frame: DataFrame):
        c = F.col(col_name)
        if dict(frame.dtypes)[col_name].startswith("timestamp"):
            return plausible_time(c)
        return c.isNotNull()

    left = left.filter(_time_ok(left_time, left))
    right = right.filter(_time_ok(right_time, right) & F.col(key).isNotNull())

    rt_type = dict(right.dtypes)[right_time]
    l_tag = left.select(
        *left.columns,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(
            f"struct<__rt:{rt_type},"
            + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in value_cols)
            + ">"
        )
        .alias("__v"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(c) for c in value_cols]
        ).alias("__v"),
    )
    left_only = [c for c in l_tag.columns if c not in r_tag.columns]
    for c in left_only:
        r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    u = l_tag.unionByName(r_tag.select(l_tag.columns))

    # __v as the final sort key makes simultaneous right-side updates (same
    # key, same time) resolve deterministically — the greatest value struct
    # wins — instead of depending on partition layout; left rows all carry
    # NULL __v so their relative order is irrelevant.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__v").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__v", F.last("__v", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:

        def _secs(col, dtype: str):
            # TIMESTAMP_NTZ refuses a direct double cast; go through
            # unix_micros for any timestamp flavor, plain cast for numerics
            if dtype.startswith("timestamp"):
                return F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000.0)
            return col.cast("double")

        lt_type = dict(left.dtypes)[left_time]
        age = _secs(F.col("__t"), lt_type) - _secs(
            F.col("__v").getField("__rt"), rt_type
        )
        out = out.withColumn(
            "__v", F.when(age <= F.lit(float(tolerance_seconds)), F.col("__v"))
        )
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.col("__v").getField(c))
    return out.drop("__t", "__side", "__v")
