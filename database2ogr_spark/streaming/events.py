"""Structured Streaming surface over the ``events`` table (north-star
extension, SURVEY.md §2.9 / §7 M6 — the reference has no streaming semantics;
its Node streams are I/O plumbing only).

Transformations are written against a plain DataFrame so the *same function*
serves batch (parquet read) and streaming (``readStream``) — the Spark
batch/stream unification. Event-time correctness: watermark on ``ts`` bounds
state for the windowed aggregation; late rows beyond the watermark are
dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database2ogr_spark.operators.cleaning import plausible_time
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the events parquet, tolerant of TIMESTAMP(NANOS).

    Spark has no nanosecond timestamp type and rejects NANOS parquet columns
    by default; ``spark.sql.legacy.parquet.nanosAsLong`` reads them as raw
    nanosecond longs, which we convert to microsecond timestamps (the
    precision Spark supports). The conf is session-dynamic, so this also
    works under an externally-created SparkSession.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        # integer division: float division would lose precision (epoch nanos
        # ≈ 1.7e18 exceeds double's 53-bit mantissa)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def read_events_stream(
    spark: SparkSession, path_glob: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over event parquet files (each micro-batch picks up
    new files — the local stand-in for a Kafka source; swap ``format`` and
    options for Kafka in production, the downstream plan is unchanged).

    TIMESTAMP(NANOS) parity with :func:`read_events` (ADVICE r10): the file
    stream source binds a FIXED schema, so on a nanos-written parquet a
    TimestampType binding would fail or misread while the tolerant batch
    twin passes — a silent batch/stream asymmetry. The physical type is
    probed with a batch footer read of the same glob (cheap: footers only,
    no data scan); if ``ts`` surfaces as ``bigint`` under ``nanosAsLong``
    the stream binds LongType and applies the identical
    nanos→micros conversion.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    nanos_ts = False
    try:
        probed = spark.read.parquet(path_glob).schema
        nanos_ts = any(
            f.name == "ts" and isinstance(f.dataType, T.LongType) for f in probed
        )
    except Exception:
        # unreadable/empty glob: keep the canonical schema; the stream will
        # surface the real error (or stay empty) on start
        pass
    schema = EVENTS_SCHEMA
    if nanos_ts:
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in EVENTS_SCHEMA
            ]
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path_glob)
    )
    if nanos_ts:
        # integer division, same as read_events: epoch nanos exceed double's
        # 53-bit mantissa
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return stream


#: fixed mtime base for replay staging (any constant works: only the
#: RELATIVE order matters to the file source, which lists oldest-first)
_REPLAY_MTIME_BASE = 1_700_000_000


def stage_replay(batches: list[DataFrame], out_dir: str) -> tuple[str, int]:
    """Write each frame as one parquet directory under ``out_dir`` and
    arrange strictly ascending modification times so a file-source stream
    with ``maxFilesPerTrigger=1`` replays them as micro-batches in EXACTLY
    list order — deterministic micro-batch boundaries, which is what makes
    watermark-eviction outcomes reproducible (the file source lists files
    oldest-mtime-first; ``_``/``.``-prefixed side files are ignored by its
    hidden-file filter).

    Each batch is ``coalesce(1)`` — replay staging is for bounded graded /
    test corpora, not a production data path. Returns ``(glob, n_batches)``
    where ``glob`` is the path pattern to hand ``readStream``.
    """
    import os

    for i, b in enumerate(batches):
        p = os.path.join(out_dir, f"batch-{i:04d}")
        b.coalesce(1).write.mode("overwrite").parquet(p)
        stamp = _REPLAY_MTIME_BASE + i * 10
        os.utime(p, (stamp, stamp))
        for name in os.listdir(p):
            os.utime(os.path.join(p, name), (stamp, stamp))
    return os.path.join(out_dir, "*"), len(batches)


def windowed_event_counts(
    events: DataFrame,
    *,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + value sum per event_type.

    Works identically on batch and streaming inputs; on streaming the
    watermark bounds the aggregation state (required for append mode).
    Output: window_start, window_end, event_type, n_events, sum_value.
    """
    # event-time semantics require an event time: on the streaming path a
    # NULL ts row can never pass the watermark, so the batch twin drops it
    # too (engines also disagree on a NULL-keyed window group's rendering)
    src = events.filter(plausible_time(F.col("ts")))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    *,
    event_time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: emit only the first row seen per key.

    ``dropDuplicatesWithinWatermark`` keyed on key_cols: seen-key state is
    evicted once it ages past the watermark, so state is bounded by keys per
    watermark window, not all history — a duplicate arriving later than the
    watermark can re-emit (the documented trade every bounded-state streaming
    dedup makes). Keys should be content fingerprints
    (``functions.textstats.content_fingerprint``) so state is ~48 B/key.
    """
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user running event count and value sum, maintained across
    micro-batches and emitted (updated) once per batch the user appears in.

    This is the pattern for operators Spark's built-in stateful aggregations
    can't express (arbitrary per-key state machines); the state here is two
    numbers per user, so state size is O(distinct users) regardless of event
    volume. Batch twin: :func:`user_totals` (same output, one groupBy).
    """
    import pandas as pd  # noqa: F401 — required by the worker
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_totals(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`user_running_totals` — the final state every user
    would converge to after the stream drains."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 6).alias("total_value"),
    )


def attribution_join(
    left: DataFrame,
    right: DataFrame | None = None,
    *,
    left_type: str = "click",
    right_type: str = "purchase",
    max_lag_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INNER interval join: attribute each ``right_type`` event
    to every ``left_type`` event by the same user in the preceding
    ``max_lag_minutes`` — the classic click→purchase attribution shape.

    Pass one DataFrame (split by ``event_type`` internally) or two. On
    streaming inputs both sides carry a watermark and the join condition
    time-bounds the buffered state: Spark can evict a click once the
    purchase-side watermark passes ``click.ts + max_lag``, so state is
    O(events per lag window), not O(stream history) — the property that
    makes the join runnable forever. On batch inputs the same plan is a
    plain equi-join with a range residual.

    Output: user_id, left_id, right_id, left_ts, right_ts, lag_seconds.
    """
    left = left.filter(plausible_time(F.col("ts")))
    if right is None:
        right = left
    else:
        right = right.filter(plausible_time(F.col("ts")))
    lhs = left.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("l_ts"),
    )
    rhs = right.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("r_ts"),
    )
    if lhs.isStreaming:
        lhs = lhs.withWatermark("l_ts", watermark)
    if rhs.isStreaming:
        rhs = rhs.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_lag_minutes} MINUTES"))
    )
    return lhs.join(rhs, cond).select(
        F.col("l_user").alias("user_id"),
        "left_id",
        "right_id",
        F.col("l_ts").alias("left_ts"),
        F.col("r_ts").alias("right_ts"),
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("lag_seconds"),
    )


def sessionize(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user (gap-based). Streaming uses the built-in
    ``session_window`` (state cleaned by watermark); batch uses the same
    expression without watermark. Output: user_id, session_start,
    session_end, n_events."""
    # same event-time contract as windowed_event_counts: NULL ts rows are
    # un-sessionizable (they'd never pass the streaming watermark either)
    src = events.filter(plausible_time(F.col("ts")))
    src = src.withWatermark("ts", watermark) if events.isStreaming else src
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    *,
    on: str = "event_type",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) event frame
    against a bounded dimension table — the third cell of the streaming
    join matrix (stream⋈stream: ``attribution_join``; stream⋈state:
    ``user_running_totals``; stream⋈static: here).

    Stream-static joins are STATELESS in Structured Streaming: each
    micro-batch hash-joins against the static side with no watermark and no
    state store, and the static side is re-read per batch (so an updated
    blocklist/dim parquet is picked up on the next trigger — the
    slowly-changing-dimension refresh pattern, for free). The same
    function serves batch frames unchanged — batch/stream unification,
    verified in tests by running the identical call on both and comparing
    results. ``F.broadcast`` is deliberately NOT forced: small dims
    broadcast via AQE in batch and via the stream planner's size estimate
    in streaming; a huge static side falls back to shuffle."""
    return events.join(dim, on=on, how=how)
