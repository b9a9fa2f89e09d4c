"""Structured Streaming operators (beyond-reference: the reference has no
streaming surface, SURVEY.md §2.8; this is the batch ``events_hourly``
rollup re-expressed incrementally).

Design for scale: event-time tumbling windows + watermark bound the state
store; append output mode emits each window once it is final, so sinks
receive immutable partitions (safe for parquet). A per-key running profile
via ``applyInPandasWithState``-style stateful processing can be layered on
the same source later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (one file per micro-batch by default).

    Schema-adaptive like the batch reader: the stored ``ts`` may be legacy
    nanosecond bigint, ``timestamp_ntz``, or ``timestamp``; the stream's
    schema is taken from a static peek at the path and ``ts`` is
    normalized to a microsecond TIMESTAMP before any watermark applies.
    When the source directory is empty at start (the normal cold-start
    case for a file stream), the peek cannot infer a schema — the stream
    falls back to the canonical ``EVENT_SCHEMA`` and waits for files
    instead of failing.
    """
    from spatialpandas_spark.sources.events import (
        ensure_events_session_confs,
        normalize_event_ts,
    )

    ensure_events_session_confs(spark)
    try:
        static_schema = spark.read.parquet(path).schema
    except Exception:
        # empty/absent dir at cold start: no files to peek — use the
        # canonical schema (the peek exists only to detect legacy nanos)
        static_schema = EVENT_SCHEMA
    stream = (
        spark.readStream.schema(static_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return normalize_event_ts(stream)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup: count + sum(value) per
    (hour, event_type). Late rows beyond the watermark are dropped;
    state is bounded by watermark horizon x cardinality."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch micros
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator: per-user sessionization, the streaming
    twin of the batch ``user_sessions`` gate query (>gap_seconds of
    silence closes a session).

    Semantics: a session is a maximal merge of intervals
    ``[ts, ts + gap]`` — identical to the batch consecutive-gap
    definition — so events arriving OUT OF ORDER (within the watermark)
    merge into the right session regardless of arrival batch. State per
    user is only the open session intervals (start, last, count), not
    the events; a session is emitted exactly once, when the watermark
    passes ``last + gap`` (no non-late event can extend it), which is
    what bounds state at 100 TB/day rates: O(open sessions per user),
    not O(events).
    """
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd  # noqa: F401 (arrow batches arrive as pandas)

        if state.exists:
            starts, lasts, counts = state.get
            ivs = list(zip(starts, lasts, counts))
        else:
            ivs = []
        for pdf in pdfs:
            us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
            ivs.extend((int(t), int(t), 1) for t in us)
        ivs.sort()
        merged: list[tuple[int, int, int]] = []
        for s, e, c in ivs:
            if merged and s - merged[-1][1] <= gap_us:
                ms, me, mc = merged[-1]
                merged[-1] = (ms, max(me, e), mc + c)
            else:
                merged.append((s, e, c))
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [iv for iv in merged if iv[1] + gap_us < wm_us]
        open_ = [iv for iv in merged if iv[1] + gap_us >= wm_us]
        if open_:
            state.update(
                (
                    [iv[0] for iv in open_],
                    [iv[1] for iv in open_],
                    [iv[2] for iv in open_],
                )
            )
            # wake again when the earliest open session becomes closable
            timeout_ms = max(
                min(iv[1] for iv in open_) // 1000 + gap_seconds * 1000 + 1,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [iv[0] for iv in closed],
                    "session_end": [iv[1] for iv in closed],
                    "n_events": [iv[2] for iv in closed],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def attribute_clicks_stream(
    clicks: DataFrame,
    views: DataFrame,
    max_gap_seconds: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream join: attribute each click to the SAME
    user's view events within the preceding ``max_gap_seconds`` — the
    incremental twin of the batch as-of/interval attribution.

    Scale design: both sides carry event-time watermarks and the join
    condition bounds view_ts to a finite window before click_ts, so the
    state store retains each side only for watermark + gap — without the
    time bound a stream-stream join must buffer one side forever. The
    equality on user_id keys the state store; the range condition prunes
    within the key.

    Output: one row per (click, qualifying view) pair — downstream picks
    last-touch (max view_ts per click) or multi-touch weights; that
    per-click reduction composes as a normal aggregation.
    """
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    v = (
        views.select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        )
    )
    return c.join(v, cond, "inner").select(
        "click_id",
        "user_id",
        "click_ts",
        "view_id",
        "view_ts",
        (F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("view_ts"))).alias(
            "gap_us"
        ),
    )


def attribute_clicks_batch(
    clicks: DataFrame,
    views: DataFrame,
    max_gap_seconds: int = 3600,
) -> DataFrame:
    """Batch twin of ``attribute_clicks_stream`` (same output schema) for
    cross-checking the streaming result on finite data."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap_seconds} SECONDS")
        )
    )
    return c.join(v, cond, "inner").select(
        "click_id",
        "user_id",
        "click_ts",
        "view_id",
        "view_ts",
        (F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("view_ts"))).alias(
            "gap_us"
        ),
    )


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Batch twin of ``sessionize_stream`` (same output schema): session =
    consecutive events with gaps <= gap_seconds, per user."""
    from pyspark.sql.window import Window

    gap_us = gap_seconds * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    sid = F.sum("new_s").over(
        Window.partitionBy("user_id").orderBy("ts").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        events.withColumn("new_s", new_s)
        .withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min(us).alias("session_start"),
            F.max(us).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("sid")
    )


def run_rollup_to_memory(
    spark: SparkSession, input_path: str, query_name: str = "hourly_rollup"
):
    """Convenience: run the rollup into an in-memory sink (tests/demos).
    Append mode => only watermark-finalized windows appear."""
    stream = hourly_rollup(read_event_stream(spark, input_path))
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
