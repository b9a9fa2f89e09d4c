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
    """File-source event stream (one file per micro-batch by default)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


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
