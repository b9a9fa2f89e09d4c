"""Watermarked stream-stream join: the streaming attribution result on
finite data must equal the batch twin, and the plan must be a
StreamingSymmetricHashJoin with state watermarks (bounded buffers)."""

import time as _time
from datetime import datetime, timezone

import pytest

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from spatialpandas_spark.streaming.events import (
    attribute_clicks_batch,
    attribute_clicks_stream,
)

SCH = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)

BASE = 1_700_000_000


def _rows(spec):
    # spec: (event_id, user_id, type, offset_seconds)
    return [
        (eid, u, t, datetime.fromtimestamp(BASE + s, tz=timezone.utc))
        for eid, u, t, s in spec
    ]


@pytest.fixture()
def event_files(spark, tmp_path):
    """Three arrival files, then a watermark-advancing sentinel."""
    f1 = _rows([(1, 1, "view", 0), (2, 1, "view", 100), (3, 2, "view", 50)])
    f2 = _rows([(4, 1, "click", 150), (5, 2, "click", 5000)])  # 5000: gap>1h? no (3600: 5000-50=4950s > 3600 -> no match)
    f3 = _rows([(6, 1, "view", 160), (7, 1, "click", 200)])
    f4 = _rows([(99, 999, "view", 100_000)])  # watermark push
    src = str(tmp_path / "attr_src")
    for chunk in (f1, f2, f3, f4):
        spark.createDataFrame(chunk, SCH).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)
    return src


def test_stream_join_matches_batch(spark, event_files):
    stream = (
        spark.readStream.schema(SCH)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    clicks = stream.filter("event_type = 'click'")
    views = stream.filter("event_type = 'view'")
    out = attribute_clicks_stream(clicks, views, max_gap_seconds=3600)
    q = (
        out.writeStream.format("memory")
        .queryName("attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["view_id"], r["gap_us"])
        for r in spark.sql("SELECT * FROM attr").collect()
        if r["user_id"] != 999
    }

    batch = spark.read.parquet(event_files)
    expect = {
        (r["click_id"], r["view_id"], r["gap_us"])
        for r in attribute_clicks_batch(
            batch.filter("event_type = 'click'"),
            batch.filter("event_type = 'view'"),
            max_gap_seconds=3600,
        ).collect()
        if r["user_id"] != 999
    }
    # click 4 (t=150) matches views 1 (0) and 2 (100); click 7 (t=200)
    # matches views 1, 2, 6; click 5 (t=5000) matches nothing within 1h
    assert expect == {
        (4, 1, 150_000_000),
        (4, 2, 50_000_000),
        (7, 1, 200_000_000),
        (7, 2, 100_000_000),
        (7, 6, 40_000_000),
    }
    assert got == expect


def test_stream_join_plan_is_stateful_and_bounded(spark, event_files):
    stream = (
        spark.readStream.schema(SCH)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_files)
    )
    out = attribute_clicks_stream(
        stream.filter("event_type = 'click'"),
        stream.filter("event_type = 'view'"),
    )
    assert out.isStreaming
    # both inputs watermarked -> Spark derives state watermarks for the
    # symmetric hash join instead of buffering a side forever
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") >= 2, plan[:1500]
