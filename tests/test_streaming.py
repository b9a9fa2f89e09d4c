"""Structured Streaming rollup: the streaming result (append mode, after
all files processed) must match the batch groupBy on the same data for all
watermark-finalized windows."""

import os

from pyspark.sql import functions as F

from spatialpandas_spark.streaming.events import (
    hourly_rollup,
    run_rollup_to_memory,
)


def _write_event_files(spark, path: str):
    """Split the sf0.001 events into 3 files to get 3 micro-batches,
    normalizing ts whatever the fixture's physical encoding."""
    from spatialpandas_spark.sources.events import read_events

    e = read_events(spark, "/root/testdata/sf0.001")
    e = e.select("event_id", "ts", "user_id", "event_type", "value", "props")
    # time-ordered 3-way split (arrival order must roughly follow event
    # time, else the watermark finalizes windows early and drops the rest
    # as late — exactly the semantics streaming guarantees)
    et = e.withColumn("tsl", F.col("ts").cast("long"))
    q1, q2 = et.approxQuantile("tsl", [0.33, 0.66], 0.0)
    splits = [
        et.filter(F.col("tsl") < q1).drop("tsl"),
        et.filter((F.col("tsl") >= q1) & (F.col("tsl") < q2)).drop("tsl"),
        et.filter(F.col("tsl") >= q2).drop("tsl"),
    ]
    import time as _time

    for part in splits:
        part.coalesce(1).write.mode("append").parquet(path)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    return e


def test_streaming_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_stream")
    batch_events = _write_event_files(spark, src)

    q = run_rollup_to_memory(spark, src, query_name="t_rollup")
    q.awaitTermination(120)

    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_rollup").collect()
    }

    expect_df = (
        batch_events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .collect()
    )
    expect = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"]) for r in expect_df
    }

    # append mode withholds windows the watermark hasn't passed; everything
    # emitted must match batch exactly, and most windows must have emitted
    assert got, "no windows emitted"
    for k, v in got.items():
        assert k in expect, k
        assert v[0] == expect[k][0]
        assert abs(v[1] - expect[k][1]) < 1e-6
    assert len(got) >= len(expect) - 10  # only trailing windows may be held


def test_rollup_is_incremental_plan(spark, tmp_path):
    src = str(tmp_path / "events_stream2")
    _write_event_files(spark, src)
    from spatialpandas_spark.streaming.events import read_event_stream

    stream = hourly_rollup(read_event_stream(spark, src))
    assert stream.isStreaming


def test_sessionize_stream_matches_batch_with_late_events(spark, tmp_path):
    """Stateful sessionization (applyInPandasWithState): out-of-order and
    late-but-within-watermark events land in the right session; every
    session is emitted exactly once and matches the batch twin."""
    import time as _time

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from spatialpandas_spark.streaming.events import (
        sessionize_batch,
        sessionize_stream,
    )

    GAP = 60  # seconds
    base = 1_700_000_000  # epoch seconds
    sch = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
        ]
    )

    def rows(spec):
        from datetime import datetime, timezone

        return [
            (u, datetime.fromtimestamp(base + s, tz=timezone.utc))
            for u, s in spec
        ]

    # user 1: session A = {0, 20, 50}; session B = {200, 230}
    # user 2: session C = {10, 40}   (40 arrives LATE, in file 3)
    # file-by-file arrival, out of order inside each file:
    f1 = rows([(1, 20), (1, 0), (2, 10)])
    f2 = rows([(1, 230), (1, 200)])           # jumps ahead in time
    f3 = rows([(2, 40), (1, 50)])             # late, within 300 s watermark
    # watermark push: closes everything (user 999 ignored in the check)
    f4 = rows([(999, 100_000)])

    src = str(tmp_path / "sess_src")
    for chunk in (f1, f2, f3, f4):
        spark.createDataFrame(chunk, sch).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_seconds=GAP, watermark="300 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
        if r["user_id"] != 999
    }

    batch = spark.createDataFrame(rows([  # same logical event set
        (1, 0), (1, 20), (1, 50), (1, 200), (1, 230), (2, 10), (2, 40),
    ]), sch)
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(batch, gap_seconds=GAP).collect()
    }
    assert got == expect
    assert len(expect) == 3  # sessions A, B, C


def test_read_event_stream_cold_start_empty_dir(spark, tmp_path):
    """A source directory that is EMPTY at stream start (the normal file-
    stream cold-start case) must fall back to EVENT_SCHEMA and wait for
    files, not fail at the static schema peek (round-3 ADVICE)."""
    import os

    from spatialpandas_spark.streaming.events import (
        EVENT_SCHEMA,
        hourly_rollup,
        read_event_stream,
    )

    src = str(tmp_path / "cold_start_events")
    os.makedirs(src, exist_ok=True)
    stream = read_event_stream(spark, src)  # must not raise
    assert stream.isStreaming
    assert stream.schema == EVENT_SCHEMA

    # files that arrive AFTER start are picked up and processed
    q = (
        hourly_rollup(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("t_cold_rollup")
        .outputMode("append")
        .start()
    )
    try:
        _write_event_files(spark, src)
        q.processAllAvailable()
    finally:
        q.stop()
    # append mode only emits watermark-finalized windows; the stream ran
    # and advanced — progress recorded rows in, zero errors
    assert q.exception() is None
