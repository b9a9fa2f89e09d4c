"""JSON-lines events source: same output contract as the parquet
reader (explicit schema, ts normalized to microsecond UTC timestamp),
batch and streaming, ISO-8601 and epoch-micros timestamps, corrupt
lines tolerated."""

import json

from pyspark.sql import functions as F

from spatialpandas_spark.sources.events import read_events, read_events_json


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_batch_iso_and_epoch_ts(spark, tmp_path):
    p = str(tmp_path / "events.jsonl")
    _write_jsonl(
        p,
        [
            {"event_id": 1, "ts": "2024-03-01T10:30:00", "user_id": 7,
             "event_type": "view", "value": 1.5, "props": "{}"},
            {"event_id": 2, "ts": str(1709289000 * 1_000_000), "user_id": 7,
             "event_type": "click", "value": None, "props": None},
        ],
    )
    df = read_events_json(spark, p)
    rows = {r["event_id"]: r for r in df.collect()}
    assert rows[1]["ts"].isoformat().startswith("2024-03-01T10:30:00")
    # epoch micros 1709289000000000 == 2024-03-01T10:30:00 UTC
    assert rows[2]["ts"] == rows[1]["ts"]
    assert df.schema["ts"].dataType.typeName() == "timestamp"


def test_matches_parquet_reader_contract(spark, tmp_path):
    # round-trip the fixture events through jsonl; the two readers must
    # produce identical rows
    src = read_events(spark, "/root/testdata/sf0.001").limit(200)
    rows = src.collect()
    p = str(tmp_path / "ev.jsonl")
    _write_jsonl(
        p,
        [
            {
                "event_id": r["event_id"],
                "ts": r["ts"].isoformat(),
                "user_id": r["user_id"],
                "event_type": r["event_type"],
                "value": r["value"],
                "props": r["props"],
            }
            for r in rows
        ],
    )
    back = read_events_json(spark, p)
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_corrupt_lines_tolerated(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "x", "value": 0.1, "props": "{}"}\n')
        f.write("not json at all\n")
        f.write('{"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 2, "event_type": "y", "value": 0.2, "props": "{}"}\n')
    df = read_events_json(spark, p)
    good = df.filter(F.col("event_id").isNotNull())
    assert good.count() == 2  # corrupt line -> all-null row, filterable


def test_streaming_same_shape(spark, tmp_path):
    src_dir = tmp_path / "stream"
    src_dir.mkdir()
    _write_jsonl(
        str(src_dir / "a.jsonl"),
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1,
             "event_type": "view", "value": 1.0, "props": "{}"},
        ],
    )
    stream = read_events_json(spark, str(src_dir), streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("json_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM json_events").collect()
    assert len(got) == 1 and got[0]["event_type"] == "view"
    assert got[0]["ts"].year == 2024
