"""Streaming dedup: watermarked exact dedup and MinHash-LSH near-dup
suspects, checked against their batch twins."""

import time as _time
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("content", StringType()),
    ]
)

BASE = 1_700_000_000


def _ts(s):
    return datetime.fromtimestamp(BASE + s, tz=timezone.utc)


def _write_chunks(spark, path, chunks):
    for chunk in chunks:
        spark.createDataFrame(chunk, DOC_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        _time.sleep(1.1)


def test_dedup_stream_exact_drops_in_watermark_dupes(spark, tmp_path):
    from spatialpandas_spark.streaming.dedup import dedup_stream_exact

    txt_a = "the quick brown fox jumps over the lazy dog"
    txt_b = "an entirely different document about spark engines"
    chunks = [
        [(1, _ts(0), txt_a), (2, _ts(5), txt_b)],
        [(3, _ts(40), txt_a)],          # exact dupe of 1, within watermark
        [(4, _ts(80), txt_b), (5, _ts(90), "a third unique text")],
    ]
    src = str(tmp_path / "docs")
    _write_chunks(spark, src, chunks)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_stream_exact(stream, ["content"], watermark="300 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["content"])
        for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    # first-seen doc per distinct content survives
    assert {d for d, _ in got} == {1, 2, 5}


def test_near_dup_suspects_stream_flags_banded_collisions(spark, tmp_path):
    from spatialpandas_spark.streaming.dedup import near_dup_suspects_stream

    base_text = (
        "large scale data pipelines need deduplication because crawled "
        "corpora repeat the same boilerplate documents many many times"
    )
    near_dup = base_text.replace("many many", "so many")  # high overlap
    distinct = "completely unrelated short text about pelicans and tides"
    chunks = [
        [(1, _ts(0), base_text), (2, _ts(10), distinct)],
        [(3, _ts(50), near_dup)],
    ]
    src = str(tmp_path / "docs2")
    _write_chunks(spark, src, chunks)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = near_dup_suspects_stream(
        stream, watermark="600 seconds", n_hashes=16, bands=4
    )
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM neardup_out").collect()
    suspects = {(r["doc_id"], r["winner_id"]) for r in rows}
    # doc 3 collides with doc 1 in at least one band; doc 2 never flagged
    assert (3, 1) in suspects
    assert all(d != 2 for d, _ in suspects)


def test_near_dup_stream_ignores_unshingleable_docs(spark, tmp_path):
    """Docs too short to form a single shingle must not collide in a
    degenerate all-MAX bucket."""
    from spatialpandas_spark.streaming.dedup import near_dup_suspects_stream

    chunks = [
        [(1, _ts(0), "one two"), (2, _ts(5), "x")],   # both unshingleable (n=3)
        [(3, _ts(20), "y z"), (999, _ts(100_000), "wm push")],
    ]
    src = str(tmp_path / "docs3")
    _write_chunks(spark, src, chunks)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = near_dup_suspects_stream(stream, watermark="600 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("neardup_empty")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM neardup_empty").count() == 0


def test_run_near_dup_filter_writes_doc_level_suspects(spark, tmp_path):
    from spatialpandas_spark.streaming.dedup import run_near_dup_filter

    base_text = (
        "large scale data pipelines need deduplication because crawled "
        "corpora repeat the same boilerplate documents many many times"
    )
    chunks = [
        [(1, _ts(0), base_text), (2, _ts(10), "unrelated pelican tides")],
        [(3, _ts(50), base_text), (4, _ts(60), base_text)],
    ]
    src = str(tmp_path / "docs4")
    _write_chunks(spark, src, chunks)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_near_dup_filter(
        stream,
        sink_path=str(tmp_path / "suspects"),
        checkpoint_path=str(tmp_path / "ckpt"),
        watermark="600 seconds",
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "suspects"))
    rows = {r["doc_id"]: r for r in out.collect()}
    # 3 and 4 are exact copies of 1 -> flagged with winner 1; one row per
    # doc per batch, several band hits folded into n_band_hits
    assert set(rows) == {3, 4}
    assert rows[3]["winner_id"] == 1 and rows[3]["n_band_hits"] >= 1
    assert rows[4]["winner_id"] in (1, 3)
