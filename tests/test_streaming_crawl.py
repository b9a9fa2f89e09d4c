"""Streaming crawl ingestion vs its sequential twin: a WARC archive
stream driven through ``stream_crawl_ingest`` must leave the same
curated corpus as ``crawl_ingest_batch`` on the same archives in order
— streaming is the same extract + dedup pipeline, incrementally
scheduled. WARC bytes are hand-assembled from the spec layout (the
independent-oracle pattern of tests/test_archives.py)."""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup_index import build_minhash_index
from spatialpandas_spark.streaming.crawl import (
    crawl_ingest_batch,
    extract_crawl_batch,
    stream_crawl_ingest,
)

RNG = np.random.default_rng(31)
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc():
    return " ".join(WORDS[int(RNG.integers(0, 10))] for _ in range(60))


def _perturb(text, k=2):
    toks = text.split()
    for _ in range(k):
        toks[int(RNG.integers(0, len(toks)))] = WORDS[int(RNG.integers(0, 10))]
    return " ".join(toks)


def _http(body: bytes, status=200, ctype="text/html"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _rec(uri, text):
    html = f"<html><head><title>t</title></head><body><p>{text}</p></body></html>"
    block = _http(html.encode())
    hdrs = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return hdrs + block + b"\r\n\r\n"


def _archive(pages):
    return b"".join(_rec(u, t) for u, t in pages)


@pytest.fixture(scope="module")
def fixture(spark):
    td = tempfile.mkdtemp(prefix="stream_crawl_")
    seed = [(f"http://seed/{i}", _doc()) for i in range(20)]
    # archive batch 1: fresh pages + near-dups of seed + a URL refetch
    b1_pages = (
        [(f"http://new/{i}", _doc()) for i in range(4)]
        + [(f"http://dup/{i}", _perturb(seed[i][1])) for i in range(3)]
        + [("http://new/0", "refetched " + _doc())]  # same URL twice
    )
    # archive batch 2: fresh + near-dups of batch-1 pages
    b2_pages = [(f"http://n2/{i}", _doc()) for i in range(3)] + [
        (f"http://d2/{i}", _perturb(b1_pages[i][1])) for i in range(2)
    ]
    b1 = [(1, _archive(b1_pages[:4])), (2, _archive(b1_pages[4:]))]
    b2 = [(3, _archive(b2_pages))]
    cdf = spark.createDataFrame(seed, "doc_id string, text string")
    yield td, cdf, b1, b2
    shutil.rmtree(td, ignore_errors=True)


def _write_stream_files(spark, td, b1, b2):
    src = f"{td}/src"
    for b in (b1, b2):
        spark.createDataFrame(
            b, "archive_id long, payload binary"
        ).coalesce(1).write.mode("append").parquet(src)
    return src


def test_extract_crawl_batch_shapes(spark, fixture):
    td, cdf, b1, b2 = fixture
    batch = spark.createDataFrame(b1, "archive_id long, payload binary")
    docs = extract_crawl_batch(batch)
    rows = {r["doc_id"]: r for r in docs.collect()}
    # 7 distinct URLs in batch 1 (the refetch collapsed to the first
    # record, archive order)
    assert len(rows) == 7
    assert not rows["http://new/0"]["text"].startswith("refetched")
    assert all(r["title"] == "t" for r in rows.values())


def test_stream_crawl_matches_sequential(spark, fixture):
    td, cdf, b1, b2 = fixture
    src = _write_stream_files(spark, td, b1, b2)
    schema = spark.read.parquet(src).schema

    sidx = f"{td}/s_index"
    build_minhash_index(cdf, sidx)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_crawl_ingest(stream, sidx, f"{td}/s_out", f"{td}/s_ckpt")
    q.processAllAvailable()
    q.stop()
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{td}/s_out").collect()
    )

    bidx = f"{td}/b_index"
    build_minhash_index(cdf, bidx)
    s1 = crawl_ingest_batch(
        spark, bidx,
        spark.createDataFrame(b1, "archive_id long, payload binary"),
    )
    s2 = crawl_ingest_batch(
        spark, bidx,
        spark.createDataFrame(b2, "archive_id long, payload binary"),
    )
    want = sorted(
        [r["doc_id"] for r in s1.collect()]
        + [r["doc_id"] for r in s2.collect()]
    )
    assert got == want and len(got) > 0
    # dedup happened: the near-dup plants (dup/*, d2/*) were dropped
    assert not any(d.startswith("http://dup/") for d in got)
    assert not any(d.startswith("http://d2/") for d in got)
    # fresh pages survived
    assert {d for d in got if d.startswith("http://new/")} == {
        f"http://new/{i}" for i in range(4)
    }
