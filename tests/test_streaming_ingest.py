"""Streaming ingestion vs its sequential-batch twin.

The contract: a file stream driven through ``stream_dedup_ingest`` must
leave the same curated output and the same index behavior as calling
``ingest_batch`` on the same files in order — streaming is the same
pipeline, incrementally scheduled.
"""

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_index,
)
from spatialpandas_spark.streaming.ingest import (
    ingest_batch,
    probe_matches_stream,
    stream_dedup_ingest,
)

RNG = np.random.default_rng(29)
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc():
    return " ".join(WORDS[int(RNG.integers(0, 10))] for _ in range(50))


def _perturb(text, k=2):
    toks = text.split()
    for _ in range(k):
        toks[int(RNG.integers(0, len(toks)))] = WORDS[int(RNG.integers(0, 10))]
    return " ".join(toks)


@pytest.fixture(scope="module")
def fixture(spark):
    td = tempfile.mkdtemp(prefix="stream_ingest_")
    corpus = [(i, _doc()) for i in range(30)]
    # batch 1: 5 fresh docs + 3 near-dups of corpus docs
    b1 = [(100 + i, _doc()) for i in range(5)] + [
        (110 + i, _perturb(corpus[i][1])) for i in range(3)
    ]
    # batch 2: 4 fresh + 2 near-dups of corpus + 2 near-dups of batch-1 docs
    b2 = (
        [(200 + i, _doc()) for i in range(4)]
        + [(210 + i, _perturb(corpus[10 + i][1])) for i in range(2)]
        + [(220 + i, _perturb(b1[i][1])) for i in range(2)]
    )
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    yield td, cdf, b1, b2
    shutil.rmtree(td, ignore_errors=True)


def _write_stream_files(spark, td, b1, b2):
    src = f"{td}/src"
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    return src


def test_stream_ingest_matches_sequential_batches(spark, fixture):
    td, cdf, b1, b2 = fixture
    src = _write_stream_files(spark, td, b1, b2)
    schema = spark.read.parquet(src).schema

    # streaming run
    sidx = f"{td}/s_index"
    build_minhash_index(cdf, sidx)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_dedup_ingest(stream, sidx, f"{td}/s_out", f"{td}/s_ckpt")
    q.processAllAvailable()
    q.stop()
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{td}/s_out").collect()
    )

    # sequential-batch twin on an identically-built index
    bidx = f"{td}/b_index"
    build_minhash_index(cdf, bidx)
    s1 = ingest_batch(
        spark, bidx, spark.createDataFrame(b1, "doc_id long, text string")
    )
    s2 = ingest_batch(
        spark, bidx, spark.createDataFrame(b2, "doc_id long, text string")
    )
    want = sorted(
        [r["doc_id"] for r in s1.collect()] + [r["doc_id"] for r in s2.collect()]
    )

    assert got == want
    # dedup actually happened: near-dup plants were dropped
    assert len(got) < len(b1) + len(b2)
    # the two indexes now answer probes identically: an exact copy of a
    # batch-1 survivor matches it in both
    probe = spark.createDataFrame(
        [(9000, dict(b1)[got[0]] if got[0] in dict(b1) else dict(b2)[got[0]])],
        "doc_id long, text string",
    )
    ga = {
        (r["dup_of"], r["est_jaccard"])
        for r in dedup_against_index(spark, sidx, probe).collect()
    }
    gb = {
        (r["dup_of"], r["est_jaccard"])
        for r in dedup_against_index(spark, bidx, probe).collect()
    }
    assert ga == gb and (got[0], 1.0) in ga


def test_probe_matches_stream_is_readonly(spark, fixture):
    td, cdf, b1, b2 = fixture
    src = _write_stream_files(spark, f"{td}/ro", b1, b2)
    schema = spark.read.parquet(src).schema
    idx = f"{td}/ro_index"
    build_minhash_index(cdf, idx)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = probe_matches_stream(stream, idx, f"{td}/ro_out", f"{td}/ro_ckpt")
    q.processAllAvailable()
    q.stop()
    got = {
        (r["new_id"], r["dup_of"])
        for r in spark.read.parquet(f"{td}/ro_out").collect()
    }
    both = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    want = {
        (r["new_id"], r["dup_of"])
        for r in dedup_against_index(spark, idx, both).collect()
    }
    # read-only: index unchanged, so per-file probes union to the
    # whole-batch probe
    assert got == want and len(want) > 0


def test_output_write_is_retry_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id — the foreachBatch retry
    contract) must rewrite its own ingest_batch partition, not append a
    second copy; other batches' partitions stay untouched."""
    cdf = spark.createDataFrame(
        [(i, _doc()) for i in range(10)], "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    build_minhash_index(cdf, idx)
    b1 = spark.createDataFrame(
        [(100 + i, _doc()) for i in range(4)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(200 + i, _doc()) for i in range(3)], "doc_id long, text string"
    )
    ingest_batch(spark, idx, b1, out, batch_id=0)
    ingest_batch(spark, idx, b2, out, batch_id=1)
    before = sorted(
        (r["doc_id"], r["ingest_batch"])
        for r in spark.read.parquet(out).collect()
    )
    # replay batch 1 (crash-after-commit scenario)
    ingest_batch(spark, idx, b2, out, batch_id=1)
    after = sorted(
        (r["doc_id"], r["ingest_batch"])
        for r in spark.read.parquet(out).collect()
    )
    assert after == before  # no duplicates, batch-0 partition untouched
    assert {b for _, b in after} == {0, 1}
