"""Embedding-stream ingestion against the persistent IVF-PQ index:
append under a pinned model, duplicate suppression with exact stored
rerank, and streaming == sequential-batch twin."""

import shutil
import tempfile

import numpy as np
import pytest

from pyspark.sql import functions as F

from spatialpandas_spark.operators.similarity_index import (
    append_to_ivfpq_index,
    build_ivfpq_index,
    query_ivfpq_index,
)
from spatialpandas_spark.streaming.ingest import (
    embedding_ingest_batch,
    stream_embedding_ingest,
)

DIM = 16
RNG = np.random.default_rng(17)


def _vecs(n, seed):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, DIM))
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def _df(spark, ids, X):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )


def _perturb(v, eps=0.01, seed=0):
    rng = np.random.default_rng(seed)
    w = v + eps * rng.standard_normal(len(v))
    return w / np.linalg.norm(w)


@pytest.fixture(scope="module")
def fixture(spark):
    td = tempfile.mkdtemp(prefix="emb_ingest_")
    base = _vecs(40, 1)
    cdf = _df(spark, range(40), base)
    # batch 1: 4 fresh + 2 near-dups of corpus vectors
    b1_X = np.vstack(
        [_vecs(4, 2), [_perturb(base[0], seed=3), _perturb(base[1], seed=4)]]
    )
    b1 = _df(spark, range(100, 106), b1_X)
    # batch 2: 3 fresh + 1 corpus near-dup + 1 near-dup of a b1 fresh vec
    b2_X = np.vstack(
        [_vecs(3, 5), [_perturb(base[2], seed=6), _perturb(b1_X[0], seed=7)]]
    )
    b2 = _df(spark, range(200, 205), b2_X)
    yield td, cdf, b1, b2
    shutil.rmtree(td, ignore_errors=True)


def _build(spark, cdf, path):
    build_ivfpq_index(
        cdf, path, n_centroids=4, m_sub=4, n_codes=32, store_vectors=True
    )


def test_append_visible_to_probe(spark, fixture):
    td, cdf, b1, b2 = fixture
    path = f"{td}/append_idx"
    _build(spark, cdf, path)
    fresh = _df(spark, [500], _vecs(1, 99))
    append_to_ivfpq_index(fresh, path)
    qs = fresh.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    top = query_ivfpq_index(
        spark, path, qs, k=1, n_probe=4, rerank="stored"
    ).collect()
    assert top and top[0]["vec_id"] == 500
    assert top[0]["sim"] == pytest.approx(1.0, abs=1e-9)


def test_ingest_batch_drops_dups_keeps_fresh(spark, fixture):
    td, cdf, b1, b2 = fixture
    path = f"{td}/batch_idx"
    out = f"{td}/batch_out"
    _build(spark, cdf, path)
    s1 = embedding_ingest_batch(
        spark, path, b1, out, threshold=0.95, n_probe=4, dim=DIM
    )
    ids1 = {r["vec_id"] for r in s1.collect()}
    assert ids1 == {100, 101, 102, 103}  # the two corpus near-dups dropped
    s2 = embedding_ingest_batch(
        spark, path, b2, out, threshold=0.95, n_probe=4, dim=DIM
    )
    ids2 = {r["vec_id"] for r in s2.collect()}
    # corpus near-dup (203) and the dup of ingested 100 (204) both dropped
    assert ids2 == {200, 201, 202}
    written = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    assert written == ids1 | ids2


def test_ingest_requires_stored_vectors(spark, fixture):
    td, cdf, b1, _ = fixture
    path = f"{td}/novec_idx"
    build_ivfpq_index(cdf, path, n_centroids=4, m_sub=4, n_codes=32)
    with pytest.raises(ValueError, match="store_vectors"):
        embedding_ingest_batch(spark, path, b1, dim=DIM)


def test_stream_matches_sequential(spark, fixture):
    td, cdf, b1, b2 = fixture
    src = f"{td}/src"
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    spath, sout = f"{td}/s_idx", f"{td}/s_out"
    _build(spark, cdf, spath)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_embedding_ingest(
        stream, spath, sout, f"{td}/ckpt", threshold=0.95, n_probe=4, dim=DIM
    )
    q.processAllAvailable()
    q.stop()
    streamed = {r["vec_id"] for r in spark.read.parquet(sout).collect()}

    bpath, bout = f"{td}/b_idx", f"{td}/b_out"
    _build(spark, cdf, bpath)
    for b in (b1, b2):
        embedding_ingest_batch(
            spark, bpath, b, bout, threshold=0.95, n_probe=4, dim=DIM
        )
    batched = {r["vec_id"] for r in spark.read.parquet(bout).collect()}
    assert streamed == batched


def test_matches_stream_read_only(spark, fixture):
    from spatialpandas_spark.streaming.ingest import embedding_matches_stream

    td, cdf, b1, b2 = fixture
    src = f"{td}/msrc"
    b1.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    path, out = f"{td}/m_idx", f"{td}/m_out"
    _build(spark, cdf, path)
    n_before = spark.read.parquet(path).count()
    stream = spark.readStream.schema(schema).parquet(src)
    q = embedding_matches_stream(
        stream, path, out, f"{td}/m_ckpt", threshold=0.95, n_probe=4
    )
    q.processAllAvailable()
    q.stop()
    matches = spark.read.parquet(out).collect()
    # b1 carries exactly two near-dups of corpus vectors 0 and 1
    assert {r["new_id"] for r in matches} == {104, 105}
    assert {r["dup_of"] for r in matches} == {0, 1}
    assert all(r["sim"] >= 0.95 for r in matches)
    # index untouched
    assert spark.read.parquet(path).count() == n_before
