"""Persistent IVF index: equivalence with in-memory ivf_topk, partition
pruning in the probe plan, and sidecar round-trip."""

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.similarity import ivf_topk
from spatialpandas_spark.operators.similarity_index import (
    build_ivf_index,
    load_ivf_centroids,
    query_ivf_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    # kmeans_iters=0 pins the deterministic md5-centroid path so the
    # index == in-memory equality below is exact (two independent k-means
    # runs could differ in last-ulp centroid sums); the kmeans DEFAULT
    # path is covered by test_default_index_recall_on_clustered below
    build_ivf_index(emb, path, n_centroids=8, kmeans_iters=0)
    return path


def _qs(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_index_query_equals_in_memory_ivf(spark, emb, index_path):
    got = {
        (r["qid"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
        for r in query_ivf_index(spark, index_path, _qs(emb), k=5, n_probe=3).collect()
    }
    expect = {
        (r["qid"], r["rank"]): (r["vec_id"], round(r["sim"], 9))
        for r in ivf_topk(
            _qs(emb), emb, k=5, n_centroids=8, n_probe=3, kmeans_iters=0
        ).collect()
    }
    assert got == expect


def test_default_index_recall_on_clustered(spark, tmp_path):
    """The DEFAULT build path (kmeans_iters=2) end-to-end: build the
    persistent index over the deterministic clustered twin, probe it, and
    require recall@5 >= 0.9 at n_probe=4/16 vs exact brute force."""
    from __spark_entry__ import _clustered_vecs
    from spatialpandas_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cdf = _clustered_vecs(emb.select("vec_id", "label"))
    path = str(tmp_path / "index_default")
    build_ivf_index(cdf, path, n_centroids=16, corpus_vec="cvec")
    qs = cdf.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("cvec").alias("qvec")
    )
    bf = {
        (r["qid"], r["vec_id"])
        for r in brute_force_topk(qs, cdf, k=5, corpus_vec="cvec").collect()
    }
    got = {
        (r["qid"], r["vec_id"])
        for r in query_ivf_index(spark, path, qs, k=5, n_probe=4).collect()
    }
    assert len(got & bf) / len(bf) >= 0.9


def test_sidecar_roundtrip(index_path):
    cents = load_ivf_centroids(index_path)
    assert len(cents) == 8 and len(cents[0]) == 64


def test_probe_prunes_partitions(spark, emb, index_path):
    from spatialpandas_spark.plans.inspect import physical_plan

    import re

    out = query_ivf_index(spark, index_path, _qs(emb), k=5, n_probe=2)
    plan = physical_plan(out)
    # the INDEX scan (not the query-side scan, whose PartitionFilters are
    # empty) must carry a bucket partition filter — static or dynamic
    assert re.search(r"PartitionFilters: \[[^\]]*bucket", plan), plan


def test_bucket_dirs_on_disk(index_path):
    import os

    dirs = [d for d in os.listdir(index_path) if d.startswith("bucket=")]
    assert len(dirs) >= 2  # corpus spread over multiple buckets
