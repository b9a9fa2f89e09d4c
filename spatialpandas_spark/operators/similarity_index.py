"""Persistent IVF index: build once, query many — the production ANN shape.

``ivf_topk`` (operators/similarity.py) recomputes centroid assignments on
every call; real serving workloads amortize that: ``build_ivf_index``
writes the corpus parquet **partitioned by bucket id** (one directory per
IVF bucket) with the centroid table as a JSON sidecar, and
``query_ivf_index`` probes only the n_probe bucket directories its
queries need — Spark's partition pruning turns the probe into a scan of
n_probe/n_centroids of the data, verifiable in the plan's
``PartitionFilters``. This is the same stats-driven-pruning philosophy as
the spatial manifest (SURVEY §2.9): the "index" is layout + metadata, not
a server-side structure.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spatialpandas_spark.operators.similarity import (
    _centroids,
    _centroid_sims,
    _topk_rerank,
    _with_centroids,
    bucket_assign_arrow,
    kmeans_refine,
    pair_cosine_arrow,
)

_SIDECAR = "_ivf_centroids.json"


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    kmeans_iters: int = 2,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> list[list[float]]:
    """Assign every corpus vector to its max-cosine centroid and write
    ``path`` partitioned by ``bucket``; centroids go to a JSON sidecar.
    Returns the centroid table. One corpus scan + one partitioned write.
    ``kmeans_iters=2`` (default) spends two extra build-time scans on
    spherical-k-means centroid refinement — the quality default; pass 0
    for the deterministic md5-sample path (exact SQL twin, used by the
    correctness gate). See ``ivf_topk`` for measured recall expectations
    on clustered vs isotropic data."""
    cents = _centroids(corpus, corpus_id, corpus_vec, n_centroids)
    if kmeans_iters > 0:
        cents = kmeans_refine(corpus, cents, kmeans_iters, corpus_id, corpus_vec)

    assigned = bucket_assign_arrow(
        corpus.select(
            F.col(corpus_id).alias("vec_id"),
            F.col(corpus_vec).cast("array<double>").alias("vec"),
        ),
        cents,
        vec_col="vec",
    ).withColumnRenamed("__bucket", "bucket")
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(path)

    # sidecar AFTER the data write so a readable index is always complete;
    # pyarrow-fs layer so object-store index paths work (S6)
    from spatialpandas_spark.sources import fs as _fs

    _fs.write_text(
        f"{path.rstrip('/')}/{_SIDECAR}", json.dumps({"centroids": cents})
    )
    return cents


def load_ivf_centroids(path: str, filesystem=None) -> list[list[float]]:
    from spatialpandas_spark.sources import fs as _fs

    return json.loads(
        _fs.read_text(f"{path.rstrip('/')}/{_SIDECAR}", filesystem=filesystem)
    )["centroids"]


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "qid",
    query_vec: str = "qvec",
) -> DataFrame:
    """Top-k by cosine over the union of each query's ``n_probe`` closest
    buckets. The bucket filter is a plain equality on the partition
    column, so Spark prunes unprobed directories at planning time.
    Columns out: (qid, vec_id, sim, rank)."""
    cents = load_ivf_centroids(path)
    q = _with_centroids(
        queries.select(
            F.col(query_id).alias("qid"),
            F.col(query_vec).cast("array<double>").alias("__qv"),
        ),
        cents,
    )
    sims = _centroid_sims(F.col("__qv"))
    ranked = F.sort_array(
        F.zip_with(
            sims,
            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        ),
        asc=False,
    )
    probes = F.transform(F.slice(ranked, 1, n_probe), lambda s: s["i"])
    q = q.withColumn("bucket", F.explode(probes)).drop("__cents")

    idx = spark.read.parquet(path)
    # pairs unique by construction (one bucket per indexed vector,
    # distinct probe buckets per query) — no dedup shuffle; Arrow pair
    # cosine + two-phase partial-top-k rerank
    cand = F.broadcast(q).join(idx, "bucket").select(
        "qid", "vec_id", "__qv", F.col("vec").alias("__cv")
    )
    return _topk_rerank(pair_cosine_arrow(cand), k)
