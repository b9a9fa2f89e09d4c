"""IVF recall study: measured recall@5 of the ACTUAL operators
(`ivf_topk` raw-md5 vs kmeans-refined centroids) across three data
regimes, at the gate's 16-centroid setting. Emits one JSON line; numbers
are recorded in BASELINE.md.

Regimes:
- `iso`: the real embeddings fixture — ISOTROPIC vectors (same-label mean
  cosine 0.002). For any partition index, recall on structureless data is
  information-theoretically bounded near the probed scan fraction
  (neighbors are distributed ~uniformly over buckets, so probing
  n_probe/n_centroids of the corpus finds ~that fraction of them, plus a
  correlation bonus from the query's own direction). Centroid quality
  CANNOT beat this — k-means moves the bound nowhere.
- `clustered`: the deterministic clustered twin the ann_ivf_topk gate
  verifies (within-label cosine 0.978) — recall saturates at 1.0 even
  with raw sampled centroids.
- `skewed`: moderately-noisy clusters with zipf-skewed sizes — the regime
  where centroid QUALITY matters: md5-sampling allocates centroids by
  cluster mass (big clusters hog them), k-means re-balances. This is
  where the kmeans_iters=2 default earns its two extra scans.

Usage: python tools/ivf_recall_study.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spatialpandas_spark.operators.similarity import brute_force_topk, ivf_topk
from spatialpandas_spark.session import get_spark


def _recall(spark, corpus, vec_col, n_probe, kmeans_iters, k=5, n_centroids=16):
    qs = corpus.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("qid"), F.col(vec_col).alias("qvec")
    )
    bf = {
        (r["qid"], r["vec_id"])
        for r in brute_force_topk(qs, corpus, k=k, corpus_vec=vec_col).collect()
    }
    got = {
        (r["qid"], r["vec_id"])
        for r in ivf_topk(
            qs,
            corpus,
            k=k,
            n_centroids=n_centroids,
            n_probe=n_probe,
            kmeans_iters=kmeans_iters,
            corpus_vec=vec_col,
        ).collect()
    }
    return round(len(got & bf) / len(bf), 3)


def _skewed_clusters(spark, seed=7, noise=0.25):
    sizes = [200, 100, 60, 40, 30, 25, 15, 12, 10, 8]
    rng = np.random.default_rng(seed)
    dim = 64
    centers = rng.standard_normal((len(sizes), dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for ci, n in enumerate(sizes):
        block = centers[ci] + noise * rng.standard_normal((n, dim))
        for v in block:
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark(app_name="ivf_recall_study")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import _clustered_vecs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {"sf_dir": sf_dir, "n_centroids": 16, "k": 5, "regimes": {}}

    iso = {}
    for n_probe in (2, 4, 8, 12):
        iso[f"n_probe={n_probe}"] = {
            "raw": _recall(spark, emb, "embedding", n_probe, 0),
            "kmeans2": _recall(spark, emb, "embedding", n_probe, 2),
            "scan_fraction": round(n_probe / 16, 3),
        }
    out["regimes"]["iso"] = iso

    cdf = _clustered_vecs(emb.select("vec_id", "label"))
    out["regimes"]["clustered"] = {
        f"n_probe={p}": {
            "raw": _recall(spark, cdf, "cvec", p, 0),
            "kmeans2": _recall(spark, cdf, "cvec", p, 2),
        }
        for p in (2, 4)
    }

    sk = _skewed_clusters(spark)
    out["regimes"]["skewed"] = {
        f"n_probe={p}": {
            "raw": _recall(spark, sk, "embedding", p, 0),
            "kmeans2": _recall(spark, sk, "embedding", p, 2),
        }
        for p in (4, 6)
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
