"""SemDeDup-style semantic dedup (operators/semantic.py) vs a
plain-python oracle implementing the same recipe independently:
deterministic md5-sample centroids, spherical Lloyd iterations,
max-cosine assignment, within-cluster exact-cosine pairs, union-find
transitive closure, min-id survivors."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.semantic import (
    semantic_dedup,
    semantic_dedup_clusters,
    semantic_dedup_pairs,
)


def _emb(spark, n=120, dim=16, labels=5, noise=0.05, seed=21, dups=10):
    """Clustered vectors plus exact near-dup copies (tiny perturbation)."""
    rng = np.random.default_rng(seed)
    protos = rng.standard_normal((labels, dim))
    lab = rng.integers(0, labels, n)
    X = protos[lab] + noise * rng.standard_normal((n, dim))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    for j in range(dups):  # id n+j duplicates id j with 1e-4 noise
        v = X[j] + 1e-4 * rng.standard_normal(dim)
        rows.append((n + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, {i: np.asarray(v) for i, v in rows}


def _py_oracle(vecs, n_clusters, threshold, iters):
    ids = sorted(vecs)
    # deterministic centroid sample: md5 hex order, ties by id
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = [vecs[i].copy() for i in order[:n_clusters]]

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    def assign():
        return {
            i: int(np.argmax([cos(vecs[i], c) for c in cents])) for i in ids
        }

    for _ in range(iters):
        a = assign()
        for c in range(n_clusters):
            members = [vecs[i] for i in ids if a[i] == c]
            if members:
                cents[c] = np.mean(members, axis=0)
    a = assign()
    pairs = set()
    for x in ids:
        for y in ids:
            if x < y and a[x] == a[y] and cos(vecs[x], vecs[y]) >= threshold:
                pairs.add((x, y))
    parent = {i: i for i in ids}

    def find(z):
        while parent[z] != z:
            parent[z] = parent[parent[z]]
            z = parent[z]
        return z

    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    clusters = {i: find(i) for i in ids}
    survivors = {i for i in ids if clusters[i] == i}
    return pairs, clusters, survivors


@pytest.mark.parametrize("iters", [0, 2])
def test_matches_python_oracle(spark, iters):
    df, vecs = _emb(spark)
    got_pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            df, n_clusters=6, threshold=0.98, kmeans_iters=iters
        ).collect()
    }
    exp_pairs, exp_clusters, exp_survivors = _py_oracle(
        vecs, 6, 0.98, iters
    )
    assert got_pairs == exp_pairs
    got_clusters = {
        r["vec_id"]: r["cluster_id"]
        for r in semantic_dedup_clusters(
            df, n_clusters=6, threshold=0.98, kmeans_iters=iters
        ).collect()
    }
    assert got_clusters == exp_clusters
    got_surv = {
        r["vec_id"]
        for r in semantic_dedup(
            df, n_clusters=6, threshold=0.98, kmeans_iters=iters
        ).collect()
    }
    assert got_surv == exp_survivors


def test_planted_duplicates_are_pruned(spark):
    df, _ = _emb(spark, dups=10)
    # threshold above the same-label cosine (~0.9988 at noise 0.05) but
    # below the planted-copy cosine (~1 - 5e-9 at noise 1e-4): exactly
    # the copies merge, nothing else
    surv = {
        r["vec_id"]
        for r in semantic_dedup(df, n_clusters=6, threshold=0.99999).collect()
    }
    # each planted copy (id 120+j of id j) loses to the lower original
    for j in range(10):
        assert 120 + j not in surv
        assert j in surv


def test_threshold_monotone_and_null_safe(spark):
    df, _ = _emb(spark, n=60, dups=5)
    df = df.unionByName(
        df.sparkSession.createDataFrame(
            [(999, None)], "vec_id long, embedding array<double>"
        )
    )
    loose = semantic_dedup_pairs(df, n_clusters=4, threshold=0.9).count()
    tight = semantic_dedup_pairs(df, n_clusters=4, threshold=0.999).count()
    assert tight <= loose
    # null-vector row passes through the survivor filter untouched
    surv = semantic_dedup(df, n_clusters=4)
    assert surv.filter(F.col("vec_id") == 999).count() == 1


def test_real_embeddings_table(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup_clusters(emb, n_clusters=8, threshold=0.99)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


# ---------------------------------------------------------- auto scaling
def test_auto_n_clusters_formula():
    """ceil(n/target) with clamps — pure math when n is supplied."""
    from spatialpandas_spark.operators.semantic import auto_n_clusters

    assert auto_n_clusters(None, n=0) == 1
    assert auto_n_clusters(None, n=1023) == 1
    assert auto_n_clusters(None, n=1025) == 2
    assert auto_n_clusters(None, n=5_000_000) == 4883  # ceil(5e6/1024)
    # 100 TB-ish corpus stays under the clamp until ~1e9 vectors
    assert auto_n_clusters(None, n=10**9) == 976_563
    assert auto_n_clusters(None, n=10**13) == 1 << 20  # clamped
    assert auto_n_clusters(None, n=300, target_mean_cluster=64) == 5
    with pytest.raises(ValueError):
        auto_n_clusters(None, n=10, target_mean_cluster=0)


def test_auto_default_matches_explicit(spark):
    """n_clusters=None resolves through auto_n_clusters: below one
    target's worth of vectors that is exactly one cluster, so the
    pair set must equal the explicit n_clusters=1 run."""
    df, _ = _emb(spark, n=60, dups=5)
    auto = semantic_dedup_pairs(df, threshold=0.9, kmeans_iters=0)
    pinned = semantic_dedup_pairs(
        df, n_clusters=1, threshold=0.9, kmeans_iters=0
    )
    assert sorted(map(tuple, auto.select("id_a", "id_b").collect())) == sorted(
        map(tuple, pinned.select("id_a", "id_b").collect())
    )


def test_auto_pair_volume_stays_linear(spark):
    """At a fixed target mean cluster size, the within-cluster candidate
    volume grows ~linearly in n, not quadratically: doubling n must not
    quadruple the all-pairs count (threshold=-1 keeps every candidate)."""
    from spatialpandas_spark.operators.semantic import auto_n_clusters

    counts = {}
    for n in (256, 512, 1024):
        df, _ = _emb(spark, n=n, dups=0, labels=8)
        k = auto_n_clusters(df, target_mean_cluster=64, n=n)
        assert k == -(-n // 64)
        pairs = semantic_dedup_pairs(
            df, n_clusters=k, threshold=-1.0, kmeans_iters=0
        )
        counts[n] = pairs.count()
    # quadratic would give 4x per doubling; linear-with-constant-mean
    # gives ~2x (cluster-size skew allows some slack)
    assert counts[512] < 3.0 * counts[256]
    assert counts[1024] < 3.0 * counts[512]
