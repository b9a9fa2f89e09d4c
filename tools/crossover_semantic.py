"""Semantic-dedup scale sweep: this engine's SemDeDup pipeline
(operators/semantic.py) vs a vectorized single-node numpy twin, at
replicated embedding scales — the crossover-evidence discipline every
operator family carries (BASELINE.md).

The twin implements the identical recipe (deterministic md5-sample
centroids, spherical Lloyd, max-cosine assignment, within-cluster
pairwise cosine, union-find, min-id labels) with BLAS matmuls — the
strongest credible one-machine implementation. Outputs are verified
EQUAL (cluster labels per id) before any timing is reported.

Run: python tools/crossover_semantic.py
(SPARK_GRAFT_SEM_SCALES="1,4,16,64" to vary; sf via SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SEM_SCALES", "1,4,16,64").split(",")
]
WORK = os.environ.get("SPARK_GRAFT_SEM_WORK", "/tmp/semantic_crossover")
#: clusters grow LINEARLY with the corpus so the average cluster size —
#: and with it the within-cluster pair volume per row — stays constant
#: (the semantic-dedup deployment rule its docstring states; a fixed
#: cluster count would make the sweep quadratic on both sides)
BASE_CLUSTERS = 16
THRESHOLD = 0.97
ITERS = 2


def replicate(n: int) -> str:
    os.makedirs(WORK, exist_ok=True)
    path = os.path.join(WORK, f"emb_x{n}.parquet")
    if os.path.exists(path):
        return path
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    n_rows = len(emb)
    copies = []
    for k in range(n):
        rolled = np.roll(emb, k, axis=1)  # distinct but same geometry
        copies.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(n_rows, dtype=np.int64) + k * n_rows
                    ),
                    "embedding": pa.array(rolled.tolist()),
                }
            )
        )
    pq.write_table(pa.concat_tables(copies), path)
    return path


def numpy_twin(path: str, n_clusters: int) -> tuple[dict[int, int], float]:
    t = pq.read_table(path)
    ids = np.asarray(t["vec_id"].to_pylist())
    X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    t0 = time.time()
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]),
    )
    C = X[order[:n_clusters]].copy()

    def norm(a):
        n = np.linalg.norm(a, axis=1, keepdims=True)
        return np.divide(a, n, out=np.zeros_like(a), where=n > 0)

    Xn = norm(X)
    for _ in range(ITERS):
        a = (Xn @ norm(C).T).argmax(1)
        for c in range(n_clusters):
            m = a == c
            if m.any():
                C[c] = X[m].mean(0)
    assign = (Xn @ norm(C).T).argmax(1)
    parent = {int(i): int(i) for i in ids}

    def find(z):
        while parent[z] != z:
            parent[z] = parent[parent[z]]
            z = parent[z]
        return z

    for c in range(n_clusters):
        m = np.flatnonzero(assign == c)
        if len(m) < 2:
            continue
        S = Xn[m] @ Xn[m].T
        ii, jj = np.nonzero(np.triu(S >= THRESHOLD, k=1))
        for a_, b_ in zip(m[ii], m[jj]):
            ra, rb = find(int(ids[a_])), find(int(ids[b_]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    labels = {int(i): find(int(i)) for i in ids}
    return labels, time.time() - t0


def main() -> None:
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.semantic import semantic_dedup_clusters
    from spatialpandas_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"scales={SCALES} base_clusters={BASE_CLUSTERS} thr={THRESHOLD}")
    for s in SCALES:
        n_clusters = BASE_CLUSTERS * s
        path = replicate(s)
        ref, t_np = numpy_twin(path, n_clusters)
        df = spark.read.parquet(path).repartition(
            spark.sparkContext.defaultParallelism
        )
        df.cache().count()
        t0 = time.time()
        out = semantic_dedup_clusters(
            df, n_clusters=n_clusters, threshold=THRESHOLD,
            kmeans_iters=ITERS,
        ).select("vec_id", "cluster_id").collect()
        t_sp = time.time() - t0
        got = {r["vec_id"]: r["cluster_id"] for r in out}
        equal = got == ref
        n = len(ref)
        print(
            f"x{s:>3} n={n:>8,}  numpy {t_np:7.2f}s  engine {t_sp:7.2f}s  "
            f"ratio {t_sp / t_np:5.2f}  EQUAL={equal}"
        )
        df.unpersist()
        if not equal:
            diff = [k for k in ref if got.get(k) != ref[k]][:5]
            print("   first diffs:", diff)


if __name__ == "__main__":
    main()
