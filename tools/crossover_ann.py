"""ANN scale sweep: exact brute force (numpy single-node twin + this
engine's two-phase plan) vs IVF probing, at replicated corpus scales.

Replication: embeddings get vec_id offsets per copy with a small
deterministic per-copy rotation of the vector (keeps copies from being
exact duplicates, preserving meaningful top-k structure). Queries are
the same 8 vectors at every scale.

Reports, per scale: numpy exact (matmul) time, engine brute-force time,
engine IVF time, and IVF recall@10 vs exact — the quality/speed trade
the 100 TB design banks on (probe n_probe/n_centroids of the corpus).

Run: python tools/crossover_ann.py
(SPARK_GRAFT_ANN_SCALES="1,4,16" to vary; sf dir via SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(x) for x in os.environ.get("SPARK_GRAFT_ANN_SCALES", "1,4,16").split(",")]
WORK = os.environ.get("SPARK_GRAFT_ANN_WORK", "/tmp/ann_crossover")
K = 10
N_QUERIES = 8


def replicate(n: int) -> str:
    os.makedirs(WORK, exist_ok=True)
    path = os.path.join(WORK, f"emb_x{n}.parquet")
    if os.path.exists(path):
        return path
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    n_rows = t.num_rows
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    copies = []
    for kcopy in range(n):
        # deterministic distinct copies: roll the vector by kcopy dims
        rolled = np.roll(emb, kcopy, axis=1)
        copies.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.asarray(t["vec_id"]) + kcopy * n_rows
                    ),
                    "label": t["label"],
                    "embedding": pa.array(list(rolled)),
                }
            )
        )
    pq.write_table(pa.concat_tables(copies), path)
    return path


def np_exact(path: str) -> tuple[float, set]:
    t = pq.read_table(path)
    ids = np.asarray(t["vec_id"])
    emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    t0 = time.time()
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    unit = emb / norms[:, None]
    q = unit[np.argsort(ids)[:N_QUERIES]]
    sims = q @ unit.T
    top = np.argsort(-sims, axis=1)[:, :K]
    elapsed = time.time() - t0
    truth = {
        (int(qi), int(ids[j])) for qi in range(N_QUERIES) for j in top[qi]
    }
    return elapsed, truth


def engine_runs(spark, path: str, truth: set) -> dict:
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(path)
    qs = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def timed(fn):
        fn().count()  # warm
        t0 = time.time()
        rows = fn().collect()
        return time.time() - t0, rows

    bf_t, bf_rows = timed(lambda: brute_force_topk(qs, emb, k=K))
    ivf_t, ivf_rows = timed(
        # kmeans_iters=0: this tool measures the assignment/probe kernels,
        # not build-time centroid refinement (library default is 2)
        lambda: ivf_topk(qs, emb, k=K, n_centroids=32, n_probe=8, kmeans_iters=0)
    )

    # persistent-index probe: the bucketing scan is paid ONCE at build
    # time; serving cost is the partition-pruned probe only
    from spatialpandas_spark.operators.similarity_index import (
        build_ivf_index,
        query_ivf_index,
    )

    idx_path = path.replace(".parquet", "_idx")
    t0 = time.time()
    build_ivf_index(emb, idx_path, n_centroids=32, kmeans_iters=0)
    build_t = time.time() - t0
    probe_t, probe_rows = timed(
        lambda: query_ivf_index(spark, idx_path, qs, k=K, n_probe=8)
    )

    got = {(r["qid"], r["vec_id"]) for r in ivf_rows}
    bf_set = {(r["qid"], r["vec_id"]) for r in bf_rows}
    recall = len(got & bf_set) / max(len(bf_set), 1)
    return {
        "bf_sec": round(bf_t, 3),
        "ivf_sec": round(ivf_t, 3),
        "ivf_build_sec": round(build_t, 3),
        "ivf_probe_sec": round(probe_t, 3),
        "ivf_recall": round(recall, 4),
        "bf_matches_numpy": bf_set == truth,
        "probe_matches_ivf": {(r["qid"], r["vec_id"]) for r in probe_rows}
        == got,
    }


def main() -> None:
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="ann_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in SCALES:
        path = replicate(n)
        np_t, truth = np_exact(path)
        r = engine_runs(spark, path, truth)
        r.update({"scale": n, "np_exact_sec": round(np_t, 3)})
        out.append(r)
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
