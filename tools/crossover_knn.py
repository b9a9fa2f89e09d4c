"""kNN-join scale sweep: sjoin_knn (level-doubling grid + residual
sweep) vs a single-node numpy twin, values cross-checked exactly.

The numpy twin is the fair floor available in this container (no
scipy/cKDTree): a chunked brute-force — for each query chunk, squared
distances to the FULL corpus and an argpartition top-k. That is the
textbook single-node answer at these sizes and has zero framework
overhead; the engine's job is to beat it once the corpus outgrows one
core's memory bandwidth.

At each scale the two result sets are compared EXACTLY ((qid, rid, rank)
triples and bit-identical dist2) before times are reported — a perf
number for a wrong answer is worthless.

Run: python tools/crossover_knn.py
(SPARK_GRAFT_KNN_SCALES="1,4,16" to vary corpus replication;
 sf dir via SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(x) for x in os.environ.get("SPARK_GRAFT_KNN_SCALES", "1,4,16").split(",")]
K = 5
N_QUERIES = 2_000


def numpy_twin(qx, qy, rx, ry, rid, k, pad=512):
    """Chunked brute force, best-available single-node formulation:
    candidate selection via the BLAS matmul expansion
    |q|^2 + |r|^2 - 2 q.r (multithreaded GEMM — ~10x the naive
    broadcast-subtract blocks, which are allocation/bandwidth-bound),
    then EXACT (a-b)^2 arithmetic recomputed on just the k+pad
    candidates so the reported dist2 is bit-identical to the engine's.

    Integer-grid fixtures produce heavy distance ties, and the engine
    breaks ties by smallest rid — the pad absorbs both the tie groups
    and the matmul formulation's FP slop, with an assert that the tie
    group never spans the pad."""
    out_rid = np.empty((len(qx), k), dtype=rid.dtype)
    out_d2 = np.empty((len(qx), k), dtype=np.float64)
    R = np.stack([rx, ry], axis=1)
    rr = rx * rx + ry * ry
    chunk = max(1, int(2e8 / max(len(rx), 1)))
    kk = min(k + pad, len(rx))
    for s in range(0, len(qx), chunk):
        Q = np.stack([qx[s : s + chunk], qy[s : s + chunk]], axis=1)
        qq = (Q * Q).sum(axis=1)
        g = qq[:, None] + rr[None, :] - 2.0 * (Q @ R.T)
        part = (
            np.argpartition(g, kk - 1, axis=1)[:, :kk]
            if kk < g.shape[1]
            else np.broadcast_to(np.arange(g.shape[1]), g.shape).copy()
        )
        # exact engine arithmetic on the candidate set only
        cdx = qx[s : s + chunk, None] - rx[part]
        cdy = qy[s : s + chunk, None] - ry[part]
        pd2 = cdx * cdx + cdy * cdy
        prid = rid[part]
        for i in range(len(pd2)):
            order = np.lexsort((prid[i], pd2[i]))
            if kk < g.shape[1]:
                assert pd2[i][order[k - 1]] < pd2[i][order[-1]], (
                    "tie group spans the pad; raise pad"
                )
            out_d2[s + i] = pd2[i][order[:k]]
            out_rid[s + i] = prid[i][order[:k]]
    return out_rid, out_d2


def main() -> None:
    from pyspark.sql import functions as F

    from spatialpandas_spark import st_point
    from spatialpandas_spark.operators.knn import sjoin_knn
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="crossover_knn")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(N_QUERIES)
    n = spark.sparkContext.defaultParallelism

    results = []
    for scale in SCALES:
        # replicated corpus: each copy shifts coords by a deterministic
        # offset so copies are distinct points, preserving kNN structure
        copies = []
        for c in range(scale):
            copies.append(
                li.select(
                    (
                        F.col("l_orderkey") * 10
                        + F.col("l_linenumber")
                        + F.lit(c * 100_000_000)
                    ).alias("id"),
                    ((F.col("l_partkey") % 500).cast("double") + c * 0.001).alias("x"),
                    ((F.col("l_suppkey") % 500).cast("double") + c * 0.0007).alias("y"),
                )
            )
        corpus_xy = copies[0]
        for cdf in copies[1:]:
            corpus_xy = corpus_xy.unionByName(cdf)
        corpus_xy = corpus_xy.repartition(n).localCheckpoint(eager=True)
        corpus = corpus_xy.select(
            "id", st_point(F.col("x"), F.col("y")).alias("geom")
        )
        qs_xy = o.select(
            F.col("o_orderkey").alias("qid"),
            (F.col("o_orderkey") * 6007 % 500).cast("double").alias("x"),
            (F.col("o_custkey") * 9973 % 500).cast("double").alias("y"),
        ).localCheckpoint(eager=True)
        qs = qs_xy.select("qid", st_point(F.col("x"), F.col("y")).alias("geom"))

        n_corpus = corpus_xy.count()

        # numpy twin (data pull excluded from its timing, as for the engine)
        rx_ry = corpus_xy.toPandas()
        q_pd = qs_xy.toPandas()
        rx = rx_ry["x"].to_numpy()
        ry = rx_ry["y"].to_numpy()
        rid = rx_ry["id"].to_numpy()
        qx = q_pd["x"].to_numpy()
        qy = q_pd["y"].to_numpy()
        t0 = time.time()
        np_rid, np_d2 = numpy_twin(qx, qy, rx, ry, rid, K)
        t_numpy = time.time() - t0

        t0 = time.time()
        eng = sjoin_knn(qs, corpus, k=K, left_id="qid", right_id="id")
        eng_pd = eng.toPandas()
        t_engine = time.time() - t0

        # exact agreement before any perf claim
        eng_pd = eng_pd.sort_values(["qid", "rank"]).reset_index(drop=True)
        qids = q_pd["qid"].to_numpy()
        order = np.argsort(qids, kind="stable")
        want_rid = np_rid[order].ravel()
        want_d2 = np_d2[order].ravel()
        assert len(eng_pd) == len(want_rid), (len(eng_pd), len(want_rid))
        assert (eng_pd["id"].to_numpy() == want_rid).all(), "rid mismatch"
        assert (eng_pd["dist2"].to_numpy() == want_d2).all(), "dist2 not bit-equal"

        results.append(
            {
                "scale": scale,
                "n_corpus": int(n_corpus),
                "n_queries": int(len(qx)),
                "numpy_sec": round(t_numpy, 3),
                "engine_sec": round(t_engine, 3),
                "ratio": round(t_engine / t_numpy, 2),
                "values": "exact-match",
            }
        )
        print(json.dumps(results[-1]))

    print(json.dumps({"sweep": results}))
    spark.stop()


if __name__ == "__main__":
    main()
