"""PQ scale study: ADC code scan vs raw-float brute force at replicated
corpus scales, with recall and storage numbers.

Uses the same replication scheme as crossover_ann.py (per-copy dimension
roll keeps copies distinct). Per scale, reports:
- encode time (one-off build cost)
- engine brute-force top-k time over raw floats (the b9 shape)
- PQ ADC scan time (codes only) and ADC+exact-rerank time
- recall@10 of ADC-only and ADC+rerank vs exact
- bytes/vector raw vs coded

Run: python tools/pq_study.py
(SPARK_GRAFT_PQ_SCALES="16,64,256" to vary; sf dir via SPARK_GRAFT_SF_DIR)
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
SCALES = [int(x) for x in os.environ.get("SPARK_GRAFT_PQ_SCALES", "16,64,256").split(",")]
WORK = os.environ.get("SPARK_GRAFT_PQ_WORK", "/tmp/pq_study")
K = 10
N_QUERIES = 8
M_SUB = 8
N_CODES = 256


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
        rolled = np.roll(emb, kcopy, axis=1)
        copies.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(n_rows, dtype=np.int64) + kcopy * n_rows
                    ),
                    "embedding": pa.array(list(rolled.astype(np.float32))),
                }
            )
        )
    pq.write_table(pa.concat_tables(copies), path, row_group_size=65536)
    return path


def _verify_adc_against_numpy(spark, emb, codes, books, qs) -> None:
    """Engine ADC top-k vs a single-process numpy replica: identical
    (qid, vec_id, rank) triples and bit-identical sims required."""
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.pq import _l2_normalize, pq_topk

    B = np.asarray(books, dtype=np.float64)
    m_sub, n_codes, sub = B.shape
    crows = codes.collect()
    vid = np.asarray([r["vec_id"] for r in crows])
    C = np.frombuffer(
        b"".join(bytes(r["code"]) for r in crows), dtype=np.uint8
    ).reshape(-1, m_sub)
    qrows = qs.collect()
    Q = _l2_normalize(
        np.asarray([np.asarray(r["qvec"], dtype=np.float64) for r in qrows])
    )
    lut = np.stack(
        [Q[:, j * sub : (j + 1) * sub] @ B[j].T for j in range(m_sub)], axis=1
    )
    got = {}
    for r in pq_topk(qs, codes, books, k=K).collect():
        got[(r["qid"], r["rank"])] = (r["vec_id"], r["sim"])
    for qi, r in enumerate(qrows):
        scores = np.zeros(C.shape[0])
        for j in range(m_sub):
            scores += lut[qi, j, :][C[:, j]]
        order = np.lexsort((vid, -scores))[:K]
        for rank, ci in enumerate(order, start=1):
            want = (vid[ci], scores[ci])
            have = got[(r["qid"], rank)]
            assert have[0] == want[0] and have[1] == want[1], (
                r["qid"], rank, have, want,
            )
    print(json.dumps({"adc_value_check": "exact", "k": K,
                      "n": int(C.shape[0]), "queries": len(qrows)}), flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.pq import pq_encode, pq_topk, train_pq
    from spatialpandas_spark.operators.similarity import brute_force_topk
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="pq_study")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    qs.cache().count()

    for scale in SCALES:
        path = replicate(scale)
        emb = spark.read.parquet(path).repartition(
            spark.sparkContext.defaultParallelism
        )
        emb.cache()
        n = emb.count()
        dim = len(emb.first()["embedding"])

        t0 = time.time()
        books = train_pq(emb, m_sub=M_SUB, n_codes=N_CODES, sample_n=4096, iters=4)
        codes = pq_encode(emb, books).repartition(
            spark.sparkContext.defaultParallelism
        )
        codes.cache().count()
        t_encode = time.time() - t0

        t0 = time.time()
        exact = brute_force_topk(qs, emb, k=K).collect()
        t_bf = time.time() - t0

        if scale == SCALES[0]:
            # value cross-check before any timing is trusted (the
            # crossover_knn discipline): a numpy ADC replica — same
            # normalization, same per-subspace j-order float64 sums —
            # must produce the identical candidate ranking
            _verify_adc_against_numpy(spark, emb, codes, books, qs)

        t0 = time.time()
        adc = pq_topk(qs, codes, books, k=K).collect()
        t_adc = time.time() - t0

        t0 = time.time()
        rr = pq_topk(qs, codes, books, k=K, rerank=emb, rerank_factor=4).collect()
        t_rr = time.time() - t0

        e = {(r["qid"], r["vec_id"]) for r in exact}
        recall_adc = len({(r["qid"], r["vec_id"]) for r in adc} & e) / len(e)
        recall_rr = len({(r["qid"], r["vec_id"]) for r in rr} & e) / len(e)

        print(
            json.dumps(
                {
                    "scale": scale,
                    "n_vectors": n,
                    "raw_bytes_per_vec": dim * 4,
                    "code_bytes_per_vec": M_SUB,
                    "t_encode_s": round(t_encode, 3),
                    "t_bruteforce_s": round(t_bf, 3),
                    "t_adc_s": round(t_adc, 3),
                    "t_adc_rerank_s": round(t_rr, 3),
                    "recall_adc": round(recall_adc, 3),
                    "recall_adc_rerank": round(recall_rr, 3),
                }
            ),
            flush=True,
        )
        emb.unpersist()
        codes.unpersist()


if __name__ == "__main__":
    main()
