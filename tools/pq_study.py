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
