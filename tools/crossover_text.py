"""Pipeline-op scale crossover: MinHash-LSH near-dup candidate pairs,
single-node numpy/python twin vs this engine, on identically replicated
document corpora.

Complements tools/scale_crossover.py (geometry kernels) with the
text-dedup path: the proxy implements the exact same public algorithm
(word 3-shingles, 60-bit md5-prefix base hash, seeded multiply-shift
MinHash family, 16 bands x 4 rows, estimated-Jaccard >= 0.5) in
single-threaded numpy + hashlib with no framework overhead; the engine
runs its Arrow-kernel + banded-join plan. Replicated docs get distinct
ids per copy ("{doc_id}_{k}"), so pair counts grow quadratically in the
replication factor within duplicate groups — both engines must agree
exactly.

Prints one JSON line {"numpy": {scale: sec}, "spark": {...},
"pairs": {scale: n}}.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_CROSSOVER_DIR", "/tmp/spatial_crossover")
SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_TEXT_SCALES", "1,8,32"
).split(",")]
REPS = 3

NUM_HASHES, BANDS, SHINGLE_N, THRESHOLD = 64, 16, 3, 0.5
SEED = 42


def build_inputs() -> dict[int, str]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    os.makedirs(WORK, exist_ok=True)
    paths = {}
    for n in SCALES:
        path = os.path.join(WORK, f"docs_x{n}.parquet")
        paths[n] = path
        if os.path.exists(path):
            continue
        rep_ids, rep_texts = [], []
        for k in range(n):
            rep_ids.extend(f"{i}_{k}" for i in ids)
            rep_texts.extend(texts)
        pq.write_table(
            pa.table({"doc_id": rep_ids, "text": rep_texts}),
            path,
            row_group_size=65536,
        )
    return paths


# ------------------------------------------------------------------ numpy
def np_minhash_pairs(path: str) -> int:
    rng = np.random.default_rng(SEED)
    MASK = np.int64((1 << 62) - 1)
    A = rng.integers(1, 1 << 61, size=NUM_HASHES, dtype=np.int64) * 2 + 1
    B = rng.integers(0, 1 << 61, size=NUM_HASHES, dtype=np.int64)
    rows = NUM_HASHES // BANDS

    t = pq.read_table(path)
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()

    sigs = np.empty((len(ids), NUM_HASHES), dtype=np.int64)
    keep = np.zeros(len(ids), dtype=bool)
    with np.errstate(over="ignore"):
        for i, txt in enumerate(texts):
            toks = txt.strip().lower().split() if txt and txt.strip() else []
            if len(toks) < SHINGLE_N:
                continue
            shingles = {
                " ".join(toks[j : j + SHINGLE_N])
                for j in range(len(toks) - SHINGLE_N + 1)
            }
            h = np.array(
                [
                    np.int64(
                        int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    )
                    for s in shingles
                ],
                dtype=np.int64,
            )
            sigs[i] = ((A[None, :] * h[:, None] + B[None, :]) & MASK).min(axis=0)
            keep[i] = True

    ids = [d for d, k in zip(ids, keep) if k]
    sigs = sigs[keep]
    # banding: bucket docs by (band, band-slice bytes)
    buckets: dict = {}
    for i in range(len(ids)):
        srow = sigs[i]
        for b in range(BANDS):
            key = (b, srow[b * rows : (b + 1) * rows].tobytes())
            buckets.setdefault(key, []).append(i)
    cand = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                x, y = members[ai], members[bi]
                if ids[x] < ids[y]:
                    cand.add((x, y))
                else:
                    cand.add((y, x))
    n = 0
    for x, y in cand:
        est = (sigs[x] == sigs[y]).sum() / NUM_HASHES
        if est >= THRESHOLD:
            n += 1
    return n


# ------------------------------------------------------------------ spark
def sp_minhash_pairs(spark, path: str) -> int:
    from spatialpandas_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(path)
    return minhash_lsh_pairs(
        docs,
        shingle_n=SHINGLE_N,
        num_hashes=NUM_HASHES,
        bands=BANDS,
        threshold=THRESHOLD,
    ).count()


def _median_time(fn, *args):
    val = fn(*args)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        fn(*args)
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3), val


def main() -> None:
    paths = build_inputs()
    out = {"numpy": {}, "spark": {}, "pairs_np": {}, "pairs_sp": {}}
    for n, path in paths.items():
        sec, val = _median_time(np_minhash_pairs, path)
        out["numpy"][str(n)] = sec
        out["pairs_np"][str(n)] = val

    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="crossover_text")
    spark.sparkContext.setLogLevel("ERROR")
    for n, path in paths.items():
        sec, val = _median_time(sp_minhash_pairs, spark, path)
        out["spark"][str(n)] = sec
        out["pairs_sp"][str(n)] = val
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
