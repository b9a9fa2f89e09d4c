"""KMV sketch scale crossover: single-node python/hashlib exact
bottom-k twin vs this engine's HLL-prefiltered scan, on identically
replicated document corpora.

Same discipline as the other crossover tools (value-equality gate
BEFORE any timing is recorded): the proxy computes the exact bottom-k
of the distinct word-5-gram md5-prefix hash set in one single-threaded
pass (the reference-free floor: stdlib hashlib + a running heap, no
framework overhead); the engine runs ``shingle_sketch``
(prefilter=True — HLL threshold, filtered distinct, bounded window,
safety net). Replicated docs ("{text} r{k}_{i}" suffix per copy) grow
the distinct shingle set ~linearly, so k stays a vanishing fraction of
the domain and the prefilter's selectivity improves with scale —
exactly the at-scale regime the operator argues for.

Prints one JSON line {"python": {scale: sec}, "spark": {scale: sec},
"distinct_est": {scale: est}, "k": k} — every timed pair first asserts
the two sketches are bit-identical.
"""

from __future__ import annotations

import hashlib
import heapq
import json
import os
import statistics
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_CROSSOVER_DIR", "/tmp/spatial_crossover")
SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_KMV_SCALES", "1,8,32"
).split(",")]
REPS = 3
K, N, SEED = 1024, 5, 42


def build_inputs() -> dict[int, str]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    os.makedirs(WORK, exist_ok=True)
    paths = {}
    for s in SCALES:
        path = f"{WORK}/kmv_docs_x{s}.parquet"
        if not os.path.exists(path):
            rid, rtext = [], []
            for k in range(s):
                for i, txt in zip(ids, texts):
                    rid.append(i * 1000 + k)
                    # distinct tail per copy -> distinct shingles, so the
                    # domain grows with scale instead of collapsing to the
                    # base corpus's set
                    rtext.append(f"{txt} r{k}_{i} q{k} z{(i * 7 + k) % 97}")
            pq.write_table(
                pa.table({"doc_id": rid, "text": rtext}), path
            )
        paths[s] = path
    return paths


def py_sketch(path: str) -> list[tuple[int, int]]:
    """Exact bottom-K via a bounded max-heap over the distinct hash set
    — the single-node floor."""
    t = pq.read_table(path, columns=["text"])
    heap: list[int] = []  # max-heap via negation
    seen_top: set[int] = set()
    for txt in t["text"].to_pylist():
        toks = txt.lower().split()
        for i in range(len(toks) - N + 1):
            s = " ".join(toks[i : i + N])
            h = int(
                hashlib.md5(f"{SEED}:{s}".encode()).hexdigest()[:15], 16
            )
            if len(heap) < K:
                if h not in seen_top:
                    heapq.heappush(heap, -h)
                    seen_top.add(h)
            elif h < -heap[0] and h not in seen_top:
                seen_top.discard(-heapq.heappushpop(heap, -h))
                seen_top.add(h)
    hs = sorted(-x for x in heap)
    return [(i + 1, h) for i, h in enumerate(hs)]


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from spatialpandas_spark.operators.sketch import shingle_sketch
    from spatialpandas_spark.session import get_spark

    paths = build_inputs()
    spark = get_spark(app_name="crossover_kmv")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"python": {}, "spark": {}, "distinct_est": {}, "k": K}
    for s, path in paths.items():
        # the replica files are single-row-group; spread so the scan
        # parallelizes the way a real multi-file corpus layout would
        # (same convention as bench.py _spread — measured 50.6 -> 7.5 s
        # at x32 on local[32])
        docs = spark.read.parquet(path).repartition(
            spark.sparkContext.defaultParallelism
        )

        def engine():
            return sorted(
                (r["rank"], r["h"])
                for r in shingle_sketch(docs, n=N, k=K).collect()
            )

        got = engine()
        want = py_sketch(path)
        assert got == want, f"VALUE MISMATCH at scale {s}"  # gate first

        pt = []
        for _ in range(REPS):
            t0 = time.time()
            py_sketch(path)
            pt.append(time.time() - t0)
        st = []
        for _ in range(REPS):
            t0 = time.time()
            engine()
            st.append(time.time() - t0)
        out["python"][s] = round(statistics.median(pt), 3)
        out["spark"][s] = round(statistics.median(st), 3)
        kth = want[-1][1]
        out["distinct_est"][s] = round((K - 1) * float(1 << 60) / kth)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
