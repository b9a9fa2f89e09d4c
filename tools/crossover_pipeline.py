"""Scale crossover for the round-2 pipeline operators: as-of join and the
full near-dup cluster pipeline, single-node twins vs this engine on
identically replicated inputs.

Twins implement the same public algorithms with zero framework overhead:
- asof: pandas.merge_asof (sort-merge as-of, C-accelerated) on the same
  (click, view) split, matched-row count compared.
- clusters: the numpy/hashlib MinHash-LSH pair pipeline (same constants
  as tools/crossover_text.py) + path-halving union-find; compared on
  (non-singleton clusters, docs-in-clusters) — both engines must agree
  exactly.

Replication: events get user_id offsets per copy (independent keyed
streams, linear growth); docs get numeric id offsets per copy (duplicate
groups grow with the factor, pairs quadratically within groups).

Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_CROSSOVER_DIR", "/tmp/spatial_crossover")
ASOF_SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_ASOF_SCALES", "1,8,32"
).split(",")]
CLUSTER_SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_CLUSTER_SCALES", "1,4,16"
).split(",")]
REPS = 3

NUM_HASHES, BANDS, SHINGLE_N, THRESHOLD = 64, 16, 3, 0.5
SEED = 42


def build_event_inputs() -> dict[int, str]:
    t = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    os.makedirs(WORK, exist_ok=True)
    n_users = 1 + int(pa.compute.max(t["user_id"]).as_py())
    n_events = t.num_rows
    paths = {}
    for n in ASOF_SCALES:
        path = os.path.join(WORK, f"events_x{n}.parquet")
        paths[n] = path
        if os.path.exists(path):
            continue
        parts = []
        for k in range(n):
            parts.append(
                pa.table(
                    {
                        "event_id": pa.compute.add(t["event_id"], k * n_events),
                        "ts": t["ts"],
                        "user_id": pa.compute.add(t["user_id"], k * n_users),
                        "event_type": t["event_type"],
                    }
                )
            )
        pq.write_table(pa.concat_tables(parts), path, row_group_size=131072)
    return paths


def build_doc_inputs() -> dict[int, str]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    os.makedirs(WORK, exist_ok=True)
    n_docs = t.num_rows
    base = 1 + int(pa.compute.max(t["doc_id"]).as_py())
    paths = {}
    for n in CLUSTER_SCALES:
        path = os.path.join(WORK, f"docs_num_x{n}.parquet")
        paths[n] = path
        if os.path.exists(path):
            continue
        parts = [
            pa.table(
                {
                    "doc_id": pa.compute.add(t["doc_id"], k * base),
                    "text": t["text"],
                }
            )
            for k in range(n)
        ]
        pq.write_table(pa.concat_tables(parts), path, row_group_size=65536)
    return paths


# --------------------------------------------------------------- asof twins
def pd_asof(path: str) -> int:
    t = pq.read_table(path).to_pandas()
    # nanosecond-int ts (driver writes nanos); µs truncation like the engine
    ts = (t["ts"].astype("int64") // 1000)
    t = t.assign(ts=ts)
    clicks = (
        t[t["event_type"] == "click"][["event_id", "user_id", "ts"]]
        .sort_values("ts", kind="stable")
    )
    views = (
        t[t["event_type"] == "view"][["user_id", "ts", "event_id"]]
        .rename(columns={"event_id": "view_id"})
        .sort_values("ts", kind="stable")
    )
    m = pd.merge_asof(clicks, views, on="ts", by="user_id")
    return int(m["view_id"].notna().sum())


def sp_asof(spark, path: str) -> int:
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.asof import asof_join
    from spatialpandas_spark.sources.events import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = normalize_event_ts(spark.read.parquet(path))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = asof_join(clicks, views, on="ts", by="user_id")
    return out.filter(F.col("view_id").isNotNull()).count()


# ------------------------------------------------------------ cluster twins
def np_clusters(path: str) -> tuple[int, int]:
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
            sh = {
                " ".join(toks[j : j + SHINGLE_N])
                for j in range(len(toks) - SHINGLE_N + 1)
            }
            h = np.array(
                [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh],
                dtype=np.int64,
            )
            sigs[i] = ((A[None, :] * h[:, None] + B[None, :]) & MASK).min(axis=0)
            keep[i] = True

    kept = [i for i in range(len(ids)) if keep[i]]
    buckets: dict = {}
    for i in kept:
        srow = sigs[i]
        for b in range(BANDS):
            key = (b, srow[b * rows : (b + 1) * rows].tobytes())
            buckets.setdefault(key, []).append(i)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    seen = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                x, y = members[ai], members[bi]
                if (x, y) in seen or (y, x) in seen:
                    continue
                seen.add((x, y))
                if (sigs[x] == sigs[y]).sum() / NUM_HASHES >= THRESHOLD:
                    rx, ry = find(ids[x]), find(ids[y])
                    if rx != ry:
                        parent[max(rx, ry)] = min(rx, ry)

    comps: dict[int, int] = {}
    for node in parent:
        comps.setdefault(find(node), 0)
        comps[find(node)] += 1
    non_singleton = [c for c in comps.values() if c >= 2]
    return len(non_singleton), sum(non_singleton)


def sp_clusters(spark, path: str) -> tuple[int, int]:
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.dedup import near_dup_clusters

    docs = spark.read.parquet(path)
    cl = near_dup_clusters(docs, threshold=THRESHOLD)
    agg = (
        cl.filter(F.col("cluster_size") >= 2)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .agg(F.count("*").alias("clusters"), F.sum("n").alias("docs"))
        .first()
    )
    return int(agg["clusters"] or 0), int(agg["docs"] or 0)


def _median_time(fn, *args):
    val = fn(*args)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        fn(*args)
        ts.append(time.time() - t0)
    return round(statistics.median(ts), 3), val


def main() -> None:
    ev_paths = build_event_inputs()
    doc_paths = build_doc_inputs()
    out: dict = {
        "asof": {"pandas": {}, "spark": {}, "matched": {}},
        "clusters": {"numpy": {}, "spark": {}, "result_np": {}, "result_sp": {}},
    }
    for n, path in ev_paths.items():
        sec, val = _median_time(pd_asof, path)
        out["asof"]["pandas"][str(n)] = sec
        out["asof"]["matched"][str(n)] = val
    for n, path in doc_paths.items():
        sec, val = _median_time(np_clusters, path)
        out["clusters"]["numpy"][str(n)] = sec
        out["clusters"]["result_np"][str(n)] = list(val)

    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="crossover_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for n, path in ev_paths.items():
        sec, val = _median_time(sp_asof, spark, path)
        out["asof"]["spark"][str(n)] = sec
        assert val == out["asof"]["matched"][str(n)], (
            "asof matched-count mismatch", n, val, out["asof"]["matched"][str(n)]
        )
    for n, path in doc_paths.items():
        sec, val = _median_time(sp_clusters, spark, path)
        out["clusters"]["spark"][str(n)] = sec
        out["clusters"]["result_sp"][str(n)] = list(val)
        assert list(val) == out["clusters"]["result_np"][str(n)], (
            "cluster mismatch", n, val, out["clusters"]["result_np"][str(n)]
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
