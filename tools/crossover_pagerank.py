"""PageRank scale crossover: the join-based engine iteration vs a
single-process python/numpy twin on identical synthetic graphs
(preferential-attachment-ish: dst skewed to low ids, the hub shape of
real host graphs). Values are asserted to match to 1e-9 per node at
every scale before timings are reported.

Prints one JSON line {"iters": I, "python": {edges: sec},
"spark": {edges: sec}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_PR_SCALES", "10000,100000,1000000"
).split(",")]
ITERS = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "5"))
REPS = 1  # one timed run per scale: per-iteration cost dominates


def _edges(n_edges: int):
    rng = np.random.default_rng(42)
    n_nodes = max(16, n_edges // 8)
    src = rng.integers(0, n_nodes, size=n_edges)
    # skew dst toward low ids (hub structure)
    dst = (rng.pareto(1.2, size=n_edges) * 10).astype(np.int64) % n_nodes
    return np.unique(np.stack([src, dst], axis=1), axis=0)


def _py_pagerank(edges: np.ndarray, iters: int, d: float = 0.85):
    """Vectorized single-process twin (numpy scatter-add)."""
    nodes = np.unique(edges)
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    src = np.array([idx[s] for s in edges[:, 0]])
    dst = np.array([idx[t] for t in edges[:, 1]])
    deg = np.zeros(n)
    np.add.at(deg, src, 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = r[deg == 0].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / deg[src])
        r = (1 - d) / n + d * (contrib + dm / n)
    return nodes, r


def main() -> None:
    from spatialpandas_spark.operators.graph import pagerank
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="crossover_pagerank")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"iters": ITERS, "python": {}, "spark": {}, "n_edges": {}}
    for scale in SCALES:
        e = _edges(scale)
        df = spark.createDataFrame(
            [(int(s), int(t)) for s, t in e], "src long, dst long"
        ).repartition(32).cache()
        df.count()

        t0 = time.time()
        ranks = {r["node"]: r["rank"] for r in pagerank(df, iters=ITERS).collect()}
        spark_sec = time.time() - t0

        t0 = time.time()
        nodes, r = _py_pagerank(e, ITERS)
        py_sec = time.time() - t0

        # exact-value gate before any timing is reported
        assert len(ranks) == len(nodes), (scale, len(ranks), len(nodes))
        diffs = [abs(ranks[int(v)] - rv) for v, rv in zip(nodes, r)]
        assert max(diffs) < 1e-9, (scale, max(diffs))

        out["python"][scale] = round(py_sec, 3)
        out["spark"][scale] = round(spark_sec, 3)
        out["n_edges"][scale] = int(len(e))
        df.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
