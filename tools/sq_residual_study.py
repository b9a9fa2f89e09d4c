"""IVF-SQ8 residual/per-bucket quantization study (VERDICT r9 #4):
does bucket-local quantization buy recall at the SAME probe bytes
(dim int8 codes per vector) over the gated GLOBAL-range contract?

Three quantizers, identical code size, identical ADC arithmetic
(round-half-up affine, 255 levels — the exact formula
operators/sq.py ships):

- ``global``  : per-dim lo/hi over the whole normalized corpus (the
  gated contract; model state 2·dim floats).
- ``bucket``  : per-dim lo/hi within each IVF bucket (state 2·dim
  floats PER BUCKET; codes decode with the owning bucket's ranges).
- ``residual``: quantize ``x - centroid[bucket]`` with per-bucket
  per-dim ranges of the residuals (classic IVFADC residual coding;
  same state as ``bucket``).

Regimes mirror tools/ivf_recall_study.py: ``iso`` (the real
embeddings fixture — isotropic), ``clustered`` (tight label clusters,
the regime the gate's clustered twin verifies), ``skewed``
(zipf-sized noisy clusters). Recall@5 of ADC top-k within the probed
buckets vs exact float brute force, plus mean per-dim dequantization
error. numpy end to end (the question is quantizer RESOLUTION, not
Spark plumbing; the engine's formula is replicated op-for-op).

Usage: python tools/sq_residual_study.py [sf_dir]
Emits one JSON line; the adoption decision table lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(X):
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return np.divide(X, n, out=np.zeros_like(X), where=n > 0)


def _kmeans(X, k, iters=8, seed=11):
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        a = np.argmax(X @ cents.T, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                v = X[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents, np.argmax(X @ cents.T, axis=1)


def _quant(X, lo, hi):
    scale = (hi - lo) / 255.0
    scale = np.where(scale == 0, 1.0, scale)
    codes = np.clip(np.floor((X - lo) / scale + 0.5), 0, 255)
    return lo + codes * scale  # dequantized (ADC scans decode this)


def _encode_all(X, assign, cents, k, mode):
    deq = np.empty_like(X)
    for c in range(k):
        m = assign == c
        if not m.any():
            continue
        if mode == "global":
            lo, hi = X.min(axis=0), X.max(axis=0)
            deq[m] = _quant(X[m], lo, hi)
        elif mode == "bucket":
            lo, hi = X[m].min(axis=0), X[m].max(axis=0)
            deq[m] = _quant(X[m], lo, hi)
        else:  # residual
            R = X[m] - cents[c]
            lo, hi = R.min(axis=0), R.max(axis=0)
            deq[m] = cents[c] + _quant(R, lo, hi)
    return deq


def _recall(X, deq, assign, cents, queries, n_probe, k=5):
    bf = np.argsort(-(queries @ X.T), axis=1)[:, :k]
    qc = np.argsort(-(queries @ cents.T), axis=1)[:, :n_probe]
    hits = 0
    for qi in range(len(queries)):
        m = np.isin(assign, qc[qi])
        idx = np.nonzero(m)[0]
        if len(idx) == 0:
            continue
        sims = queries[qi] @ deq[idx].T
        top = idx[np.argsort(-sims)[:k]]
        hits += len(set(top) & set(bf[qi]))
    return round(hits / (len(queries) * k), 3)


def _clustered(seed=3, n_labels=16, per=125, dim=64, noise=0.05):
    rng = np.random.default_rng(seed)
    c = _normalize(rng.standard_normal((n_labels, dim)))
    X = np.repeat(c, per, axis=0) + noise * rng.standard_normal(
        (n_labels * per, dim)
    )
    return _normalize(X)


def _skewed(seed=7, dim=64, noise=0.25):
    sizes = [600, 300, 180, 120, 90, 75, 45, 36, 30, 24]
    rng = np.random.default_rng(seed)
    c = _normalize(rng.standard_normal((len(sizes), dim)))
    X = np.concatenate(
        [c[i] + noise * rng.standard_normal((n, dim)) for i, n in enumerate(sizes)]
    )
    return _normalize(X)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    iso = _normalize(
        np.asarray(t["embedding"].combine_chunks().to_numpy(zero_copy_only=False).tolist())
    )
    out = {"sf_dir": sf_dir, "n_centroids": 16, "k": 5, "regimes": {}}
    for name, X in (
        ("iso", iso),
        ("clustered", _clustered()),
        ("skewed", _skewed()),
    ):
        cents, assign = _kmeans(X, 16)
        queries = X[:25]
        row = {}
        for mode in ("global", "bucket", "residual"):
            deq = _encode_all(X, assign, cents, 16, mode)
            row[mode] = {
                "mse": round(float(((X - deq) ** 2).mean()), 9),
                **{
                    f"recall@5_probe{p}": _recall(
                        X, deq, assign, cents, queries, p
                    )
                    for p in (4, 8, 16)
                },
            }
        # the float ceiling: ADC error zero, same probe schedule
        row["float_ceiling"] = {
            f"recall@5_probe{p}": _recall(X, X, assign, cents, queries, p)
            for p in (4, 8, 16)
        }
        out["regimes"][name] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
