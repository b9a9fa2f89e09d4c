"""Probe-volume-vs-rebuild-cost curve for ``rebuild_if_drifted``'s
``drift_factor`` default (round 13, VERDICT r12 ask #7).

The factor-2 default was asserted, not measured. This sweep measures
it at sf1: build a decon index over an initial benchmark slice, append
equal-sized slices (appends OR into the ORIGINAL bloom bits, so
``fpp_realized`` drifts up without a resize), and at each drift level
measure

- the PROBE cost: wall time of the bloom-method screen of the full
  non-benchmark corpus against the drifted index (the per-batch cost
  an ingestion loop pays while it tolerates the drift), plus the
  sidecar's realized fpp (candidate volume for a non-contained shingle
  scales ~linearly in it);
- the REBUILD cost: wall time of ``rebuild_decon_index`` on a COPY of
  the index at that level (the copy keeps the live index drifting so
  one run traces the whole curve).

Decision rule the curve feeds: rebuilding pays off when the probe
overhead it removes, summed over the batches until the next natural
rebuild, exceeds the rebuild wall. With geometric appends the drift
factor f reached before rebuild bounds the false-candidate multiplier
at f (fpp_realized <= f * fpp by the policy trigger).

Usage: python tools/drift_sweep.py [sf_dir] [n_appends]
Prints one JSON line per drift level; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from spatialpandas_spark.operators.contamination_index import (
        append_to_decon_index,
        build_decon_index,
        load_decon_params,
        ngram_overlap_against_index,
        rebuild_decon_index,
    )
    from spatialpandas_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="drift_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mod = 4 * (n_appends + 1)  # bench slices disjoint from probe corpus
    probe = docs.filter(F.col("doc_id") % mod >= n_appends + 1).select(
        "doc_id", "text"
    )
    probe.cache().count()

    work = tempfile.mkdtemp(prefix="drift_sweep_")
    path = os.path.join(work, "ix")

    def bench_slice(i: int):
        return docs.filter(F.col("doc_id") % mod == i).withColumn(
            "benchmark", (F.col("doc_id") % 3).cast("string")
        )

    def measure(level: int) -> dict:
        p = load_decon_params(path)
        drift = p["bloom"]["fpp_realized"] / p["bloom"]["fpp"]
        t0 = time.time()
        n_flagged = (
            ngram_overlap_against_index(probe, path, method="bloom")
            .count()
        )
        probe_sec = round(time.time() - t0, 2)
        # rebuild a COPY so the live index keeps drifting
        cp = os.path.join(work, f"copy{level}")
        shutil.copytree(path, cp)
        t0 = time.time()
        new_p = rebuild_decon_index(spark, cp)
        rebuild_sec = round(time.time() - t0, 2)
        # probe cost against the FRESH (rebuilt) copy at same contents
        t0 = time.time()
        ngram_overlap_against_index(probe, cp, method="bloom").count()
        probe_fresh_sec = round(time.time() - t0, 2)
        shutil.rmtree(cp)
        row = {
            "appends": level,
            "n_shingles": p["n_shingles"],
            "bloom_m": p["bloom"]["m"],
            "fpp_realized": round(p["bloom"]["fpp_realized"], 5),
            "drift_factor": round(drift, 2),
            "probe_sec_drifted": probe_sec,
            "probe_sec_rebuilt": probe_fresh_sec,
            "rebuild_sec": rebuild_sec,
            "rebuilt_fpp_realized": round(
                new_p["bloom"]["fpp_realized"], 5
            ),
            "n_flagged": n_flagged,
        }
        print(json.dumps(row), flush=True)
        return row

    try:
        build_decon_index(bench_slice(0), path, n=5,
                          group_cols=["benchmark"])
        measure(0)
        for i in range(1, n_appends + 1):
            append_to_decon_index(bench_slice(i), path)
            measure(i)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
