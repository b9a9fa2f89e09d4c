"""Probe-cost-vs-drift curve for ``rebuild_if_drifted``'s
``drift_factor`` default (round 13, VERDICT r12 ask #7).

The factor-2 default was asserted, not measured. This sweep measures
the two sides of the policy trade at sf1:

- **probe overhead of tolerated drift**: the bloom screen's cost at
  realized-fpp levels spanning the policy range. A drifted bloom
  passes false candidates into the exact verify join; with a CLEAN
  probe corpus (below) every extra candidate is pure overhead, so the
  probe wall at fpp f vs at the design 0.01 is exactly the per-batch
  cost an ingestion loop pays while it tolerates drift f/0.01.
- **rebuild cost**: the wall of ``rebuild_decon_index``, paid once to
  restore the design fpp.

Design notes (the v1 sweep was degenerate and is documented here so it
is not repeated): the sf1 corpus is a 10x replication of sf0.1, so a
probe corpus drawn from it is ~fully TRULY contaminated against any
benchmark slice — false positives are invisible when every candidate
verifies. This version makes the benchmark's shingle space DISJOINT
from the probe corpus (every benchmark word carries a slice prefix),
so the probe is 100% clean and the verify join's volume is purely
bloom false positives. Drift levels are produced directly (not by
append churn): rebuild COPIES of the index at fpp = drift * 0.01 —
``rebuild_decon_index(fpp=...)`` resizes m exactly as appends would
have filled it.

Decision rule the curve feeds: tolerate drift while
(probe_overhead_per_batch * batches_until_rebuild) < rebuild_sec.

Usage: python tools/drift_sweep.py [sf_dir]
Prints one JSON line per drift level; paste into BASELINE.md.
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

DRIFTS = (1.0, 1.5, 2.0, 4.0, 8.0, 20.0, 50.0)


def main() -> None:
    from spatialpandas_spark.operators.contamination_index import (
        build_decon_index,
        load_decon_params,
        ngram_overlap_against_index,
        rebuild_decon_index,
    )
    from spatialpandas_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    spark = get_spark(app_name="drift_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # benchmark: every word prefixed -> shingle space disjoint from the
    # probe corpus, so bloom hits on probes are false positives only
    bench = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.regexp_replace(F.col("text"), r"(^|\s)(\S)", r"$1bx$2")
            .alias("text"),
        )
        .withColumn("benchmark", (F.col("doc_id") % 3).cast("string"))
    )
    probe = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    probe.cache().count()

    work = tempfile.mkdtemp(prefix="drift_sweep_")
    path = os.path.join(work, "ix")
    try:
        build_decon_index(bench, path, n=5, group_cols=["benchmark"])
        base_p = load_decon_params(path)
        print(json.dumps({"built": base_p["n_shingles"],
                          "m": base_p["bloom"]["m"],
                          "fpp": base_p["bloom"]["fpp"]}), flush=True)
        for drift in DRIFTS:
            cp = os.path.join(work, f"d{drift}")
            shutil.copytree(path, cp)
            t0 = time.time()
            p = rebuild_decon_index(spark, cp, fpp=0.01 * drift)
            rebuild_sec = round(time.time() - t0, 2)
            # warm-up then two timed probes (median-ish of a 2-sample)
            out = ngram_overlap_against_index(probe, cp, method="bloom")
            out.count()
            walls = []
            for _ in range(2):
                t0 = time.time()
                out = ngram_overlap_against_index(
                    probe, cp, method="bloom"
                )
                n_contam = out.filter(F.col("overlap") > 0).count()
                walls.append(round(time.time() - t0, 2))
            # CANDIDATE VOLUME — the quantity that scales the verify
            # join at real store sizes (here the store is 23k shingles
            # and the screen is scan-dominated, so the probe wall
            # alone cannot see fpp; at 100 TB the candidates SHUFFLE
            # into a verify join against a billions-row store and this
            # count is the cost driver). Probe shingles are clean by
            # construction, so every candidate is a false positive.
            from spatialpandas_spark.operators.contamination import (
                bloom_member_fn,
                bloom_words_row,
            )
            from spatialpandas_spark.operators.contamination_index import (
                _read_bloom,
            )
            from spatialpandas_spark.operators.dedup import word_shingles

            m, bk = p["bloom"]["m"], p["bloom"]["k"]
            words = _read_bloom(spark, f"{cp}/bloom", m)
            sh = probe.select(
                F.explode(word_shingles(F.col("text"), 5)).alias("s")
            )
            n_shingle_probes = sh.count()
            member = bloom_member_fn(m, bk)
            n_cand = (
                sh.crossJoin(F.broadcast(bloom_words_row(spark, words)))
                .filter(member(F.col("s")))
                .count()
            )
            shutil.rmtree(cp)
            print(json.dumps({
                "drift_factor": drift,
                "fpp_realized": round(p["bloom"]["fpp_realized"], 5),
                "bloom_m": p["bloom"]["m"],
                "probe_sec": min(walls),
                "probe_walls": walls,
                "rebuild_sec": rebuild_sec,
                "n_probe_shingles": n_shingle_probes,
                "n_false_candidates": n_cand,
                "n_contaminated_docs": n_contam,
            }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
