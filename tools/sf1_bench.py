"""sf1 WALL-TIME bench evidence (VERDICT r9 ask #1): the hash-exact sf1
rehearsal proves VALUES scale, not that plans' RUNTIME scales — a plan
that merely degrades (superlinear shuffle, skew) passes the hash check
and is never seen (the b16 294s->10s history is exactly this class).

Part A runs the heavy bench queries against `.scale/sf1` through the
same subprocess protocol as ``bench.py --isolated`` (fresh session,
1 warm-up + 3 timed, median) and reports each query's ratio vs its
COMMITTED sf0.1 isolated median (BASELINE_isolated.json). sf1 holds
10x the rows, so a shuffle-light plan at local[32] should land at
<= ~10x; anything far above is an outlier needing forensics.

Part B times ONE composed curation pipeline end-to-end at sf1:
crawl (WARC parse) -> extract (HTML->text) -> near-dedup (MinHash-LSH
clusters) -> decontaminate (bloom) -> tokenize (BPE ids, pretrained
merges — the persisted-tokenizer serving shape, same as b22/b26) ->
pack (concat-and-chunk token sequences) -> parquet sink. The WARC
input is synthesized and written to disk UNTIMED (that's data
generation, not pipeline); merges are trained untimed for the same
reason.

Usage: python tools/sf1_bench.py [--queries b5_sjoin,...] [--skip-pipeline]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".scale/sf1"))

HEAVY = [
    "b5_sjoin",
    "b8_minhash",
    "b11_grid_sjoin",
    "b12_text_pipeline",
    "b15_dedup_clusters",
    "b16_knn",
    "b18_index_probe",       # r11 (VERDICT r10 ask #6): index probes,
    "b21_ivfpq_probe",       # nearest joins, and composition rows that
    "b27_sjoin_nearest",     # had no sf1 wall row yet
    "b29_training_mix",
    "b31_ivfsq8_probe",
    "b22_bpe_encode",
    "b24_crawl_extract",
    "b25_semantic_dedup",
    "b30_kmv_overlap",
    "b32_containment_probe",
    "b33_decon_index_screen",
    "b34_langid",            # r11: new operator row
    "b35_span_dedup",        # r11: content-defined span dedup row
]


def _canonical_anchor() -> float | None:
    try:
        with open(os.path.join(REPO, "BASELINE_isolated.json")) as f:
            return json.load(f).get("anchor_sec")
    except Exception:
        return None


def _time_anchor_subprocess() -> float | None:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--anchor"],
        capture_output=True, text=True, timeout=600,
    )
    try:
        return json.loads(p.stdout.strip().splitlines()[-1])["sec"]
    except Exception:
        return None


def run_queries(names: list[str]) -> dict:
    """Each heavy row is preceded by its OWN fresh-JVM phase-anchor
    measurement (round 12, VERDICT r11 ask #5): the r11 battery checked
    the anchor only at battery start, which let one contaminated row
    (b8: 14.3 s in a bad phase vs 3.24 s re-measured) through
    undetected. A row whose anchor departs the committed canonical by
    >20% is flagged ``anchor_out_of_band`` — re-measure it before
    trusting the wall time."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF1_DIR)
    canon = _canonical_anchor()
    out: dict[str, dict] = {}
    for name in names:
        anchor = _time_anchor_subprocess()
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--one", name],
            capture_output=True,
            text=True,
            env=env,
            timeout=3600,
        )
        wall = round(time.time() - t0, 1)
        if p.returncode != 0:
            out[name] = {"error": p.stderr.strip()[-300:]}
            print(f"ERR  {name} [{wall}s]", file=sys.stderr)
            continue
        res = json.loads(p.stdout.strip().splitlines()[-1])
        res["anchor_sec"] = anchor
        if anchor and canon:
            ratio = round(anchor / canon, 3)
            res["anchor_ratio"] = ratio
            res["anchor_out_of_band"] = not (0.8 <= ratio <= 1.2)
        out[name] = res
        flag = (
            "  ANCHOR OUT OF BAND"
            if res.get("anchor_out_of_band")
            else ""
        )
        print(
            f"ok   {name}: median {res['sec']}s  anchor {anchor}s"
            f"  (subprocess {wall}s){flag}",
            file=sys.stderr,
        )
    return out


def ratios(results: dict) -> dict:
    with open(os.path.join(REPO, "BASELINE_isolated.json")) as f:
        base = json.load(f)["queries"]
    r = {}
    for q, res in results.items():
        if "sec" in res and q in base and base[q]["median"] > 0:
            r[q] = round(res["sec"] / base[q]["median"], 2)
    return r


def run_pipeline() -> dict:
    """End-to-end curation pipeline at sf1, timed as one wall-clock run."""
    from pyspark.sql import functions as F

    from spatialpandas_spark.corpus import CorpusFrame
    from spatialpandas_spark.operators.bpe import bpe_encode_ids, train_bpe
    from spatialpandas_spark.operators.html import extract_text_from_html
    from spatialpandas_spark.operators.shards import (
        materialize_token_sequences,
    )
    from spatialpandas_spark.session import get_spark
    from spatialpandas_spark.sources.archives import (
        synth_warc_archives,
        warc_records,
    )

    spark = get_spark(app_name="sf1_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.sparkContext.defaultParallelism
    work = tempfile.mkdtemp(prefix="sf1_pipeline_")
    warc_path = os.path.join(work, "warc")
    out_path = os.path.join(work, "sequences")
    try:
        # ---- UNTIMED input synthesis: WARC archives on disk + tokenizer
        docs = spark.read.parquet(f"{SF1_DIR}/documents.parquet").repartition(n)
        synth_warc_archives(docs, n_archives=256).write.parquet(warc_path)
        merges = train_bpe(
            spark.read.parquet(f"{SF1_DIR}/documents.parquet").limit(5000),
            n_merges=512,
        )
        # the benchmark to decontaminate against: a slice of the corpus
        # itself (guarantees true contamination flows through the bloom)
        bench = (
            spark.read.parquet(f"{SF1_DIR}/documents.parquet")
            .select("doc_id", "text")
            .filter(F.col("doc_id") % 97 == 0)
        )
        bench.cache().count()

        # ---- TIMED: crawl -> extract -> dedup -> decontaminate(bloom)
        #      -> tokenize -> pack -> sink
        t0 = time.time()
        recs = warc_records(spark.read.parquet(warc_path))
        extracted = (
            extract_text_from_html(
                recs.select(
                    F.regexp_extract(F.col("url"), r"http://t/(\d+)", 1)
                    .cast("long")
                    .alias("doc_id"),
                    F.col("body").alias("html"),
                ),
                html_col="html",
            )
            .filter("parse_ok = 'ok'")
            .select("doc_id", "text")
        )
        cf = CorpusFrame(extracted)
        deduped = cf.dedup_near(threshold=0.5)
        decon = deduped.decontaminate(bench, max_overlap=0.5, method="bloom")
        toks = bpe_encode_ids(decon.df, merges)
        seqs = materialize_token_sequences(toks, 2048)
        seqs.write.parquet(out_path)
        wall = round(time.time() - t0, 1)

        n_seqs = spark.read.parquet(out_path).count()
        n_docs = docs.count()
        n_kept = decon.count()
        return {
            "sec": wall,
            "input_docs": n_docs,
            "docs_after_dedup_decon": n_kept,
            "packed_sequences": n_seqs,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def main() -> None:
    names = HEAVY
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
    results = run_queries(names)
    out = {
        "sf_dir": SF1_DIR,
        "queries": {
            q: r.get("sec", r.get("error")) for q, r in results.items()
        },
        "times": {q: r.get("times") for q, r in results.items() if "times" in r},
        "anchors": {
            q: r.get("anchor_sec") for q, r in results.items()
        },
        "anchor_flags": [
            q for q, r in results.items() if r.get("anchor_out_of_band")
        ],
        "ratio_vs_sf0.1_isolated": ratios(results),
    }
    if "--skip-pipeline" not in sys.argv:
        print("pipeline: running end-to-end curation row...", file=sys.stderr)
        out["pipeline"] = run_pipeline()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
