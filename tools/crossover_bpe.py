"""BPE tokenization scale crossover: engine (Arrow batches, broadcast
merges, distinct-word cache) vs a single-process python twin applying
the same merges with the same cache trick, on identically replicated
document corpora. Token totals are asserted EQUAL at every scale before
any timing is reported — values first, speed second, as in the other
crossover tools.

Prints one JSON line
{"merges": M, "python": {scale: sec}, "spark": {scale: sec},
 "tokens": {scale: n}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(s) for s in os.environ.get(
    "SPARK_GRAFT_BPE_SCALES", "1,8,32"
).split(",")]
N_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "500"))
REPS = 3


def main() -> None:
    import re

    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.bpe import (
        bpe_encode,
        segment_word,
        train_bpe,
    )
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="crossover_bpe")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe(base, n_merges=N_MERGES, text_col="text")
    ranks = {m: i for i, m in enumerate(merges)}

    base_texts = [r["text"] or "" for r in base.collect()]
    word_re = re.compile(r"[^a-z0-9]+")

    out = {"merges": len(merges), "python": {}, "spark": {}, "tokens": {}}
    for scale in SCALES:
        texts = base_texts * scale
        df = (
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
            .repartition(32)
            .cache()
        )
        df.count()

        def run_spark():
            return (
                bpe_encode(df, merges, id_col="doc_id", text_col="text")
                .agg(F.sum("n_tokens"))
                .first()[0]
            )

        n_spark = run_spark()  # warm
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            run_spark()
            ts.append(time.time() - t0)
        spark_sec = statistics.median(ts)

        def run_python():
            cache: dict[str, int] = {}
            total = 0
            for t in texts:
                for w in word_re.split(t.lower()):
                    if not w:
                        continue
                    n = cache.get(w)
                    if n is None:
                        n = len(segment_word(w, ranks))
                        cache[w] = n
                    total += n
            return total

        t0 = time.time()
        n_py = run_python()
        py_sec = time.time() - t0

        assert n_py == n_spark, (scale, n_py, n_spark)
        out["python"][scale] = round(py_sec, 3)
        out["spark"][scale] = round(spark_sec, 3)
        out["tokens"][scale] = n_spark
        df.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
