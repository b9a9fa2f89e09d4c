"""Training-row formation scale crossover: engine
(pack_token_sequences + materialize_token_sequences — distributed
two-phase running sum, slice join, one groupBy(seq) shuffle) vs a
single-process python twin doing the literal concat-and-chunk, on
identically replicated per-doc token arrays. Per-sequence id lists are
asserted EQUAL at every scale before any timing is reported — values
first, speed second, as in the other crossover tools.

Prints one JSON line
{"seq_len": L, "python": {scale: sec}, "spark": {scale: sec},
 "sequences": {scale: n}}.
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
    "SPARK_GRAFT_SEQ_SCALES", "1,8,32"
).split(",")]
SEQ_LEN = int(os.environ.get("SPARK_GRAFT_SEQ_LEN", "2048"))
REPS = 3


def main() -> None:
    import hashlib

    from spatialpandas_spark.operators.bpe import bpe_encode_ids, train_bpe
    from spatialpandas_spark.operators.shards import (
        materialize_token_sequences,
    )
    from spatialpandas_spark.session import get_spark

    spark = get_spark(app_name="crossover_seqpack")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe(base, n_merges=200, text_col="text")
    base_ids = [
        (r["doc_id"], list(r["token_ids"]))
        for r in bpe_encode_ids(base, merges).orderBy("doc_id").collect()
    ]

    def py_twin(docs):
        """The literal recipe: concatenate, cut, hash each sequence."""
        stream: list[int] = []
        for _, ids in docs:
            stream.extend(ids)
        out = {}
        for s in range(0, len(stream), SEQ_LEN):
            blk = stream[s : s + SEQ_LEN]
            out[s // SEQ_LEN] = hashlib.md5(
                ",".join(map(str, blk)).encode()
            ).hexdigest()
        return out

    out = {"seq_len": SEQ_LEN, "python": {}, "spark": {}, "sequences": {}}
    for scale in SCALES:
        docs = [
            (did + i * 1_000_000_000, ids)
            for i in range(scale)
            for did, ids in base_ids
        ]
        df = spark.createDataFrame(
            [(d, ids, len(ids)) for d, ids in docs],
            "doc_id long, token_ids array<int>, n_tokens long",
        ).cache()
        df.count()

        def run_spark():
            from pyspark.sql import functions as F

            rows = (
                materialize_token_sequences(df, SEQ_LEN)
                .select(
                    "seq_id",
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.col("token_ids"),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("h"),
                )
                .collect()
            )
            return {r["seq_id"]: r["h"] for r in rows}

        # values first: engine == python twin, every sequence's hash
        exp = py_twin(docs)
        got = run_spark()
        assert got == exp, f"scale {scale}: sequence mismatch"
        out["sequences"][scale] = len(exp)

        pts, sts = [], []
        for _ in range(REPS):
            t0 = time.time(); py_twin(docs); pts.append(time.time() - t0)
            t0 = time.time(); run_spark(); sts.append(time.time() - t0)
        out["python"][scale] = round(statistics.median(pts), 3)
        out["spark"][scale] = round(statistics.median(sts), 3)
        df.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
