"""Scandinavian-family sub-model prototype (round 13, VERDICT r12
ask #3, second lever).

The 16384-bucket retrain fixed pt/cs/bg but left the da/sv/nl cluster
as the residual (da recall 0.86; da->sv and nl->da the two largest
confusion cells). This tool trains a 3-class {da, sv, nl} sub-model
with the SAME deterministic recipe (corpus, LR hyperparameters, dyadic
quantization) and measures the TWO-STAGE path on the frozen holdout:
coarse prediction first; rows the coarse model lands in the family are
re-scored by the sub-model (rows outside never enter, so no other
language's accuracy can change).

Measures sub-model bucket sizes independently of the coarse model —
a 3-class head needs far fewer parameters than the 39-class trunk.

Usage: python tools/langid_family_sweep.py [sizes...]  (default 4096 16384)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spatialpandas_spark.operators.langid import (  # noqa: E402
    builtin_langid_model,
    langid_corpus,
    margins_kernel,
    quantize_langid_model,
    train_langid_classifier,
)
from tools.eval_langid_holdout import HOLDOUT_SENTENCES  # noqa: E402
from tools.eval_langid_real import py_buckets  # noqa: E402
from tools.train_langid import (  # noqa: E402
    DENOM,
    INCLUDE_WORDS,
    MAX_CHARS,
    ORDERS,
    PER_LANG_TRAIN,
)

FAMILY = ("da", "nl", "sv")  # sorted — train_langid_classifier order


def two_stage_report(sub: dict | None) -> dict:
    coarse = builtin_langid_model()
    Wc = np.asarray(coarse["weights"], dtype=np.float64)
    Ic = np.asarray(coarse["intercepts"], dtype=np.float64)
    cls_c = list(coarse["classes"])
    if sub is not None:
        Ws = np.asarray(sub["weights"], dtype=np.float64)
        Is = np.asarray(sub["intercepts"], dtype=np.float64)
        cls_s = list(sub["classes"])

    rows = []
    for lang, sents in sorted(HOLDOUT_SENTENCES.items()):
        bc = [py_buckets(s, coarse) for s in sents]
        marg = margins_kernel(bc, Wc, Ic, coarse.get("len_std"))
        preds = [cls_c[i] for i in np.argmax(marg, axis=1)]
        for s, p in zip(sents, preds):
            if sub is not None and p in FAMILY:
                bs = py_buckets(s, sub)
                ms = margins_kernel([bs], Ws, Is)
                p = cls_s[int(np.argmax(ms[0]))]
            rows.append((lang, p))
    total = len(rows)
    correct = sum(1 for t, p in rows if t == p)
    fam_recalls = {
        lg: round(
            sum(1 for t, p in rows if t == lg and p == lg)
            / sum(1 for t, p in rows if t == lg),
            3,
        )
        for lg in FAMILY
    }
    conf: dict[str, int] = {}
    for t, p in rows:
        if t != p:
            conf[f"{t}->{p}"] = conf.get(f"{t}->{p}", 0) + 1
    fam_conf = {
        k: v for k, v in sorted(conf.items(), key=lambda kv: -kv[1])
        if k.split("->")[0] in FAMILY or k.split("->")[1] in FAMILY
    }
    return {
        "accuracy": round(correct / total, 4),
        "family_recalls": fam_recalls,
        "family_confusions": fam_conf,
        "total_confused": total - correct,
    }


def main() -> None:
    from spatialpandas_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [4096, 16384]
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    fam_rows = [
        (lg, t)
        for lg, t in langid_corpus(PER_LANG_TRAIN, "train")
        if lg in FAMILY
    ]
    train = spark.createDataFrame(
        fam_rows, "lang string, text string"
    ).localCheckpoint()

    print("coarse-only: " + json.dumps(two_stage_report(None)))

    for nf in sizes:
        sub = train_langid_classifier(
            train, n_features=nf, orders=ORDERS, max_chars=MAX_CHARS,
            include_words=INCLUDE_WORDS, reg_param=1e-5, max_iter=200,
        )
        qs = quantize_langid_model(sub, DENOM)
        assert tuple(qs["classes"]) == FAMILY, qs["classes"]
        rep = two_stage_report(qs)
        print(f"sub N_FEATURES={nf}: " + json.dumps(rep))


if __name__ == "__main__":
    main()
