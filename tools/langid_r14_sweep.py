"""Round-14 langid configuration sweep (VERDICT r13 asks #1 and #3).

Three candidate configurations, all trained on the round-14 vocabulary
(which adds everyday-register contrastive blocks to uk/ru/bg — the
Cyrillic triangle the verdict named first — plus es/pt/de/nl/cs/hr/tr/
fi/ro/en, driven by per-sentence error analysis of the dev holdout):

  A  raw-count training, unscaled intercept serve (the r13 recipe,
     new vocabulary only)
  B  raw-count training, length-scaled intercept at serve time
     (margins = (n/128)*I + S) — the judge's "length-scaled
     intercept" option, measured serve-side against config A's
     weights (inconsistent with training, but cheap)
  C  length-standardized training (len_std=128: every training vector
     scaled to the same total feature mass) with the matching serve
     kernel — the self-consistent fastText-style fix for the
     short-text intercept artifact (ko->zh / tr->zh cells)

Scored on the 1900-sentence dev holdout (a DEV set since round 13 —
the round-14 blind figure comes from sealed reserve B, opened once
after the winner ships). Reports overall accuracy, worst recalls, the
named confusion cells, and — the carve-out-deletion criterion — every
cross-script cell.

Usage: python tools/langid_r14_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spatialpandas_spark.operators.langid import (  # noqa: E402
    LANGS,
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
    N_FEATURES,
    ORDERS,
    PER_LANG_TRAIN,
)

LEN_STD = 128

#: same-script families (mirrors tests/test_langid_holdout.py) — any
#: confusion cell OUTSIDE these is a cross-script cell
_LATIN = {"en", "de", "fr", "es", "it", "pt", "nl", "pl", "sv", "tr",
          "vi", "id", "da", "fi", "cs", "ro", "hu", "hr", "sw"}
_CYRILLIC = {"ru", "uk", "bg"}
_ARABIC = {"ar", "fa", "ur"}


def holdout_report(qm: dict) -> dict:
    W = np.asarray(qm["weights"], dtype=np.float64)
    I = np.asarray(qm["intercepts"], dtype=np.float64)
    classes = list(qm["classes"])
    ls = qm.get("len_std")
    per, conf = {}, {}
    correct = total = 0
    for lang, sents in sorted(HOLDOUT_SENTENCES.items()):
        marg = margins_kernel(
            [py_buckets(s, qm) for s in sents], W, I, ls
        )
        preds = [classes[i] for i in np.argmax(marg, axis=1)]
        ok = sum(p == lang for p in preds)
        for p in preds:
            if p != lang:
                conf[f"{lang}->{p}"] = conf.get(f"{lang}->{p}", 0) + 1
        per[lang] = ok / len(sents)
        correct += ok
        total += len(sents)
    cross = {
        k: v
        for k, v in conf.items()
        for t, p in [k.split("->")]
        if not (
            (t in _LATIN and p in _LATIN)
            or (t in _CYRILLIC and p in _CYRILLIC)
            or (t in _ARABIC and p in _ARABIC)
        )
    }
    return {
        "accuracy": round(correct / total, 4),
        "errors": total - correct,
        "worst": sorted(per.items(), key=lambda kv: kv[1])[:8],
        "confusions": dict(sorted(conf.items(), key=lambda kv: -kv[1])),
        "cross_script": cross,
        "min_recall": round(min(per.values()), 4),
        "uk_recall": per["uk"],
    }


def main() -> None:
    from spatialpandas_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    train = spark.createDataFrame(
        langid_corpus(PER_LANG_TRAIN, "train"), "lang string, text string"
    )

    def fit(len_std):
        m = train_langid_classifier(
            train, n_features=N_FEATURES, orders=ORDERS,
            max_chars=MAX_CHARS, include_words=INCLUDE_WORDS,
            reg_param=1e-5, max_iter=200, len_std=len_std,
        )
        return quantize_langid_model(m, DENOM)

    qa = fit(None)
    qb = dict(qa, len_std=LEN_STD)  # serve-side scaling of A's weights
    qc = fit(LEN_STD)

    out = {}
    for name, qm in (("A_raw", qa), ("B_raw_servescaled", qb),
                     ("C_len_std", qc)):
        rep = holdout_report(qm)
        out[name] = rep
        print(f"\n=== {name} ===")
        print(f"accuracy {rep['accuracy']}  errors {rep['errors']}  "
              f"min_recall {rep['min_recall']}  uk {rep['uk_recall']}")
        print("worst:", [(k, round(v, 2)) for k, v in rep["worst"]])
        print("cross-script cells:", rep["cross_script"])
        print("top confusions:",
              dict(list(rep["confusions"].items())[:12]))
    print("\n" + json.dumps({k: {kk: v[kk] for kk in
                                 ("accuracy", "errors", "min_recall",
                                  "uk_recall", "cross_script")}
                             for k, v in out.items()}))


if __name__ == "__main__":
    main()
