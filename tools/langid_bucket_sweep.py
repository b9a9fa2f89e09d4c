"""Hash-bucket sweep for the langid close-sibling ceiling (round 13,
VERDICT r12 ask #3).

Trains the EXACT shipped recipe (tools/train_langid.py: same corpus,
same LR hyperparameters, same dyadic quantization) at candidate
N_FEATURES sizes and scores each candidate on the frozen 1900-sentence
holdout, reporting overall accuracy, the weak-language recalls the
verdict names (pt, da, plus cs/nl/uk), and the headline sibling
confusion cells (da->sv, uk->ru, pt->it, nl->da). Pure measurement —
does NOT write the model module; the winner is shipped by rerunning
tools/train_langid.py with its N_FEATURES bumped.

Freeze-discipline note: this consultation of HOLDOUT_SENTENCES as a
bucket-size accept gate is recorded per the protocol in
tools/eval_langid_holdout.py; the round-13 blind figure comes from the
sealed reserve (tools/langid_reserve_slices.py), opened once after the
winner ships.

Usage: python tools/langid_bucket_sweep.py [sizes...]   (default 8192 16384)
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
    ORDERS,
    PER_LANG_TRAIN,
)

WATCH_RECALL = ("pt", "da", "cs", "nl", "uk", "bg", "tr")
WATCH_CONF = ("da->sv", "uk->ru", "nl->da", "pt->it", "pt->es", "tr->id",
              "cs->sw", "bg->ru", "ar->fa")


def holdout_report(qm: dict) -> dict:
    W = np.asarray(qm["weights"], dtype=np.float64)
    I = np.asarray(qm["intercepts"], dtype=np.float64)
    classes = list(qm["classes"])
    rows = []
    for lang, sents in sorted(HOLDOUT_SENTENCES.items()):
        marg = margins_kernel(
            [py_buckets(s, qm) for s in sents], W, I, qm.get("len_std")
        )
        for a in np.argmax(marg, axis=1):
            rows.append((lang, classes[a]))
    total = len(rows)
    correct = sum(1 for t, p in rows if t == p)
    recalls = {
        lg: sum(1 for t, p in rows if t == lg and p == lg)
        / sum(1 for t, p in rows if t == lg)
        for lg in WATCH_RECALL
    }
    conf: dict[str, int] = {}
    for t, p in rows:
        if t != p:
            conf[f"{t}->{p}"] = conf.get(f"{t}->{p}", 0) + 1
    min_recall = min(
        (
            sum(1 for t, p in rows if t == lg and p == lg)
            / max(sum(1 for t, p in rows if t == lg), 1),
            lg,
        )
        for lg in sorted({t for t, _ in rows})
    )
    return {
        "accuracy": round(correct / total, 4),
        "recalls": {k: round(v, 3) for k, v in recalls.items()},
        "watch_confusions": {k: conf.get(k, 0) for k in WATCH_CONF},
        "worst_recall": (round(min_recall[0], 3), min_recall[1]),
        "total_confused": total - correct,
    }


def main() -> None:
    from spatialpandas_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384]
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    train = spark.createDataFrame(
        langid_corpus(PER_LANG_TRAIN, "train"), "lang string, text string"
    )
    train = train.localCheckpoint()  # reused across candidate fits

    for nf in sizes:
        model = train_langid_classifier(
            train, n_features=nf, orders=ORDERS, max_chars=MAX_CHARS,
            include_words=INCLUDE_WORDS, reg_param=1e-5, max_iter=200,
        )
        qm = quantize_langid_model(model, DENOM)
        assert qm["classes"] == LANGS
        rep = holdout_report(qm)
        print(f"N_FEATURES={nf}: " + json.dumps(rep))


if __name__ == "__main__":
    main()
