"""Round-14 da/no sibling pilot (VERDICT r13 ask #2): train the
da/no binary refiner on REAL authored contrastive prose
(tools/langid_dano_prose.py — the lever the round-13 sweep named)
upweighted over the synthetic vocab draws, and measure the two-stage
ship gate:

- no-recall on the FRESH round-14 dev battery (NO_DEV_FRESH, never
  trained on) — ship bar >= 0.90;
- flip leakage on the 50 Danish dev-holdout sentences — ship bar
  <= 2;
- the r13 10-sentence no battery and the per-gram gap distributions
  for the diagnosis trail.

The coarse model is the SHIPPED round-14 39-class artifact
(untouched). Sweeps the real-prose upweight factor U; the refiner
trains at the shipped bucket width and len_std so serving can share
one bucket stream.

Usage: python tools/langid_dano_pilot.py [U ...]   (default 3 5 10)
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
from tools.langid_dano_prose import (  # noqa: E402
    DA_PROSE,
    DA_PROSE_2,
    NO_DEV_FRESH,
    NO_PROSE,
    NO_PROSE_2,
)
from tools.langid_sibling_sweep import DEV_SENTENCES  # noqa: E402
from tools.train_langid import (  # noqa: E402
    DENOM,
    INCLUDE_WORDS,
    LEN_STD,
    MAX_CHARS,
    N_FEATURES,
    ORDERS,
    PER_LANG_TRAIN,
)


def main() -> None:
    from spatialpandas_spark.session import get_spark

    ups = [int(a) for a in sys.argv[1:]] or [3, 5, 10]
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    coarse = builtin_langid_model()
    Wc = np.asarray(coarse["weights"], dtype=np.float64)
    Ic = np.asarray(coarse["intercepts"], dtype=np.float64)
    cls_c = list(coarse["classes"])

    def coarse_top2(sents):
        """(top1, top2) coarse labels per sentence."""
        marg = margins_kernel(
            [py_buckets(s, coarse) for s in sents], Wc, Ic,
            coarse.get("len_std"),
        )
        order = np.argsort(marg, axis=1)
        return [(cls_c[o[-1]], cls_c[o[-2]]) for o in order]

    synth = langid_corpus(PER_LANG_TRAIN, "train", langs=["da", "no"])
    out = {}
    for U in ups:
        rows = list(synth)
        rows += [("da", s) for s in DA_PROSE + DA_PROSE_2] * U
        rows += [("no", s) for s in NO_PROSE + NO_PROSE_2] * U
        train = spark.createDataFrame(rows, "lang string, text string")
        bm = train_langid_classifier(
            train, n_features=N_FEATURES, orders=ORDERS,
            max_chars=MAX_CHARS, include_words=INCLUDE_WORDS,
            reg_param=1e-5, max_iter=200, len_std=LEN_STD,
        )
        qb = quantize_langid_model(bm, DENOM)
        Wb = np.asarray(qb["weights"], dtype=np.float64)
        Ib = np.asarray(qb["intercepts"], dtype=np.float64)
        cls_b = list(qb["classes"])
        ino, ida = cls_b.index("no"), cls_b.index("da")

        def gaps(sents, top2=False):
            """(coarse_top1, refiner gap or None) rows. With ``top2``
            the refiner also runs when 'da' is the coarse RUNNER-UP —
            the routing fix for no-prose the coarse model lands on a
            third Germanic class with da second (measured: 3/30 fresh
            sentences, all with strongly-no refiner gaps)."""
            outp = []
            for s, (p1, p2) in zip(sents, coarse_top2(sents)):
                g = None
                if p1 == "da" or (top2 and p2 == "da"):
                    b = py_buckets(s, qb)
                    mb = margins_kernel([b], Wb, Ib, LEN_STD)[0]
                    g = (mb[ino] - mb[ida]) / max(len(b), 1)
                outp.append((p1, g))
            return outp

        def two_stage(sents, tau=0.0, top2=False):
            return [
                "no" if g is not None and g >= tau else p
                for p, g in gaps(sents, top2)
            ]

        rep = {}
        for trig in (False, True):
            fresh = two_stage(NO_DEV_FRESH, top2=trig)
            old10 = two_stage(DEV_SENTENCES["no"], top2=trig)
            hold = two_stage(HOLDOUT_SENTENCES["da"], top2=trig)
            key = "top2" if trig else "top1"
            rep[key] = {
                "fresh_no_recall": round(
                    sum(p == "no" for p in fresh) / len(fresh), 3
                ),
                "old10_no_recall": round(
                    sum(p == "no" for p in old10) / len(old10), 2
                ),
                "da_flips": sum(p == "no" for p in hold),
                "da_holdout_recall": round(
                    sum(p == "da" for p in hold) / len(hold), 3
                ),
                "fresh_miss": {
                    p: fresh.count(p) for p in set(fresh) if p != "no"
                },
            }
        og = sorted(g for _, g in gaps(HOLDOUT_SENTENCES["da"], True)
                    if g is not None)
        ng = sorted(g for _, g in gaps(NO_DEV_FRESH, True)
                    if g is not None)
        rep["da_gap_max8"] = [round(g, 4) for g in og[-8:]]
        rep["no_gap_min8"] = [round(g, 4) for g in ng[:8]]
        out[f"U={U}"] = rep
        print(json.dumps({f"U={U}": rep}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
