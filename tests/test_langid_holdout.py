"""FROZEN-holdout generalization floors for the shipped langid model.

The corpus in tools/eval_langid_holdout.py must never be used to tune
the model — test_corpus_is_frozen pins its exact content so any edit
(which would silently turn it back into a dev set) fails loudly. See
the tool's provenance docstring for the honest history: the original
23-language slice (round-12 freeze: 0.9704 on 1150 with the 24-class
model) was consulted during the breadth expansion, so the blind
figures now come from HOLDOUT_FRESH23 (0.9565 at freeze) and the 15
new languages' sentences (authored post-final-vocab). Round-12 final
measurement: 0.9642 over all 38 languages / 1900 sentences. The
floors below leave retrain headroom without accepting a regression.
Pure-python twin of the serving kernel — no Spark session needed."""

import hashlib

import numpy as np

from spatialpandas_spark.operators.langid import (
    RECOMMENDED_MIN_GAP,
    builtin_langid_model,
    margins_kernel,
)
from tools.eval_langid_holdout import (
    HOLDOUT_FRESH23,
    HOLDOUT_SENTENCES,
    evaluate,
    evaluate_fresh23,
)
from tools.eval_langid_real import py_buckets

#: md5 of the canonical serialization of the frozen corpus. If this
#: test fails you have edited the holdout — either revert, or accept
#: that it is now a dev set and author a NEW frozen slice (then update
#: the provenance notes in eval_langid_holdout.py and BASELINE.md).
_FREEZE_MD5 = "27afbd54b207df36a625ddd1cd769593"
_FRESH23_MD5 = "9123bdb7acd43f99eb07012aa38ef846"
#: the sealed reserve (tools/langid_reserve_slices.py): A opened once
#: in round 13 (0.9737), B opened once in round 14 (1.0000 on the
#: length-standardized retrain), C and D sealed — the hash pin stops
#: silent edits in ALL states
_RESERVE_A_MD5 = "4d1d183780044a3e3eecf590e2c0c0c3"
_RESERVE_B_MD5 = "d900444a4ef3e0e09d35adc623ca5bac"
_RESERVE_C_MD5 = "699207e77b1cc6b3a833da036e8306c5"  # 42-language slice
#: round-14 replacement slice, authored BEFORE any r14 model eval
#: (rule 4 — B and C are both candidates for opening this round)
_RESERVE_D_MD5 = "70a8c9f6ce45d4bf069d861f5c45787c"  # 42-language slice

#: languages whose SCRIPT alone separates them from every other class —
#: a miss here is a kernel/feature failure, not a close-family residual
_SCRIPT_DISTINCT = ("am", "bn", "el", "he", "hi", "hy", "ja", "ka",
                    "ko", "ta", "te", "th", "zh")


def _report():
    # cache: evaluate() walks all 1150 sentences (~2 s)
    if not hasattr(_report, "_cached"):
        _report._cached = evaluate()
    return _report._cached


def test_corpus_is_frozen():
    blob = "\x00".join(
        f"{lg}\x01" + "\x01".join(ss)
        for lg, ss in sorted(HOLDOUT_SENTENCES.items())
    )
    assert hashlib.md5(blob.encode()).hexdigest() == _FREEZE_MD5
    assert len(HOLDOUT_SENTENCES) == 38
    assert all(len(ss) == 50 for ss in HOLDOUT_SENTENCES.values())
    blob2 = "\x00".join(
        f"{lg}\x01" + "\x01".join(ss)
        for lg, ss in sorted(HOLDOUT_FRESH23.items())
    )
    assert hashlib.md5(blob2.encode()).hexdigest() == _FRESH23_MD5
    assert len(HOLDOUT_FRESH23) == 23
    assert all(len(ss) == 10 for ss in HOLDOUT_FRESH23.values())


def test_reserve_slices_are_sealed():
    """Round-13 reserve discipline (VERDICT r12 ask #4): both reserve
    slices are hash-pinned; opening one is a documented one-shot
    measurement, never an edit."""
    from tools.langid_reserve_slices import (
        RESERVE_A,
        RESERVE_B,
        RESERVE_C,
        RESERVE_D,
    )

    for d, want, n_langs in (
        (RESERVE_A, _RESERVE_A_MD5, 38),
        (RESERVE_B, _RESERVE_B_MD5, 38),
        (RESERVE_C, _RESERVE_C_MD5, 42),
        (RESERVE_D, _RESERVE_D_MD5, 42),
    ):
        blob = "\x00".join(
            f"{lg}\x01" + "\x01".join(ss) for lg, ss in sorted(d.items())
        )
        assert hashlib.md5(blob.encode()).hexdigest() == want
        assert len(d) == n_langs
        assert all(len(ss) == 5 for ss in d.values())


def test_overall_accuracy_floor():
    rep = _report()
    assert rep["n"] == 1900
    # measured 0.9642 at the round-12 freeze (4096 buckets), 0.9753
    # after the round-13 16384-bucket retrain, 0.9905 after the
    # round-14 length-standardized retrain + uk/ru/bg + Romance/
    # Germanic/Slavic contrastive vocabulary blocks (VERDICT r13 asks
    # #1/#3; this set is a DEV set since round 13 — see the provenance
    # note in tools/eval_langid_holdout); floor allows retrain
    # headroom, still far above the heuristic
    assert rep["accuracy"] >= 0.975, rep["accuracy"]


def test_script_distinct_languages_near_perfect():
    rep = _report()
    for lg in _SCRIPT_DISTINCT:
        assert rep["per_lang"][lg]["recall"] >= 0.95, (
            lg, rep["per_lang"][lg],
        )


def test_every_language_recall_floor():
    """VERDICT r11 ask #3: >=90% per script-distinct language was the
    stated bar; the round-14 retrain measures every language >= 0.96
    (uk and ru — the r13 worst — are now perfect). Pin 0.90 everywhere
    so a retrain that silently collapses one confusable language
    fails."""
    rep = _report()
    for lg, d in rep["per_lang"].items():
        assert d["recall"] >= 0.90, (lg, d)


def test_blind_fresh23_slice():
    """The never-consulted blind slice (authored after every holdout
    consultation; new domains): measured 0.9565 at freeze — the
    untainted generalization figure for the original languages."""
    rep = evaluate_fresh23()
    assert rep["n"] == 230
    # 0.9565 at the r12 freeze; 0.9696 after the r13 retrain (no
    # longer blind — the round-13 blind figure comes from the sealed
    # reserve, tools/langid_reserve_slices.py)
    assert rep["accuracy"] >= 0.94, rep



def test_confusions_stay_in_known_families():
    """Errors must remain within the documented close-language
    residuals — a cross-script or distant-family confusion signals a
    feature-hashing bug, not a model limitation."""
    rep = _report()
    # round-12 breadth expansion: the new Latin-script languages
    # (da/fi/cs/ro/hu/hr/sw), Cyrillic bg, and Arabic-script ur join
    # their script families — a within-family miss is a close-language
    # residual, not a feature failure
    latin = {"en", "de", "fr", "es", "it", "pt", "nl", "pl", "sv",
             "tr", "vi", "id", "da", "fi", "cs", "ro", "hu", "hr", "sw"}
    cyrillic = {"ru", "uk", "bg"}
    arabic_script = {"ar", "fa", "ur"}
    # Round 14 (VERDICT r13 ask #3): the r13 x->zh carve-out is GONE.
    # The short-text intercept artifact (zh's no-space gram streams
    # earned a 6.85 LR intercept that ~50 grams of evidence could not
    # overcome) was fixed at the root by length-standardized training
    # (len_std=128, operators/langid.train_langid_classifier): the
    # intercept now competes against a fixed evidence mass at every
    # length. EVERY cross-script cell fails the build again.
    for key, n in rep["confusions"].items():
        t, p = key.split("->")
        same_family = (
            (t in latin and p in latin)
            or (t in cyrillic and p in cyrillic)
            or (t in arabic_script and p in arabic_script)
        )
        assert same_family, (key, n)


def test_min_gap_calibration_properties():
    """The shipped RECOMMENDED_MIN_GAP must keep >= 93% of correct
    predictions while abstaining on >= 60% of wrong ones (measured
    95.1% / 73.5% at freeze) — the property that makes gap-based
    abstention worth shipping where raw-margin abstention measures 0%
    wrong-abstention at every threshold <= 3.0."""
    m = builtin_langid_model()
    W = np.asarray(m["weights"])
    I = np.asarray(m["intercepts"])
    classes = list(m["classes"])
    cg, wg = [], []
    for lang, sents in HOLDOUT_SENTENCES.items():
        bks = [py_buckets(s, m) for s in sents]
        marg = margins_kernel(bks, W, I, m.get("len_std"))
        arg = np.argmax(marg, axis=1)
        second = np.partition(marg, -2, axis=1)[:, -2]
        best = marg[np.arange(len(marg)), arg]
        for a, b, s2, bk in zip(arg, best, second, bks):
            gap = (b - s2) / max(len(bk), 1)
            (cg if classes[a] == lang else wg).append(gap)
    kept = sum(1 for g in cg if g >= RECOMMENDED_MIN_GAP) / len(cg)
    abstained = sum(1 for g in wg if g < RECOMMENDED_MIN_GAP) / len(wg)
    assert kept >= 0.93, kept
    assert abstained >= 0.60, abstained
