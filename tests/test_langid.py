"""Language-ID classifier (VERDICT r10 ask #1): hashed char-n-gram +
word linear model — bucket-hash cross-engine parity, held-out accuracy
of the SHIPPED quantized model incl. non-latin scripts, dyadic margin
exactness, deterministic tie-breaks, and the MLlib train path."""

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.langid import (
    LANGS,
    builtin_langid_model,
    char_ngrams,
    classify_language,
    lang_buckets,
    langid_corpus,
    margins_kernel,
    quantize_langid_model,
    score_langs,
    train_langid_classifier,
)


def py_buckets(text, model):
    """Pure-python bucket twin (same construction as
    tools/train_langid.py py_buckets)."""
    t = text.lower() if model["lowercase"] else text
    if model.get("max_chars") is not None:
        t = t[: model["max_chars"]]
    grams = []
    for o in model["orders"]:
        grams += [t[i : i + o] for i in range(len(t) - o + 1)]
    if model.get("include_words"):
        grams += [w for w in re.split(r"\s+", t) if w != ""]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
        % model["n_features"]
        for g in grams
    ]


def test_char_ngrams_extraction(spark):
    df = spark.createDataFrame([("ab cd",), ("",), (None,)], "text string")
    got = [
        list(r["g"])
        for r in df.select(
            char_ngrams(F.col("text"), (1, 2), True, None, True).alias("g")
        ).collect()
    ]
    assert got[0] == [
        "a", "b", " ", "c", "d",          # unigrams
        "ab", "b ", " c", "cd",            # bigrams
        "ab", "cd",                        # words
    ]
    assert got[1] == [] and got[2] == []


def test_bucket_hash_parity_with_python_twin(spark):
    """Catalyst buckets == the pure-python md5 twin on every script the
    model covers plus case/whitespace/truncation edge cases — the
    property the DuckDB oracle replay rests on."""
    m = builtin_langid_model()
    samples = [t for _, t in langid_corpus(2, "parity")] + [
        "", " \t ", "Hello WORLD!  mixed\tCase",
        "Привет МИР", "你好世界 ναι οχι", "مرحبا नमस्ते 안녕",
        "y" * 600,  # exercises max_chars truncation
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i long, text string"
    )
    got = {
        r["i"]: list(r["b"])
        for r in df.select(
            "i",
            lang_buckets(
                F.col("text"), m["n_features"], tuple(m["orders"]),
                m["lowercase"], m["max_chars"], m["include_words"],
            ).alias("b"),
        ).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == py_buckets(s, m), (i, s[:30])


def test_builtin_model_held_out_accuracy():
    """The shipped quantized model classifies a held-out draw (disjoint
    seed block) at >= 99% overall and 100% on non-latin scripts."""
    m = builtin_langid_model()
    W = np.asarray(m["weights"])
    I = np.asarray(m["intercepts"])
    held = langid_corpus(40, "pytest-heldout")
    marg = margins_kernel(
        (py_buckets(t, m) for _, t in held), W, I, m.get("len_std")
    )
    pred = [m["classes"][a] for a in np.argmax(marg, axis=1)]
    ok = sum(g == w for (w, _), g in zip(held, pred))
    assert ok / len(held) >= 0.99, ok / len(held)
    nonlatin = {"ar", "el", "hi", "ja", "ko", "ru", "zh"}
    for (want, _), got in zip(held, pred):
        if want in nonlatin:
            assert got == want, (want, got)


def test_builtin_margins_are_exact_dyadic():
    """Every margin of the shipped model is an integer multiple of
    1/(DENOM*LEN_STD) — the property that makes the SQL replay
    bit-exact under any summation order (round 14: the
    length-standardized kernel adds the exact n/LEN_STD intercept
    scale, LEN_STD a power of two)."""
    m = builtin_langid_model()
    W = np.asarray(m["weights"])
    I = np.asarray(m["intercepts"])
    texts = [t for _, t in langid_corpus(3, "dyadic")]
    marg = margins_kernel(
        (py_buckets(t, m) for t in texts), W, I, m.get("len_std")
    )
    scaled = marg * m["denom"] * (m.get("len_std") or 1)
    assert np.array_equal(scaled, np.rint(scaled))


def test_margins_kernel_transposed_gather_bitwise_identical():
    """The round-15 locality fix (contiguous-row gather over W.T) must
    be BITWISE identical to the strided column gather — for arbitrary
    NON-dyadic float64 weights, both with and without len_std, with a
    precomputed WT and with the in-kernel volume-triggered transpose,
    including empty bucket rows."""
    rng = np.random.default_rng(7)
    n_classes, n_feat = 5, 64
    W = rng.standard_normal((n_classes, n_feat))
    I = rng.standard_normal(n_classes)
    rows = [
        rng.integers(0, n_feat, size=n).tolist()
        for n in (0, 1, 3, 40, 200, 999)
    ]
    WT = np.ascontiguousarray(W.T)
    for ls in (None, 256):
        # reference: the pre-round-15 column-gather formula, verbatim
        ref = []
        for b in rows:
            bk = np.asarray(b, dtype=np.int64)
            s = W[:, bk].sum(axis=1) if len(bk) else 0.0
            ref.append(
                I + s if ls is None else (max(len(bk), 1) / ls) * I + s
            )
        ref = np.asarray(ref)
        got_wt = margins_kernel(rows, W, I, ls, WT=WT)
        got_auto = margins_kernel(rows, W, I, ls)  # volume >= n_feat
        got_small = margins_kernel(rows[:3], W, I, ls)  # column path
        assert np.array_equal(got_wt, ref)
        assert np.array_equal(got_auto, ref)
        assert np.array_equal(got_small, ref[:3])


def test_spark_serve_matches_python_replay(spark):
    """score_langs (Arrow path) == the numpy replay, prediction AND
    margin, on mixed-script rows including empty text (intercept-only
    argmax — deterministic first-max tie-break)."""
    m = builtin_langid_model()
    rows = [(i, t) for i, (_, t) in enumerate(langid_corpus(2, "serve"))]
    rows += [(900, ""), (901, "le la 的 и")]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r["i"]: (r["lang_pred"], r["margin"])
        for r in score_langs(df, m, "text", "lang_pred", "margin").collect()
    }
    W = np.asarray(m["weights"])
    I = np.asarray(m["intercepts"])
    for i, t in rows:
        marg = margins_kernel(
            [py_buckets(t, m)], W, I, m.get("len_std")
        )[0]
        a = int(np.argmax(marg))
        assert got[i] == (m["classes"][a], marg[a]), (i, t[:30])
    # empty text -> intercept argmax, same for every empty row
    assert got[900][0] == m["classes"][int(np.argmax(I))]


def test_classify_language_on_documents(spark):
    """Production entry point over the real documents table: every row
    gets a prediction from the class set; the synthetic corpus is
    English-like word salad, and the model agrees it is latin-script."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    out = classify_language(docs, "text", "lang_pred").collect()
    assert len(out) == 50
    assert all(r["lang_pred"] in LANGS for r in out)
    # any latin-SCRIPT class counts: the salad is not a real language,
    # the property under test is script-level sanity (r13: the da/sv/nl
    # vocabulary broadening moved some salad rows en -> sv/da)
    latin = {"de", "en", "es", "fr", "it", "pt", "nl", "sv", "da",
             "pl", "cs", "ro", "hu", "hr", "fi", "tr", "id", "vi", "sw"}
    frac = sum(r["lang_pred"] in latin for r in out) / len(out)
    assert frac >= 0.9, frac


def test_train_quantize_roundtrip(spark):
    """MLlib multinomial train on a 3-language subset converges and the
    quantized model still separates held-out draws."""
    langs = ["en", "ru", "zh"]
    rows = [(l, t) for l, t in langid_corpus(60, "train3") if l in langs]
    df = spark.createDataFrame(rows, "lang string, text string")
    model = train_langid_classifier(
        df, n_features=1024, orders=(1, 2), include_words=True,
        max_chars=256, reg_param=1e-4, max_iter=60,
    )
    assert model["classes"] == langs
    qm = quantize_langid_model(model)
    held = [(l, t) for l, t in langid_corpus(10, "held3") if l in langs]
    pred = {
        r["lang"]: r["p"]
        for r in score_langs(
            spark.createDataFrame(held, "lang string, text string"),
            qm, "text", "p",
        ).collect()
    }
    assert all(pred[l] == l for l in langs)


def test_gibberish_classifies_as_und(spark):
    """'und' is an explicit trained class (random-character noise), so
    gibberish abstains BY ARGMAX — no threshold heuristics (a margin
    threshold cannot work: multinomial intercepts carry class priors,
    and ASCII noise lands on trained latin buckets; see LANGS note).
    Real sentences keep their labels; min_margin remains available as
    an extra knob and must not relabel confident rows."""
    m = builtin_langid_model()
    assert "und" in m["classes"]
    real = [(i, t) for i, (_, t) in enumerate(langid_corpus(2, "abst"))
            if t]
    import random
    rng = random.Random("gib")
    noise = [
        (900 + j, " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(rng.randint(2, 9)))
            for _ in range(10)))
        for j in range(5)
    ]
    df = spark.createDataFrame(real + noise, "i long, text string")
    out = {
        r["i"]: r["p"]
        for r in score_langs(df, m, "text", "p", min_margin=1.0).collect()
    }
    for i, t in real:
        want = langid_corpus(2, "abst")[i][0]
        assert out[i] == want, (i, t[:30], out[i])
    for i, _ in noise:
        assert out[i] == "und", (i, out[i])


def test_segment_classification_mixed_document(spark):
    """Per-segment language ID on a mixed-language document: each
    paragraph gets its own label (the whole-doc argmax flattens this);
    blank/short segments are dropped but seg_id keeps original
    positions; predictions match the pure-python kernel twin."""
    import numpy as np

    from spatialpandas_spark.operators.langid import (
        classify_language_segments,
    )

    doc = "\n".join([
        "the government announced the new policy yesterday evening",
        "",                                     # dropped (blank)
        "он открыл окно и посмотрел на тихую улицу",
        "x",                                    # kept (min_chars=1)
        "彼は午後ずっと庭で本を読んで過ごした",
    ])
    df = spark.createDataFrame([(7, doc)], "doc_id long, text string")
    out = classify_language_segments(df, "text").orderBy("seg_id").collect()
    got = [(r["seg_id"], r["lang_pred"]) for r in out]
    assert [g[0] for g in got] == [0, 2, 3, 4]          # gap at blank
    assert got[0][1] == "en" and got[1][1] == "ru" and got[3][1] == "ja"
    assert all(r["doc_id"] == 7 for r in out)
    assert "text" not in out[0].asDict()

    # python-twin parity on every surviving segment
    m = builtin_langid_model()
    W = np.asarray(m["weights"]); I = np.asarray(m["intercepts"])
    segs = [s for s in doc.split("\n") if s.strip()]
    marg = margins_kernel(
        [py_buckets(s, m) for s in segs], W, I, m.get("len_std")
    )
    want = [m["classes"][i] for i in np.argmax(marg, axis=1)]
    assert [g[1] for g in got] == want


def test_segment_classification_min_chars_and_margin(spark):
    from spatialpandas_spark.operators.langid import (
        classify_language_segments,
    )

    df = spark.createDataFrame(
        [(1, "het was een rustige avond in de stad\nab\n  \n")],
        "doc_id long, text string",
    )
    out = classify_language_segments(
        df, "text", min_chars=3, margin_col="margin"
    ).collect()
    assert [r["seg_id"] for r in out] == [0]
    assert out[0]["lang_pred"] == "nl" and out[0]["margin"] > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        classify_language_segments(df, "text", min_chars=0)


def test_segment_classification_plan_is_single_stage(spark):
    """The split+posexplode+score composition must stay shuffle-free —
    same contract as score_langs (no Exchange in the plan)."""
    from spatialpandas_spark.operators.langid import (
        classify_language_segments,
    )

    df = spark.createDataFrame([(1, "a b c\nd e f")], "doc_id long, text string")
    plan = (
        classify_language_segments(df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_segment_sep_is_literal_by_default(spark):
    """ADVICE r11: F.split treats its pattern as a Java regex; sep must
    be quoted so metacharacter separators split LITERALLY. sep='.'
    must split on periods, not between every character."""
    from spatialpandas_spark.operators.langid import (
        classify_language_segments,
    )

    doc = (
        "the quick brown fox jumped over the lazy dog."
        "il a passé tout l'après-midi à lire dans le jardin."
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    out = (
        classify_language_segments(df, "text", sep=".", min_chars=5)
        .orderBy("seg_id")
        .collect()
    )
    assert [r["seg_id"] for r in out] == [0, 1]
    assert [r["lang_pred"] for r in out] == ["en", "fr"]

    # regex=True restores pattern interpretation: split on runs of
    # either separator
    doc2 = "one two three four five;;;sechs sieben acht neun zehn"
    df2 = spark.createDataFrame([(1, doc2)], "doc_id long, text string")
    out2 = (
        classify_language_segments(df2, "text", sep=";+", regex=True)
        .orderBy("seg_id")
        .collect()
    )
    assert len(out2) == 2


def test_segment_output_column_collision_raises(spark):
    from spatialpandas_spark.operators.langid import (
        classify_language_segments,
    )

    df = spark.createDataFrame(
        [(1, "a", "hello world")], "doc_id long, seg_id string, text string"
    )
    with pytest.raises(ValueError, match="seg_id"):
        classify_language_segments(df, "text")
    df2 = spark.createDataFrame(
        [(1, "a", "hello world")], "doc_id long, segment string, text string"
    )
    with pytest.raises(ValueError, match="segment"):
        classify_language_segments(df2, "text")


def test_score_langs_does_not_clobber_caller_bucket_column(spark):
    """score_langs used a fixed '__b' temp name; a caller column named
    '__b' must survive scoring untouched (ADVICE r11)."""
    from spatialpandas_spark.operators.langid import (
        builtin_langid_model,
        score_langs,
    )

    df = spark.createDataFrame(
        [(1, 42, "the weather was very warm this year in the city")],
        "doc_id long, __b long, text string",
    )
    out = score_langs(df, builtin_langid_model(), "text").collect()
    assert out[0]["__b"] == 42
    assert out[0]["lang_pred"] == "en"


def test_min_gap_abstention_spark_matches_twin(spark):
    """min_gap (per-feature top-2 gap abstention, round-12 calibrated
    knob) on the serving path: engine output matches the python twin's
    gap computation row-for-row."""
    import numpy as np

    from spatialpandas_spark.operators.langid import (
        RECOMMENDED_MIN_GAP,
        builtin_langid_model,
        classify_language,
        margins_kernel,
    )

    texts = [
        "the weather was unusually warm for this time of year",
        "das wetter war ungewöhnlich warm für diese jahreszeit",
        "qzx vbn mmm kkk zzz qqq",          # gibberish: tiny gap
        "la la la la",                       # ambiguous romance filler
        "он открыл окно и посмотрел на улицу",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: r["lang_pred"]
        for r in classify_language(
            df, "text", min_gap=RECOMMENDED_MIN_GAP
        ).collect()
    }

    m = builtin_langid_model()
    W = np.asarray(m["weights"]); I = np.asarray(m["intercepts"])
    bks = [py_buckets(t, m) for t in texts]
    marg = margins_kernel(bks, W, I, m.get("len_std"))
    arg = np.argmax(marg, axis=1)
    second = np.partition(marg, -2, axis=1)[:, -2]
    best = marg[np.arange(len(marg)), arg]
    for i in range(len(texts)):
        gap = (best[i] - second[i]) / max(len(bks[i]), 1)
        want = m["classes"][arg[i]] if gap >= RECOMMENDED_MIN_GAP else "und"
        assert got[i] == want, (i, texts[i], got[i], want, gap)
    # both confident rows survive; at least one weak row abstains
    assert got[0] == "en" and got[1] == "de" and got[4] == "ru"
