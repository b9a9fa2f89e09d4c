"""Bigram LM (operators/lm.py) vs a plain-python oracle: fit counts and
conditional log-probs, Jelinek-Mercer interpolated scoring with unigram
backoff and OOV floor, empty/null-document contracts."""

import math

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup import tokens as _tok_col  # noqa: F401
from spatialpandas_spark.operators.lm import (
    BOS,
    bigram_fit,
    bigram_logprob,
    unigram_fit,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "a dog sat"),
    (4, ""),
    (5, None),
]


def _py_tokens(text):
    return [t for t in (text or "").lower().split() if t]


def _py_fit(corpus):
    uni, bi = {}, {}
    for _, text in corpus:
        toks = _py_tokens(text)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for p, t in zip([BOS] + toks[:-1], toks):
            bi[(p, t)] = bi.get((p, t), 0) + 1
    return uni, bi


def test_bigram_fit_matches_python(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r["prev"], r["token"]): (r["n"], r["logp"])
        for r in bigram_fit(docs).collect()
    }
    uni, bi = _py_fit(CORPUS)
    prev_tot = {}
    for (p, _), n in bi.items():
        prev_tot[p] = prev_tot.get(p, 0) + n
    assert set(got) == set(bi)
    for (p, t), n in bi.items():
        gn, glp = got[(p, t)]
        assert gn == n
        assert glp == pytest.approx(math.log(n / prev_tot[p]), abs=1e-12)


def test_bigram_logprob_matches_python(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    uni_m = unigram_fit(docs)
    bi_m = bigram_fit(docs)
    lam = 0.6
    score_docs = spark.createDataFrame(
        [
            (10, "the cat sat"),       # all seen bigrams
            (11, "cat the"),           # unseen bigram -> unigram backoff
            (12, "zebra unknownword"), # OOV -> floor
            (13, ""),
            (14, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logp"])
        for r in bigram_logprob(score_docs, bi_m, uni_m, lam=lam).collect()
    }

    uni, bi = _py_fit(CORPUS)
    total = sum(uni.values())
    vocab = len(uni)
    floor = 1.0 / (total + vocab)
    prev_tot = {}
    for (p, _), n in bi.items():
        prev_tot[p] = prev_tot.get(p, 0) + n

    def score(text):
        toks = _py_tokens(text)
        if not toks:
            return (0, None)
        lps = []
        for p, t in zip([BOS] + toks[:-1], toks):
            p_uni = uni[t] / total if t in uni else floor
            p_bi = bi.get((p, t), 0) / prev_tot[p] if p in prev_tot else 0.0
            lps.append(math.log(lam * p_bi + (1 - lam) * p_uni))
        return (len(toks), sum(lps) / len(lps))

    for did, text in [(10, "the cat sat"), (11, "cat the"), (12, "zebra unknownword")]:
        n, lp = score(text)
        assert got[did][0] == n
        assert got[did][1] == pytest.approx(lp, abs=1e-9), did
    assert got[13] == (0, None)
    assert got[14] == (0, None)


def test_bigram_scoring_ranks_in_domain_text_higher(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    uni_m, bi_m = unigram_fit(docs), bigram_fit(docs)
    probe = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "qq ww ee rr tt yy")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["avg_logp"] for r in bigram_logprob(probe, bi_m, uni_m).collect()}
    assert rows[1] > rows[2]


def test_plans_are_equi_joins(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    plan = (
        bigram_logprob(docs, bigram_fit(docs), unigram_fit(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # permitted nested-loops: broadcast crossJoins attaching 1-row
    # aggregates (unigram total, interpolation stats). Every BNLJ line
    # must be a Cross attach; the model joins themselves must be
    # hash/sort-merge equi-joins (visible as SortMergeJoin/HashJoin).
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line
    assert "SortMergeJoin" in plan or "HashJoin" in plan