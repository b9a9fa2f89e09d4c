"""Unigram LM fit/score vs a brute-force Python twin."""

import math
from collections import Counter

import pytest

from spatialpandas_spark.operators.lm import unigram_fit, unigram_logprob


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "rare words only"),
    (3, ""),
    (4, None),
]


def _fit():
    c = Counter()
    for _, t in DOCS:
        c.update((t or "").lower().split())
    total = sum(c.values())
    return c, total


def test_fit_matches_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["token"]: (r["n"], r["logp"]) for r in unigram_fit(df).collect()}
    c, total = _fit()
    assert set(got) == set(c)
    for t, n in c.items():
        assert got[t][0] == n
        assert got[t][1] == pytest.approx(math.log(n / total), abs=1e-12)


def test_score_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = unigram_fit(df)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logp"])
        for r in unigram_logprob(df, model).collect()
    }
    c, total = _fit()
    for d, t in DOCS:
        toks = (t or "").lower().split()
        assert got[d][0] == len(toks)
        if toks:
            expect = sum(math.log(c[x] / total) for x in toks) / len(toks)
            assert got[d][1] == pytest.approx(expect, abs=1e-12)
        else:
            assert got[d][1] is None


def test_oov_floor(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = unigram_fit(df)
    other = spark.createDataFrame(
        [(10, "the unseen zebra")], "doc_id long, text string"
    )
    row = unigram_logprob(other, model).collect()[0]
    c, total = _fit()
    floor = math.log(1.0 / (total + len(c)))
    expect = (math.log(c["the"] / total) + 2 * floor) / 3
    assert row["n_tokens"] == 3
    assert row["avg_logp"] == pytest.approx(expect, abs=1e-12)
