"""Repetition quality signals vs Python Counter oracles."""

from collections import Counter

from pyspark.sql import functions as F

from spatialpandas_spark.operators.text import (
    duplicate_line_fraction,
    top_ngram_fraction,
)


DOCS = [
    (0, "unique one\nunique two\nunique three"),
    (1, "menu\nhome\nmenu\nabout\nmenu\n\n  \nhome"),
    (2, "single line only"),
    (3, ""),
    (4, None),
    (5, "a\na\na\na"),
    (6, "buy now buy now buy now buy now"),
    (7, "the cat sat on the mat while the dog slept"),
]


def _dup_line_oracle(text):
    lines = [l.strip() for l in (text or "").split("\n")]
    lines = [l for l in lines if l]
    if not lines:
        return 0.0
    return (len(lines) - len(set(lines))) / len(lines)


def _top_ngram_oracle(text, n):
    toks = (text or "").lower().split()
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not toks or not grams:
        return 0.0
    top = Counter(grams).most_common(1)[0][1]
    return min(top * n / len(toks), 1.0)


def test_duplicate_line_fraction(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", duplicate_line_fraction(F.col("text")).alias("f")
        ).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _dup_line_oracle(text), doc_id
    assert got[0] == 0.0
    # doc 1: 6 non-empty lines (menu x3, home x2, about) -> 3 dups / 6
    assert got[1] == 0.5
    assert got[5] == 0.75


def test_top_ngram_fraction(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for n in (2, 3):
        got = {
            r["doc_id"]: r["f"]
            for r in df.select(
                "doc_id", top_ngram_fraction(F.col("text"), n).alias("f")
            ).collect()
        }
        for doc_id, text in DOCS:
            assert got[doc_id] == _top_ngram_oracle(text, n), (doc_id, n)
    # "buy now" x4 covers everything (overlap-capped at 1.0)
    got2 = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id", top_ngram_fraction(F.col("text"), 2).alias("f")
        ).collect()
    }
    assert got2[6] == 1.0
    assert got2[0] < 0.5
