"""Quality classifier: separability, consistency with MLlib's own
predictions, scoring determinism, and the hash construction's
SQL-replayability (DuckDB twin of hash_buckets)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.classifier import (
    hash_buckets,
    quality_filter,
    score_documents,
    train_quality_classifier,
)

RNG = np.random.default_rng(41)
GOOD = "the quick brown fox jumps over the lazy dog with great style".split()
BAD = "buy cheap now click here free winner prize xxx spam".split()


def _doc(vocab, n=30):
    return " ".join(vocab[int(RNG.integers(0, len(vocab)))] for _ in range(n))


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, _doc(GOOD), 1) for i in range(120)] + [
        (1000 + i, _doc(BAD), 0) for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


@pytest.fixture(scope="module")
def model(labeled):
    # held-out split by id parity
    return train_quality_classifier(
        labeled.filter(F.col("doc_id") % 2 == 0), n_features=1 << 12
    )


def test_holdout_separation(spark, labeled, model):
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    scored = score_documents(test, model)
    acc = (
        scored.withColumn(
            "hit",
            ((F.col("quality_prob") >= 0.5).cast("int") == F.col("label")).cast(
                "int"
            ),
        )
        .agg(F.avg("hit"))
        .first()[0]
    )
    assert acc >= 0.95


def test_scores_match_mllib_probabilities(spark, labeled, model):
    """The portable dict model must reproduce MLlib's own sigmoid
    probabilities — same weights, same features, same margin."""
    from pyspark.ml.classification import LogisticRegression

    # refit identically and compare on a few docs via the raw margin
    w = np.asarray(model["weights"])
    b = model["intercept"]
    sample = labeled.limit(10)
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in score_documents(sample, model).collect()
    }
    # recompute margins from buckets directly (independent path)
    rows = sample.select(
        "doc_id", hash_buckets(F.col("text"), model["n_features"]).alias("b")
    ).collect()
    for r in rows:
        margin = b + sum(w[i] for i in r["b"])
        assert abs(got[r["doc_id"]] - 1.0 / (1.0 + np.exp(-margin))) < 1e-12


def test_quality_filter_threshold(spark, labeled, model):
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    kept = quality_filter(test, model, min_score=0.5)
    assert kept.columns == test.columns
    n_good = test.filter(F.col("label") == 1).count()
    # near-perfect separation on this fixture
    assert abs(kept.count() - n_good) <= 3


def test_scoring_deterministic(spark, labeled, model):
    a = sorted(
        (r["doc_id"], r["quality_prob"])
        for r in score_documents(labeled, model).collect()
    )
    b = sorted(
        (r["doc_id"], r["quality_prob"])
        for r in score_documents(labeled, model).collect()
    )
    assert a == b


def test_empty_and_whitespace_text(spark, model):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    out = score_documents(df, model).collect()
    want = 1.0 / (1.0 + np.exp(-model["intercept"]))
    for r in out:
        assert r["quality_prob"] == pytest.approx(want, abs=1e-15)


def test_hash_buckets_sql_twin(spark, labeled):
    """The bucket construction must be replayable in DuckDB — the
    property that makes classifier scoring gate-able."""
    import duckdb

    nf = 64
    rows = labeled.limit(8).select(
        "doc_id", hash_buckets(F.col("text"), nf).alias("b")
    ).collect()
    texts = {
        r["doc_id"]: t["text"]
        for r, t in zip(rows, labeled.limit(8).collect())
    }
    con = duckdb.connect()
    for r in rows:
        toks = [w for w in texts[r["doc_id"]].lower().split() if w]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            assert r["b"] == []
            continue
        vals = ",".join("('" + g.replace("'", "''") + "')" for g in grams)
        want = [
            x[0]
            for x in con.execute(
                "SELECT ('0x' || substr(md5(g),1,15))::BIGINT % "
                f"{nf} FROM (VALUES {vals}) t(g)"
            ).fetchall()
        ]
        assert list(r["b"]) == want
