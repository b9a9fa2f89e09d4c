"""Dedup + text operators vs brute-force Python oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from spatialpandas_spark.operators.text import (
    avg_word_length,
    lang_id,
    quality_score,
    token_count,
)
from tests.oracles import jaccard

RNG = np.random.default_rng(5)
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _mk_docs(n=120, dup_frac=0.3):
    docs = []
    for i in range(n):
        if i > 0 and RNG.random() < dup_frac:
            # near-dup of an earlier doc: copy + small perturbation
            base = docs[int(RNG.integers(0, i))][1].split()
            k = max(1, len(base) // 20)
            for _ in range(k):
                base[int(RNG.integers(0, len(base)))] = WORDS[int(RNG.integers(0, 10))]
            docs.append((i, " ".join(base)))
        else:
            docs.append(
                (i, " ".join(WORDS[int(RNG.integers(0, 10))] for _ in range(60)))
            )
    return docs


def _shingles(text, n=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def docs_df(spark):
    docs = _mk_docs()
    return spark.createDataFrame(docs, "doc_id long, text string"), docs


def test_dedup_exact_keeps_min_id(spark, docs_df):
    df, docs = docs_df
    dup = df.union(df.withColumn("doc_id", F.col("doc_id") + 1000))
    out = dedup_exact(dup, ["text"], "doc_id")
    got = sorted(r["doc_id"] for r in out.collect())
    by_text = {}
    for i, t in docs:
        by_text.setdefault(t, []).append(i)
    expect = sorted(min(ids) for ids in by_text.values())
    assert got == expect


def test_minhash_pairs_match_true_jaccard(spark, docs_df):
    df, docs = docs_df
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(df, threshold=0.6).collect()
    }
    # every reported pair must truly be similar (estimate within tolerance)
    for (a, b), est in got.items():
        true = jaccard(_shingles(docs[a][1]), _shingles(docs[b][1]))
        assert est == pytest.approx(true, abs=0.25), (a, b)
    # high-similarity pairs must be found (recall at j >= 0.85)
    for i, (ia, ta) in enumerate(docs):
        for ib, tb in docs[i + 1 :]:
            if jaccard(_shingles(ta), _shingles(tb)) >= 0.85:
                assert (ia, ib) in got, (ia, ib)


def test_ngram_jaccard_pairs_exact_values(spark, docs_df):
    df, docs = docs_df
    rows = ngram_jaccard_pairs(df, threshold=0.7).collect()
    assert rows, "expected some near-dup pairs in constructed corpus"
    for r in rows:
        true = jaccard(_shingles(docs[r["id_a"]][1]), _shingles(docs[r["id_b"]][1]))
        assert r["jaccard"] == pytest.approx(true, rel=1e-9)
        assert true >= 0.7


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different words entirely unrelated content here now")],
        "doc_id long, text string",
    )
    rows = simhash_pairs(df, max_hamming=3, bands=8).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_token_count_and_avg_word_length(spark):
    df = spark.createDataFrame(
        [(1, "  hello   world  "), (2, ""), (3, "a"), (4, "one two three")],
        "id long, text string",
    )
    rows = {
        r["id"]: (r["tc"], r["awl"])
        for r in df.select(
            "id",
            token_count(F.col("text")).alias("tc"),
            avg_word_length(F.col("text")).alias("awl"),
        ).collect()
    }
    assert rows[1] == (2, 5.0)
    assert rows[2] == (0, 0.0)
    assert rows[3] == (1, 1.0)
    assert rows[4][0] == 3 and rows[4][1] == pytest.approx(11 / 3)


def test_lang_id_on_clear_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it was good"),
            (2, "der Hund ist nicht mit der Katze und das ist gut"),
            (3, "le chat est dans la maison et il est pour les amis"),
            (4, "el perro es un animal y los gatos no son para el agua"),
            (5, "xyzzy plugh quux"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["l"] for r in df.select("id", lang_id(F.col("text")).alias("l")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_quality_score_bounded(spark, docs_df):
    df, _ = docs_df
    rows = df.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_content_hash_null_vs_empty_and_separator_injection(spark):
    from spatialpandas_spark.operators.dedup import content_hash

    df = spark.createDataFrame(
        [
            (1, None, ""),        # NULL vs empty string must differ
            (2, "", ""),
            (3, "a\x1fb", ""),    # separator inside a field must not merge
            (4, "a", "b"),
            (5, "a", "b"),        # true duplicate of 4
        ],
        "id long, a string, b string",
    )
    h = df.select(
        "id", content_hash(F.col("a"), F.col("b")).alias("h")
    ).collect()
    hashes = {r["id"]: r["h"] for r in h}
    assert hashes[1] != hashes[2]
    assert hashes[3] != hashes[4]
    assert hashes[4] == hashes[5]


def test_bpe_token_count_edges(spark):
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [
            (1, "Hello world, it's 2026!"),
            (2, ""),
            (3, None),
            (4, "a1b2!?c"),
        ],
        "id long, txt string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", bpe_token_count(F.col("txt")).alias("n")
        ).collect()
    }
    # Hello | ' world' | ',' | ' it' | 's | ' 2026' | '!' -> 7
    assert got[1] == 7
    assert got[2] == 0
    assert got[3] == 0
    assert got[4] == 6  # a|1|b|2|!?|c


def test_lsh_band_plan_midpoints():
    from spatialpandas_spark.operators.dedup import lsh_band_plan

    # high threshold -> wide bands (many rows); low threshold -> many bands
    b_hi, r_hi = lsh_band_plan(0.9, 64)
    b_lo, r_lo = lsh_band_plan(0.3, 64)
    assert b_hi * r_hi == 64 and b_lo * r_lo == 64
    assert r_hi > r_lo and b_lo > b_hi
    # the default gate config (16 bands of 4) is near the 0.5 sweet spot
    assert lsh_band_plan(0.5, 64) in [(16, 4), (8, 8), (32, 2)]


def test_embedding_band_bits_scales_with_n():
    from spatialpandas_spark.operators.dedup import embedding_band_bits

    assert embedding_band_bits(10_000, bands=4) == 14
    assert embedding_band_bits(10**8, bands=4) == 15  # clamped to 63//4
    assert embedding_band_bits(1, bands=4) == 1
