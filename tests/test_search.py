"""BM25 retrieval (operators/search.py) vs a plain-python oracle
implementing the same Robertson-Spärck Jones formulas independently."""

import math

import pytest

from spatialpandas_spark.operators.search import (
    bm25_score,
    bm25_score_all,
    bm25_search,
    build_postings,
    corpus_stats,
    doc_lengths,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown dog outpaces a quick fox"),
    (3, "spark engines process large corpora of text"),
    (4, "the dog sleeps"),
    (5, ""),
]


def _py_bm25(corpus, query, k1=1.2, b=0.75):
    docs = {i: (t or "").lower().split() for i, t in corpus}
    n = len(docs)
    dls = {i: len(ts) for i, ts in docs.items()}
    avgdl = sum(dls.values()) / n
    dfreq = {}
    for ts in docs.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    scores = {}
    qterms = query.lower().split()
    for i, ts in docs.items():
        s = 0.0
        for qt in qterms:
            tf = ts.count(qt)
            if tf == 0 or qt not in dfreq:
                continue
            idf = math.log(1 + (n - dfreq[qt] + 0.5) / (dfreq[qt] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        if s > 0:
            scores[i] = s
    return scores


def test_bm25_matches_python_oracle(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    for query in ("quick fox", "dog", "spark text corpora", "quick quick"):
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_search(docs, query, k=10).collect()
        }
        exp = _py_bm25(CORPUS, query)
        assert set(got) == set(exp), query
        for did in exp:
            assert got[did] == pytest.approx(exp[did], rel=1e-12), (query, did)


def test_bm25_ranking_and_topk(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    rows = bm25_search(docs, "quick fox", k=2).collect()
    exp = _py_bm25(CORPUS, "quick fox")
    order = sorted(exp, key=lambda i: (-exp[i], i))[:2]
    assert [r["doc_id"] for r in rows] == order
    # doc 2 has 'quick' twice — should outrank doc 1 on this query
    assert rows[0]["doc_id"] == 2


def test_reusable_postings_consistent(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    postings = build_postings(docs)
    stats = corpus_stats(postings, doc_lengths(docs))
    a = {r["doc_id"]: r["score"] for r in bm25_score(postings, stats, "dog").collect()}
    b_ = {r["doc_id"]: r["score"] for r in bm25_search(docs, "dog").collect()}
    assert a == b_


def test_empty_query_and_no_match(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert bm25_search(docs, "").count() == 0
    assert bm25_search(docs, "zzznotfound").count() == 0


def _py_tfidf(corpus, dim, normalize=True):
    import zlib

    docs = {i: (t or "").lower().split() for i, t in corpus}
    n = len(docs)
    dfreq = {}
    for ts in docs.values():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for i, ts in docs.items():
        if not ts:
            continue
        v = [0.0] * dim
        for t in set(ts):
            tf = ts.count(t)
            b = zlib.crc32(t.encode()) % dim
            sign = 1.0 if zlib.crc32((t + "#s").encode()) % 2 == 0 else -1.0
            v[b] += sign * tf * (math.log((n + 1) / (dfreq[t] + 1)) + 1)
        if normalize:
            nrm = math.sqrt(sum(x * x for x in v))
            if nrm > 0:
                v = [x / nrm for x in v]
        out[i] = v
    return out


def test_hashed_tfidf_matches_python(spark):
    from spatialpandas_spark.operators.search import hashed_tfidf_vectors

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    for normalize in (True, False):
        got = {
            r["doc_id"]: list(r["vector"])
            for r in hashed_tfidf_vectors(
                docs, dim=32, normalize=normalize
            ).collect()
        }
        exp = _py_tfidf(CORPUS, 32, normalize)
        assert set(got) == set(exp)  # empty doc 5 produces no vector
        for did in exp:
            assert got[did] == pytest.approx(exp[did], abs=1e-12), did


def test_tfidf_vectors_feed_ann_surface(spark):
    """End-to-end: TF-IDF vectors into the existing embedding near-dup
    operator find the duplicated document pair."""
    from spatialpandas_spark.operators.search import hashed_tfidf_vectors
    from spatialpandas_spark.operators.similarity import brute_force_topk

    corpus = CORPUS[:4] + [(6, CORPUS[0][1])]  # doc 6 duplicates doc 1
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    vecs = hashed_tfidf_vectors(docs, dim=64)
    q = vecs.filter("doc_id = 6").selectExpr("doc_id as qid", "vector as qvec")
    top = brute_force_topk(
        q, vecs.filter("doc_id != 6"), k=1,
        query_vec="qvec", corpus_id="doc_id", corpus_vec="vector",
    ).collect()
    assert top[0]["vec_id"] == 1
    assert top[0]["sim"] == pytest.approx(1.0, abs=1e-9)


def test_empty_query_id_type_matches_postings(spark):
    """The empty-query result schema derives its id type from the
    postings (string ids here), so it unions cleanly with the normal
    scoring path instead of pinning 'long'."""
    docs = spark.createDataFrame(
        [("a", "dog runs"), ("b", "cat sits")], "doc_id string, text string"
    )
    postings = build_postings(docs)
    stats = corpus_stats(postings, doc_lengths(docs))
    empty = bm25_score_all(postings, stats, "   ")
    scored = bm25_score_all(postings, stats, "dog")
    assert empty.schema == scored.schema
    assert empty.unionByName(scored).count() == scored.count()
