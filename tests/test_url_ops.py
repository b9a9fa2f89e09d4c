"""URL / domain curation ops (operators/text.py) vs a straightforward
python oracle, plus a plan assertion that the blocklist join is an
equi-join (broadcast hash), never a nested-loop endswith scan."""

import re

from pyspark.sql import functions as F

from spatialpandas_spark.operators.text import (
    doc_hosts,
    extract_urls,
    filter_blocklisted_hosts,
    host_counts,
    host_suffixes,
    url_host,
)

DOCS = [
    (1, "see https://Example.com/page and http://sub.example.com/x?y=1 twice"),
    (2, "no urls at all"),
    (3, "mixed http://spam.bad.net/a text https://ok.org"),
    (4, "dup https://ok.org https://ok.org trailing"),
    (5, None),
    (6, "edge https://bad.net. and (https://other.io/path)"),
]


def _py_urls(text):
    return re.findall(r"https?://[^\s\"'<>]+", text or "")


def _py_host(url):
    m = re.match(r"https?://([^/?#]+)", url)
    if not m:
        return None
    host = m.group(1)
    if "@" in host:
        host = host.split("@", 1)[1]
    return host.split(":", 1)[0].lower()


def test_extract_urls_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select("doc_id", extract_urls(F.col("text")).alias("u")).collect()
    }
    for did, text in DOCS:
        if text is None:
            assert got[did] is None  # null in, null out (SQL semantics)
        else:
            assert list(got[did]) == _py_urls(text), did


def test_doc_hosts_distinct_lowercase(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", doc_hosts(F.col("text")).alias("h")).collect()
    }
    for did, text in DOCS:
        if text is None:
            assert got[did] is None
            continue
        exp = sorted({h for h in map(_py_host, _py_urls(text)) if h})
        assert sorted(got[did]) == exp, (did, got[did], exp)


def test_host_suffixes(spark):
    df = spark.createDataFrame([("a.b.co",), ("solo",)], "h string")
    got = [r["s"] for r in df.select(host_suffixes(F.col("h")).alias("s")).collect()]
    assert got[0] == ["a.b.co", "b.co", "co"]
    assert got[1] == ["solo"]


def test_host_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["host"]: (r["n_docs"], r["n_refs"])
        for r in host_counts(df).collect()
    }
    # ok.org: docs 3,4 -> n_docs=2; refs 1+2=3
    assert got["ok.org"] == (2, 3)
    assert got["example.com"] == (1, 1)
    assert got["sub.example.com"] == (1, 1)


def test_filter_blocklisted_hosts_subdomains(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = filter_blocklisted_hosts(df, ["example.com", "bad.net"])
    kept = sorted(r["doc_id"] for r in out.collect())
    # doc 1: example.com + sub.example.com -> blocked (incl. subdomain)
    # doc 3: spam.bad.net -> blocked via suffix
    # doc 6: 'bad.net.' parses to host 'bad.net.' whose suffix chain
    #        contains 'net.' and 'bad.net.' — trailing dot means NO match
    #        (kept); docs 2,4,5 keep trivially
    assert kept == [2, 4, 5, 6]


def test_blocklist_dataframe_input_and_no_url_docs_kept(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    bl = spark.createDataFrame([("ok.org",)], "host string")
    kept = sorted(r["doc_id"] for r in filter_blocklisted_hosts(df, bl).collect())
    assert kept == [1, 2, 5, 6]


def test_blocklist_join_is_hash_not_nested_loop(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = filter_blocklisted_hosts(df, ["bad.net"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_url_host_column(spark):
    df = spark.createDataFrame(
        [("https://A.B.C:8080/path?q=1",), ("http://user@host.io/x",)], "u string"
    )
    got = [r[0] for r in df.select(url_host(F.col("u"))).collect()]
    assert got == ["a.b.c", "host.io"]


def test_corpus_profile(spark):
    from spatialpandas_spark.operators.text import corpus_profile

    corpus = [
        (1, "the cat sat on the mat here now"),
        (2, "the cat sat on the mat here now"),   # exact dup of 1
        (3, "The  cat sat on the mat here NOW"),  # dup after normalize
        (4, "der hund und die katze und der vogel"),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    row = corpus_profile(df).collect()[0]
    assert row["n_docs"] == 6
    assert row["n_empty"] == 2
    assert row["total_tokens"] == 8 * 4  # four 8-token docs
    assert row["avg_tokens"] == 32 / 6
    assert row["p50_tokens"] == 8.0  # sorted [0,0,8,8,8,8] -> median 8
    assert row["p90_tokens"] == 8.0
    assert row["top_lang"] == "en"
    assert row["n_langs"] == 3  # en, de, und(empty/null)
    # docs 1,2 identical; doc 3 identical after normalize -> 2 distinct of 4
    assert row["exact_dup_rate"] == 0.5
