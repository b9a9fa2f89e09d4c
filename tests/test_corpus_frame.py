"""CorpusFrame facade: every method must delegate exactly to its
operator (same rows), and the chained end-to-end flow must run on real
fixture data. The facade has no logic of its own, so the tests pin
delegation equality, not re-derive operator semantics."""

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.corpus import CorpusFrame

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near https://ok.org"),
    (2, "the quick brown fox jumps over the lazy dog near https://ok.org"),
    (3, "ein kleiner deutscher text und noch mehr und der hund"),
    (4, "x"),
    (5, "spam content here see http://bad.example/now"),
]


@pytest.fixture()
def cf(spark):
    return CorpusFrame(spark.createDataFrame(CORPUS, "doc_id long, text string"))


def test_profile_and_host_counts_delegate(cf):
    from spatialpandas_spark.operators.text import corpus_profile, host_counts

    assert cf.profile().collect() == corpus_profile(cf.df).collect()
    assert sorted(cf.host_counts().collect()) == sorted(host_counts(cf.df).collect())


def test_filters_chain(cf):
    out = (
        cf.filter_language(["en"])
        .filter_blocklisted_hosts(["bad.example"])
        .dedup_exact()
    )
    kept = sorted(r["doc_id"] for r in out.df.collect())
    # en docs: 1, 2, 5 ('x' and german drop); 5 blocked; 2 is an exact dup of 1
    assert kept == [1]


def test_scrub_changes_text(cf):
    out = cf.scrub_pii().df.filter("doc_id = 1").first()["text"]
    assert "<URL>" in out and "https://" not in out


def test_tokenize_and_bm25_and_vectors(cf):
    merges = cf.train_bpe(n_merges=10)
    toks = cf.tokenize(merges).collect()
    ids = cf.tokenize(merges, ids=True).collect()
    assert {r["doc_id"] for r in toks} == {1, 2, 3, 4, 5}
    assert all(isinstance(r["token_ids"][0], int) for r in ids if r["n_tokens"])
    top = cf.bm25("quick fox", k=2).collect()
    assert [r["doc_id"] for r in top] == [1, 2]
    vecs = cf.tfidf_vectors(dim=16).collect()
    assert all(len(r["vector"]) == 16 for r in vecs)


def test_decontaminate(cf, spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = cf.decontaminate(bench, max_overlap=0.3)
    kept = {r["doc_id"] for r in out.df.collect()}
    assert 1 not in kept and 2 not in kept  # heavy 5-gram overlap
    assert 3 in kept


def test_shard_sink(cf, tmp_path):
    merges = cf.train_bpe(n_merges=5)
    stats = cf.write_training_shards(merges, str(tmp_path / "s"), shard_tokens=20)
    assert stats["n_docs"] == 5 and stats["total_tokens"] > 0


def test_fixture_end_to_end(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c = CorpusFrame(docs)
    prof = c.profile().first()
    assert prof["n_docs"] == docs.count()
    filtered = c.filter_quality(0.2).dedup_exact()
    assert 0 < filtered.count() <= prof["n_docs"]


def test_pack_sequences_delegates(spark):
    """Facade == direct operator with inline BPE-count weights."""
    from pyspark.sql import functions as F

    from spatialpandas_spark.corpus import CorpusFrame
    from spatialpandas_spark.operators.shards import pack_token_sequences
    from spatialpandas_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [(i, "tok " * (i % 7)) for i in range(40)], "doc_id long, text string"
    )
    via_facade = sorted(
        (r["doc_id"], r["seq_id"], r["doc_offset"], r["n_tokens_in_seq"])
        for r in CorpusFrame(df).pack_sequences(16).collect()
    )
    direct = sorted(
        (r["doc_id"], r["seq_id"], r["doc_offset"], r["n_tokens_in_seq"])
        for r in pack_token_sequences(
            df.withColumn(
                "__w", bpe_token_count(F.col("text")).cast("long")
            ),
            "__w",
            ["doc_id"],
            16,
        ).collect()
    )
    assert via_facade == direct and len(direct) > 0


def test_training_sequences_end_to_end(spark):
    """tokenize -> layout -> materialize through the facade: sequences
    reassemble the exact tokenized stream in doc order."""
    from spatialpandas_spark.corpus import CorpusFrame
    from spatialpandas_spark.operators.bpe import bpe_encode_ids

    df = spark.createDataFrame(
        [(i, ("alpha beta gamma " * (i % 5 + 1)).strip())
         for i in range(30)],
        "doc_id long, text string",
    )
    merges = [("a", "l"), ("b", "e"), ("g", "a")]
    L = 32
    rows = CorpusFrame(df).training_sequences(merges, L).collect()
    toks = bpe_encode_ids(df, merges).orderBy("doc_id").collect()
    stream = [t for r in toks for t in r["token_ids"]]
    got = {r["seq_id"]: list(r["token_ids"]) for r in rows}
    exp = {
        s: stream[s * L : (s + 1) * L]
        for s in range((len(stream) + L - 1) // L)
    }
    assert got == exp


def test_pack_examples_delegates(spark):
    """Facade == direct pack_documents_nextfit with inline BPE weights."""
    from pyspark.sql import functions as F

    from spatialpandas_spark.corpus import CorpusFrame
    from spatialpandas_spark.operators.shards import pack_documents_nextfit
    from spatialpandas_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [(i, "tok " * (i % 9)) for i in range(60)], "doc_id long, text string"
    )
    via_facade = sorted(
        (r["doc_id"], r["grp"], r["bin"], r["oversized"])
        for r in CorpusFrame(df).pack_examples(12, group_size=16).collect()
    )
    direct = sorted(
        (r["doc_id"], r["grp"], r["bin"], r["oversized"])
        for r in pack_documents_nextfit(
            df.withColumn(
                "__w", bpe_token_count(F.col("text")).cast("long")
            ),
            "__w",
            ["doc_id"],
            12,
            group_size=16,
        ).collect()
    )
    assert via_facade == direct and len(direct) > 0


def test_sketch_and_overlap_delegate(spark):
    """Facade sketch/overlap == direct operator calls, including a
    different text column name on the other side."""
    from spatialpandas_spark.operators.sketch import (
        kmv_overlap,
        shingle_sketch,
    )

    a = spark.createDataFrame(
        [(i, " ".join(f"a{i}_{j}" for j in range(10))) for i in range(30)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, " ".join(f"a{i}_{j}" for j in range(10))) for i in range(15)]
        + [(i, " ".join(f"b{i}_{j}" for j in range(10))) for i in range(15, 30)],
        "doc_id long, body string",
    )
    ca = CorpusFrame(a)
    cb = CorpusFrame(b, text_col="body")
    k = 64
    assert sorted(map(tuple, ca.sketch(k=k).collect())) == sorted(
        map(tuple, shingle_sketch(a, "text", n=5, k=k).collect())
    )
    via = ca.overlap(cb, k=k).collect()[0]
    direct = kmv_overlap(
        shingle_sketch(a, "text", n=5, k=k),
        shingle_sketch(b, "body", n=5, k=k),
        k,
    ).collect()[0]
    assert via == direct
    # half of b's docs share a's text -> containment_b around 0.5
    assert 0.3 < via["containment_b"] < 0.7


def test_decontaminate_screened(cf, spark):
    """Clean benchmark -> screen clears it and the frame is returned
    UNCHANGED (same object: the exact pass never ran); contaminated
    benchmark -> result equals the plain exact pass."""
    clean_bench = spark.createDataFrame(
        [(200, "völlig anderes material ohne gemeinsame fünfgramme hier drin")],
        "doc_id long, text string",
    )
    out = cf.decontaminate_screened(clean_bench, max_overlap=0.3)
    assert out is cf

    dirty_bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    screened = cf.decontaminate_screened(dirty_bench, max_overlap=0.3)
    exact = cf.decontaminate(dirty_bench, max_overlap=0.3)
    assert screened is not cf
    assert sorted(r["doc_id"] for r in screened.df.collect()) == sorted(
        r["doc_id"] for r in exact.df.collect()
    )


def test_distinct_ngrams_per_source(spark):
    """Facade == kmv_summary over the grouped shingle sketch; small
    groups report exact counts."""
    from spatialpandas_spark.operators.sketch import (
        kmv_summary,
        shingle_sketch,
    )

    df = spark.createDataFrame(
        [
            (i, "web" if i % 2 else "code",
             " ".join(f"t{i}_{j}" for j in range(7)))
            for i in range(40)
        ],
        "doc_id long, source string, text string",
    )
    cf = CorpusFrame(df)
    got = sorted(map(tuple, cf.distinct_ngrams(by="source", n=3, k=256).collect()))
    want = sorted(
        map(
            tuple,
            kmv_summary(
                shingle_sketch(df, "text", n=3, k=256, group_cols=["source"]),
                256,
                group_cols=["source"],
            ).collect(),
        )
    )
    assert got == want
    # 20 docs x 5 trigrams per doc, all distinct -> exact counts of 100
    for src, n_hashes, kth, est in got:
        assert n_hashes == 100 and est == 100.0


def test_dedup_near_delegates(spark):
    """Facade == direct operator; the duplicated doc collapses to the
    smallest id while distinct docs survive."""
    from spatialpandas_spark.operators.dedup import dedup_near

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely different material about spark pipelines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via = sorted(r["doc_id"] for r in CorpusFrame(df).dedup_near().df.collect())
    direct = sorted(r["doc_id"] for r in dedup_near(df).collect())
    assert via == direct
    assert 1 in via and 2 not in via and 3 in via


def test_overlap_matrix_delegates(spark):
    from spatialpandas_spark.operators.sketch import (
        kmv_overlap_matrix,
        shingle_sketch,
    )

    df = spark.createDataFrame(
        [
            (i, f"s{i % 3}", " ".join(f"m{i}_{j}" for j in range(7)))
            for i in range(30)
        ],
        "doc_id long, source string, text string",
    )
    via = sorted(
        map(tuple, CorpusFrame(df).overlap_matrix(n=3, k=32).collect())
    )
    direct = sorted(
        map(
            tuple,
            kmv_overlap_matrix(
                shingle_sketch(df, "text", n=3, k=32, group_cols=["source"]),
                32,
                "source",
            ).collect(),
        )
    )
    assert via == direct and len(via) == 3


def test_sample_pps_delegates(spark):
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.sampling import systematic_sample
    from spatialpandas_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [(i, "tok " * (i % 13 + 1)) for i in range(80)],
        "doc_id long, text string",
    )
    via = sorted(
        (r["doc_id"], r["n_hits"])
        for r in CorpusFrame(df).sample_pps(step=17).df.collect()
    )
    direct = sorted(
        (r["doc_id"], r["n_hits"])
        for r in systematic_sample(
            df.withColumn("__w", bpe_token_count(F.col("text")).cast("long")),
            "__w",
            ["doc_id"],
            17,
        ).collect()
    )
    assert via == direct and len(via) > 0


def test_containment_facade_small_in_large(spark):
    """CorpusFrame.containment: the direct probe — exact 1.0 for a tiny
    fully-contained benchmark regardless of corpus size (the regime the
    union-jaccard screen can't resolve)."""
    corpus = CorpusFrame(
        spark.createDataFrame(
            [
                (i, " ".join(f"c{i}w{j}" for j in range(8)))
                for i in range(2000)
            ],
            "doc_id long, text string",
        )
    )
    bench = spark.createDataFrame(
        [
            (7, " ".join(f"c7w{j}" for j in range(8))),
            (42, " ".join(f"c42w{j}" for j in range(8))),
        ],
        "doc_id long, body string",
    )
    row = corpus.containment(CorpusFrame(bench, text_col="body")).collect()[0]
    assert row["exact"] and row["containment_b"] == 1.0


def test_decontaminate_screened_small_in_large_not_skipped(spark):
    """REGRESSION (ADVICE r8): a fully-contaminated benchmark that is
    tiny relative to the corpus must NOT be screened out — the old
    union-jaccard screen read containment ~0 here and silently skipped
    the exact pass."""
    texts = {
        i: " ".join(f"c{i}w{j}" for j in range(8)) for i in range(2000)
    }
    corpus = CorpusFrame(
        spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
    )
    dirty = spark.createDataFrame(
        [(900, texts[3]), (901, texts[1044])], "doc_id long, text string"
    )
    screened = corpus.decontaminate_screened(dirty, max_overlap=0.3)
    assert screened is not corpus, "contaminated benchmark was skipped"
    kept = {r["doc_id"] for r in screened.df.collect()}
    assert 3 not in kept and 1044 not in kept
    assert len(kept) == 1998

    # and a genuinely clean benchmark still short-circuits (exact probe)
    clean = spark.createDataFrame(
        [(0, " ".join(f"z0w{j}" for j in range(8)))],
        "doc_id long, text string",
    )
    assert corpus.decontaminate_screened(clean, max_overlap=0.3) is corpus


def test_screen_benchmarks_one_scan(spark):
    """Many benchmarks screened in one corpus scan: per-benchmark rows
    equal the individual containment probes."""
    texts = {
        i: " ".join(f"c{i}w{j}" for j in range(8)) for i in range(300)
    }
    corpus = CorpusFrame(
        spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
    )
    benches = spark.createDataFrame(
        [("contained", 0, texts[5]), ("contained", 1, texts[77])]
        + [("foreign", 0, "zz yy xx ww vv uu tt ss rr qq pp oo")],
        "benchmark string, doc_id long, text string",
    )
    rows = {
        r["benchmark"]: r
        for r in corpus.screen_benchmarks(benches, k=256).collect()
    }
    assert rows["contained"]["containment_b"] == 1.0
    assert rows["foreign"]["containment_b"] == 0.0
    for name in ("contained", "foreign"):
        solo = corpus.containment(
            benches.filter(F.col("benchmark") == name), k=256
        ).collect()[0]
        got = rows[name]
        assert (got["n_probed"], got["n_found"], got["containment_b"]) == (
            solo["n_probed"], solo["n_found"], solo["containment_b"]
        )


def test_screen_benchmarks_zero_shingle_group(spark):
    """A benchmark group whose every text is shorter than n words
    produces zero shingles; it must still get a summary row
    (n_probed=0) so callers can tell 'screened clean' from 'not
    screened' (ADVICE r9)."""
    corpus = CorpusFrame(
        spark.createDataFrame(
            [(i, " ".join(f"c{i}w{j}" for j in range(8))) for i in range(50)],
            "doc_id long, text string",
        )
    )
    benches = spark.createDataFrame(
        [("normal", 0, " ".join(f"c5w{j}" for j in range(8))),
         ("tiny", 0, "a b c")],  # 3 words < n=5 -> zero shingles
        "benchmark string, doc_id long, text string",
    )
    rows = {
        r["benchmark"]: r
        for r in corpus.screen_benchmarks(benches, k=256).collect()
    }
    assert set(rows) == {"normal", "tiny"}
    t = rows["tiny"]
    assert (t["n_probed"], t["n_found"], t["containment_b"], t["exact"]) == (
        0, 0, 0.0, True,
    )
    assert rows["normal"]["containment_b"] == 1.0


def test_binom_ucb_exact_clopper_pearson():
    """_binom_ucb is the exact one-sided Clopper-Pearson upper bound:
    matches the closed form at n_found=0, is strictly wider than the
    rule-of-three shortcut ADVICE r9 flagged as anti-conservative, and
    its coverage holds (binomial CDF at the bound <= alpha)."""
    import math

    from spatialpandas_spark.corpus import _binom_ucb

    # closed form at zero successes: 1 - alpha**(1/n)
    for n in (16, 512, 8192):
        want = 1 - 0.025 ** (1 / n)
        assert abs(_binom_ucb(0, n) - want) < 1e-9

    # strictly wider than (nf+3)/n for nf >= 1 (the flagged shortcut)
    for nf in (1, 2, 5, 8):
        assert _binom_ucb(nf, 8192) > (nf + 3) / 8192

    # exact coverage: P(X <= nf | n, ub) <= alpha, independently computed
    def cdf(nf, n, p):
        return sum(
            math.comb(n, i) * p**i * (1 - p) ** (n - i)
            for i in range(nf + 1)
        )

    for nf, n in ((0, 100), (1, 16), (5, 8192), (40, 500)):
        ub = _binom_ucb(nf, n)
        assert cdf(nf, n, ub) <= 0.025 + 1e-9
        # tightness: nudging below the bound exceeds alpha
        assert cdf(nf, n, ub * 0.98) > 0.025

    # edges
    assert _binom_ucb(0, 0) == 1.0 and _binom_ucb(5, 5) == 1.0


def test_corpus_frame_decon_index_facades(spark, tmp_path):
    """index_benchmarks / screen_index / decontaminate_indexed delegate
    to the persistent-index operators and match the one-shot methods."""
    texts = {i: " ".join(f"f{i}w{j}" for j in range(8)) for i in range(60)}
    corpus = CorpusFrame(
        spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    )
    bench = spark.createDataFrame(
        [("ev", 0, texts[7]), ("ev", 1, texts[9])],
        "benchmark string, doc_id long, text string",
    )
    path = str(tmp_path / "ix")
    CorpusFrame(bench).index_benchmarks(path, n=3)
    got = sorted(map(tuple, corpus.screen_index(path).collect()))
    want = sorted(
        map(tuple, corpus.screen_benchmarks(bench, n=3, k=8192).collect())
    )
    assert got == want
    for method in ("broadcast", "bloom"):
        kept = corpus.decontaminate_indexed(
            path, max_overlap=0.3, method=method
        )
        want_kept = corpus.decontaminate(bench, max_overlap=0.3, n=3)
        assert sorted(r["doc_id"] for r in kept.df.collect()) == sorted(
            r["doc_id"] for r in want_kept.df.collect()
        )
    assert kept.count() == 58


def test_filter_language_classifier_and_languages(cf, spark):
    """The classifier path keeps english rows and drops the german one
    (the shipped model, unlike the heuristic, also covers non-latin
    scripts); languages() profiles the distribution."""
    kept = sorted(
        r["doc_id"] for r in cf.filter_language(["en"]).df.collect()
    )
    assert 3 not in kept and {1, 2} <= set(kept)
    mixed = CorpusFrame(
        spark.createDataFrame(
            CORPUS + [(6, "они мы как из у который то за свой весь год")],
            "doc_id long, text string",
        )
    )
    langs = {r["lang_pred"]: r["n_docs"] for r in mixed.languages().collect()}
    assert langs.get("ru") == 1
    kept_ru = [r["doc_id"] for r in mixed.filter_language(["ru"]).df.collect()]
    assert kept_ru == [6]
    with pytest.raises(ValueError, match="method"):
        cf.filter_language(["en"], method="nope")
