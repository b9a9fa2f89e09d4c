"""Decontamination vs a Python set-overlap oracle; broadcast-plan checks."""

from pyspark.sql import functions as F

from spatialpandas_spark.operators.contamination import (
    decontaminate,
    ngram_overlap,
)


DOCS = [
    (0, "alpha beta gamma delta epsilon zeta"),
    (1, "alpha beta gamma delta epsilon zeta eta theta"),  # superset of eval 0
    (2, "totally different words here none shared at all"),
    (3, "short doc"),  # too short for n=3 -> no shingles
    (4, None),
    (5, "alpha beta gamma something else entirely now friend"),
]

BENCH = [
    (100, "alpha beta gamma delta epsilon zeta"),
    (101, "the quick brown fox jumps"),
]


def _shingles(text, n=3):
    toks = (text or "").lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _oracle(n=3):
    bench = set()
    for _, t in BENCH:
        bench |= _shingles(t, n)
    out = {}
    for doc_id, t in DOCS:
        sh = _shingles(t, n)
        matched = len(sh & bench)
        out[doc_id] = (
            len(sh),
            matched,
            matched / len(sh) if sh else 0.0,
        )
    return out


def test_ngram_overlap_matches_set_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["total_ngrams"], r["matched_ngrams"], r["overlap"])
        for r in ngram_overlap(docs, bench, n=3).collect()
    }
    assert got == _oracle(3)
    # the fully-contained doc is 100% contaminated
    assert got[0][2] == 1.0
    # shingle-less docs survive with overlap 0, not dropped
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_decontaminate_drops_flagged(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(docs, bench, threshold=0.5, n=3).collect()
    )
    oracle = sorted(
        d for d, (_, _, ov) in _oracle(3).items() if ov < 0.5
    )
    assert kept == oracle
    assert 0 not in kept and 1 not in kept


def test_overlap_plan_broadcasts_benchmark(spark):
    from spatialpandas_spark.plans.inspect import physical_plan

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    plan = physical_plan(ngram_overlap(docs, bench, n=3))
    assert "BroadcastHashJoin" in plan
    # the corpus side is never sort-merge shuffled for the membership test
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan


def test_decontaminate_anti_join_is_broadcast(spark):
    from spatialpandas_spark.plans.inspect import physical_plan

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    plan = physical_plan(decontaminate(docs, bench, threshold=0.5, n=3))
    assert "LeftAnti, BuildRight" in plan
