"""remove_duplicate_spans vs a brute-force Python twin; plan shape."""

from collections import Counter

import pytest

from spatialpandas_spark.operators.spans import doc_spans, remove_duplicate_spans


BOILER = "subscribe to our newsletter for updates every week now"  # 9 tokens
DOCS = [
    (0, "alpha beta gamma delta " + BOILER),
    (1, BOILER + " unique tail content here"),
    (2, "totally original text with no repeats at all"),
    (3, BOILER),  # document that is nothing but boilerplate
    (4, ""),
    (5, None),
    (6, "alpha beta gamma delta " + BOILER),  # full dup of doc 0
]


def _spans(text, window):
    toks = (text or "").lower().split()
    return [
        (i // window, " ".join(toks[i : i + window]))
        for i in range(0, len(toks), window)
    ]


def _oracle(window, min_count, keep):
    per_doc = {d: _spans(t, window) for d, t in DOCS}
    counts = Counter(s for sp in per_doc.values() for _, s in sp)
    first = {}
    for d in sorted(per_doc):
        for i, s in per_doc[d]:
            first.setdefault(s, (d, i))
    out = []
    for d, sp in per_doc.items():
        kept = [
            s
            for i, s in sp
            if counts[s] < min_count
            or (keep == "first" and first[s] == (d, i))
        ]
        out.append((d, len(kept), " ".join(kept)))
    return sorted(out)


@pytest.mark.parametrize("window", [3, 4, 9])
@pytest.mark.parametrize("keep", ["none", "first"])
def test_matches_bruteforce(spark, window, keep):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["kept_spans"], r["text"])
        for r in remove_duplicate_spans(
            df, window=window, min_count=2, keep=keep
        ).collect()
    )
    assert got == _oracle(window, 2, keep)


def test_boilerplate_removed_originals_survive(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(df, window=3, min_count=2).collect()
    }
    assert len(out) == len(DOCS)  # every doc row survives
    assert out[2] == "totally original text with no repeats at all"
    assert out[3] == ""  # all-boilerplate doc emptied, row kept
    assert BOILER.split()[0] not in out[0]


def test_min_count_threshold(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # spans repeat at most 4x (boilerplate in docs 0,1,3,6); with
    # min_count=5 nothing is removed
    out = remove_duplicate_spans(df, window=3, min_count=5)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    for d, t in DOCS:
        expect = " ".join((t or "").lower().split())
        assert got[d] == expect


def test_doc_spans_no_shuffle(spark):
    from spatialpandas_spark.plans.inspect import physical_plan

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    assert "Exchange" not in physical_plan(doc_spans(df, window=4))


def test_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, window=0)
    with pytest.raises(ValueError):
        remove_duplicate_spans(df, keep="last")
