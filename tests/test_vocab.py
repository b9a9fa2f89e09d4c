"""term_counts / top_terms vs a Python Counter oracle."""

from collections import Counter

from spatialpandas_spark.operators.text import term_counts, top_terms


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "  "),
    (3, "CAT the Cat"),
    (4, None),
]


def _oracle():
    tf, df = Counter(), Counter()
    for _, text in DOCS:
        toks = (text or "").lower().split()
        tf.update(toks)
        df.update(set(toks))
    return tf, df


def test_term_counts_matches_counter(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["term"]: (r["tf"], r["df"]) for r in term_counts(df).collect()}
    tf, dfc = _oracle()
    assert got == {t: (tf[t], dfc[t]) for t in tf}
    assert got["the"] == (4, 3)
    assert got["cat"] == (3, 2)


def test_top_terms_order_and_tiebreak(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [r["term"] for r in top_terms(df, k=3).collect()]
    # tf: the=4, cat=3, sat=2, then alphabetical
    assert got == ["the", "cat", "sat"]


def test_top_terms_uses_take_ordered(spark):
    from spatialpandas_spark.plans.inspect import physical_plan

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = physical_plan(top_terms(df, k=3))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
