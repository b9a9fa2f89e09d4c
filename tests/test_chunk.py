"""chunk_documents vs a Python sliding-window oracle; plan shape."""

import pytest

from spatialpandas_spark.operators.chunk import chunk_documents


DOCS = [
    (0, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
    (1, " ".join(f"w{i}" for i in range(4))),  # exactly one short chunk
    (2, "one"),
    (3, ""),
    (4, None),
    (5, " ".join(f"x{i}" for i in range(9))),  # n = size+overlap boundary
]


def _oracle(size, stride):
    out = []
    for doc_id, text in DOCS:
        toks = (text or "").lower().split()
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 + max(0, -(-(n - size) // stride)) if n > size else 1
        for i in range(n_chunks):
            piece = toks[i * stride : i * stride + size]
            out.append((doc_id, i, len(piece), " ".join(piece)))
    return sorted(out)


@pytest.mark.parametrize("size,stride", [(4, 3), (4, 4), (5, 2), (100, 50)])
def test_chunks_match_oracle(spark, size, stride):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, size=size, stride=stride).collect()
    )
    assert got == _oracle(size, stride)


def test_every_token_covered_and_overlap(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = chunk_documents(df, size=4, stride=3).collect()
    doc0 = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in rows if r["doc_id"] == 0
    )
    # 10 tokens, size 4 stride 3 -> chunks at 0, 3, 6 (last covers 6..9)
    assert [c for c, _ in doc0] == [0, 1, 2]
    covered = []
    for _, t in doc0:
        covered.extend(t.split())
    assert set(covered) == {f"t{i}" for i in range(10)}
    # consecutive chunks share size - stride = 1 token
    assert doc0[0][1].split()[-1] == doc0[1][1].split()[0]


def test_no_shuffle_in_plan(spark):
    from spatialpandas_spark.plans.inspect import physical_plan

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = physical_plan(chunk_documents(df, size=4, stride=3))
    assert "Exchange" not in plan


def test_rejects_bad_params(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, stride=0)
