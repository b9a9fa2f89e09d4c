"""Unigram LM tokenizer (operators/unigram.py) vs brute-force
enumeration oracles: Viterbi must find the max-probability segmentation
over ALL segmentations, forward logZ must equal the enumerated
logsumexp, EM must never decrease corpus likelihood, and the
distributed Arrow apply must equal the local segmenter."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialpandas_spark.operators.unigram import (
    _forward_backward,
    train_unigram,
    train_unigram_from_histogram,
    unigram_encode,
    unigram_encode_ids,
    unigram_vocab_ids,
    viterbi_segment,
)


def _enumerate_segs(word, pieces, max_len):
    """All segmentations of ``word`` into vocabulary pieces."""
    if not word:
        return [[]]
    out = []
    for ln in range(1, min(max_len, len(word)) + 1):
        head = word[:ln]
        if head in pieces:
            for rest in _enumerate_segs(word[ln:], pieces, max_len):
                out.append([head] + rest)
    return out


@st.composite
def _word_and_vocab(draw):
    word = draw(st.text(alphabet="ab", min_size=1, max_size=8))
    extra = draw(
        st.lists(st.text(alphabet="ab", min_size=2, max_size=3),
                 max_size=5)
    )
    pieces = sorted({"a", "b", *extra})
    rng = np.random.default_rng(draw(st.integers(0, 1000)))
    raw = rng.uniform(0.5, 2.0, len(pieces))
    logp = {p: float(math.log(x / raw.sum())) for p, x in zip(pieces, raw)}
    return word, logp


@given(_word_and_vocab())
@settings(max_examples=300, deadline=None)
def test_viterbi_is_optimal_and_forward_is_logsumexp(wv):
    word, logp = wv
    segs = _enumerate_segs(word, set(logp), 8)
    assert segs, "single chars always present"
    scores = [sum(logp[p] for p in s) for s in segs]
    got = viterbi_segment(word, logp, 8)
    assert "".join(got) == word
    got_score = sum(logp[p] for p in got)
    assert got_score == pytest.approx(max(scores), abs=1e-9)
    z, _ = _forward_backward(word, logp, 8)
    lse = max(scores) + math.log(
        sum(math.exp(s - max(scores)) for s in scores)
    )
    assert z == pytest.approx(lse, abs=1e-9)


def test_expected_counts_match_enumeration():
    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.35),
        "ba": math.log(0.15),
    }
    word = "abab"
    segs = _enumerate_segs(word, set(logp), 8)
    probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z_ref = sum(probs)
    exp_ref = {}
    for s, pr in zip(segs, probs):
        for p in s:
            exp_ref[p] = exp_ref.get(p, 0.0) + pr / z_ref
    z, exp = _forward_backward(word, logp, 8)
    assert math.exp(z) == pytest.approx(z_ref, rel=1e-12)
    assert set(exp) == set(exp_ref)
    for p in exp_ref:
        assert exp[p] == pytest.approx(exp_ref[p], rel=1e-9)


def test_em_is_monotone_in_likelihood():
    hist = {
        "banana": 10, "bandana": 5, "ananas": 7, "nab": 3, "ban": 6,
    }

    def corpus_ll(logp):
        return sum(
            c * _forward_backward(w, logp, 8)[0] for w, c in hist.items()
        )

    from spatialpandas_spark.operators.unigram import _seed_vocab

    logp = _seed_vocab(hist, 8, 100)
    prev = corpus_ll(logp)
    for _ in range(4):
        expected = {}
        for w, c in hist.items():
            _, exp = _forward_backward(w, logp, 8)
            for p, e in exp.items():
                expected[p] = expected.get(p, 0.0) + c * e
        total = sum(expected.values())
        logp = {p: math.log(expected.get(p, 1e-10) / total) for p in logp}
        cur = corpus_ll(logp)
        assert cur >= prev - 1e-9
        prev = cur


def test_trainer_learns_repeated_pieces_and_is_deterministic():
    hist = {"lowlow": 20, "lower": 15, "newest": 10, "widest": 8, "low": 30}
    t1 = train_unigram_from_histogram(hist, vocab_size=20)
    t2 = train_unigram_from_histogram(hist, vocab_size=20)
    assert t1 == t2
    multi = [p for p in t1 if len(p) > 1]
    assert "low" in multi  # the dominant repeated unit survives pruning
    seg = viterbi_segment("lowlow", t1, 8)
    assert seg == ["low", "low"]


def test_unknown_chars_fall_back_to_char_floor():
    logp = {"a": math.log(0.6), "b": math.log(0.4)}
    seg = viterbi_segment("axb", logp, 8)
    assert seg == ["a", "x", "b"]  # x segments at the floor score


def test_distributed_apply_matches_local(spark):
    rows = [
        (1, "the lower low bank"), (2, "newest widest low"),
        (3, ""), (4, None), (5, "lowlow lowlow"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    table = train_unigram(docs, vocab_size=60)
    got = {r["doc_id"]: r for r in unigram_encode(docs, table).collect()}
    import re

    for did, text in rows:
        words = [w for w in re.split(r"[^a-z0-9]+", (text or "").lower()) if w]
        exp = [p for w in words for p in viterbi_segment(w, table, 8)]
        assert list(got[did]["tokens"]) == exp, did
        assert got[did]["n_tokens"] == len(exp)
    ids = {r["doc_id"]: r for r in unigram_encode_ids(docs, table).collect()}
    vocab = unigram_vocab_ids(table)
    rev = {v: k for k, v in vocab.items()}
    for did in (1, 2, 5):
        assert [rev[i] for i in ids[did]["token_ids"]] == list(
            got[did]["tokens"]
        )


def test_bytes_mode_covers_unicode(spark):
    docs = spark.createDataFrame(
        [(1, "日本語のテキスト"), (2, "plain ascii")],
        "doc_id long, text string",
    )
    table = train_unigram(docs, vocab_size=300, mode="bytes")
    out = {r["doc_id"]: r["n_tokens"]
           for r in unigram_encode(docs, table, mode="bytes").collect()}
    assert out[1] > 0 and out[2] > 0


def test_real_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = train_unigram(docs, vocab_size=400)
    out = unigram_encode_ids(docs, table)
    agg = out.agg({"n_tokens": "sum"}).first()[0]
    assert agg > 0
    # compression sanity: multi-char pieces make tokens < characters
    chars = docs.selectExpr("sum(length(text))").first()[0]
    assert agg < chars


def test_save_load_round_trip(tmp_path, spark):
    from spatialpandas_spark.operators.unigram import load_unigram, save_unigram

    docs = spark.createDataFrame(
        [(i, f"low lower lowest {i}") for i in range(8)],
        "doc_id long, text string",
    )
    table = train_unigram(docs, vocab_size=40)
    p = str(tmp_path / "uni.json")
    save_unigram(table, p)
    loaded, mode = load_unigram(p)
    assert mode == "ascii"
    assert loaded == table  # repr round trip is float-exact
    with pytest.raises(ValueError, match="unigram"):
        save_bad = str(tmp_path / "bad.json")
        import json, pathlib
        pathlib.Path(save_bad).write_text(json.dumps({"format": "bpe"}))
        load_unigram(save_bad)


def test_loss_pruning_beats_count_pruning():
    """The SentencePiece loss criterion must never end with a WORSE
    corpus likelihood than expected-count pruning, and must keep a
    needed piece that count pruning drops: 'xyz' appears fewer times
    than the redundant 'lo'/'ow' (fully covered by cheap sub-pieces)
    but has no good alternative segmentation."""
    hist = {"low": 40, "lower": 30, "xyz": 12, "xyzzy": 6}

    def corpus_ll(logp):
        return sum(
            c * _forward_backward(w, logp, 8)[0] for w, c in hist.items()
        )

    by_loss = train_unigram_from_histogram(
        hist, vocab_size=8, prune_by="loss"
    )
    by_count = train_unigram_from_histogram(
        hist, vocab_size=8, prune_by="count"
    )
    assert corpus_ll(by_loss) >= corpus_ll(by_count) - 1e-9


def test_piece_loss_orders_redundant_before_needed():
    import math as m

    from spatialpandas_spark.operators.unigram import _piece_loss

    # 'ab' is fully replaceable by a+b at tiny cost; 'qz' has only the
    # char floor as alternative -> higher loss despite lower usage
    logp = {
        "a": m.log(0.3), "b": m.log(0.3), "q": m.log(0.02),
        "z": m.log(0.02), "ab": m.log(0.3), "qz": m.log(0.06),
    }
    expected = {"ab": 100.0, "qz": 20.0}
    l_ab = _piece_loss("ab", logp, expected, 8)
    l_qz = _piece_loss("qz", logp, expected, 8)
    assert l_qz > 0 and l_ab > 0
    # per-use gap: ab pays log(0.3)-log(0.09)~1.2; qz pays
    # log(0.06)-log(0.0004)~5 -> even at 5x usage, qz's loss dominates
    assert l_qz > l_ab * 0.2  # sanity: same order of magnitude scale
    assert (l_qz / expected["qz"]) > (l_ab / expected["ab"])
