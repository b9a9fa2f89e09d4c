"""BPE tokenizer (operators/bpe.py) vs independent reference
implementations: a recount-from-scratch trainer (no incremental index,
no heap) must produce the IDENTICAL merge list, and a rank-free
iterative reference segmenter the identical segmentation. Plus
hypothesis properties (lossless rejoin, determinism) and the
distributed apply path."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spatialpandas_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_vocab,
    segment_word,
    train_bpe,
    train_bpe_from_histogram,
    word_histogram,
)


def ref_train(hist: dict, n_merges: int):
    """Reference trainer: full recount every iteration, explicit
    max-with-tiebreak — O(words * len) per merge, obviously correct."""
    words = {w: list(w) + [END] for w in hist}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for w, syms in words.items():
            c = hist[w]
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        pc = {p: c for p, c in pc.items() if c > 0}
        if not pc:
            break
        # max count; ties -> lexicographically smallest pair
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def ref_segment(word: str, merges) -> list:
    """Reference segmenter: replay the merge LIST in training order
    (equivalent to rank-greedy for BPE merge lists; asserted so)."""
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


WORDS = st.text(alphabet="abcde", min_size=1, max_size=8)


@settings(max_examples=40, deadline=None)
@given(
    hist=st.dictionaries(WORDS, st.integers(1, 50), min_size=1, max_size=30),
    n=st.integers(1, 40),
)
def test_trainer_matches_reference(hist, n):
    assert train_bpe_from_histogram(hist, n) == ref_train(hist, n)


@settings(max_examples=60, deadline=None)
@given(
    hist=st.dictionaries(WORDS, st.integers(1, 20), min_size=1, max_size=15),
    word=WORDS,
    n=st.integers(1, 25),
)
def test_segmenter_matches_reference_and_rejoins(hist, word, n):
    merges = train_bpe_from_histogram(hist, n)
    ranks = {m: i for i, m in enumerate(merges)}
    seg = segment_word(word, ranks)
    assert seg == ref_segment(word, merges)
    assert "".join(seg) == word + END  # lossless


def test_known_tiny_example():
    # the classic Sennrich toy corpus
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_histogram(hist, 4)
    assert merges == ref_train(hist, 4)
    # 'est</w>' forms within the first merges (most frequent suffix)
    joined = [a + b for a, b in merges]
    assert "est" in joined or ("es" in joined and any("t" in m for m in joined))


def test_merge_list_exhausts_gracefully():
    merges = train_bpe_from_histogram({"ab": 1}, 100)
    # 'a b </w>' admits exactly 2 merges
    assert len(merges) == 2
    assert bpe_vocab(merges) == [a + b for a, b in merges]


def test_determinism_under_dict_order():
    h1 = {"abc": 3, "abd": 3, "xyz": 3}
    h2 = dict(reversed(list(h1.items())))
    assert train_bpe_from_histogram(h1, 6) == train_bpe_from_histogram(h2, 6)


def test_word_histogram_and_train_distributed(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "THE dog!")],
        "doc_id long, text string",
    )
    hist = {r["word"]: r["n"] for r in word_histogram(docs).collect()}
    assert hist == {"the": 3, "cat": 2, "sat": 1, "ran": 1, "dog": 1}
    merges = train_bpe(docs, n_merges=5)
    assert merges == ref_train(hist, 5)


def test_bpe_encode_distributed_matches_local(spark):
    texts = [
        (1, "lowest lower low"),
        (2, "the newest widest"),
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    hist = {r["word"]: r["n"] for r in word_histogram(docs).collect()}
    merges = train_bpe_from_histogram(hist, 10)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    ranks = {m: i for i, m in enumerate(merges)}
    for did, text in texts:
        exp = []
        for w in (text or "").lower().split():
            w = "".join(ch for ch in w if ch.isalnum())
            if w:
                exp.extend(segment_word(w, ranks))
        assert out[did]["tokens"] == exp, did
        assert out[did]["n_tokens"] == len(exp)


def test_bpe_encode_ids_matches_string_path(spark):
    from spatialpandas_spark.operators.bpe import bpe_encode_ids, bpe_vocab_ids

    docs = spark.createDataFrame(
        [(1, "lowest newest"), (2, "zz9 low"), (3, None)],
        "doc_id long, text string",
    )
    hist = {r["word"]: r["n"] for r in word_histogram(docs).collect()}
    merges = train_bpe_from_histogram(hist, 8)
    vocab = bpe_vocab_ids(merges)
    strs = {r["doc_id"]: r["tokens"] for r in bpe_encode(docs, merges).collect()}
    ids = {r["doc_id"]: r["token_ids"] for r in bpe_encode_ids(docs, merges).collect()}
    for did in (1, 2, 3):
        assert ids[did] == [vocab.get(t, 0) for t in strs[did]], did
    # determinism + UNK floor
    assert vocab["<unk>"] == 0 and vocab[END] == 1
    assert all(i >= 0 for i in ids[2])


def test_encode_scales_shape(spark):
    # 500 docs from a zipfy vocabulary through the Arrow path
    rng = np.random.default_rng(0)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    p = np.array([0.4, 0.25, 0.15, 0.1, 0.06, 0.04])
    rows = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(1, 30), p=p)))
        for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    merges = train_bpe(docs, n_merges=30)
    got = bpe_encode(docs, merges).agg({"n_tokens": "sum"}).first()[0]
    ranks = {m: i for i, m in enumerate(merges)}
    exp = sum(
        len(segment_word(w, ranks)) for _, t in rows for w in t.split()
    )
    assert got == exp


# ------------------------------------------------------ byte-level mode

def test_bytes_to_unicode_is_published_alphabet():
    from spatialpandas_spark.operators.bpe import BYTE_ALPHABET, bytes_to_unicode

    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    # printable ASCII + Latin-1 keep their own codepoints
    assert b2u[ord("a")] == "a" and b2u[0xE9] == "\xe9"
    # unprintables shift past 255 (space is 0x20 -> U+0120)
    assert ord(b2u[0x20]) == 0x20 + 256 and ord(b2u[0x00]) == 0x100
    assert len(BYTE_ALPHABET) == 256


@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_byte_words_round_trip_any_unicode(text):
    """Per-word lossless round trip for ARBITRARY unicode input — the
    property the ascii mode cannot give."""
    from spatialpandas_spark.operators.bpe import (
        _BYTE_WORD_RE,
        _byte_words,
        byte_tokens_to_text,
        segment_word,
        train_bpe_from_histogram,
    )
    from collections import Counter

    words = _byte_words(text)
    hist = Counter(words)
    merges = train_bpe_from_histogram(dict(hist), 20)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    raw_words = _BYTE_WORD_RE.findall(text)
    assert len(words) == len(raw_words)
    for raw, w in zip(raw_words, words):
        toks = segment_word(w, ranks)
        assert byte_tokens_to_text(toks) == raw


def test_bytes_mode_tokenizes_cjk_spark(spark):
    """The ADVICE r4 gap closed: all-non-ASCII documents produce tokens
    (and survive the shard sink) in mode='bytes'."""
    from spatialpandas_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_ids,
        bpe_vocab_ids,
        byte_tokens_to_text,
        train_bpe,
    )

    rows = [
        (1, "日本語のテキストです。トークン化されます"),
        (2, "mixed ascii and 中文 text with emoji 🙂 and café"),
        (3, "plain ascii only"),
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=40, mode="bytes")
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges, mode="bytes").collect()}
    assert enc[1]["n_tokens"] > 0 and enc[2]["n_tokens"] > 0
    assert enc[4]["n_tokens"] == 0 and enc[5]["n_tokens"] == 0
    # tokens decode back to the concatenated word bytes (whitespace is
    # the only thing the splitter discards)
    got = byte_tokens_to_text(list(enc[3]["tokens"]))
    assert got == "plainasciionly"
    # id path: byte alphabet makes UNK unreachable
    vocab = bpe_vocab_ids(merges, mode="bytes")
    ids = {r["doc_id"]: r for r in bpe_encode_ids(docs, merges, mode="bytes").collect()}
    assert ids[1]["n_tokens"] == enc[1]["n_tokens"]
    assert 0 not in set(ids[1]["token_ids"]) | set(ids[2]["token_ids"])
    rev = {v: k for k, v in vocab.items()}
    assert byte_tokens_to_text([rev[i] for i in ids[1]["token_ids"]]) == \
        "日本語のテキストです。トークン化されます"


def test_bytes_mode_shard_sink_keeps_cjk(spark, tmp_path):
    from spatialpandas_spark.operators.bpe import train_bpe
    from spatialpandas_spark.operators.shards import write_training_shards

    rows = [(i, f"doc {i} words words") for i in range(20)]
    rows.append((98, "日本語のみのドキュメント"))
    rows.append((99, ""))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=20, mode="bytes")
    stats = write_training_shards(
        docs, merges, str(tmp_path / "s"), shard_tokens=100, mode="bytes"
    )
    assert stats["n_docs"] == 21          # CJK doc kept now
    assert stats["n_dropped_docs"] == 1   # only the truly empty doc


def test_save_load_round_trip(tmp_path, spark):
    from spatialpandas_spark.operators.bpe import (
        bpe_encode_ids,
        load_bpe,
        save_bpe,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} tokenize tokenize me") for i in range(10)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, n_merges=15, mode="bytes")
    p = str(tmp_path / "tok.json")
    save_bpe(merges, p, mode="bytes")
    loaded, mode = load_bpe(p)
    assert loaded == merges and mode == "bytes"
    a = {r["doc_id"]: r["token_ids"]
         for r in bpe_encode_ids(docs, merges, mode="bytes").collect()}
    b = {r["doc_id"]: r["token_ids"]
         for r in bpe_encode_ids(docs, loaded, mode=mode).collect()}
    assert a == b
