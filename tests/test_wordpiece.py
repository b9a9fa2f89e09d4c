"""WordPiece tokenizer (operators/wordpiece.py) vs independent oracles.

Evidence shape mirrors tests/test_bpe.py: an INDEPENDENT reference
trainer (expanded corpus list, recount per round — no shared code with
the histogram trainer) must produce the identical vocab; a reference
greedy longest-match segmenter the identical segmentation; round-trip,
UNK, id-mapping, partition-invariance, and sidecar save/load pinned.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from spatialpandas_spark.operators.wordpiece import (
    CONT,
    UNK,
    load_wordpiece,
    save_wordpiece,
    segment_word_wp,
    train_wordpiece,
    train_wordpiece_from_histogram,
    wordpiece_encode,
    wordpiece_encode_ids,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "the quicker they run the quickest they tire over rough banks",
    "running water runs over the river rocks quickly",
    "banks and rivers and dogs and foxes run over and over",
]


def _words():
    out = []
    for s in CORPUS:
        out.extend(w for w in s.lower().split() if w)
    return out


def ref_train(corpus_words, vocab_size):
    """Independent recount trainer over the EXPANDED word list."""
    seqs = [[w[0]] + [CONT + c for c in w[1:]] for w in corpus_words]
    base = sorted({s for seq in seqs for s in seq})
    vocab = [UNK] + base
    if len(vocab) >= vocab_size:  # documented contract: cap includes base
        return vocab[:vocab_size]
    while len(vocab) < vocab_size:
        pair_n, sym_n = Counter(), Counter()
        for seq in seqs:
            sym_n.update(seq)
            pair_n.update(zip(seq, seq[1:]))
        scored = [
            (c / (sym_n[a] * sym_n[b]), (a, b))
            for (a, b), c in pair_n.items()
            if c >= 2
        ]
        if not scored:
            break
        top = max(s for s, _ in scored)
        a, b = min(p for s, p in scored if s == top)
        merged = a + b[len(CONT):]
        vocab.append(merged)
        new_seqs = []
        for seq in seqs:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return vocab


def ref_segment(word, vocab):
    """Independent greedy longest-match (scans candidate lengths by
    explicit enumeration rather than decrementing end)."""
    pieces, pos = [], 0
    while pos < len(word):
        cands = []
        for end in range(pos + 1, len(word) + 1):
            sub = word[pos:end]
            if pos > 0:
                sub = CONT + sub
            if sub in vocab:
                cands.append((end, sub))
        if not cands:
            return [UNK]
        end, piece = max(cands)
        pieces.append(piece)
        pos = end
    return pieces


def test_trainer_matches_reference():
    words = _words()
    hist = dict(Counter(words))
    for size in (30, 60, 120):
        assert train_wordpiece_from_histogram(hist, size) == ref_train(
            words, size
        )


def test_trainer_stops_when_dry():
    v = train_wordpiece_from_histogram({"ab": 1, "cd": 1}, 1000)
    # no pair occurs twice -> base vocab only
    assert v == [UNK, "##b", "##d", "a", "c"]


def test_segmenter_matches_reference_and_roundtrips():
    vocab = train_wordpiece_from_histogram(dict(Counter(_words())), 80)
    vs = set(vocab)
    for w in set(_words()) | {"quickestest", "riverbankdog"}:
        got = segment_word_wp(w, vs)
        assert got == ref_segment(w, vs), w
        if got != [UNK]:
            assert "".join(
                p[len(CONT):] if p.startswith(CONT) else p for p in got
            ) == w
    # char outside the alphabet -> whole-word UNK
    assert segment_word_wp("zebra?", vs) == [UNK]


def test_encode_end_to_end(spark, tmp_path):
    docs = spark.createDataFrame(
        list(enumerate(CORPUS)), "doc_id long, text string"
    )
    vocab = train_wordpiece(docs, vocab_size=80)
    assert vocab == train_wordpiece_from_histogram(
        dict(Counter(_words())), 80
    )

    enc = {
        r["doc_id"]: list(r["tokens"])
        for r in wordpiece_encode(docs, vocab).collect()
    }
    vs = set(vocab)
    for i, s in enumerate(CORPUS):
        want = [p for w in s.lower().split() for p in segment_word_wp(w, vs)]
        assert enc[i] == want
        assert UNK not in enc[i]  # training corpus == apply corpus

    # ids path: same segmentation mapped through vocab indices
    ids = {
        r["doc_id"]: list(r["token_ids"])
        for r in wordpiece_encode_ids(docs, vocab).collect()
    }
    vi = {s: j for j, s in enumerate(vocab)}
    assert ids == {i: [vi[p] for p in toks] for i, toks in enc.items()}

    # partition invariance
    enc2 = {
        r["doc_id"]: list(r["tokens"])
        for r in wordpiece_encode(docs.repartition(7), vocab).collect()
    }
    assert enc2 == enc

    # sidecar round trip + loud rejection of foreign sidecars
    p = str(tmp_path / "wp.json")
    save_wordpiece(vocab, p)
    assert load_wordpiece(p) == vocab
    from spatialpandas_spark.operators.bpe import save_bpe

    p2 = str(tmp_path / "bpe.json")
    save_bpe([("a", "b")], p2)
    with pytest.raises(ValueError):
        load_wordpiece(p2)


def test_unk_id_is_zero(spark):
    docs = spark.createDataFrame(
        [(0, "der fluss läuft"), (1, "the dog")], "doc_id long, text string"
    )
    vocab = train_wordpiece_from_histogram(
        {"the": 3, "dog": 2, "thedog": 2}, 60
    )
    out = {
        r["doc_id"]: list(r["token_ids"])
        for r in wordpiece_encode_ids(docs, vocab).collect()
    }
    # 'der'/'fluss' contain chars outside the tiny vocab -> UNK id 0;
    # 'läuft' is non-ascii so the pre-tokenizer splits it — its ascii
    # fragments also miss the vocab
    assert 0 in out[0]
    assert 0 not in out[1]


# ------------------------- hypothesis battery (pure python, no Spark)
from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcdez01", min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(st.lists(_word, min_size=1, max_size=40), st.integers(10, 80))
def test_property_trainer_identity(words, size):
    """Histogram trainer == expanded-corpus reference trainer on random
    corpora — including degenerate ones (single repeated word, unary
    alphabets, base vocab bigger than the cap)."""
    assert train_wordpiece_from_histogram(
        dict(Counter(words)), size
    ) == ref_train(words, size)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_word, min_size=1, max_size=25),
    st.lists(_word, min_size=1, max_size=10),
    st.integers(15, 60),
)
def test_property_segmenter_roundtrip_and_identity(train_words, apply_words, size):
    """On any trained vocab: segmenter == reference on arbitrary apply
    words (in- and out-of-corpus); non-UNK output rejoins to the word;
    every emitted piece is in the vocab; continuation prefixes appear
    exactly on non-initial pieces."""
    vocab = train_wordpiece_from_histogram(dict(Counter(train_words)), size)
    vs = set(vocab)
    for w in apply_words:
        got = segment_word_wp(w, vs)
        assert got == ref_segment(w, vs)
        if got == [UNK]:
            continue
        assert all(p in vs for p in got)
        assert not got[0].startswith(CONT)
        assert all(p.startswith(CONT) for p in got[1:])
        assert "".join(
            p[len(CONT):] if p.startswith(CONT) else p for p in got
        ) == w


# ---------------------------------------------------- byte-level mode

BYTE_CORPUS = [
    "straße größe äpfel über die brücke",
    "日本語のテキストを処理する",
    "mixed ascii und ümlaute zusammen 42",
    "emoji 🎉 rows and straße again für größe",
]


def test_bytes_trainer_matches_reference(spark):
    """mode='bytes' training == the independent reference trainer over
    the byte-alphabet word expansion (the ascii-mode identity test's
    shape, on the byte domain)."""
    from spatialpandas_spark.operators.bpe import _byte_words

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BYTE_CORPUS)],
        "doc_id long, text string",
    ).repartition(3)
    words = []
    for t in BYTE_CORPUS:
        words.extend(_byte_words(t))
    assert train_wordpiece(docs, 80, mode="bytes") == ref_train(words, 80)


def test_bytes_mode_tokenizes_unicode_spark(spark):
    """The round-8 gap closed: non-ASCII corpora no longer collapse to
    whole-word [UNK] — every seen word segments into real pieces and
    round-trips back to its text, while ascii mode on the same docs
    yields zero tokens (why byte mode exists)."""
    from spatialpandas_spark.operators.bpe import _byte_words
    from spatialpandas_spark.operators.wordpiece import (
        wordpiece_word_to_text,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BYTE_CORPUS)],
        "doc_id long, text string",
    ).repartition(2)
    vocab = train_wordpiece(docs, 96, mode="bytes")
    enc = {
        r["doc_id"]: r
        for r in wordpiece_encode(docs, vocab, mode="bytes").collect()
    }
    vset = set(vocab)
    for i, t in enumerate(BYTE_CORPUS):
        toks = enc[i]["tokens"]
        assert toks and UNK not in toks, (i, toks)
        # per-word round trip: regroup the flat stream at non-## starts
        words, cur = [], []
        for p in toks:
            if cur and not p.startswith(CONT):
                words.append(cur)
                cur = []
            cur.append(p)
        words.append(cur)
        raw = [w for w in _re_findall(t)]
        got = [wordpiece_word_to_text(w) for w in words]
        assert got == raw, (i, got, raw)

    # ascii mode on the all-CJK doc: zero tokens (the documented drop)
    ascii_enc = {
        r["doc_id"]: r["tokens"]
        for r in wordpiece_encode(docs, [UNK, "a"], mode="ascii").collect()
    }
    assert ascii_enc[1] == []

    # ids twin: same stream through the id path, UNK-free
    ids = {
        r["doc_id"]: r["token_ids"]
        for r in wordpiece_encode_ids(docs, vocab, mode="bytes").collect()
    }
    vid = {s: j for j, s in enumerate(vocab)}
    for i in enc:
        assert ids[i] == [vid[p] for p in enc[i]["tokens"]]


def _re_findall(text):
    from spatialpandas_spark.operators.bpe import _BYTE_WORD_RE

    return _BYTE_WORD_RE.findall(text)


def test_bytes_segmenter_property_roundtrip():
    """Hypothesis: for arbitrary unicode text, every trained-on word
    segments UNK-free and round-trips exactly (the BPE byte-mode
    battery's property on the WordPiece surface)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spatialpandas_spark.operators.bpe import _byte_words
    from spatialpandas_spark.operators.wordpiece import (
        wordpiece_word_to_text,
    )

    @given(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=30,
        )
    )
    @settings(max_examples=150, deadline=None)
    def prop(text):
        words = _byte_words(text)
        hist = Counter(words)
        vocab = set(
            train_wordpiece_from_histogram(dict(hist), vocab_size=60)
        )
        raw_words = _re_findall(text)
        for raw, w in zip(raw_words, words):
            seg = segment_word_wp(w, vocab)
            # every byte symbol of a trained-on word is in the base
            # vocab unless the cap cut base symbols — tolerate UNK only
            # then
            if seg != [UNK]:
                assert wordpiece_word_to_text(seg) == raw

    prop()


def test_bytes_sidecar_mode_round_trip(tmp_path):
    p = str(tmp_path / "wp_bytes.json")
    vocab = [UNK, "a", "##b", "ab"]
    save_wordpiece(vocab, p, mode="bytes")
    from spatialpandas_spark.operators.wordpiece import (
        load_wordpiece_mode,
    )

    assert load_wordpiece(p) == vocab
    assert load_wordpiece_mode(p) == "bytes"
    # legacy sidecar without the field reads as ascii
    import json

    p2 = str(tmp_path / "wp_legacy.json")
    with open(p2, "w") as f:
        json.dump({"format": "wordpiece", "vocab": vocab}, f)
    assert load_wordpiece_mode(p2) == "ascii"
    with pytest.raises(ValueError):
        save_wordpiece(vocab, str(tmp_path / "x.json"), mode="wat")
