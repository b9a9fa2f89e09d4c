"""Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016 /
GPT-2-style apply) with the standard at-scale split:

- **histogram** (cluster): BPE training never needs the corpus — only
  the WORD HISTOGRAM, which is one ``groupBy(word)`` count (one
  shuffle, map-side combine). 100 TB of text collapses to millions of
  distinct words, MBs on the driver.
- **train** (driver): classic merge-pair iterations over the histogram
  with an incremental pair-count index (only words containing the
  merged pair are touched per round) — the subword-nmt trainer shape.
  The histogram is capped (``max_words``, keep-most-frequent) with the
  truncation logged in the result, never silent.
- **apply** (cluster): merges broadcast to executors; segmentation runs
  inside Arrow-batched ``mapInPandas`` with a per-batch word cache —
  Zipf means the cache hits almost always, so the per-word merge loop
  runs once per DISTINCT word per batch, not once per token.

Determinism contract: ties in pair frequency break lexicographically,
so the same histogram always yields the same merge list on any machine
— required for reproducible tokenization across cluster re-runs (the
same property the deterministic-sampling operators guarantee).

Correctness evidence (tests/test_bpe.py): an independent
recount-from-scratch reference trainer (no incremental index) must
produce the IDENTICAL merge list, and a per-word reference segmenter
the identical segmentation; hypothesis properties pin lossless
round-trip (tokens rejoin to the word) and cache-transparency.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

END = "</w>"  # end-of-word marker, merged like any symbol


def word_tokens(text):
    """ASCII-mode pre-tokenization: lowercase words and standalone
    punctuation runs (a deliberately simple, RE2-safe public-recipe
    splitter whose SQL twin is oracle-checkable). Non-ASCII text yields
    zero tokens in this mode — use ``mode='bytes'`` for full coverage."""
    return F.expr(
        f"filter(split(lower({text}), '[^a-z0-9]+'), x -> x != '')"
    )


# --- byte-level mode (GPT-2-style): every text tokenizes, no drops ----

import re as _re

#: unicode-aware word/punctuation splitter for byte mode. Runs in
#: PYTHON on both the histogram and apply paths (never as a Spark
#: regexp), so training and application can never disagree on word
#: boundaries across engines/locales.
_BYTE_WORD_RE = _re.compile(r"\w+|[^\w\s]+")


def bytes_to_unicode() -> dict[int, str]:
    """The published GPT-2 byte-to-unicode alphabet: every byte 0-255
    maps to a printable unicode char (printable ASCII + Latin-1 keep
    their own codepoint; the 68 unprintables shift up by 256), so BPE
    symbols stay plain strings and any UTF-8 text — CJK, emoji, broken
    encodings — round-trips losslessly through the tokenizer."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_B2U = bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}
BYTE_ALPHABET = "".join(_B2U[b] for b in range(256))


def _byte_words(text: str | None) -> list[str]:
    """Byte-mode pre-tokenization: unicode word/punct runs, each mapped
    through the byte alphabet (one symbol per UTF-8 byte)."""
    if not text:
        return []
    return [
        "".join(_B2U[b] for b in w.encode("utf-8"))
        for w in _BYTE_WORD_RE.findall(text)
    ]


def byte_tokens_to_text(tokens: list[str]) -> str:
    """Inverse of the byte mapping for a segmented word's tokens (the
    lossless-round-trip guarantee byte mode exists for): strips ``END``
    markers, maps symbols back to bytes, decodes UTF-8."""
    data = bytes(
        _U2B[ch]
        for tok in tokens
        for ch in tok.replace(END, "")
        if ch in _U2B
    )
    return data.decode("utf-8", errors="replace")


def word_histogram(
    docs: DataFrame, text_col: str = "text", mode: str = "ascii"
) -> DataFrame:
    """Distributed word count: ``(word, n)``, one shuffle. ``mode``:

    - ``'ascii'`` (default): the Catalyst splitter (SQL-replayable;
      non-ASCII text contributes nothing);
    - ``'bytes'``: GPT-2-style byte-level words via an Arrow pass — the
      same Python splitter + byte alphabet the apply path uses, so EVERY
      document contributes and training/apply can never disagree."""
    if mode == "ascii":
        return (
            docs.select(F.explode(word_tokens(text_col)).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("n"))
        )
    if mode != "bytes":
        raise ValueError(f"unknown BPE mode {mode!r}")
    from collections.abc import Iterator

    import pandas as pd

    schema = StructType([StructField("word", StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[str] = []
            for text in pdf[text_col]:
                out.extend(_byte_words(text))
            yield pd.DataFrame({"word": out})

    return (
        docs.select(text_col)
        .mapInPandas(run, schema)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 1_000_000,
    mode: str = "ascii",
) -> list[tuple[str, str]]:
    """Train BPE merges from a corpus. Returns the ordered merge list
    (earlier = higher priority). Driver memory is bounded by
    ``max_words`` histogram rows (kept most-frequent, ties by word, so
    the cap is deterministic too). ``mode='bytes'`` trains on the
    byte-alphabet words (full unicode coverage, lossless)."""
    rows = (
        word_histogram(docs, text_col, mode=mode)
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
        .collect()
    )
    hist = {r["word"]: r["n"] for r in rows}
    return train_bpe_from_histogram(hist, n_merges)


def train_bpe_from_histogram(
    hist: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side trainer: incremental pair-count index (pair ->
    count and pair -> word ids), touching only words containing the
    merged pair per round, with best-pair selection through a
    lazy-invalidation heap — O(log P) per count change instead of a
    linear scan over all pairs per merge, the difference between
    minutes and hours at a million-word histogram. The heap key
    ``(-count, pair)`` makes ties break on the lexicographically
    smallest pair, so the merge list is deterministic for a given
    histogram on any machine."""
    import heapq

    words = [list(w) + [END] for w in hist]
    counts = list(hist.values())
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = counts[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words.setdefault((a, b), set()).add(wi)

    heap = [(-c, pair) for pair, c in pair_counts.items()]
    heapq.heapify(heap)

    def bump(pair, delta):
        pair_counts[pair] += delta
        # push the NEW value on every change (including decrements —
        # a pair whose count only ever went down must still be findable
        # at its current value); outdated entries are skipped lazily by
        # the pop loop's current-count check
        if pair_counts[pair] > 0:
            heapq.heappush(heap, (-pair_counts[pair], pair))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pair = None
        while heap:
            negc, cand = heapq.heappop(heap)
            if pair_counts.get(cand, 0) == -negc and -negc > 0:
                pair = cand
                break
        if pair is None:
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wi in list(pair_words.get(pair, ())):
            syms = words[wi]
            c = counts[wi]
            # remove this word's contribution to all its pairs
            for a, b in zip(syms, syms[1:]):
                bump((a, b), -c)
                s = pair_words.get((a, b))
                if s is not None:
                    s.discard(wi)
            # merge in place
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == pair[0]
                    and syms[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            # re-add contributions
            for a, b in zip(out, out[1:]):
                bump((a, b), c)
                pair_words.setdefault((a, b), set()).add(wi)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word greedily by rank (GPT-2 ``bpe()``): the
    lowest-rank adjacent pair merges first, repeat to fixpoint."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _prep_words(docs: DataFrame, id_col: str, text_col: str, mode: str):
    """Shared encode prep: (prepped frame, per-row word-list getter).
    ascii mode extracts words JVM-side (Catalyst split); bytes mode
    ships the raw text and splits in Python with the SAME splitter the
    byte histogram uses."""
    if mode == "ascii":
        prepped = docs.select(id_col, word_tokens(text_col).alias("__w"))
        return prepped, lambda v: v if v is not None else []
    if mode != "bytes":
        raise ValueError(f"unknown BPE mode {mode!r}")
    prepped = docs.select(id_col, F.col(text_col).alias("__w"))
    return prepped, _byte_words


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ascii",
) -> DataFrame:
    """Tokenize documents with a trained merge list: returns
    ``(id_col, tokens array<string>, n_tokens)``. Merges are broadcast
    once; segmentation runs in Arrow batches with a per-batch
    distinct-word cache (Zipf: the merge loop runs per distinct word,
    not per token). ``mode='bytes'`` tokenizes byte-alphabet words
    (every text yields tokens; per-word byte sequences round-trip via
    :func:`byte_tokens_to_text`)."""
    from collections.abc import Iterator

    import pandas as pd

    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(
        {tuple(m): i for i, m in enumerate(merges)}
    )
    out_schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("tokens", ArrayType(StringType())),
            StructField("n_tokens", IntegerType()),
        ]
    )
    prepped, words_of = _prep_words(docs, id_col, text_col, mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for did, raw in zip(pdf[id_col], pdf["__w"]):
                out: list[str] = []
                for w in words_of(raw):
                    seg = cache.get(w)
                    if seg is None:
                        seg = segment_word(w, ranks)
                        cache[w] = seg
                    out.extend(seg)
                ids.append(did)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({id_col: ids, "tokens": toks, "n_tokens": ns})

    return prepped.mapInPandas(run, out_schema)


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The symbol vocabulary a merge list induces (merged symbols in
    rank order; base characters are implicit)."""
    return [a + b for a, b in merges]


def bpe_vocab_ids(
    merges: list[tuple[str, str]],
    alphabet: str | None = None,
    mode: str = "ascii",
) -> dict[str, int]:
    """Stable symbol -> id mapping for training export: id 0 is UNK,
    1 is ``</w>``, then the base alphabet in order, then merged symbols
    in rank order. Deterministic for a given merge list — the property
    a resumable training pipeline needs. In ``mode='bytes'`` the base
    alphabet is all 256 byte symbols, so UNK is unreachable and every
    id sequence decodes back to exact bytes."""
    if alphabet is None:
        alphabet = (
            BYTE_ALPHABET if mode == "bytes"
            else "abcdefghijklmnopqrstuvwxyz0123456789"
        )
    vocab = {"<unk>": 0, END: 1}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for m in bpe_vocab(merges):
        if m not in vocab:
            vocab[m] = len(vocab)
    return vocab


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ascii",
) -> DataFrame:
    """``bpe_encode`` + vocabulary lookup in one Arrow pass:
    ``(id_col, token_ids array<int>, n_tokens)``, unknown symbols -> 0
    (UNK; unreachable in ``mode='bytes'``). The export shape a
    tokenized-dataset writer consumes."""
    from collections.abc import Iterator

    import pandas as pd

    spark = docs.sparkSession
    vocab = bpe_vocab_ids(merges, mode=mode)
    bc = spark.sparkContext.broadcast(
        ({tuple(m): i for i, m in enumerate(merges)}, vocab)
    )
    out_schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField("token_ids", ArrayType(IntegerType())),
            StructField("n_tokens", IntegerType()),
        ]
    )
    prepped, words_of = _prep_words(docs, id_col, text_col, mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks, voc = bc.value
        cache: dict[str, list[int]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for did, raw in zip(pdf[id_col], pdf["__w"]):
                out: list[int] = []
                for w in words_of(raw):
                    seg = cache.get(w)
                    if seg is None:
                        seg = [
                            voc.get(s, 0) for s in segment_word(w, ranks)
                        ]
                        cache[w] = seg
                    out.extend(seg)
                ids.append(did)
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "token_ids": toks, "n_tokens": ns}
            )

    return prepped.mapInPandas(run, out_schema)


def save_bpe(merges: list[tuple[str, str]], path: str, mode: str = "ascii",
             filesystem=None) -> None:
    """Persist a trained merge list as a JSON sidecar (via the
    object-store fs layer, like every other model artifact): the
    reproducibility anchor — a pipeline rerun loads the EXACT tokenizer
    rather than retraining."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    _fs.write_text(
        path,
        json.dumps(
            {"format": "bpe", "mode": mode, "merges": [list(m) for m in merges]}
        ),
        filesystem=filesystem,
    )


def load_bpe(path: str, filesystem=None) -> tuple[list[tuple[str, str]], str]:
    """(merges, mode) from :func:`save_bpe` output. Rejects non-BPE
    sidecars loudly."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    d = json.loads(_fs.read_text(path, filesystem=filesystem))
    if d.get("format") != "bpe":
        raise ValueError(f"not a BPE tokenizer sidecar: {path}")
    return [tuple(m) for m in d["merges"]], d.get("mode", "ascii")
