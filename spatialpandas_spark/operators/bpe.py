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
    """Pre-tokenization: lowercase words and standalone punctuation runs
    (a deliberately simple, RE2-safe public-recipe splitter; swap for a
    GPT-2 regex if byte-level fidelity is needed)."""
    return F.expr(
        f"filter(split(lower({text}), '[^a-z0-9]+'), x -> x != '')"
    )


def word_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distributed word count: ``(word, n)``, one shuffle."""
    return (
        docs.select(F.explode(word_tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train BPE merges from a corpus. Returns the ordered merge list
    (earlier = higher priority). Driver memory is bounded by
    ``max_words`` histogram rows (kept most-frequent, ties by word, so
    the cap is deterministic too)."""
    rows = (
        word_histogram(docs, text_col)
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


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a trained merge list: returns
    ``(id_col, tokens array<string>, n_tokens)``. Merges are broadcast
    once; segmentation runs in Arrow batches with a per-batch
    distinct-word cache (Zipf: the merge loop runs per distinct word,
    not per token)."""
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
    words_expr = word_tokens(text_col)
    prepped = docs.select(id_col, words_expr.alias("__words"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for did, words in zip(pdf[id_col], pdf["__words"]):
                out: list[str] = []
                if words is not None:
                    for w in words:
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
    merges: list[tuple[str, str]], alphabet: str = "abcdefghijklmnopqrstuvwxyz0123456789"
) -> dict[str, int]:
    """Stable symbol -> id mapping for training export: id 0 is UNK,
    1 is ``</w>``, then the base alphabet in order, then merged symbols
    in rank order. Deterministic for a given merge list — the property
    a resumable training pipeline needs."""
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
) -> DataFrame:
    """``bpe_encode`` + vocabulary lookup in one Arrow pass:
    ``(id_col, token_ids array<int>, n_tokens)``, unknown symbols -> 0
    (UNK). The export shape a tokenized-dataset writer consumes."""
    from collections.abc import Iterator

    import pandas as pd

    spark = docs.sparkSession
    vocab = bpe_vocab_ids(merges)
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
    prepped = docs.select(id_col, word_tokens(text_col).alias("__words"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks, voc = bc.value
        cache: dict[str, list[int]] = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for did, words in zip(pdf[id_col], pdf["__words"]):
                out: list[int] = []
                if words is not None:
                    for w in words:
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
