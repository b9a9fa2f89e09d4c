"""Trainable WordPiece tokenizer (Schuster & Nakajima 2012; the BERT
tokenizer) — completing the standard subword triad beside BPE
(operators/bpe.py) and Unigram-LM (operators/unigram.py). No reference
analog: spatialpandas has no text surface; this is LLM-pipeline
extension surface.

Same at-scale split as the BPE module:

- **histogram** (cluster): training needs only the WORD HISTOGRAM —
  one ``groupBy(word)`` count (reused from ``operators.bpe``). 100 TB
  of text collapses to millions of distinct words.
- **train** (driver): merge iterations over the histogram like BPE,
  but scored by LIKELIHOOD GAIN ``n(ab) / (n(a) * n(b))`` instead of
  raw frequency — the published WordPiece objective (maximize corpus
  likelihood under a unigram model of the symbols). Continuation
  symbols carry the ``##`` prefix (``hello`` -> ``h ##e ##l ##l ##o``
  before any merge). Ties break on (score, lexicographic pair) so the
  same histogram yields the same vocab on any machine — the module
  family's determinism contract.
- **apply** (cluster): the famous property of WordPiece is that apply
  IGNORES the trainer entirely: greedy LONGEST-MATCH-FIRST against the
  vocab set, ``##``-prefixed continuations, whole word -> ``[UNK]``
  when no prefix matches. Vocab broadcast once; segmentation runs in
  Arrow-batched ``mapInPandas`` with a per-batch distinct-word cache
  (Zipf: the matcher runs per distinct word, not per token) — the same
  plan shape as ``bpe_encode``, so everything in docs/SCALE.md about
  that shape applies unchanged.

Correctness evidence (tests/test_wordpiece.py): an independent
expanded-corpus reference trainer must produce the IDENTICAL vocab; a
per-word reference longest-match segmenter the identical segmentation;
round-trip and UNK contracts pinned; partition-invariance pinned.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

UNK = "[UNK]"
CONT = "##"


def _word_symbols(word: str) -> list[str]:
    """``hello`` -> ``['h', '##e', '##l', '##l', '##o']``."""
    return [word[0]] + [CONT + c for c in word[1:]]


def _merge_symbols(a: str, b: str) -> str:
    """Merged symbol keeps ``a``'s prefix; ``b`` is always a
    continuation (only adjacent pairs merge, and every non-initial
    symbol is ##-prefixed)."""
    return a + b[len(CONT):]


def train_wordpiece_from_histogram(
    hist: dict[str, int], vocab_size: int = 200
) -> list[str]:
    """Driver-side WordPiece training over a word histogram: returns
    the vocabulary — base symbols (every initial char and ##-prefixed
    continuation char seen) followed by merged tokens in creation
    order, ``[UNK]`` first. ``vocab_size`` caps the TOTAL vocab length.

    Each round recounts weighted adjacent-pair counts over the distinct
    words (the histogram is capped upstream, so rounds are cheap on the
    driver — same posture as the BPE trainer) and merges the pair
    maximizing ``n(ab) / (n(a) * n(b))``, ties to the lexicographically
    smallest pair. Merging stops early when no pair occurs twice."""
    words: dict[str, list[str]] = {w: _word_symbols(w) for w in hist if w}
    base: set[str] = set()
    for syms in words.values():
        base.update(syms)
    vocab: list[str] = [UNK] + sorted(base)
    if len(vocab) >= vocab_size:
        return vocab[:vocab_size]

    while len(vocab) < vocab_size:
        pair_n: Counter = Counter()
        sym_n: Counter = Counter()
        for w, syms in words.items():
            n = hist[w]
            for s in syms:
                sym_n[s] += n
            for i in range(len(syms) - 1):
                pair_n[(syms[i], syms[i + 1])] += n
        best, best_score = None, None
        for p, c in pair_n.items():
            if c < 2:
                continue
            score = c / (sym_n[p[0]] * sym_n[p[1]])
            # deterministic: higher score wins; ties -> smaller pair
            if best is None or score > best_score or (
                score == best_score and p < best
            ):
                best, best_score = p, score
        if best is None:
            break
        merged = _merge_symbols(*best)
        vocab.append(merged)
        a, b = best
        for w, syms in words.items():
            if a not in syms:
                continue
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return vocab


def train_wordpiece(
    docs: DataFrame,
    vocab_size: int = 200,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[str]:
    """Distributed histogram -> driver training (the BPE split). The
    histogram is capped keep-most-frequent like ``train_bpe``; ascii
    pre-tokenization (``operators.bpe.word_tokens``)."""
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.bpe import word_histogram

    rows = (
        word_histogram(docs, text_col, mode="ascii")
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return train_wordpiece_from_histogram(
        {r["word"]: r["n"] for r in rows}, vocab_size
    )


def segment_word_wp(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first segmentation — the BERT algorithm.
    Returns ``[UNK]`` when any position has no matching vocab piece."""
    out, pos, L = [], 0, len(word)
    while pos < L:
        end = L
        piece = None
        while end > pos:
            sub = word[pos:end]
            if pos > 0:
                sub = CONT + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        pos = end
    return out


def _encode(
    docs: DataFrame,
    vocab: list[str],
    id_col: str,
    text_col: str,
    ids: bool,
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from spatialpandas_spark.operators.bpe import word_tokens

    spark = docs.sparkSession
    vset = set(vocab)
    vids = {s: i for i, s in enumerate(vocab)}
    bc = spark.sparkContext.broadcast((vset, vids))
    col = "token_ids" if ids else "tokens"
    typ = ArrayType(IntegerType()) if ids else ArrayType(StringType())
    out_schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            StructField(col, typ),
            StructField("n_tokens", IntegerType()),
        ]
    )
    prepped = docs.select(id_col, word_tokens(text_col).alias("__w"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vs, vi = bc.value
        cache: dict[str, list] = {}
        for pdf in batches:
            out_ids, out_toks, ns = [], [], []
            for did, raw in zip(pdf[id_col], pdf["__w"]):
                toks: list = []
                for w in (raw if raw is not None else []):
                    seg = cache.get(w)
                    if seg is None:
                        seg = segment_word_wp(w, vs)
                        if ids:
                            seg = [vi.get(s, 0) for s in seg]
                        cache[w] = seg
                    toks.extend(seg)
                out_ids.append(did)
                out_toks.append(toks)
                ns.append(len(toks))
            yield pd.DataFrame(
                {id_col: out_ids, col: out_toks, "n_tokens": ns}
            )

    return prepped.mapInPandas(run, out_schema)


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize: ``(id_col, tokens array<string>, n_tokens)``."""
    return _encode(docs, vocab, id_col, text_col, ids=False)


def wordpiece_encode_ids(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize to vocab ids: ``(id_col, token_ids array<int>,
    n_tokens)`` — ``[UNK]`` is id 0 by construction."""
    return _encode(docs, vocab, id_col, text_col, ids=True)


def save_wordpiece(vocab: list[str], path: str, filesystem=None) -> None:
    """Persist the vocab as a JSON sidecar via the object-store fs
    layer (same convention as ``save_bpe``/unigram)."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    _fs.write_text(
        path,
        json.dumps({"format": "wordpiece", "vocab": vocab}),
        filesystem=filesystem,
    )


def load_wordpiece(path: str, filesystem=None) -> list[str]:
    """Vocab from :func:`save_wordpiece` output; rejects non-WordPiece
    sidecars loudly."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    d = json.loads(_fs.read_text(path, filesystem=filesystem))
    if d.get("format") != "wordpiece":
        raise ValueError(f"not a WordPiece tokenizer sidecar: {path}")
    return list(d["vocab"])
