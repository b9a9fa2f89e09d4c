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
    mode: str = "ascii",
) -> list[str]:
    """Distributed histogram -> driver training (the BPE split). The
    histogram is capped keep-most-frequent like ``train_bpe``. ``mode``
    mirrors the BPE module exactly:

    - ``'ascii'`` (default): Catalyst word splitter, SQL-replayable;
      non-ASCII text contributes nothing;
    - ``'bytes'``: GPT-2-style byte-level words
      (``operators.bpe.word_histogram(mode='bytes')``) — every UTF-8
      document contributes, symbols are byte-alphabet chars, and the
      ``##`` continuation convention applies to byte symbols. (As in
      standard WordPiece, a literal ``#`` in text can produce pieces
      that LOOK like continuations — segmentation is still
      deterministic because the prefix is positional, never parsed.)"""
    from pyspark.sql import functions as F

    from spatialpandas_spark.operators.bpe import word_histogram

    if mode not in ("ascii", "bytes"):
        raise ValueError(f"unknown WordPiece mode {mode!r}")
    rows = (
        word_histogram(docs, text_col, mode=mode)
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


def wordpiece_word_to_text(pieces: list[str]) -> str:
    """Inverse of a single word's byte-mode segmentation: strip the
    positional ``##`` prefix from every non-initial piece, then map the
    byte-alphabet symbols back through UTF-8
    (``operators.bpe.byte_tokens_to_text``). ``[UNK]`` words are not
    invertible (returns the empty string for them)."""
    from spatialpandas_spark.operators.bpe import byte_tokens_to_text

    if pieces == [UNK]:
        return ""
    flat = [pieces[0]] + [p[len(CONT):] for p in pieces[1:]]
    return byte_tokens_to_text(flat)


def _encode(
    docs: DataFrame,
    vocab: list[str],
    id_col: str,
    text_col: str,
    ids: bool,
    mode: str = "ascii",
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from spatialpandas_spark.operators.bpe import _byte_words, word_tokens

    if mode not in ("ascii", "bytes"):
        raise ValueError(f"unknown WordPiece mode {mode!r}")
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
    # byte mode pre-tokenizes in PYTHON inside the Arrow pass (the same
    # splitter + byte alphabet the histogram used — training and apply
    # can never disagree, the bpe.py discipline); ascii mode keeps the
    # Catalyst splitter
    from pyspark.sql import functions as F

    if mode == "ascii":
        prepped = docs.select(id_col, word_tokens(text_col).alias("__w"))
    else:
        prepped = docs.select(
            id_col, F.col(text_col).cast("string").alias("__t")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vs, vi = bc.value
        cache: dict[str, list] = {}
        for pdf in batches:
            out_ids, out_toks, ns = [], [], []
            src = pdf["__w"] if mode == "ascii" else pdf["__t"]
            for did, raw in zip(pdf[id_col], src):
                if mode == "bytes":
                    words = _byte_words(raw)
                else:
                    words = raw if raw is not None else []
                toks: list = []
                for w in words:
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
    mode: str = "ascii",
) -> DataFrame:
    """Tokenize: ``(id_col, tokens array<string>, n_tokens)``.
    ``mode='bytes'`` applies the GPT-2 byte-level pre-tokenizer (full
    UTF-8 coverage; pair with a ``mode='bytes'``-trained vocab)."""
    return _encode(docs, vocab, id_col, text_col, ids=False, mode=mode)


def wordpiece_encode_ids(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ascii",
) -> DataFrame:
    """Tokenize to vocab ids: ``(id_col, token_ids array<int>,
    n_tokens)`` — ``[UNK]`` is id 0 by construction. ``mode='bytes'``
    as in :func:`wordpiece_encode`."""
    return _encode(docs, vocab, id_col, text_col, ids=True, mode=mode)


def save_wordpiece(
    vocab: list[str], path: str, filesystem=None, mode: str = "ascii"
) -> None:
    """Persist the vocab as a JSON sidecar via the object-store fs
    layer (same convention as ``save_bpe``/unigram). ``mode`` records
    which pre-tokenizer the vocab was trained under (apply with the
    same one; see :func:`load_wordpiece_mode`)."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    if mode not in ("ascii", "bytes"):
        raise ValueError(f"unknown WordPiece mode {mode!r}")
    _fs.write_text(
        path,
        json.dumps({"format": "wordpiece", "mode": mode, "vocab": vocab}),
        filesystem=filesystem,
    )


def load_wordpiece_mode(path: str, filesystem=None) -> str:
    """The pre-tokenizer mode a sidecar's vocab was trained under
    (sidecars predating the mode field read as 'ascii')."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    d = json.loads(_fs.read_text(path, filesystem=filesystem))
    if d.get("format") != "wordpiece":
        raise ValueError(f"not a WordPiece tokenizer sidecar: {path}")
    return d.get("mode", "ascii")


def load_wordpiece(path: str, filesystem=None) -> list[str]:
    """Vocab from :func:`save_wordpiece` output; rejects non-WordPiece
    sidecars loudly."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    d = json.loads(_fs.read_text(path, filesystem=filesystem))
    if d.get("format") != "wordpiece":
        raise ValueError(f"not a WordPiece tokenizer sidecar: {path}")
    return list(d["vocab"])
