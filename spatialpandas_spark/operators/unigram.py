"""Unigram language-model tokenizer (Kudo 2018, "Subword
Regularization" — the SentencePiece ``unigram`` algorithm), the other
dominant subword family next to BPE.

Same at-scale split as ``operators/bpe.py``: the corpus collapses to a
WORD HISTOGRAM (one shuffle — ``word_histogram`` is shared, including
``mode='bytes'`` full-unicode coverage); training is driver-side EM
over that histogram; application broadcasts the piece table and runs
Viterbi segmentation inside Arrow batches with a distinct-word cache.

Training loop (deterministic — ties break lexicographically, floats are
one-threaded driver numpy/python):

1. seed vocabulary: every substring of histogram words up to
   ``max_piece_len``, scored by total occurrence count, capped at
   ``seed_size`` (all single characters always kept — coverage
   guarantee);
2. EM: E-step runs the forward-backward lattice per distinct word
   (expected piece counts under the current unigram probabilities,
   weighted by word count); M-step renormalizes;
3. prune: drop the lowest-expected-count pieces (never single chars)
   down a geometric schedule to ``vocab_size``, re-running EM between
   rounds. This is the SIMPLIFIED public recipe — SentencePiece prunes
   by per-piece likelihood LOSS; expected-count pruning is the
   standard approximation and is what the tests pin.

Correctness evidence (tests/test_unigram.py): Viterbi vs brute-force
enumeration over all segmentations (hypothesis), forward logZ vs
enumerated logsumexp, EM monotonically non-decreasing corpus
likelihood, lossless per-word round trip, distributed == local apply.
"""

from __future__ import annotations

import math
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

from spatialpandas_spark.operators.bpe import _prep_words, word_histogram

__all__ = [
    "train_unigram",
    "train_unigram_from_histogram",
    "unigram_encode",
    "unigram_encode_ids",
    "viterbi_segment",
    "unigram_vocab_ids",
]

_NEG_INF = float("-inf")


def _seed_vocab(
    hist: dict[str, int], max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Substring-count seed: log-prob init proportional to occurrence
    counts; all single characters kept unconditionally."""
    counts: Counter = Counter()
    for w, c in hist.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                counts[w[i:j]] += c
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[: max(0, seed_size - len(chars))]
    total = sum(counts[p] for p in chars) + sum(counts[p] for p in multi)
    return {
        p: math.log(counts[p] / total) for p in sorted(chars | set(multi))
    }


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[float, dict[str, float]]:
    """(log Z, expected piece counts) for one word under the unigram
    model — the standard lattice forward-backward with logsumexp."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = _NEG_INF
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None or alpha[i] == _NEG_INF:
                continue
            v = alpha[i] + lp
            acc = v if acc == _NEG_INF else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        alpha[j] = acc
    if alpha[n] == _NEG_INF:
        return _NEG_INF, {}
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = _NEG_INF
        for j in range(i + 1, min(i + max_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == _NEG_INF:
                continue
            v = lp + beta[j]
            acc = v if acc == _NEG_INF else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        beta[i] = acc
    z = alpha[n]
    exp: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or beta[j] == _NEG_INF:
                continue
            exp[piece] = exp.get(piece, 0.0) + math.exp(
                alpha[i] + lp + beta[j] - z
            )
    return z, exp


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int = 8
) -> list[str]:
    """Max-probability segmentation (ties: the later split point wins,
    i.e. the SHORTEST final piece — deterministic). Characters absent
    from the vocabulary become single-char pieces at a floor score so
    any word segments (the SentencePiece unk-coverage behavior)."""
    n = len(word)
    floor = min(logp.values(), default=0.0) - 10.0
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                lp = floor if j - i == 1 else None
            if lp is None or best[i] == _NEG_INF:
                continue
            v = best[i] + lp
            if v >= best[j]:
                best[j] = v
                back[j] = i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def _piece_loss(p: str, logp: dict[str, float], expected: dict[str, float],
                max_len: int) -> float:
    """Likelihood LOSS of removing piece ``p`` — the SentencePiece
    pruning criterion: its expected usage times how much worse its best
    ALTERNATIVE segmentation (Viterbi over the remaining pieces) scores.
    A frequent piece whose span is nearly as probable via sub-pieces is
    cheap to drop; a modest piece with no good alternative is kept."""
    alt = viterbi_segment(p, {q: lp for q, lp in logp.items() if q != p},
                          max_len)
    alt_score = sum(
        logp.get(q, min(logp.values()) - 10.0) for q in alt
    )
    return expected.get(p, 0.0) * (logp[p] - alt_score)


def train_unigram_from_histogram(
    hist: dict[str, int],
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    seed_size: int = 20000,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    prune_by: str = "loss",
) -> dict[str, float]:
    """Driver-side unigram trainer: seed -> (EM x em_iters -> prune
    ``prune_frac`` of multi-char pieces) until ``vocab_size``. Returns
    the piece -> log-prob table.

    ``prune_by='loss'`` (default) ranks pieces by the SentencePiece
    likelihood-loss criterion (:func:`_piece_loss` — expected usage
    times the gap to the best alternative segmentation), so a redundant
    high-frequency piece is dropped before a modest piece the model
    actually needs; ``'count'`` is the cruder expected-count ranking
    (kept for comparison; the tests pin that loss pruning never yields
    a worse corpus likelihood)."""
    if not hist:
        raise ValueError("empty histogram")
    if not 0.0 < prune_frac <= 1.0:
        # prune_frac <= 0 would keep every piece each round and loop
        # forever; fail loudly instead of hanging the driver
        raise ValueError("prune_frac must be in (0, 1]")
    if prune_by not in ("loss", "count"):
        raise ValueError(f"unknown prune_by {prune_by!r}")
    logp = _seed_vocab(hist, max_piece_len, seed_size)
    while True:
        expected: dict[str, float] = {}
        for _ in range(em_iters):
            expected = {}
            for w, c in hist.items():
                _, exp = _forward_backward(w, logp, max_piece_len)
                for p, e in exp.items():
                    expected[p] = expected.get(p, 0.0) + c * e
            total = sum(expected.values())
            if total <= 0:
                break
            # pieces with zero (or underflowed-to-zero) expectation keep
            # a floor so they are pruned deterministically instead of
            # tripping log(0)
            logp = {
                p: math.log(max(expected.get(p, 0.0), 1e-10) / total)
                for p in logp
            }
        multi = [p for p in logp if len(p) > 1]
        n_target = max(0, vocab_size - (len(logp) - len(multi)))
        if len(multi) <= n_target:
            break
        keep_n = max(n_target, int(len(multi) * (1.0 - prune_frac)))
        if prune_by == "loss":
            score = {p: _piece_loss(p, logp, expected, max_piece_len)
                     for p in multi}
            kept = sorted(multi, key=lambda p: (-score[p], p))[:keep_n]
        else:
            kept = sorted(multi, key=lambda p: (-logp[p], p))[:keep_n]
        logp = {
            p: lp for p, lp in logp.items() if len(p) == 1 or p in set(kept)
        }
    return logp


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    max_words: int = 1_000_000,
    mode: str = "ascii",
    **kw,
) -> dict[str, float]:
    """Train a unigram piece table from a corpus: one histogram shuffle
    (shared with BPE, including ``mode='bytes'``), then the driver EM.
    ``max_words`` bounds driver memory (kept most-frequent,
    deterministic ties)."""
    rows = (
        word_histogram(docs, text_col, mode=mode)
        .orderBy(F.desc("n"), "word")
        .limit(max_words)
        .collect()
    )
    hist = {r["word"]: r["n"] for r in rows}
    return train_unigram_from_histogram(hist, vocab_size, **kw)


def unigram_vocab_ids(logp: dict[str, float]) -> dict[str, int]:
    """Stable piece -> id map: 0 is UNK, then pieces by descending
    log-prob (ties lexicographic) — deterministic for a given table."""
    vocab = {"<unk>": 0}
    for p in sorted(logp, key=lambda p: (-logp[p], p)):
        vocab[p] = len(vocab)
    return vocab


def _encode_frame(
    docs: DataFrame,
    logp: dict[str, float],
    id_col: str,
    text_col: str,
    mode: str,
    max_piece_len: int,
    ids: bool,
) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    spark = docs.sparkSession
    vocab = unigram_vocab_ids(logp) if ids else None
    bc = spark.sparkContext.broadcast((dict(logp), vocab))
    value_field = (
        StructField("token_ids", ArrayType(IntegerType()))
        if ids
        else StructField("tokens", ArrayType(StringType()))
    )
    out_schema = StructType(
        [
            StructField(id_col, docs.schema[id_col].dataType),
            value_field,
            StructField("n_tokens", IntegerType()),
        ]
    )
    prepped, words_of = _prep_words(docs, id_col, text_col, mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table, voc = bc.value
        cache: dict[str, list] = {}
        for pdf in batches:
            out_ids, vals, ns = [], [], []
            for did, raw in zip(pdf[id_col], pdf["__w"]):
                row: list = []
                for w in words_of(raw):
                    seg = cache.get(w)
                    if seg is None:
                        seg = viterbi_segment(w, table, max_piece_len)
                        if voc is not None:
                            seg = [voc.get(p, 0) for p in seg]
                        cache[w] = seg
                    row.extend(seg)
                out_ids.append(did)
                vals.append(row)
                ns.append(len(row))
            yield pd.DataFrame(
                {
                    id_col: out_ids,
                    value_field.name: vals,
                    "n_tokens": ns,
                }
            )

    return prepped.mapInPandas(run, out_schema)


def unigram_encode(
    docs: DataFrame,
    logp: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ascii",
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi-tokenize documents: ``(id_col, tokens array<string>,
    n_tokens)`` — Arrow batches, distinct-word cache (Zipf)."""
    return _encode_frame(
        docs, logp, id_col, text_col, mode, max_piece_len, ids=False
    )


def unigram_encode_ids(
    docs: DataFrame,
    logp: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ascii",
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi tokenization + stable vocab lookup in one pass:
    ``(id_col, token_ids array<int>, n_tokens)``; out-of-vocab
    single-char floor pieces map to 0 (UNK)."""
    return _encode_frame(
        docs, logp, id_col, text_col, mode, max_piece_len, ids=True
    )


def save_unigram(logp: dict[str, float], path: str, mode: str = "ascii",
                 filesystem=None) -> None:
    """Persist a trained piece table as a JSON sidecar (object-store fs
    layer) — full float repr, so the loaded table segments identically."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    _fs.write_text(
        path,
        json.dumps(
            {
                "format": "unigram",
                "mode": mode,
                "pieces": [[p, repr(lp)] for p, lp in sorted(logp.items())],
            }
        ),
        filesystem=filesystem,
    )


def load_unigram(path: str, filesystem=None) -> tuple[dict[str, float], str]:
    """(piece table, mode) from :func:`save_unigram` output."""
    import json

    from spatialpandas_spark.sources import fs as _fs

    d = json.loads(_fs.read_text(path, filesystem=filesystem))
    if d.get("format") != "unigram":
        raise ValueError(f"not a unigram tokenizer sidecar: {path}")
    return {p: float(lp) for p, lp in d["pieces"]}, d.get("mode", "ascii")
