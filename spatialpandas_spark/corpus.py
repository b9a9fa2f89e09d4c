"""CorpusFrame: the curation-side facade, mirroring ``SpatialFrame``.

One object wraps (DataFrame, id column, text column) and exposes the
training-data pipeline surface as chainable methods, so a user composes
the same flows the operators provide — profile, quality-filter, dedup,
decontaminate, tokenize, search, shard — without importing a dozen
modules. Every method delegates to the corresponding operator
(each independently oracle-tested); the facade adds no logic of its
own beyond column-name plumbing, so there is nothing here to get out of
sync. ``df`` stays accessible as ``.df`` at every step.

Typical flow::

    c = CorpusFrame(spark.read.parquet(".../documents.parquet"))
    stats = c.profile()                                # look first
    clean = (
        c.filter_quality(min_score=0.3)
         .filter_blocklisted_hosts(["spam.example"])
         .dedup_exact()
    )
    merges = clean.train_bpe(n_merges=32_000)
    clean.write_training_shards(merges, "/data/shards", shard_tokens=2**20)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _binom_ucb(n_found: int, n_probed: int, alpha: float = 0.025) -> float:
    """Exact one-sided Clopper-Pearson upper confidence bound for a
    binomial proportion: the smallest ``p`` with
    ``P(X <= n_found | n_probed, p) <= alpha`` (bisection on the exact
    binomial CDF via lgamma — no scipy). At ``n_found=0`` this is
    ``1 - alpha**(1/n)`` (~3.689/n for alpha=0.025, the "rule of 3.7");
    for ``n_found >= 1`` it is strictly wider than the rule-of-three
    ``(n_found+3)/n`` shortcut that ADVICE r9 flagged as
    anti-conservative (e.g. n_found=5, n=8192: ~10.5/8192 vs 8/8192)."""
    if n_probed <= 0 or n_found >= n_probed:
        return 1.0
    from math import exp, lgamma, log, log1p

    lc = [
        lgamma(n_probed + 1) - lgamma(i + 1) - lgamma(n_probed - i + 1)
        for i in range(n_found + 1)
    ]

    def cdf(p: float) -> float:
        lp, lq = log(p), log1p(-p)
        return sum(
            exp(lc[i] + i * lp + (n_probed - i) * lq)
            for i in range(n_found + 1)
        )

    lo, hi = n_found / n_probed, 1.0
    for _ in range(80):  # cdf is decreasing in p; hi always satisfies
        mid = (lo + hi) / 2
        if cdf(mid) > alpha:
            lo = mid
        else:
            hi = mid
    return hi


class CorpusFrame:
    """A DataFrame + (id column, text column) pair with the curation
    method surface. ``df`` stays accessible as ``.df``."""

    def __init__(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col

    # ------------------------------------------------------------- util
    def _wrap(self, df: DataFrame) -> CorpusFrame:
        return CorpusFrame(df, self.id_col, self.text_col)

    def count(self) -> int:
        return self.df.count()

    # ----------------------------------------------------------- report
    def profile(self) -> DataFrame:
        from spatialpandas_spark.operators.text import corpus_profile

        return corpus_profile(self.df, self.id_col, self.text_col)

    def host_counts(self) -> DataFrame:
        from spatialpandas_spark.operators.text import host_counts

        return host_counts(self.df, self.id_col, self.text_col)

    # ---------------------------------------------------------- filters
    def filter_quality(self, min_score: float = 0.3) -> CorpusFrame:
        from spatialpandas_spark.operators.text import quality_score

        return self._wrap(
            self.df.filter(quality_score(F.col(self.text_col)) >= min_score)
        )

    def filter_language(self, langs, method: str = "classifier") -> CorpusFrame:
        """Keep rows the language identifier assigns to ``langs``.
        ``method="classifier"`` (default) uses the shipped 23-language
        hashed char-n-gram model (operators/langid.py — covers
        non-latin scripts); ``"heuristic"`` is the cheap pure-Catalyst
        4-language stopword scorer."""
        if method == "heuristic":
            from spatialpandas_spark.operators.text import lang_id

            return self._wrap(
                self.df.filter(
                    lang_id(F.col(self.text_col)).isin(list(langs))
                )
            )
        if method != "classifier":
            raise ValueError(f"unknown language-ID method {method!r}")
        from spatialpandas_spark.operators.langid import classify_language

        scored = classify_language(self.df, self.text_col, "__lang")
        return self._wrap(
            scored.filter(F.col("__lang").isin(list(langs))).drop("__lang")
        )

    def languages(self) -> DataFrame:
        """Per-language document counts under the shipped classifier —
        the corpus-profile language distribution a multilingual crawl
        needs (the stopword heuristic mislabels non-latin scripts)."""
        from spatialpandas_spark.operators.langid import classify_language

        return (
            classify_language(self.df, self.text_col, "lang_pred")
            .groupBy("lang_pred")
            .agg(F.count("*").alias("n_docs"))
        )

    def language_segments(self, sep: str = "\n", min_chars: int = 1) -> DataFrame:
        """Per-paragraph language labels for every document — the
        mixed-language-page view whole-document argmax flattens
        (operators/langid.classify_language_segments)."""
        from spatialpandas_spark.operators.langid import (
            classify_language_segments,
        )

        return classify_language_segments(
            self.df, self.text_col, sep=sep, min_chars=min_chars
        )

    def filter_blocklisted_hosts(self, blocklist) -> CorpusFrame:
        from spatialpandas_spark.operators.text import (
            filter_blocklisted_hosts,
        )

        return self._wrap(
            filter_blocklisted_hosts(
                self.df, blocklist, self.text_col, self.id_col
            )
        )

    def scrub_pii(self) -> CorpusFrame:
        from spatialpandas_spark.operators.text import scrub_pii

        return self._wrap(
            self.df.withColumn(self.text_col, scrub_pii(F.col(self.text_col)))
        )

    # ------------------------------------------------------------ dedup
    def dedup_exact(self) -> CorpusFrame:
        from spatialpandas_spark.operators.dedup import dedup_exact

        return self._wrap(
            dedup_exact(self.df, [self.text_col], id_col=self.id_col)
        )

    def near_dup_pairs(self, threshold: float = 0.5, **kw) -> DataFrame:
        from spatialpandas_spark.operators.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(
            self.df, id_col=self.id_col, text_col=self.text_col,
            threshold=threshold, **kw
        )

    def dedup_near(self, threshold: float = 0.5, **kw) -> CorpusFrame:
        """Near-duplicate dedup end to end (MinHash-LSH pairs ->
        connected components -> keep the smallest id per cluster) —
        the chainable form of :meth:`near_dup_pairs` + cluster-drop."""
        from spatialpandas_spark.operators.dedup import dedup_near

        return self._wrap(
            dedup_near(
                self.df, id_col=self.id_col, text_col=self.text_col,
                threshold=threshold, **kw
            )
        )

    def decontaminate(
        self,
        benchmark: DataFrame,
        max_overlap: float = 0.5,
        method: str = "broadcast",
        **kw,
    ):
        """Keep documents whose benchmark n-gram overlap is
        ``<= max_overlap``. ``method='bloom'`` scores via
        :func:`~spatialpandas_spark.operators.contamination
        .ngram_overlap_bloom` (value-identical; use when the benchmark
        shingle set exceeds broadcast size)."""
        from spatialpandas_spark.operators.contamination import (
            ngram_overlap,
            ngram_overlap_bloom,
        )

        if method not in ("broadcast", "bloom"):
            raise ValueError(f"unknown decontamination method {method!r}")
        fn = ngram_overlap if method == "broadcast" else ngram_overlap_bloom
        scored = fn(
            self.df, benchmark, id_col=self.id_col, text_col=self.text_col, **kw
        )
        keep = scored.filter(F.col("overlap") <= max_overlap).select(self.id_col)
        return self._wrap(self.df.join(keep, self.id_col, "left_semi"))

    # --------------------------------------------- corpus-level sketches
    def sketch(self, n: int = 5, k: int = 256, **kw) -> DataFrame:
        """KMV bottom-``k`` sketch of this corpus's distinct word-``n``-
        gram set (one corpus scan, ≤ k rows out) — reusable across every
        :meth:`overlap` comparison, so sketch each corpus once and
        compare many."""
        from spatialpandas_spark.operators.sketch import shingle_sketch

        return shingle_sketch(
            self.df, text_col=self.text_col, n=n, k=k, **kw
        )

    def distinct_ngrams(
        self, by: "str | list[str] | None" = None, n: int = 5,
        k: int = 256, **kw,
    ) -> DataFrame:
        """Estimated distinct word-``n``-gram count (per ``by`` group —
        e.g. ``by='source'`` profiles vocabulary diversity per source
        in ONE corpus scan): ``(*by, n_hashes, kth_hash,
        distinct_est)``; groups with fewer than ``k`` distinct grams
        report the exact count."""
        from spatialpandas_spark.operators.sketch import (
            kmv_summary,
            shingle_sketch,
        )

        groups = [by] if isinstance(by, str) else list(by or [])
        sk = shingle_sketch(
            self.df, self.text_col, n=n, k=k, group_cols=groups, **kw
        )
        return kmv_summary(sk, k, group_cols=groups)

    def overlap_matrix(
        self, by: str = "source", n: int = 5, k: int = 256, **kw
    ) -> DataFrame:
        """All-pairs overlap screen across the corpus's own ``by``
        groups (one row per unordered source pair) — the dedup-planning
        report: one corpus scan into grouped sketches, then N²/2 k-row
        comparisons, no corpus joins."""
        from spatialpandas_spark.operators.sketch import (
            kmv_overlap_matrix,
            shingle_sketch,
        )

        sk = shingle_sketch(
            self.df, self.text_col, n=n, k=k, group_cols=[by], **kw
        )
        return kmv_overlap_matrix(sk, k, by)

    def overlap(
        self, other: "CorpusFrame | DataFrame", n: int = 5, k: int = 256,
        seed: int = 42,
    ) -> DataFrame:
        """Corpus-level n-gram overlap SCREEN against another corpus:
        one row of (jaccard, union/intersection estimates, containment
        both ways) from two KMV sketches — each corpus is scanned once,
        nothing is joined across corpora. The cheap first question
        before any exact pass: is a new dump worth ingesting, how much
        do two crawls share. The derived containment numbers resolve
        only down to ~union/k, so they are meaningful for
        similar-sized corpora; for SMALL-in-LARGE containment (is this
        benchmark in my 100 TB corpus) use :meth:`containment` — the
        direct probe whose error is independent of corpus size.
        ``other`` may carry a different text column — each side is
        sketched under its own."""
        from spatialpandas_spark.operators.sketch import (
            kmv_overlap,
            shingle_sketch,
        )

        o = other if isinstance(other, CorpusFrame) else CorpusFrame(other)
        return kmv_overlap(
            shingle_sketch(self.df, self.text_col, n=n, k=k, seed=seed),
            shingle_sketch(o.df, o.text_col, n=n, k=k, seed=seed),
            k,
        )

    def containment(
        self, benchmark: "CorpusFrame | DataFrame", n: int = 5,
        k: int = 8192, seed: int = 42,
    ) -> DataFrame:
        """DIRECT estimate of how much of ``benchmark`` appears in this
        corpus: one row ``(n_probed, n_found, containment_b, exact)``
        from probing the benchmark's own bottom-``k`` shingle hashes
        against one corpus scan. Unlike :meth:`overlap`'s
        ``containment_b`` (derived from the union jaccard — resolution
        ``~union/k``, which goes BLIND for a small benchmark against a
        huge corpus), this probe's error is binomial ``~sqrt(c(1-c)/k)``
        regardless of corpus size, and EXACT whenever the benchmark has
        fewer than ``k`` distinct shingles (the usual eval-set case)."""
        from spatialpandas_spark.operators.sketch import containment_probe

        o = (
            benchmark
            if isinstance(benchmark, CorpusFrame)
            else CorpusFrame(benchmark)
        )
        return containment_probe(
            self.df, o.df, text_col=self.text_col, n=n, k=k, seed=seed,
            bench_text_col=o.text_col,
        )

    def screen_benchmarks(
        self,
        benchmarks: "CorpusFrame | DataFrame",
        group_col: str = "benchmark",
        n: int = 5,
        k: int = 8192,
        seed: int = 42,
    ) -> DataFrame:
        """Containment screen for MANY benchmarks in ONE corpus scan
        (the "dozens of eval sets" pipeline shape): ``benchmarks`` is a
        single frame tagging each eval set's documents with
        ``group_col``; returns one row per benchmark —
        ``(group_col, n_probed, n_found, containment_b, exact)`` — from
        the same direct probe as :meth:`containment`. Feed the rows
        above your threshold to :meth:`decontaminate` individually."""
        from spatialpandas_spark.operators.sketch import containment_probe

        o = (
            benchmarks
            if isinstance(benchmarks, CorpusFrame)
            else CorpusFrame(benchmarks)
        )
        return containment_probe(
            self.df, o.df, text_col=self.text_col, n=n, k=k, seed=seed,
            bench_text_col=o.text_col, bench_group_cols=[group_col],
        )

    def decontaminate_screened(
        self,
        benchmark: DataFrame,
        max_overlap: float = 0.5,
        screen_threshold: float = 1e-3,
        screen_k: int = 8192,
        n: int = 5,
        **kw,
    ):
        """Screen-then-exact decontamination: probe the benchmark's
        containment in the corpus first (:meth:`containment` — the
        DIRECT estimator) and run the exact per-document
        :meth:`decontaminate` pass only when the screen cannot certify
        containment at or below ``screen_threshold``.

        The screen is one corpus scan (shingle + hash + broadcast
        membership — scan speed, no benchmark-set broadcast, and many
        benchmarks can share the scan via
        ``containment_probe(bench_group_cols=...)``); clearing it skips
        the exact pass's heavier per-document overlap aggregation and —
        the real 100 TB win — the filtered-corpus rewrite.

        The skip decision is CONSERVATIVE by construction: with an
        exact probe (benchmark smaller than ``screen_k`` distinct
        shingles — the usual eval set) the measured containment is
        compared to the threshold directly; with a sampled probe the
        screen requires the EXACT 97.5% one-sided Clopper-Pearson upper
        confidence bound (:func:`_binom_ucb` — not the rule-of-three
        ``(n_found+3)/n`` shortcut, which is anti-conservative for
        ``n_found >= 1``, ADVICE r9) to clear the threshold, so the
        earlier small-in-large FALSE-NEGATIVE regime (a fully
        contaminated benchmark reading containment 0.0 from the
        union-jaccard screen) cannot occur: a contaminated benchmark's
        own probes DO hit the corpus no matter how large the corpus is.
        Note ``-ln(0.025)/screen_k`` (~3.689/screen_k) is the smallest
        threshold a sampled probe can certify (default 8192 -> ~4.5e-4
        < the 1e-3 default); below that the exact pass always runs."""
        row = self.containment(benchmark, n=n, k=screen_k).collect()[0]
        if row["n_probed"] == 0:
            return self  # empty benchmark cannot contaminate
        if row["exact"]:
            clean = row["containment_b"] <= screen_threshold
        else:
            ub = _binom_ucb(row["n_found"], row["n_probed"])
            clean = ub <= screen_threshold
        if clean:
            return self
        return self.decontaminate(benchmark, max_overlap=max_overlap, n=n, **kw)

    # ------------------------------------- persistent benchmark index
    def index_benchmarks(
        self, path: str, group_col: str | None = "benchmark", **kw
    ) -> None:
        """Treat THIS frame as the benchmark suite and persist its
        decontamination artifacts (shingle store + bloom + sidecar) at
        ``path`` — build once, then screen/decontaminate every future
        corpus batch via :meth:`screen_index` /
        :meth:`decontaminate_indexed` without re-shingling the
        benchmark text (operators/contamination_index.py)."""
        from spatialpandas_spark.operators.contamination_index import (
            build_decon_index,
        )

        build_decon_index(
            self.df,
            path,
            text_col=self.text_col,
            group_cols=[group_col] if group_col else None,
            **kw,
        )

    def screen_index(self, path: str) -> DataFrame:
        """Containment screen of every benchmark stored at ``path`` in
        THIS corpus — row-identical to :meth:`screen_benchmarks` on the
        original benchmark frame."""
        from spatialpandas_spark.operators.contamination_index import (
            screen_against_index,
        )

        return screen_against_index(self.df, path, text_col=self.text_col)

    def decontaminate_indexed(
        self,
        path: str,
        max_overlap: float = 0.5,
        method: str = "broadcast",
    ) -> CorpusFrame:
        """Keep documents whose overlap with the INDEXED benchmark
        suite is ``<= max_overlap`` — the amortized twin of
        :meth:`decontaminate` (same keep rule)."""
        from spatialpandas_spark.operators.contamination_index import (
            ngram_overlap_against_index,
        )

        scored = ngram_overlap_against_index(
            self.df, path, id_col=self.id_col,
            text_col=self.text_col, method=method,
        )
        keep = scored.filter(F.col("overlap") <= max_overlap).select(
            self.id_col
        )
        return self._wrap(self.df.join(keep, self.id_col, "left_semi"))

    def sample_pps(
        self, step: int, weight_col: str | None = None, **kw
    ) -> CorpusFrame:
        """Weight-proportional systematic sampling (select probability
        = weight/step, exact integer lattice — deterministic on any
        cluster). With ``weight_col=None`` the BPE-pretokenizer token
        count is the weight, same convention as :meth:`pack_sequences`;
        the selection multiplicity lands in ``n_hits``."""
        from spatialpandas_spark.operators.sampling import systematic_sample
        from spatialpandas_spark.operators.text import bpe_token_count

        df, wc = self.df, weight_col
        if wc is None:
            wc = "__w"
            df = df.withColumn(
                wc, bpe_token_count(F.col(self.text_col)).cast("long")
            )
        out = systematic_sample(df, wc, [self.id_col], step, **kw)
        return self._wrap(out.drop("__w") if weight_col is None else out)

    # -------------------------------------------------------- tokenizer
    def train_bpe(self, n_merges: int = 32_000, **kw):
        from spatialpandas_spark.operators.bpe import train_bpe

        return train_bpe(self.df, n_merges=n_merges, text_col=self.text_col, **kw)

    def tokenize(self, merges, ids: bool = False, **kw) -> DataFrame:
        from spatialpandas_spark.operators.bpe import bpe_encode, bpe_encode_ids

        fn = bpe_encode_ids if ids else bpe_encode
        return fn(
            self.df, merges, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def train_wordpiece(self, vocab_size: int = 32_000, **kw):
        from spatialpandas_spark.operators.wordpiece import train_wordpiece

        return train_wordpiece(
            self.df, vocab_size=vocab_size, text_col=self.text_col, **kw
        )

    def tokenize_wordpiece(self, vocab, ids: bool = False, **kw) -> DataFrame:
        from spatialpandas_spark.operators.wordpiece import (
            wordpiece_encode,
            wordpiece_encode_ids,
        )

        fn = wordpiece_encode_ids if ids else wordpiece_encode
        return fn(
            self.df, vocab, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def train_unigram(self, vocab_size: int = 32_000, **kw):
        from spatialpandas_spark.operators.unigram import train_unigram

        return train_unigram(
            self.df, vocab_size=vocab_size, text_col=self.text_col, **kw
        )

    def tokenize_unigram(self, table, ids: bool = False, **kw) -> DataFrame:
        from spatialpandas_spark.operators.unigram import (
            unigram_encode,
            unigram_encode_ids,
        )

        fn = unigram_encode_ids if ids else unigram_encode
        return fn(
            self.df, table, id_col=self.id_col, text_col=self.text_col, **kw
        )

    # ----------------------------------------------------------- search
    def bm25(self, query: str, k: int = 10, **kw) -> DataFrame:
        from spatialpandas_spark.operators.search import bm25_search

        return bm25_search(
            self.df, query, k=k, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def tfidf_vectors(self, dim: int = 256, **kw) -> DataFrame:
        from spatialpandas_spark.operators.search import hashed_tfidf_vectors

        return hashed_tfidf_vectors(
            self.df, dim=dim, id_col=self.id_col, text_col=self.text_col, **kw
        )

    def pack_sequences(
        self, seq_len: int, weight_col: str | None = None, **kw
    ) -> DataFrame:
        """(document, fixed-length training sequence) layout via
        :func:`~spatialpandas_spark.operators.shards
        .pack_token_sequences` — the GPT-style concat-and-chunk step.
        With ``weight_col=None`` each document's weight is its
        BPE-pretokenizer token count (the same counter the shard sink
        uses), computed inline."""
        from pyspark.sql import functions as F

        from spatialpandas_spark.operators.shards import (
            pack_token_sequences,
        )
        from spatialpandas_spark.operators.text import bpe_token_count

        df, wc = self.df, weight_col
        if wc is None:
            wc = "__w"
            df = df.withColumn(
                wc, bpe_token_count(F.col(self.text_col)).cast("long")
            )
        return pack_token_sequences(df, wc, [self.id_col], seq_len, **kw)

    def training_sequences(
        self, merges, seq_len: int, **kw
    ) -> DataFrame:
        """Actual fixed-length training rows in one chain: BPE-id
        tokenization -> concat-and-chunk layout -> per-sequence token
        assembly. Returns ``(seq_id, token_ids, n_tokens)``."""
        from spatialpandas_spark.operators.shards import (
            materialize_token_sequences,
        )

        toks = self.tokenize(merges, ids=True, **kw)
        return materialize_token_sequences(
            toks, seq_len, id_col=self.id_col
        )

    def pack_examples(
        self, budget: int, weight_col: str | None = None, **kw
    ) -> DataFrame:
        """NO-SPLIT example packing via
        :func:`~spatialpandas_spark.operators.shards
        .pack_documents_nextfit` — whole documents into token-budget
        bins (the SFT/attention-masked layout; contrast
        :meth:`pack_sequences`, which splits docs across boundaries).
        With ``weight_col=None`` the BPE-pretokenizer count is computed
        inline, same as :meth:`pack_sequences`."""
        from pyspark.sql import functions as F

        from spatialpandas_spark.operators.shards import (
            pack_documents_nextfit,
        )
        from spatialpandas_spark.operators.text import bpe_token_count

        df, wc = self.df, weight_col
        if wc is None:
            wc = "__w"
            df = df.withColumn(
                wc, bpe_token_count(F.col(self.text_col)).cast("long")
            )
        return pack_documents_nextfit(df, wc, [self.id_col], budget, **kw)

    # ------------------------------------------------------------- sink
    def write_training_shards(
        self, merges, out_dir: str, shard_tokens: int = 1_000_000, **kw
    ) -> dict:
        from spatialpandas_spark.operators.shards import write_training_shards

        return write_training_shards(
            self.df, merges, out_dir, shard_tokens=shard_tokens,
            id_col=self.id_col, text_col=self.text_col, **kw
        )
