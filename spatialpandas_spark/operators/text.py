"""Text-analysis operators for training-data pipelines.

All pure JVM column expressions (regex + higher-order functions) so they run
at scan speed at 100 TB — no Python UDFs. Each has a closed-form definition
that an external SQL engine can mirror exactly (the DuckDB oracles in
``__spark_entry__.py`` do).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spatialpandas_spark.functions.measures import _seq0
from spatialpandas_spark.operators.dedup import tokens, word_shingles


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


#: GPT-2-style pretokenizer pattern (public BPE convention: contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs,
#: whitespace), restricted to lookahead-free ASCII classes so Java regex
#: (Spark) and RE2 (DuckDB oracle) tokenize identically.
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|'|\s+"


def bpe_token_count(text: Column) -> Column:
    """Subword-ish token count under the BPE pretokenizer regex — the
    budget estimator an LLM-data pipeline filters on (whitespace counts
    undercount punctuation-heavy text). Null-safe: null text -> 0."""
    return F.coalesce(
        F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)),
        F.lit(0),
    )


def avg_word_length(text: Column) -> Column:
    n = token_count(text)
    total = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


#: tiny built-in stopword lists per language — enough for a deterministic
#: n-gram/stopword language-ID heuristic on latin-script text
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "las", "es", "no", "un", "una", "por", "para"],
}


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang`."""
    toks = tokens(text)
    n = F.size(toks)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS[lang]))
    )
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: the language with the most stopword hits
    ('und' — undetermined — when no list scores a hit). Deterministic
    tie-break by language code order en < de < fr < es (first max wins)."""
    toks = tokens(text)

    def hits(code: str) -> Column:
        words = list(_STOPWORDS[code])
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = [(code, hits(code)) for code in _STOPWORDS]
    top = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for code, score in reversed(scores):
        out = F.when(score == top, F.lit(code)).otherwise(out)
    return F.when(top == 0, F.lit("und")).otherwise(out)


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4 * length_score (saturating at 200 tokens)
    + 0.3 * stopword presence (en-list ratio, saturating at 0.4)
    + 0.3 * alpha ratio (alphabetic+space chars / all chars)."""
    n = token_count(text)
    length_score = F.least(n.cast("double") / F.lit(200.0), F.lit(1.0))
    sw = F.least(stopword_ratio(text, "en") / F.lit(0.4), F.lit(1.0))
    total_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z\s]", ""))
    alpha_ratio = F.when(
        total_chars > 0, alpha_chars.cast("double") / total_chars
    ).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * length_score + F.lit(0.3) * sw + F.lit(0.3) * alpha_ratio
    )


def doc_fingerprint(text: Column, shingle_n: int = 3, k: int = 8) -> Column:
    """Bottom-k sketch fingerprint: the k smallest xxhash64 values over the
    document's word n-gram shingles, re-hashed into one 64-bit value. Two
    documents sharing most shingles collide with high probability — a cheap
    near-dup blocking key (winnowing-style selection, Schleimer et al.)."""
    hashes = F.array_sort(
        F.transform(word_shingles(text, shingle_n), lambda s: F.xxhash64(s))
    )
    bottom = F.slice(hashes, 1, k)
    return F.xxhash64(F.concat_ws(",", F.transform(bottom, lambda h: h.cast("string"))))


def term_counts(df, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus vocabulary statistics: per term, total occurrences (``tf``)
    and document frequency (``df`` — number of distinct docs containing
    it). One explode + one groupBy: the shuffle key is the term, map-side
    partial aggregation keeps the exploded volume bounded, and at 100 TB
    AQE's skew handling covers stopword-heavy keys."""
    t = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    return t.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.count_distinct("__doc").alias("df"),
    )


def top_terms(
    df,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
):
    """The k most frequent terms (ties broken alphabetically) with their
    corpus tf/df — vocabulary building for tokenizer training or stopword
    discovery. ``orderBy().limit()`` compiles to TakeOrderedAndProject:
    per-partition heaps merged on the driver, never a global sort."""
    tc = term_counts(df, id_col, text_col)
    return (
        tc.filter(F.col("df") >= min_df)
        .orderBy(F.col("tf").desc(), F.col("term"))
        .limit(k)
    )


#: PII/noise patterns — restricted to the RE2-compatible subset (no
#: lookaround, no backrefs) so any engine's regex evaluates identically
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def scrub_pii(text: Column) -> Column:
    """Replace URLs, emails, IPv4 addresses, and phone-like digit runs
    with placeholder tokens — the standard pre-training scrub pass.
    Order matters: URLs first (they may contain @ and dots), then emails,
    IPs, then phones (dot-free, so IP replacement does not feed it).
    Pure JVM regexp_replace chain: scan-speed, no shuffle."""
    out = F.regexp_replace(text, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of a document's non-empty lines that are duplicates of an
    earlier line — the classic boilerplate/repetition quality signal
    (navigation bars, repeated headers). Whole computation is doc-local
    array algebra (split → trim → distinct): scan speed, no shuffle."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n = F.size(lines)
    d = F.size(F.array_distinct(lines))
    return F.when(n > 0, (n - d).cast("double") / n).otherwise(F.lit(0.0))


def top_ngram_fraction(text: Column, n: int = 2) -> Column:
    """Fraction of the document's tokens covered by its single most
    frequent word ``n``-gram (Gopher-style repetition signal; capped at
    1.0 because overlapping occurrences can over-count). Doc-local and
    quadratic in the number of distinct n-grams — bounded by document
    length, which is bounded by ingest policy, so it stays a scan-speed
    expression with no shuffle at any corpus size.

    Both the token array and the shingle array are LET-BOUND
    (``let_``): without binding, every ``filter(sh, ...)`` inside the
    per-distinct-gram lambda re-built the whole shingle array (which
    itself re-split the document per shingle) — a multiplicative
    interpreted blowup the sf1 rehearsal caught as a pinned task."""
    from spatialpandas_spark.functions.measures import let_

    def with_toks(toks: Column) -> Column:
        cnt = F.size(toks) - F.lit(n - 1)
        sh_expr = F.transform(
            _seq0(cnt), lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        )

        def with_sh(sh: Column) -> Column:
            maxc = F.array_max(
                F.transform(
                    F.array_distinct(sh),
                    lambda g: F.size(F.filter(sh, lambda x: x == g)),
                )
            )
            ntok = F.size(toks)
            return F.when(
                (ntok > 0) & (F.size(sh) > 0),
                F.least((maxc * F.lit(n)).cast("double") / ntok, F.lit(1.0)),
            ).otherwise(F.lit(0.0))

        return let_(sh_expr, with_sh)

    return let_(tokens(text), with_toks)


def normalize_text(text: Column) -> Column:
    """Canonical text form: lowercase, whitespace runs collapsed to one
    space, trimmed. The usual prelude to hashing/dedup so formatting
    differences do not defeat exact dedup."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


# --------------------------------------------------------- URL / domain ops


URL_RE = "https?://[^\\s\"'<>]+"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in the text, in order (RE2-safe character-class
    regex, no backtracking). The standard first step of web-corpus
    domain accounting."""
    return F.regexp_extract_all(text, F.lit(URL_RE), F.lit(0))


def url_host(url: Column) -> Column:
    """Hostname of a URL, lowercased (JVM ``parse_url`` — scan speed)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def doc_hosts(text: Column) -> Column:
    """Distinct lowercased hostnames referenced by a document."""
    return F.array_distinct(
        F.filter(
            F.transform(extract_urls(text), url_host),
            lambda h: h.isNotNull(),
        )
    )


def host_suffixes(host: Column) -> Column:
    """Every registrable suffix of a hostname: ``a.b.co`` ->
    ``[a.b.co, b.co, co]``. Turns "blocked domain or any subdomain"
    matching into a plain EQUI-join key (suffix chains are <= ~6 long),
    so the blocklist join stays a broadcast hash join — never a
    nested-loop ``endswith`` scan."""
    from spatialpandas_spark.functions.measures import let_

    def body(parts: Column) -> Column:
        n = F.size(parts)
        return F.transform(
            _seq0(n), lambda i: F.array_join(F.slice(parts, i + 1, n - i), ".")
        )

    return let_(F.split(host, "\\."), body)


def host_counts(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-level host frequency: ``(host, n_docs, n_refs)`` —
    explode + one groupBy (n_docs counts a host once per document)."""
    per_doc = docs.select(
        F.col(id_col).alias("__did"),
        F.explode(
            F.filter(
                F.transform(extract_urls(F.col(text_col)), url_host),
                lambda h: h.isNotNull(),
            )
        ).alias("host"),
    )
    return per_doc.groupBy("host").agg(
        F.count_distinct("__did").alias("n_docs"),
        F.count("*").alias("n_refs"),
    )


def filter_blocklisted_hosts(
    docs,
    blocklist,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Drop documents that reference any blocklisted host — by exact
    lowercase hostname or any subdomain of a blocked host (the
    domain-blocklist curation step). ``blocklist`` is a DataFrame with a
    ``host`` column or a plain list of hostnames.

    Scale shape: documents with at least one URL explode to
    (id, host-suffix) pairs (see :func:`host_suffixes`) and equi-join
    the broadcast blocklist; matching ids LEFT ANTI join back.
    Documents with no URLs never enter the join."""
    from pyspark.sql import DataFrame

    spark = docs.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(h.lower(),) for h in blocklist], "host string"
        )
    sufs = docs.select(
        F.col(id_col),
        F.explode(
            F.flatten(F.transform(doc_hosts(F.col(text_col)), host_suffixes))
        ).alias("host"),
    )
    bad = sufs.join(F.broadcast(blocklist), "host", "inner").select(id_col).distinct()
    return docs.join(bad, id_col, "left_anti")


def corpus_profile(docs, id_col: str = "doc_id", text_col: str = "text"):
    """One-row corpus report — the look-before-you-train profile:
    document/empty counts, token totals and exact percentiles, language
    distribution entropy + modal language, mean quality score, and the
    exact-duplicate rate (1 - distinct(normalized md5)/non-empty docs).

    The language columns use the cheap pure-Catalyst stopword heuristic
    (latin-script en/de/fr/es only — this keeps the profile a single
    codegen'd scan and its oracle trivially replayable). For a REAL
    multilingual distribution use ``CorpusFrame.languages()``, which
    serves the 23-language classifier (operators/langid.py).

    Scale shape: a single full-scan aggregate plus one distinct-count
    aggregate, joined as 1-row frames (broadcast). Exact percentiles use
    the SQL ``percentile`` aggregate — at 100 TB swap for
    ``percentile_approx`` if the token-count column's sort spills; the
    profile is advisory, the rest of the row is exact either way."""
    text = F.col(text_col)
    toks = token_count(text)
    lang = lang_id(text)
    q = quality_score(text)
    nt = F.coalesce(toks, F.lit(0))

    base = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when((text.isNull()) | (F.trim(text) == ""), 1).otherwise(0)).alias(
            "n_empty"
        ),
        F.sum(nt).alias("total_tokens"),
        F.avg(nt).alias("avg_tokens"),
        F.mode(lang).alias("top_lang"),
        F.count_distinct(lang).alias("n_langs"),
        F.avg(q).alias("avg_quality"),
    )
    pcts = docs.select(nt.alias("__nt")).agg(
        F.expr("percentile(__nt, 0.5)").alias("p50_tokens"),
        F.expr("percentile(__nt, 0.9)").alias("p90_tokens"),
    )
    nonempty = docs.filter((text.isNotNull()) & (F.trim(text) != ""))
    dups = nonempty.agg(
        F.count("*").alias("__ne"),
        F.count_distinct(F.md5(normalize_text(text))).alias("__nd"),
    ).select(
        F.when(
            F.col("__ne") > 0,
            1.0 - F.col("__nd").cast("double") / F.col("__ne"),
        )
        .otherwise(F.lit(0.0))
        .alias("exact_dup_rate")
    )
    return base.crossJoin(F.broadcast(pcts)).crossJoin(F.broadcast(dups))
