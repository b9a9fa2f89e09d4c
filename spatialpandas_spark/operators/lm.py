"""Unigram language-model scoring (CCNet-style perplexity proxy).

The public web-corpus recipe (CCNet, Wenzek et al. 2020) filters
documents by language-model perplexity. A full KenLM is out of scope for
a SQL engine, but its cheapest faithful proxy — a unigram model fit on
the corpus itself — is exactly expressible as two relational passes:

- **fit**: one ``groupBy(token)`` count over the exploded corpus (one
  shuffle, map-side combine; the model is ``|vocab|`` rows — millions at
  worst, MBs on disk);
- **score**: explode each document to tokens, join the model on the
  token key, and average ``ln p(token)`` per document — one join keyed
  by token plus one ``groupBy(doc)``. The model side is broadcast when
  it fits (Spark's AQE threshold decides); otherwise it is a plain
  shuffle hash join on a uniform key. Either way the corpus is scanned
  once and never collected.

Out-of-vocabulary tokens (scoring against a model fit elsewhere) get a
floor probability of ``1 / (total + vocab)`` — the add-one smoothing
mass — so scores stay finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup import tokens


def unigram_fit(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Fit a unigram model: one row per distinct token with its corpus
    count and log-probability ``ln(count / total)``. Columns:
    ``(token, n, logp)``."""
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("n"))
    # a window-over-nothing for the total would single-task the model;
    # a scalar agg + broadcast cross join keeps both passes distributed
    tot = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "token",
            "n",
            F.log(F.col("n").cast("double") / F.col("__total")).alias("logp"),
        )
    )


def unigram_logprob(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a fitted unigram model: mean token
    log-probability (higher = more typical of the model corpus).
    Returns ``(id_col, n_tokens, avg_logp)``; empty documents score
    NULL. OOV tokens get the smoothing floor ``ln(1/(total+vocab))``
    where total/vocab come from the model."""
    stats = model.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__vocab")
    )
    floor = F.log(
        F.lit(1.0) / (F.col("__total") + F.col("__vocab")).cast("double")
    )
    ex = docs.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("token")
    )
    joined = (
        ex.join(model.select("token", "logp"), "token", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "token",
            F.when(F.col("token").isNull(), F.lit(None).cast("double"))
            .otherwise(F.coalesce(F.col("logp"), floor))
            .alias("__lp"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count("token").alias("n_tokens"),
        F.avg("__lp").alias("avg_logp"),
    )


BOS = "<s>"  # sentence/document start context for the first token


def _bigram_pairs(text, id_col_expr):
    """(prev, token) pairs per document, with a BOS context before the
    first token — pure array expressions, no UDF."""
    toks = tokens(text)
    # greatest(…, 0): slice() under ANSI mode rejects a negative length
    # for the empty-document case
    prevs = F.concat(
        F.array(F.lit(BOS)),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    return F.explode_outer(F.arrays_zip(prevs.alias("prev"), toks.alias("token")))


def bigram_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fit a bigram model: one row per (prev, token) with its count and
    conditional log-probability ``ln(n(prev, token) / n(prev))``.
    Columns: ``(prev, token, n, logp)``.

    Scale shape: one explode + one ``groupBy(prev, token)`` count, then
    a window-free second aggregation for the per-``prev`` totals joined
    back on ``prev`` (both shuffles key on token-ish columns with
    natural cardinality; no single-partition exchange)."""
    ex = docs.select(
        _bigram_pairs(F.col(text_col), None).alias("p")
    ).select("p.prev", "p.token").filter(F.col("token").isNotNull())
    pair_counts = ex.groupBy("prev", "token").agg(F.count("*").alias("n"))
    prev_totals = pair_counts.groupBy("prev").agg(F.sum("n").alias("__pn"))
    return pair_counts.join(prev_totals, "prev").select(
        "prev",
        "token",
        "n",
        F.log(F.col("n").cast("double") / F.col("__pn")).alias("logp"),
    )


def bigram_logprob(
    docs: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated bigram scoring — the Jelinek-Mercer recipe:
    ``p(tok | prev) = lam * p_bi(tok | prev) + (1 - lam) * p_uni(tok)``,
    averaged as log-prob per document. An unseen bigram backs off to the
    unigram term alone; an unseen token gets the unigram smoothing
    floor. Returns ``(id_col, n_tokens, avg_logp)``.

    Scale shape: two equi-joins — (prev, token) against the bigram
    model and (token) against the unigram model — plus one
    ``groupBy(doc)``; both model sides broadcast when small, shuffle
    hash otherwise. The corpus is scanned once and never collected."""
    stats = unigram.agg(
        F.sum("n").alias("__total"), F.count("*").alias("__vocab")
    )
    floor = F.lit(1.0) / (F.col("__total") + F.col("__vocab")).cast("double")
    ex = docs.select(
        F.col(id_col), _bigram_pairs(F.col(text_col), None).alias("p")
    ).select(id_col, "p.prev", "p.token")
    j = (
        ex.join(
            bigram.select("prev", "token", F.col("logp").alias("__blp")),
            ["prev", "token"],
            "left",
        )
        .join(
            unigram.select("token", F.col("logp").alias("__ulp")), "token", "left"
        )
        .crossJoin(F.broadcast(stats))
    )
    p_uni = F.coalesce(F.exp(F.col("__ulp")), floor)
    p_bi = F.coalesce(F.exp(F.col("__blp")), F.lit(0.0))
    lp = F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)
    scored = j.select(
        id_col,
        "token",
        F.when(F.col("token").isNull(), F.lit(None).cast("double"))
        .otherwise(lp)
        .alias("__lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count("token").alias("n_tokens"),
        F.avg("__lp").alias("avg_logp"),
    )
