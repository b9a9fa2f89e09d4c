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
