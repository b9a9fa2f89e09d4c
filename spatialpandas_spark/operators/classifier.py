"""Model-based document quality filtering (fasttext-style linear
classifier over hashed n-gram features), trained and served in-Spark.

The standard LLM-curation shape (CCNet/GPT-3 style quality filters): a
linear classifier over bag-of-hashed-ngrams separates wanted from
unwanted documents orders of magnitude better than handwritten
heuristics, and scoring stays scan-speed. Pieces:

- ``hash_buckets``: tokens + word bigrams -> feature bucket ids, as a
  pure Catalyst expression. The bucket hash is the 60-bit md5-prefix
  integer (same construction as the MinHash base hash,
  operators/dedup.py) so a SQL engine can replay scoring exactly — NOT
  MLlib's HashingTF murmur3, which has no cross-engine twin.
- ``train_quality_classifier``: MLlib ``LogisticRegression`` over
  sparse count vectors assembled from the buckets (Arrow batch pass).
  Returns a plain dict model {weights, intercept, n_features, lowercase}
  — serving needs numpy, not an MLlib runtime.
- ``score_documents``: sigmoid(intercept + sum over tokens of
  weights[bucket]) via one ``mapInPandas`` numpy kernel (np.bincount
  per batch, vectorized); deterministic given the model.
- ``quality_filter``: keep rows with score >= min_score.

Scale notes (100 TB): training input is typically a small labeled set
(fits one MLlib job); scoring is embarrassingly parallel — one Arrow
pass, weights broadcast by closure (n_features * 8 B; the 2^18 default
is 2 MiB). No shuffle anywhere in serving.

Reference parity note: the reference library has no classifier surface;
this implements the builder brief's training-data-pipeline mandate
(SURVEY addendum), alongside the heuristic quality_score
(operators/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column, lowercase: bool = True) -> Column:
    t = F.lower(text) if lowercase else text
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def _md5_bucket(s: Column, n_features: int) -> Column:
    # 60-bit md5-prefix integer, pmod into the feature space — the same
    # cross-engine-replayable hash family as the MinHash base hash
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        F.lit(n_features),
    )


def hash_buckets(
    text: Column, n_features: int = 1 << 18, lowercase: bool = True
) -> Column:
    """array<long> of feature bucket ids: one per token plus one per
    word bigram (the fasttext recipe). Empty/whitespace text -> empty
    array.

    The token array is LET-BOUND (``let_``) so the document split runs
    once per row; the original ``element_at(toks, i)``-in-a-lambda
    formulation re-ran the full split per bigram — O(tokens x chars)
    interpreted per row, a single-task-for-hours scale bug caught by
    the sf1 rehearsal. Bigrams pair two slices with ``zip_with``
    (argument expressions evaluate once)."""
    from spatialpandas_spark.functions.measures import let_

    def body(toks: Column) -> Column:
        n = F.size(toks)
        bigrams = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1),
                F.slice(toks, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bigrams)
        return F.transform(grams, lambda g: _md5_bucket(g, n_features))

    # null text scores like empty text (intercept only), not as null
    return F.coalesce(
        let_(_tokens(text, lowercase), body),
        F.array().cast("array<long>"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 18,
    lowercase: bool = True,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> dict:
    """Fit the linear classifier; ``label_col`` is 0/1 (1 = keep).
    Returns the portable model dict consumed by ``score_documents``."""
    import numpy as np
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql.types import DoubleType, StructField, StructType

    feats = labeled.select(
        F.col(label_col).cast("double").alias("label"),
        hash_buckets(F.col(text_col), n_features, lowercase).alias("__b"),
    )

    schema = StructType(
        [
            StructField("label", DoubleType()),
            StructField("features", VectorUDT()),
        ]
    )

    # VectorUDT cannot ride through Arrow (mapInPandas rejects it), so
    # vector assembly goes through the pickled-RDD path — acceptable
    # because the LABELED TRAINING SET is small by contract (the 100 TB
    # side of this operator is scoring, which is Arrow end-to-end)
    def to_vector(row):
        idx, cnt = np.unique(
            np.asarray(row["__b"], dtype=np.int64), return_counts=True
        )
        return (
            float(row["label"]),
            SparseVector(n_features, idx.tolist(), cnt.astype(float).tolist()),
        )

    train_df = labeled.sparkSession.createDataFrame(
        feats.rdd.map(to_vector), schema
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    m = lr.fit(train_df)
    return {
        "weights": m.coefficients.toArray().tolist(),
        "intercept": float(m.intercept),
        "n_features": n_features,
        "lowercase": lowercase,
    }


def score_documents(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    score_col: str = "quality_prob",
    link: str = "prob",
) -> DataFrame:
    """Append sigmoid(intercept + sum weights[bucket]) per document —
    one Arrow pass, weights carried in the kernel closure.

    ``link="margin"`` emits the raw linear margin instead of the
    sigmoid: monotone-equivalent for thresholding, and — with dyadic
    (k/2^m) weights — EXACTLY representable and order-independent under
    float addition, which is what makes the margin replayable
    bit-for-bit by a SQL engine (the correctness gate uses this; the
    sigmoid involves exp(), whose last-ulp behavior is libm-specific)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    w = np.asarray(model["weights"], dtype=np.float64)
    b = float(model["intercept"])
    nf = int(model["n_features"])

    buck = df.withColumn(
        "__b", hash_buckets(F.col(text_col), nf, model["lowercase"])
    )
    schema = StructType(
        list(df.schema.fields) + [StructField(score_col, DoubleType())]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            margins = np.empty(len(pdf), dtype=np.float64)
            for i, buckets in enumerate(pdf["__b"]):
                bk = np.asarray(buckets, dtype=np.int64)
                margins[i] = b + (
                    w[bk].sum() if len(bk) else 0.0
                )
            out = pdf.drop(columns=["__b"])
            out[score_col] = (
                margins if link == "margin" else 1.0 / (1.0 + np.exp(-margins))
            )
            yield out

    return buck.mapInPandas(score, schema)


def quality_filter(
    df: DataFrame,
    model: dict,
    min_score: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents the classifier scores >= ``min_score``; column set
    passes through untouched."""
    scored = score_documents(df, model, text_col, "__q")
    return scored.filter(F.col("__q") >= min_score).drop("__q")
