"""Benchmark decontamination for training corpora.

A pretraining pipeline must drop (or flag) documents that overlap an
evaluation benchmark, or downstream eval numbers are meaningless. The
standard public recipe (GPT-2/GPT-3 appendix-style n-gram overlap) is:
shingle both corpora into word n-grams, and flag any training document
whose shingle set overlaps the benchmark's shingle set above a threshold.

Spark shape, designed for the 100 TB / small-benchmark asymmetry:

- the benchmark side (MBs: eval sets are thousands of documents) is
  reduced to its DISTINCT shingle set and **broadcast** — the 100 TB
  training side is never shuffled for the membership test;
- the training side is exploded to (doc, shingle) pairs, left-joined
  against the broadcast set (map-side, no exchange), and re-aggregated
  per document — exactly one shuffle, keyed by doc id, with map-side
  partial counts;
- docs too short to shingle survive via ``explode_outer`` with overlap 0.

No Python in the pipeline: shingling is the same JVM higher-order
expression used by MinHash (``operators/dedup.py``), so decontamination
composes with dedup at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup import word_shingles


def benchmark_shingles(
    bench: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """The benchmark corpus reduced to its distinct word-``n``-gram set
    (one column ``s``). This is the broadcast side of decontamination:
    distinct-aggregate it once, reuse it across every training shard."""
    return (
        bench.select(F.explode(word_shingles(F.col(text_col), n)).alias("s"))
        .distinct()
    )


def ngram_overlap(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document contamination: the fraction of the document's distinct
    word ``n``-grams that occur anywhere in the benchmark corpus.

    Returns ``(id_col, total_ngrams, matched_ngrams, overlap)`` with
    ``overlap = matched/total`` (0.0 for docs with no shingles). One
    broadcast join + one groupBy(doc) shuffle; the benchmark side must be
    broadcast-sized (true for every real eval suite).
    """
    bset = benchmark_shingles(bench, bench_text_col, n).withColumn(
        "__hit", F.lit(1)
    )
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(word_shingles(F.col(text_col), n)).alias("s"),
    )
    joined = exploded.join(F.broadcast(bset), "s", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("s").alias("total_ngrams"),
        F.count("__hit").alias("matched_ngrams"),
    )
    return agg.withColumn(
        "overlap",
        F.when(
            F.col("total_ngrams") > 0,
            F.col("matched_ngrams").cast("double") / F.col("total_ngrams"),
        ).otherwise(F.lit(0.0)),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    threshold: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Drop training documents whose benchmark n-gram overlap is
    ``>= threshold``. The flagged-id set is tiny (contamination is rare),
    so the removal is a broadcast anti-join — the corpus itself is never
    shuffled."""
    flagged = (
        ngram_overlap(docs, bench, id_col, text_col, bench_text_col, n)
        .filter(F.col("overlap") >= F.lit(float(threshold)))
        .select(id_col)
    )
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
