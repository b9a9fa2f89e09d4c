"""BM25 full-text retrieval over the documents table — pure relational
algebra, no index library.

The classic Okapi BM25 ranking function decomposes into exactly the
relational pieces a Spark engine is good at:

- **corpus statistics** (one pass): document frequency per term
  (``groupBy(term)`` over distinct (doc, term)), document lengths, and
  the corpus-average length — all reusable across queries, the
  "index build" analog;
- **scoring** (per query): the query's terms (a handful) broadcast
  against the per-document term frequencies, one ``groupBy(doc)`` sum.

Scale shape: the postings frame is (doc_id, term, tf) — the same
explode + groupBy shape as ``term_counts`` — partitioned naturally by
its keys; a query touches only the broadcast-joined slice of postings
for its terms (Catalyst pushes the IN-filter into the scan when the
postings are stored term-partitioned). Nothing is collected; the only
driver-side object is the query string itself.

IDF uses the standard Robertson-Spärck Jones form
``ln(1 + (N - df + 0.5) / (df + 0.5))`` (non-negative); tf saturation
``tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen))``. Oracle-tested against
a plain-python implementation (tests/test_search.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialpandas_spark.operators.dedup import tokens


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document term frequencies + document length:
    ``(doc_id, term, tf, dl)`` — the reusable scoring substrate. One
    explode + one groupBy."""
    ex = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    return ex.groupBy(id_col, "term", "dl").agg(F.count("*").alias("tf"))


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, dl)`` for EVERY document — including empty/null-text
    ones, which the postings frame cannot represent but which still
    count toward N and avgdl in the standard BM25 constants."""
    return docs.select(
        F.col(id_col),
        F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0)).alias("dl"),
    )


def corpus_stats(
    postings: DataFrame,
    doclens: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Document frequency per term plus corpus constants, as one small
    frame ``(term, df, n_docs, avgdl)`` (the constants replicated per
    row so scoring needs no extra join). Pass ``doclens`` (from
    :func:`doc_lengths`) so empty documents count toward N/avgdl per
    the standard definition; without it the constants cover only
    documents that produced at least one term."""
    df_ = postings.groupBy("term").agg(
        F.count_distinct(id_col).alias("df")
    )
    lens = (
        doclens
        if doclens is not None
        else postings.select(id_col, "dl").distinct()
    )
    consts = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return df_.crossJoin(F.broadcast(consts))


def bm25_score_all(
    postings: DataFrame,
    stats: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 scores for EVERY document matching at least one query term:
    ``(doc_id, score)``, unordered. Duplicate query terms add their
    occurrences (standard bag-of-words query semantics). Use
    :func:`bm25_score` for the ranked top-k."""
    spark = postings.sparkSession
    terms = [t for t in query.lower().split() if t]
    if not terms:
        # empty-query schema mirrors the scoring path: id type comes
        # from the postings, not a hardcoded long — string/int doc ids
        # union cleanly with the normal path downstream
        from pyspark.sql.types import DoubleType, StructField, StructType

        empty_schema = StructType(
            [
                StructField(id_col, postings.schema[id_col].dataType),
                StructField("score", DoubleType()),
            ]
        )
        return spark.createDataFrame([], empty_schema)
    qdf = spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).groupBy("term").agg(F.count("*").alias("qtf"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_sat = (
        F.col("tf") * (k1 + 1)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        postings.join(F.broadcast(qdf), "term", "inner")
        .join(F.broadcast(stats), "term", "inner")
        .select(
            id_col,
            (idf * tf_sat * F.col("qtf")).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.sum("__s").alias("score"))
    )


def bm25_score(
    postings: DataFrame,
    stats: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for ``query`` under BM25: ``(doc_id, score)``,
    score descending, ties by id ascending.

    ``k`` must be a genuinely small top-k: ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject, whose per-partition heaps
    allocate O(k) — a "give me everything" k can OOM the JVM (learned
    the hard way: a limit(1e9) variant killed a test session). For all
    matching docs use :func:`bm25_score_all`, which has no ordering
    stage at all."""
    scored = bm25_score_all(postings, stats, query, k1, b, id_col)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def bm25_search(
    docs: DataFrame,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-shot convenience: build postings + stats and score ``query``.
    For repeated queries, build once and call :func:`bm25_score`."""
    postings = build_postings(docs, id_col, text_col)
    stats = corpus_stats(
        postings, doc_lengths(docs, id_col, text_col), id_col
    )
    return bm25_score(postings, stats, query, k1, b, k, id_col)


def hashed_tfidf_vectors(
    docs: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Feature-hashed TF-IDF document vectors: ``(doc_id, vector
    array<double>)`` — the bridge from the text surface to the ANN
    stack (near-dup pairs, cosine top-k, IVF indexes all take any
    ``array<double>``), with no external embedding model.

    The hashing trick (Weinberger et al. 2009): each term maps to
    bucket ``crc32(term) % dim`` with sign ``crc32(term + '#s') % 2``
    (the sign makes collision noise zero-mean). Weights are
    ``tf * (ln((N + 1) / (df + 1)) + 1)`` (smoothed IDF), optionally
    l2-normalized so dot product = cosine.

    Scale shape: explode + two keyed aggregations (per-doc tf, per-term
    df) + one broadcast of the 1-row N, then ONE groupBy(doc) building
    the dense array with ``dim`` conditional sums — the expression tree
    is O(dim), independent of corpus size, and everything stays in
    whole-stage codegen. CRC32 was chosen over xxhash64 deliberately:
    it exists in every engine and stdlib, so the vectors are exactly
    reproducible outside Spark (the test oracle replicates them
    bit-for-bit)."""
    ex = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = ex.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = ex.groupBy("term").agg(F.count_distinct(id_col).alias("df"))
    n = docs.select(F.count("*").alias("n_docs"))
    w = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            F.pmod(F.crc32(F.col("term")), F.lit(dim)).cast("int").alias("__b"),
            (
                F.when(
                    F.pmod(F.crc32(F.concat(F.col("term"), F.lit("#s"))), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                * F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).alias("__w"),
        )
    )
    vec = F.array(
        *[
            F.coalesce(
                F.sum(F.when(F.col("__b") == i, F.col("__w"))), F.lit(0.0)
            )
            for i in range(dim)
        ]
    )
    out = w.groupBy(id_col).agg(vec.alias("vector"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.col("vector"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        out = out.select(
            id_col,
            F.when(
                nrm > 0, F.transform(F.col("vector"), lambda x: x / nrm)
            )
            .otherwise(F.col("vector"))
            .alias("vector"),
        )
    return out
