"""Document chunking: split long documents into fixed-size token windows.

Training pipelines rarely feed raw documents to the tokenizer — they pack
fixed-length sequences, and long documents are first split into windows of
``size`` tokens advancing by ``stride`` (overlap = size - stride preserves
context across boundaries). This is a pure row-local explode:

- per row, the number of chunks is computed from the token count with
  integer arithmetic (no data exchange of any kind);
- ``explode`` fans each document out to its chunk rows inside the same
  task — at 100 TB the operation is scan-shaped, embarrassingly parallel,
  and the output volume is input × (size/stride) with zero shuffles.

Everything is JVM higher-order expressions over the whitespace token
array; no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spatialpandas_spark.functions.measures import _seq0
from spatialpandas_spark.operators.dedup import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Explode each document into sliding token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + size)``; the number
    of chunks is ``1 + ceil((n_tokens - size) / stride)`` (documents with
    ``<= size`` tokens yield exactly one chunk; empty documents yield
    none). Returns ``(id_col, chunk_id, n_tokens, chunk_text)``.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # integer ceil((n - size)/stride); exact for any document length
    extra = F.when(
        n > size,
        F.floor((n - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)).cast(
            "int"
        ),
    ).otherwise(F.lit(0))
    n_chunks = F.when(n > 0, extra + F.lit(1)).otherwise(F.lit(0))
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(_seq0(n_chunks)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * F.lit(stride) + F.lit(1), size
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
