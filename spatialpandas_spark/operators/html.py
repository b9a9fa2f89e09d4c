"""HTML-to-text extraction — the step between crawl ingestion
(sources/archives.py) and the text curation surface.

Pure-stdlib: ``html.parser.HTMLParser`` tokenizes the markup (it is
deliberately error-tolerant — real crawl HTML is malformed), script /
style / head-metadata subtrees are dropped, block-level elements break
lines, entities decode via the parser itself, and whitespace collapses
per line. The title is extracted alongside. No external sanitizer.

Spark shape: one Arrow ``mapInPandas`` pass, one output row per input
row — the same batch contract as ``extract_features``. A payload that
the tolerant parser still cannot walk yields null text + an error tag
rather than failing the job.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe"}
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1", "h2", "h3",
    "h4", "h5", "h6", "section", "article", "header", "footer", "blockquote",
    "pre", "hr",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.links: list[str] = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a" and self._skip_depth == 0:
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth > 0:
            return  # skip wins: a <title> inside <svg>/<script> is not
        if self._in_title:  # the document title
            self.title_parts.append(data)
        else:
            self.parts.append(data)


def html_to_text(html: str) -> tuple[str, str | None]:
    """(text, title) from an HTML string: script/style subtrees dropped,
    block tags become line breaks, per-line whitespace collapsed, blank
    lines squeezed. Tolerant of malformed markup (crawl reality)."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    raw = "".join(p.parts)
    lines = [re.sub(r"\s+", " ", ln).strip() for ln in raw.split("\n")]
    text = "\n".join(ln for ln in lines if ln)
    title = re.sub(r"\s+", " ", "".join(p.title_parts)).strip() or None
    return text, title


def extract_text_from_html(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    encoding: str = "utf-8",
) -> DataFrame:
    """Arrow-batched HTML text extraction: (id, title, text, parse_ok).
    ``html_col`` may be STRING or BINARY (decoded with ``encoding``,
    errors replaced — crawl bytes lie about charsets)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("title", StringType()),
            StructField("text", StringType()),
            StructField("parse_ok", StringType()),
        ]
    )
    is_binary = dict(df.dtypes)[html_col] == "binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, titles, texts, oks = [], [], [], []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                ids.append(did)
                if h is None:
                    titles.append(None)
                    texts.append(None)
                    oks.append("error: null input")
                    continue
                if is_binary:
                    h = bytes(h).decode(encoding, errors="replace")
                try:
                    text, title = html_to_text(h)
                    titles.append(title)
                    texts.append(text)
                    oks.append("ok")
                except Exception as exc:  # html.parser rarely throws, but
                    titles.append(None)   # a crawl payload WILL find a way
                    texts.append(None)
                    oks.append(f"error: {exc}"[:120])
            yield pd.DataFrame(
                {id_col: ids, "title": titles, "text": texts, "parse_ok": oks}
            )

    return df.select(id_col, html_col).mapInPandas(run, out_schema)


def extract_links_from_html(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    encoding: str = "utf-8",
) -> DataFrame:
    """Anchor hrefs per document: one row per (id, href) — the edge
    material for a crawl link graph. Skipped subtrees (script/svg/...)
    contribute no links; unparseable payloads contribute no rows (the
    crawl zero-row contract). Same Arrow batch shape as
    :func:`extract_text_from_html`."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("href", StringType()),
        ]
    )
    is_binary = dict(df.dtypes)[html_col] == "binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hrefs = [], []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                if h is None:
                    continue
                if is_binary:
                    h = bytes(h).decode(encoding, errors="replace")
                try:
                    p = _TextExtractor()
                    p.feed(h)
                    p.close()
                except Exception:  # noqa: BLE001 — crawl reality
                    continue
                for link in p.links:
                    ids.append(did)
                    hrefs.append(link)
            yield pd.DataFrame({id_col: ids, "href": hrefs})

    return df.select(id_col, html_col).mapInPandas(run, out_schema)


def host_link_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Distinct host-level link edges from crawled pages:
    ``(src, dst)`` hostnames — the input :func:`~spatialpandas_spark
    .operators.graph.pagerank` ranks for the host-quality prior.
    Protocol-relative and absolute http(s) hrefs resolve to their own
    host; relative hrefs resolve to the PAGE's host (self-edges are
    dropped — they carry no cross-host endorsement). Pure Catalyst
    after the link explode: one regexp per side + distinct."""
    from pyspark.sql import functions as F

    links = extract_links_from_html(
        pages.select(F.col(url_col).alias("__u"), html_col),
        html_col=html_col,
        id_col="__u",
    )
    host = r"(?i)^(?:https?:)?//([^/:?#]+)"  # (?i): schemes may be uppercase
    src = F.lower(F.regexp_extract(F.col("__u"), host, 1))
    dst_abs = F.lower(F.regexp_extract(F.col("href"), host, 1))
    dst = F.when(dst_abs != "", dst_abs).otherwise(src)
    return (
        links.select(src.alias("src"), dst.alias("dst"))
        .filter((F.col("src") != "") & (F.col("dst") != ""))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
