"""HTML-to-text extraction (operators/html.py): closed-form expectations
on hand-written markup (the format is the spec), malformed-markup
tolerance, entity decoding, and the full WARC -> HTML -> text ->
curation chain."""

import numpy as np
from pyspark.sql import functions as F

from spatialpandas_spark.operators.html import extract_text_from_html, html_to_text

DOC = """<!DOCTYPE html><html><head>
<title> The  Title </title>
<style>body { color: red }</style>
<script>var x = "<p>not text</p>";</script>
</head><body>
<h1>Heading</h1>
<p>First &amp; second &lt;paragraph&gt;.</p>
<div>Block <b>with bold</b> inline.</div>
<ul><li>one</li><li>two</li></ul>
<noscript>hidden</noscript>
</body></html>"""


def test_html_to_text_closed_form():
    text, title = html_to_text(DOC)
    assert title == "The Title"
    lines = text.split("\n")
    assert lines[0] == "Heading"
    assert lines[1] == "First & second <paragraph>."
    assert lines[2] == "Block with bold inline."
    assert lines[3:5] == ["one", "two"]
    assert "color: red" not in text and "var x" not in text
    assert "hidden" not in text


def test_malformed_markup_tolerated():
    text, title = html_to_text("<p>unclosed <b>bold <div>next</p> tail")
    assert "unclosed bold" in text and "next" in text and "tail" in text
    # script never closed: content after it is dropped (skip-depth holds)
    text2, _ = html_to_text("before<script>junk")
    assert text2 == "before"


def test_empty_and_plain():
    assert html_to_text("") == ("", None)
    assert html_to_text("just plain text")[0] == "just plain text"


def test_spark_string_and_binary(spark):
    rows = [(1, DOC), (2, "<p>tiny</p>"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in extract_text_from_html(df).collect()}
    assert got[1]["title"] == "The Title" and got[1]["parse_ok"] == "ok"
    assert got[2]["text"] == "tiny"
    assert got[3]["text"] is None and got[3]["parse_ok"].startswith("error")

    bdf = spark.createDataFrame(
        [(1, DOC.encode()), (2, b"\xff\xfe<p>odd bytes</p>")],
        "doc_id long, html binary",
    )
    bgot = {r["doc_id"]: r for r in extract_text_from_html(bdf).collect()}
    assert bgot[1]["text"] == got[1]["text"]
    assert "odd bytes" in bgot[2]["text"]


def test_warc_html_curation_chain(spark):
    """The full ingestion story: WARC archive -> response bodies ->
    HTML text -> BM25 over the extracted corpus."""
    import sys

    sys.path.insert(0, "tests")
    from test_archives import _http, _warc_record

    from spatialpandas_spark.corpus import CorpusFrame
    from spatialpandas_spark.sources.archives import warc_records

    pages = [
        ("http://a.test/", "<html><title>A</title><p>spark engine documentation</p></html>"),
        ("http://b.test/", "<html><title>B</title><p>cooking recipes and food</p></html>"),
    ]
    warc = b"".join(
        _warc_record("response", url, _http(html.encode())) for url, html in pages
    )
    archives = spark.createDataFrame([(1, warc)], "archive_id long, payload binary")
    recs = warc_records(archives).select(
        F.col("record_idx").cast("long").alias("doc_id"), F.col("body").alias("html")
    )
    docs = extract_text_from_html(recs).select("doc_id", "text")
    top = CorpusFrame(docs).bm25("spark engine", k=1).collect()
    assert top[0]["doc_id"] == 0


def test_title_inside_skipped_subtree_does_not_leak():
    """Skip wins over title: an <svg><title> (or script-embedded title)
    is not the document title."""
    doc = (
        "<html><head><title>Real Title</title></head><body>"
        "<svg><title>icon label</title><path/></svg>"
        "<p>body text</p></body></html>"
    )
    text, title = html_to_text(doc)
    assert title == "Real Title"
    assert "icon label" not in text
    # skipped-subtree title with NO real title -> no title at all
    text2, title2 = html_to_text("<svg><title>only icon</title></svg><p>hi</p>")
    assert title2 is None and text2 == "hi"


def test_extract_links_closed_form(spark):
    from spatialpandas_spark.operators.html import extract_links_from_html

    doc = (
        '<html><body><a href="http://a.test/x">one</a>'
        '<p><a href="/rel">two</a><a name="anchor">no href</a></p>'
        '<svg><a href="http://hidden.test/">skipped</a></svg>'
        '<a href="//proto.test/p">three</a></body></html>'
    )
    df = spark.createDataFrame(
        [(1, doc), (2, "<p>no links</p>"), (3, None)],
        "doc_id long, html string",
    )
    got = sorted(
        (r["doc_id"], r["href"])
        for r in extract_links_from_html(df).collect()
    )
    assert got == [
        (1, "//proto.test/p"), (1, "/rel"), (1, "http://a.test/x"),
    ]


def test_host_link_edges_and_pagerank_chain(spark):
    """The crawl-to-quality-prior composition: pages -> host edges ->
    PageRank. Resolution rules pinned (absolute/protocol-relative to
    their host, relative to the page host, self-edges dropped), then
    the hub every host links to must out-rank the others."""
    from spatialpandas_spark.operators.graph import pagerank
    from spatialpandas_spark.operators.html import host_link_edges

    def page(url, hrefs):
        links = "".join(f'<a href="{h}">l</a>' for h in hrefs)
        return (url, f"<html><body>{links}</body></html>")

    pages = spark.createDataFrame(
        [
            page("http://a.test/1", ["http://hub.test/x", "/local",
                                     "http://b.test/"]),
            page("http://b.test/1", ["//hub.test/y", "HTTP://a.test/"]),
            page("http://c.test/1", ["http://hub.test/z"]),
        ],
        "url string, html string",
    )
    edges = {(r["src"], r["dst"]) for r in host_link_edges(pages).collect()}
    # /local resolves to a.test itself -> self-edge dropped; hosts and
    # schemes fold case (HTTP://a.test resolves absolutely)
    assert edges == {
        ("a.test", "hub.test"), ("b.test", "hub.test"),
        ("c.test", "hub.test"), ("a.test", "b.test"),
        ("b.test", "a.test"),
    }

    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(host_link_edges(pages), iters=10).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["hub.test"] == max(ranks.values())
