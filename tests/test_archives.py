"""Archive ingestion (sources/archives.py): WARC byte streams are
hand-assembled from the public spec layout (the independent-oracle
pattern), including the real .warc.gz concatenated-gzip-member
encoding; zip/tar fixtures come from stdlib writers. Explode-shaped
Spark paths tested end-to-end, plus the malformed/zero-row contracts."""

import gzip
import io
import tarfile
import zipfile

import pytest

from spatialpandas_spark.sources.archives import (
    archive_members,
    gunzip_members,
    iter_warc_records,
    parse_http_response,
    warc_records,
)


def _warc_record(wtype, uri, block, extra=()):
    hdrs = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"Content-Length: {len(block)}",
    ]
    if uri:
        hdrs.append(f"WARC-Target-URI: {uri}")
    hdrs.extend(extra)
    return "\r\n".join(hdrs).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http(body: bytes, status=200, ctype="text/html"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


WARC = (
    _warc_record("warcinfo", None, b"software: test\r\n")
    + _warc_record("request", "http://a.test/", b"GET / HTTP/1.1\r\n\r\n")
    + _warc_record("response", "http://a.test/", _http(b"<html>hello</html>"))
    + _warc_record(
        "response", "http://b.test/x", _http(b"plain body", 404, "text/plain")
    )
)


def test_iter_warc_records_plain():
    recs = list(iter_warc_records(WARC))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    assert recs[2][0]["warc-target-uri"] == "http://a.test/"


def test_warc_gz_concatenated_members():
    # the real .warc.gz layout: EACH record is its own gzip member
    gz = b"".join(
        gzip.compress(_warc_record("response", f"http://{i}.test/", _http(b"x" * i)))
        for i in range(1, 4)
    )
    assert gunzip_members(gz).count(b"WARC/1.0") == 3
    recs = list(iter_warc_records(gz))
    assert len(recs) == 3


def test_parse_http_response():
    status, hdrs, body = parse_http_response(_http(b"abc", 301, "x/y"))
    assert (status, hdrs["content-type"], body) == (301, "x/y", b"abc")
    status, hdrs, body = parse_http_response(b"no http envelope")
    assert status is None and body == b"no http envelope"


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[: len(b) - 30],  # truncated block
        lambda b: b.replace(b"WARC/1.0", b"HARC/1.0", 1),  # bad version
        lambda b: b.replace(b"Content-Length", b"X-Length", 1),  # no length
    ],
)
def test_malformed_warc_raises(mutate):
    with pytest.raises(ValueError):
        list(iter_warc_records(mutate(WARC)))


def test_warc_records_spark(spark):
    df = spark.createDataFrame(
        [(1, WARC), (2, b"not a warc"), (3, None)],
        "archive_id long, payload binary",
    )
    rows = warc_records(df).collect()
    # only archive 1 contributes; only the two response records
    assert {(r["archive_id"], r["url"], r["http_status"]) for r in rows} == {
        (1, "http://a.test/", 200),
        (1, "http://b.test/x", 404),
    }
    body = next(bytes(r["body"]) for r in rows if r["http_status"] == 200)
    assert body == b"<html>hello</html>"


def test_zip_and_tar_members_spark(spark):
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as z:
        z.writestr("a.txt", "alpha")
        z.writestr("sub/b.txt", "beta")
        z.writestr("c.bin", b"\x00\x01")
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as t:
        data = b"gamma"
        info = tarfile.TarInfo("d.txt")
        info.size = len(data)
        t.addfile(info, io.BytesIO(data))
    df = spark.createDataFrame(
        [(1, zbuf.getvalue()), (2, tbuf.getvalue()), (3, b"junk")],
        "archive_id long, payload binary",
    )
    rows = archive_members(df, suffix=".txt").collect()
    got = {(r["archive_id"], r["member"]): bytes(r["body"]) for r in rows}
    assert got == {
        (1, "a.txt"): b"alpha",
        (1, "sub/b.txt"): b"beta",
        (2, "d.txt"): b"gamma",
    }


def test_zip_bomb_guard(spark):
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("bomb.txt", "A" * 100_000)
        z.writestr("ok.txt", "fine")
    df = spark.createDataFrame(
        [(1, zbuf.getvalue())], "archive_id long, payload binary"
    )
    rows = archive_members(df, max_member_bytes=1000).collect()
    assert [r["member"] for r in rows] == ["ok.txt"]  # bomb skipped whole


def test_warc_to_documents_flow(spark):
    """End-to-end: WARC -> response bodies -> text -> the curation
    surface (the ingestion story this module exists for)."""
    from pyspark.sql import functions as F

    from spatialpandas_spark.corpus import CorpusFrame

    df = spark.createDataFrame(
        [(1, WARC)], "archive_id long, payload binary"
    )
    docs = warc_records(df).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("body").cast("string").alias("text"),
    )
    prof = CorpusFrame(docs).profile().first()
    assert prof["n_docs"] == 2 and prof["total_tokens"] > 0


def test_warc_gzip_bomb_guard(spark):
    """The WARC analogue of the zip-bomb guard: a tiny gzip stream that
    expands past max_bytes raises before the output materializes (unit
    path) and contributes zero rows (Spark path)."""
    bomb_block = _http(b"A" * 500_000)
    bomb = gzip.compress(_warc_record("response", "http://bomb.test/", bomb_block))
    assert len(bomb) < 5_000  # genuinely high expansion ratio
    with pytest.raises(ValueError, match="max_bytes"):
        gunzip_members(bomb, max_bytes=10_000)
    with pytest.raises(ValueError, match="max_bytes"):
        list(iter_warc_records(bomb, max_bytes=10_000))
    # under the cap it still parses fine
    assert len(list(iter_warc_records(bomb, max_bytes=10_000_000))) == 1

    df = spark.createDataFrame(
        [(1, bomb), (2, WARC)], "archive_id long, payload binary"
    )
    rows = warc_records(df, max_bytes=10_000).collect()
    assert {r["archive_id"] for r in rows} == {2}  # bomb archive dropped whole
