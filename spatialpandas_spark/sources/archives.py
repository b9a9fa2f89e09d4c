"""Archive-container ingestion: WARC, zip, and tar payloads to rows.

Web-scale text corpora arrive as ARCHIVES, not loose documents —
Common-Crawl-style WARC files, zip/tar bundles of documents. All three
containers parse with pure stdlib (WARC is a line-oriented header
format whose usual ``.warc.gz`` encoding is CONCATENATED per-record
gzip members, which ``zlib`` handles by re-priming a decompressobj;
zip/tar come from ``zipfile``/``tarfile`` over in-memory bytes), so
ingestion needs no external reader.

Spark shape: each operator is an explode-shaped Arrow ``mapInPandas``
— one input archive row fans out to one output row per member/record,
the same batch contract as ``sample_frames``. A malformed archive
yields zero rows plus nothing else (at 100 TB some archives WILL be
truncated); per-record defects skip that record only. Archives
parallelize across rows, so the bit-serial parsing cost rides executor
parallelism exactly like the media codecs.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def gunzip_members(
    data: bytes, max_bytes: int = 1024 * 1024 * 1024
) -> bytes:
    """Decompress CONCATENATED gzip members (the .warc.gz layout: one
    member per record) into one byte stream. Plain input passes
    through; a corrupt member raises ``ValueError``.

    ``max_bytes`` caps the TOTAL decompressed size (gzip-bomb guard —
    the WARC analogue of ``archive_members``' ``max_member_bytes``):
    decompression runs in bounded ``max_length`` chunks so a bomb is
    rejected with ``ValueError`` before the output materializes, never
    after executor memory is gone."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    total = 0
    while data:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        chunk_in = data
        try:
            while True:
                chunk = d.decompress(chunk_in, 1 << 20)
                chunk_in = b""
                total += len(chunk)
                if total > max_bytes:
                    raise ValueError(
                        f"gzip stream exceeds max_bytes={max_bytes} "
                        "decompressed (possible gzip bomb)"
                    )
                out.append(chunk)
                if d.eof or not d.unconsumed_tail:
                    break
                chunk_in = d.unconsumed_tail
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member: {exc}") from exc
        if not d.eof:
            raise ValueError("truncated gzip member")
        data = d.unused_data
    return b"".join(out)


def iter_warc_records(
    payload: bytes, max_bytes: int = 1024 * 1024 * 1024
):
    """Iterate (headers dict, block bytes) over a WARC 1.x byte stream
    (gzipped or plain). Header keys are lowercased. Raises
    ``ValueError`` on a malformed container (including a gzip stream
    whose decompressed size exceeds ``max_bytes``); a stream that
    simply ends cleanly between records terminates."""
    data = gunzip_members(bytes(payload), max_bytes=max_bytes)
    pos, n = 0, len(data)
    while pos < n:
        # skip the inter-record blank lines (spec: two CRLFs)
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            return
        end_hdr = data.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            raise ValueError("truncated WARC record header")
        head = data[pos:end_hdr].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError("missing WARC version line")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        body_start = end_hdr + 4
        if body_start + length > n:
            raise ValueError("truncated WARC record block")
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def parse_http_response(block: bytes):
    """Split an HTTP response block into (status int | None, headers
    dict, body bytes). Tolerates bare bodies (no status line)."""
    end = block.find(b"\r\n\r\n")
    if end < 0 or not block[:5].startswith(b"HTTP/"):
        return None, {}, block
    head = block[:end].decode("utf-8", errors="replace").split("\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        status = None
    headers = {}
    for line in head[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return status, headers, block[end + 4 :]


_WARC_SCHEMA_SUFFIX = [
    StructField("record_idx", IntegerType()),
    StructField("warc_type", StringType()),
    StructField("url", StringType()),
    StructField("http_status", IntegerType()),
    StructField("mime", StringType()),
    StructField("body", BinaryType()),
]


def warc_records(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "archive_id",
    types: tuple[str, ...] = ("response",),
    max_bytes: int = 1024 * 1024 * 1024,
) -> DataFrame:
    """Explode WARC archive payloads to one row per record of the
    requested ``types``: (id, record_idx, warc_type, url, http_status,
    mime, body). ``http_status``/``mime``/``body`` come from the HTTP
    response envelope when present. Malformed archives contribute zero
    rows (including gzip bombs past ``max_bytes`` decompressed);
    defective records are skipped."""
    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + _WARC_SCHEMA_SUFFIX
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in out_schema.fields}
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                try:
                    records = list(
                        iter_warc_records(bytes(p), max_bytes=max_bytes)
                    )
                except ValueError:
                    continue
                for i, (hdrs, block) in enumerate(records):
                    wtype = hdrs.get("warc-type", "")
                    if types and wtype not in types:
                        continue
                    status, http_hdrs, body = parse_http_response(block)
                    rows[id_col].append(aid)
                    rows["record_idx"].append(i)
                    rows["warc_type"].append(wtype)
                    rows["url"].append(hdrs.get("warc-target-uri"))
                    rows["http_status"].append(status)
                    rows["mime"].append(
                        http_hdrs.get("content-type", hdrs.get("content-type"))
                    )
                    rows["body"].append(body)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


_MEMBER_SCHEMA_SUFFIX = [
    StructField("member", StringType()),
    StructField("size", IntegerType()),
    StructField("body", BinaryType()),
]


def archive_members(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "archive_id",
    suffix: str | None = None,
    max_member_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Explode zip/tar(.gz) payloads to one row per file member:
    (id, member, size, body). Container kind is sniffed per row (zip
    magic 'PK', else tar via ``tarfile``). ``suffix`` filters member
    names (e.g. '.txt'); ``max_member_bytes`` guards the zip-bomb case
    — an oversized member is SKIPPED, not truncated, so no silently
    partial payloads."""
    out_schema = StructType(
        [StructField(id_col, df.schema[id_col].dataType)]
        + _MEMBER_SCHEMA_SUFFIX
    )

    def members(p: bytes):
        if p[:2] == b"PK":
            with zipfile.ZipFile(io.BytesIO(p)) as z:
                for info in z.infolist():
                    if info.is_dir():
                        continue
                    if info.file_size > max_member_bytes:
                        continue
                    yield info.filename, z.read(info)
        else:
            with tarfile.open(fileobj=io.BytesIO(p)) as t:
                for m in t.getmembers():
                    if not m.isfile() or m.size > max_member_bytes:
                        continue
                    f = t.extractfile(m)
                    if f is not None:
                        yield m.name, f.read()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f.name: [] for f in out_schema.fields}
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                try:
                    found = list(members(bytes(p)))
                except (zipfile.BadZipFile, tarfile.TarError, OSError, EOFError):
                    continue
                for name, body in found:
                    if suffix and not name.endswith(suffix):
                        continue
                    rows[id_col].append(aid)
                    rows["member"].append(name)
                    rows["size"].append(len(body))
                    rows["body"].append(body)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def synth_warc_archives(
    docs: DataFrame,
    n_archives: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Synthesize spec-layout WARC archives FROM a document frame with
    pure Catalyst expressions — the fixture generator the correctness
    gate and the bench share (one definition, so both always exercise
    the identical payload shape): each document becomes an
    entity-escaped HTML page inside an HTTP 200 envelope inside a WARC
    response record with byte-exact Content-Length; records concatenate
    id-sorted into ``n_archives`` archives keyed by ``id % n_archives``.
    Returns (archive_id, payload binary). The ROUND TRIP through
    ``warc_records`` + HTML extraction has the closed-form expectation
    title='Doc {id}' / text = whitespace-collapsed original lines."""
    from pyspark.sql import functions as F

    sid = F.col(id_col).cast("string")
    esc = F.replace(
        F.replace(
            F.replace(F.col(text_col), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "), sid,
        F.lit("</title></head><body><p>"), esc,
        F.lit("</p></body></html>"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), html
    )
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://t/"),
        sid,
        F.lit("\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"), http, F.lit("\r\n\r\n"),
    )
    return (
        docs.select(F.col(id_col), rec.alias("__rec"))
        .groupBy((F.col(id_col) % n_archives).alias("archive_id"))
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col(id_col).alias("i"),
                                    F.col("__rec").alias("r"),
                                )
                            )
                        ),
                        lambda s: s["r"],
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("payload")
        )
    )
