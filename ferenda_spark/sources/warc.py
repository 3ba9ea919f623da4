"""WARC reader: Common-Crawl container files → the pages table.

The pipeline's input contract is the pages table (url, warc_ts,
html, text, lang) — SURVEY scopes the crawler out, but the raw form
those pages arrive in IS the WARC file (ISO 28500; Common Crawl
ships `.warc.gz` where every record is its own gzip member).  This
module closes that last ingestion seam hermetically: a distributed
reader that turns a directory of WARC files into pages rows.

Unit of parallelism: the FILE (`spark.read.format("binaryFile")` →
one `mapInPandas` parse per file) — exactly how Common Crawl is
consumed at scale, where a crawl is ~64k files of ~1 GB and
per-file parallelism saturates any cluster.  Record walking is
streaming within a file: gzip members decompress lazily via
`zlib.decompressobj` over the member boundaries, headers parse per
record, and only `response` records with an HTTP 200 payload become
rows (request/metadata/warcinfo records are skipped, like every
Common-Crawl consumer).

Malformed records follow the codec family's contract: a corrupt
RECORD is skipped (bulk ingest must survive a damaged crawl file),
while a file that is not WARC at all raises ValueError."""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.sources.pages import PAGES_SCHEMA

_GZ_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream (the
    Common-Crawl layout: one member per WARC record)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"warc: corrupt gzip member: {e}") from e
        yield out
        rest = d.unused_data
        if not rest:
            return
        pos = len(data) - len(rest)


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer framing.  A malformed chunk
    header ends the walk with what was decoded so far (truncated
    captures are common in crawls)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.find(b"\n", pos)
        if eol == -1:
            break
        size_field = body[pos:eol].strip().split(b";", 1)[0]
        try:
            size = int(size_field, 16)
        except ValueError:
            break
        if size == 0:
            break
        start = eol + 1
        out += body[start : start + size]
        pos = start + size
        # consume the CRLF / LF that terminates the chunk data
        if body[pos : pos + 2] == b"\r\n":
            pos += 2
        elif body[pos : pos + 1] == b"\n":
            pos += 1
    return bytes(out)


def _parse_http_response(payload: bytes) -> tuple[int, bytes] | None:
    """(status, body) for an HTTP response payload; None if the
    payload isn't HTTP.  Chunked transfer framing is removed and
    gzip/deflate content encodings are decompressed (both occur in
    real Common-Crawl response records)."""
    if not payload.startswith(b"HTTP/"):
        return None
    head, _, body = payload.partition(b"\r\n\r\n")
    if not _:
        head, _, body = payload.partition(b"\n\n")
    try:
        status = int(head.split(None, 2)[1])
    except (IndexError, ValueError):
        return None
    hdrs: dict[str, str] = {}
    for line in head.splitlines()[1:]:
        k, sep, v = line.decode("latin-1", "replace").partition(":")
        if sep:
            hdrs[k.strip().lower()] = v.strip().lower()
    if "chunked" in hdrs.get("transfer-encoding", ""):
        body = _dechunk(body)
    enc = hdrs.get("content-encoding", "")
    if enc in ("gzip", "x-gzip", "deflate"):
        try:
            body = zlib.decompressobj(
                wbits=47 if enc != "deflate" else 15
            ).decompress(body)
        except zlib.error:
            if enc == "deflate":
                # raw deflate without the zlib wrapper also occurs
                try:
                    body = zlib.decompressobj(wbits=-15).decompress(body)
                except zlib.error:
                    return None
            else:
                return None
    return status, body


def _iter_records(stream: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk WARC records in an uncompressed stream: (headers dict
    lower-cased, payload bytes).  Stops at the first structurally
    broken record (the remainder of a truncated file is
    unrecoverable — earlier records are still yielded)."""
    pos = 0
    n = len(stream)
    while pos < n:
        # skip inter-record blank lines byte-wise: a CRLF pair is one
        # separator, a lone LF is one separator (LF-delimited WARCs)
        while pos < n:
            if stream[pos : pos + 2] == b"\r\n":
                pos += 2
            elif stream[pos : pos + 1] == b"\n":
                pos += 1
            else:
                break
        if pos >= n:
            return
        if not stream.startswith(b"WARC/", pos):
            return
        hdr_end = stream.find(b"\r\n\r\n", pos)
        sep = 4
        if hdr_end == -1:
            hdr_end = stream.find(b"\n\n", pos)
            sep = 2
        if hdr_end == -1:
            return
        headers: dict[str, str] = {}
        for line in stream[pos:hdr_end].splitlines()[1:]:
            k, _, v = line.decode("latin-1").partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + sep
        yield headers, stream[body_start : body_start + length]
        pos = body_start + length


def parse_warc_bytes(data: bytes) -> list[tuple]:
    """One WARC file (gz or plain) -> pages rows.  Responses only,
    HTTP 200 only; warc_ts from WARC-Date; text/lang left NULL for
    the extract stage to fill (operators/extract.py)."""
    if data.startswith(_GZ_MAGIC):
        stream = b"".join(_gunzip_members(data))
    elif data.startswith(b"WARC/"):
        stream = data
    else:
        raise ValueError("warc: neither gzip nor WARC/1.x")
    rows: list[tuple] = []
    for headers, payload in _iter_records(stream):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        http = _parse_http_response(payload)
        if http is None or http[0] != 200:
            continue
        ts = None
        raw_ts = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(raw_ts.replace("Z", "+00:00")).astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        except ValueError:
            pass
        rows.append((url, ts, http[1], None, None))
    return rows


def read_warc(spark, path: str) -> DataFrame:
    """Directory/glob of .warc / .warc.gz files -> pages-schema
    DataFrame (one streaming parse per file inside mapInPandas;
    per-file parallelism, no shuffle)."""
    import pandas as pd

    src = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: list[tuple] = []
            for blob in pdf["content"]:
                if blob is None:
                    continue
                rows.extend(parse_warc_bytes(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields]
            )

    return src.mapInPandas(run, PAGES_SCHEMA)
