"""WARC ingestion: the format crawls actually arrive in.

Common Crawl (and every Heritrix-style crawler) ships WARC/1.0 files:
a sequence of records, each a header block (``WARC/1.0`` + name:value
lines), a blank line, ``Content-Length`` payload bytes, and a blank
separator - usually with EVERY record its own gzip member so readers
can skip without decompressing the file (ISO 28500; Python's ``gzip``
reads concatenated members transparently).

Scale model - file-per-task parallelism: per-record gzip members make
a WARC non-splittable, so the parallelism unit is the FILE, exactly
how production crawl jobs run (Common Crawl ships ~1 GB files in the
thousands; 100 TB = ~100k files = ample tasks for any cluster).
``read_warc`` distributes the file LIST and stream-parses each file
inside its task - payloads are never concatenated in memory, and the
emitted rows land in the standard pages schema so the whole pipeline
(dedup, skew bucketing, extraction, sinks) composes unchanged.

``write_warc`` is the deterministic fixture twin (the repo-wide
pattern): record layout, per-member gzip, HTTP response wrapping and
chunked transfer-encoding are all exercised decode-side by goldens it
writes.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
    TimestampType,
)

WARC_PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("n_bytes", LongType()),
])


class WarcError(ValueError):
    pass


def _read_headers(fh) -> dict[bytes, bytes] | None:
    """One CRLF-terminated header block -> {lower-name: value}; None at
    clean EOF."""
    line = fh.readline()
    while line in (b"\r\n", b"\n"):  # inter-record separators
        line = fh.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise WarcError(f"bad record marker {line[:20]!r}")
    headers: dict[bytes, bytes] = {}
    while True:
        line = fh.readline()
        if line in (b"\r\n", b"\n", b""):
            return headers
        if b":" not in line:
            raise WarcError(f"bad header line {line[:40]!r}")
        name, value = line.split(b":", 1)
        headers[name.strip().lower()] = value.strip()


def _dechunk(body: bytes) -> bytes:
    """HTTP/1.1 chunked transfer decoding (crawlers store the raw wire
    bytes; Common Crawl records frequently keep the chunking)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise WarcError("truncated chunk size line")
        size_s = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_s, 16)
        except ValueError as exc:
            raise WarcError(f"bad chunk size {size_s[:16]!r}") from exc
        pos = nl + 2
        if size == 0:
            return bytes(out)
        if pos + size > len(body):
            raise WarcError("truncated chunk body")
        out += body[pos : pos + size]
        pos += size + 2  # trailing CRLF


def _split_http_response(payload: bytes) -> bytes:
    """HTTP response wire bytes -> body (headers dropped, chunked
    encoding undone).  Payloads that aren't HTTP pass through whole."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return payload
    head = payload[:sep].lower()
    body = payload[sep + 4:]
    if b"transfer-encoding:" in head and b"chunked" in head:
        body = _dechunk(body)
    return body


def _parse_warc_date(value: bytes) -> datetime | None:
    try:
        s = value.decode("ascii").strip()
        if s.endswith("Z"):
            s = s[:-1]
        # naive UTC (the repo pins the session timezone to UTC)
        return datetime.fromisoformat(s)
    except ValueError:
        return None


def iter_warc_records(fh, record_types: tuple = (b"response",)):
    """Stream (url, warc_ts, body) records of the given WARC-Types from
    a WARC file object (plain or gzipped; per-record gzip members read
    seamlessly).

    ``response`` payloads are HTTP wire bytes (headers stripped,
    chunked encoding undone); ``conversion`` payloads (WET extracted
    text) pass through whole.  Other records (warcinfo, request,
    metadata, ...) are skipped; a record that fails to parse raises
    WarcError - callers decide containment."""
    import zlib

    head = fh.peek(2)[:2] if hasattr(fh, "peek") else b""
    if head == b"\x1f\x8b":
        fh = gzip.GzipFile(fileobj=fh)
    while True:
        try:
            headers = _read_headers(fh)
            if headers is None:
                return
            try:
                length = int(headers.get(b"content-length", b""))
            except ValueError as exc:
                raise WarcError("missing/bad Content-Length") from exc
            payload = fh.read(length)
        except zlib.error as exc:
            # corrupted gzip member: surface as the module's own error
            # so callers' containment (read_warc) catches ONE family
            raise WarcError(f"corrupt gzip member: {exc}") from exc
        if len(payload) != length:
            raise WarcError("truncated record payload")
        rtype = headers.get(b"warc-type", b"")
        if rtype not in record_types:
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "latin-1") or None
        ts = _parse_warc_date(headers.get(b"warc-date", b""))
        body = (_split_http_response(payload) if rtype == b"response"
                else payload)
        yield url, ts, body


def warc_files(source: str) -> list[str]:
    """Expand a file / directory / glob into a sorted WARC file list."""
    if os.path.isdir(source):
        paths = sorted(
            _glob.glob(os.path.join(source, "*.warc"))
            + _glob.glob(os.path.join(source, "*.warc.gz")))
    elif any(c in source for c in "*?["):
        paths = sorted(_glob.glob(source))
    else:
        paths = [source]
    if not paths:
        raise WarcError(f"no WARC files under {source}")
    return paths


def read_wet(spark: SparkSession, source: str,
             chunk_bytes: int = 64 << 20,
             chunk_records: int = 10_000) -> DataFrame:
    """WET files (Common Crawl's pre-extracted text sibling:
    ``conversion`` records with UTF-8 text payloads) -> pages rows with
    the ``text`` column POPULATED and ``html`` empty - rows that skip
    extraction and flow straight into the text-analysis operators."""
    from pyspark.sql import functions as F

    raw = read_warc(spark, source, record_types=(b"conversion",),
                    chunk_bytes=chunk_bytes, chunk_records=chunk_records)
    return (raw.withColumn("text", F.col("html").cast("string"))
            .withColumn("html", F.lit(None).cast("binary")))


def read_warc(spark: SparkSession, source: str,
              text: str | None = None,
              lang: str | None = None,
              record_types: tuple = (b"response",),
              chunk_bytes: int = 64 << 20,
              chunk_records: int = 10_000) -> DataFrame:
    """WARC file(s)/dir/glob -> the standard pages DataFrame.

    One Spark task per file (the WARC parallelism unit - see module
    docstring); records stream through ``iter_warc_records`` inside the
    task and are flushed as a pandas batch every ``chunk_bytes`` of
    payload or ``chunk_records`` rows, whichever first - so peak task
    memory is one CHUNK (~64 MB default), never one file.  A 1 GB gzip
    Common-Crawl WARC decompresses to ~4-5 GB; without the bound, 32
    concurrent tasks each holding a whole file is an executor OOM at
    exactly the scale this reader exists for.  A file that fails to
    parse emits a diagnostic row (url = ``warc-error://<path>``, html
    carries the message) after any records already parsed -
    containment, not job death, at crawl scale."""
    import pandas as pd

    paths = warc_files(source)
    paths_df = spark.createDataFrame(
        [(p,) for p in paths], "path string").repartition(len(paths))

    def parse(pdfs):
        for pdf in pdfs:
            for path in pdf["path"]:
                yield from iter_warc_batches(
                    path, text=text, lang=lang, record_types=record_types,
                    chunk_bytes=chunk_bytes, chunk_records=chunk_records)

    return paths_df.mapInPandas(parse, WARC_PAGES_SCHEMA)


_WARC_COLS = ("url", "warc_ts", "html", "text", "lang", "n_bytes")


def iter_warc_batches(path: str, text: str | None = None,
                      lang: str | None = None,
                      record_types: tuple = (b"response",),
                      chunk_bytes: int = 64 << 20,
                      chunk_records: int = 10_000):
    """One WARC file -> pandas DataFrames of at most ``chunk_records``
    rows / ~``chunk_bytes`` payload each (the ``read_warc`` task body,
    module-level so the memory bound is directly testable).  A parse
    failure emits a ``warc-error://`` diagnostic row after any records
    already parsed, then stops the file."""
    import pandas as pd

    def file_rows():
        try:
            with open(path, "rb") as fh:
                bfh = io.BufferedReader(fh)
                for url, ts, body in iter_warc_records(bfh, record_types):
                    yield url, ts, body, text, lang, len(body)
        except (OSError, WarcError, EOFError) as exc:
            yield (f"warc-error://{path}", None,
                   f"{type(exc).__name__}: {exc}".encode(), None, None, 0)

    buf, payload = [], 0
    for row in file_rows():
        buf.append(row)
        payload += row[5]
        if len(buf) >= chunk_records or payload >= chunk_bytes:
            yield pd.DataFrame(buf, columns=_WARC_COLS)
            buf, payload = [], 0
    if buf:
        yield pd.DataFrame(buf, columns=_WARC_COLS)


def write_warc(path: str, records: list[dict],
               gzip_members: bool = True,
               chunked: bool = False) -> None:
    """Deterministic WARC writer (fixture twin).

    ``records``: dicts with ``url`` (optional - ``warcinfo`` records
    carry no WARC-Target-URI), ``date`` (ISO string or datetime),
    ``body`` bytes, optional ``type`` (default ``response``) and
    ``http`` (default True for response/request records: wrap the body
    as HTTP wire bytes - a 200 response, or a GET request for
    ``type="request"``; ``chunked`` stores responses with chunked
    transfer-encoding).  Every WARC-Type a real crawl file interleaves
    (warcinfo, request, response, metadata, conversion) is writable, so
    the reader's skip logic is golden-pinned instead of hand-built."""
    out = io.BytesIO()
    for rec in records:
        body = rec.get("body", b"")
        rtype = rec.get("type", "response")
        if rec.get("http", rtype in ("response", "request")):
            if rtype == "request":
                # request wire bytes: GET line + Host, body rarely used
                url = rec.get("url", "http://example/")
                hostpath = url.split("://", 1)[-1]
                host, _, reqpath = hostpath.partition("/")
                payload = (b"GET /" + reqpath.encode() + b" HTTP/1.1\r\n"
                           b"Host: " + host.encode() + b"\r\n\r\n" + body)
            elif chunked:
                wire = b""
                for i in range(0, len(body), 7):
                    part = body[i : i + 7]
                    wire += f"{len(part):x}".encode() + b"\r\n" + part \
                        + b"\r\n"
                wire += b"0\r\n\r\n"
                payload = (b"HTTP/1.1 200 OK\r\n"
                           b"Content-Type: text/html\r\n"
                           b"Transfer-Encoding: chunked\r\n\r\n" + wire)
            else:
                payload = (b"HTTP/1.1 200 OK\r\n"
                           b"Content-Type: text/html\r\n"
                           + f"Content-Length: {len(body)}\r\n".encode()
                           + b"\r\n" + body)
        else:
            payload = body
        date = rec.get("date", "2026-01-01T00:00:00Z")
        if isinstance(date, datetime):
            date = date.strftime("%Y-%m-%dT%H:%M:%SZ")
        head = bytearray(b"WARC/1.0\r\n"
                         b"WARC-Type: " + rtype.encode() + b"\r\n")
        if rec.get("url") is not None:  # warcinfo has no Target-URI
            head += b"WARC-Target-URI: " + rec["url"].encode() + b"\r\n"
        head += (b"WARC-Date: " + date.encode() + b"\r\n"
                 b"Content-Length: " + str(len(payload)).encode()
                 + b"\r\n\r\n")
        head = bytes(head)
        member = head + payload + b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(member)
            out.write(buf.getvalue())
        else:
            out.write(member)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


def write_wet(path: str, records: list[dict],
              gzip_members: bool = True) -> None:
    """Deterministic WET writer - ``read_wet``'s twin.

    Common Crawl WET layout: one leading ``warcinfo`` record describing
    the extraction, then one ``conversion`` record per page carrying the
    extracted UTF-8 text (no HTTP wrapper).  ``records``: dicts with
    ``url``, optional ``date``, and ``text`` (str) or ``body`` (bytes).
    """
    info = (b"Software-Info: livre-spark WET writer\r\n"
            b"Extracted-Date: 2026-01-01T00:00:00Z\r\n"
            b"Format: WARC File Format 1.0\r\n")
    recs = [{"type": "warcinfo", "body": info, "http": False}]
    for rec in records:
        body = rec.get("body")
        if body is None:
            body = rec["text"].encode()
        recs.append({"type": "conversion", "url": rec["url"],
                     "date": rec.get("date", "2026-01-01T00:00:00Z"),
                     "body": body, "http": False})
    write_warc(path, recs, gzip_members=gzip_members)
