"""WARC/1.1 archive sink + source (ISO 28500, the Common Crawl /
Internet Archive interchange format) for the fetch stage.

A real web-scale crawl must emit its captures in the archival format
the ecosystem consumes; the reference keeps pages only in its KV
store. Here:

- :func:`write_warc` — fetch-stage rows → ``part-*.warc.gz`` segment
  files, one per partition, each WARC record its OWN gzip member
  (the Common Crawl convention: record-level random access by byte
  offset without decompressing the segment). Records are
  ``WARC-Type: response`` wrapping a reconstructed HTTP/1.1 response
  (status line + captured headers + body), with deterministic
  ``WARC-Record-ID``s (urn:uuid shaped from md5(url|date) — replayable
  runs produce byte-identical archives; no wall-clock randomness).
- :func:`read_warc` — segment files → the same frame shape back
  (url, status, content, content_type, headers, warc_date),
  via ``binaryFile`` + an Arrow-batched member-by-member parse.

Scale shape: writing is a ``foreachPartition`` stream (one open file
per task, bounded memory per record); reading parallelizes per
segment file (gzip is not splittable — size segments via the wave's
partitioning, ~1 GB each at production scale, exactly how Common
Crawl ships WARCs). No driver-side bytes in either direction.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_warc", "read_warc", "WARC_ROWS_DDL"]

WARC_ROWS_DDL = (
    "url string, status int, content binary, content_type string, "
    "headers map<string,string>, warc_date string"
)

_CRLF = b"\r\n"

_REASONS = {200: "OK", 301: "Moved Permanently", 302: "Found",
            304: "Not Modified", 404: "Not Found", 403: "Forbidden",
            500: "Internal Server Error", 503: "Service Unavailable"}


def _record_id(url: str, date: str) -> str:
    h = hashlib.md5(f"{url}|{date}".encode("utf-8")).hexdigest()
    return f"<urn:uuid:{uuid.UUID(h)}>"


def _http_block(status: int, headers: dict | None, body: bytes) -> bytes:
    reason = _REASONS.get(status, "Unknown")
    out = io.BytesIO()
    out.write(f"HTTP/1.1 {status} {reason}".encode() + _CRLF)
    for k, v in sorted((headers or {}).items()):
        if k.lower() in ("transfer-encoding", "content-length"):
            continue  # body is already de-chunked; length is recomputed
        out.write(f"{k}: {v}".encode("utf-8", "replace") + _CRLF)
    out.write(f"Content-Length: {len(body)}".encode() + _CRLF)
    out.write(_CRLF)
    out.write(body)
    return out.getvalue()


def _render_record(url: str, status: int, headers: dict | None,
                   body: bytes, date: str) -> bytes:
    http = _http_block(status, headers, body)
    head = io.BytesIO()
    head.write(b"WARC/1.1" + _CRLF)
    head.write(b"WARC-Type: response" + _CRLF)
    head.write(f"WARC-Record-ID: {_record_id(url, date)}".encode() + _CRLF)
    head.write(f"WARC-Date: {date}".encode() + _CRLF)
    head.write(f"WARC-Target-URI: {url}".encode("utf-8", "replace") + _CRLF)
    head.write(b"Content-Type: application/http;msgtype=response" + _CRLF)
    head.write(f"Content-Length: {len(http)}".encode() + _CRLF)
    head.write(_CRLF)
    head.write(http)
    head.write(_CRLF + _CRLF)  # record boundary
    return head.getvalue()


def write_warc(
    fetched: DataFrame,
    out_dir: str,
    url_col: str = "url",
    status_col: str = "status",
    content_col: str = "content",
    headers_col: str = "headers",
    date_col: str | None = None,
    default_date: str = "2000-01-01T00:00:00Z",
) -> None:
    """fetch rows → ``<out_dir>/part-<pid>-<hash>.warc.gz`` segments.
    ``date_col`` (ISO-8601 string or timestamp) stamps WARC-Date;
    absent, ``default_date`` keeps archives deterministic."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [url_col, status_col, content_col, headers_col]
    if date_col:
        cols.append(date_col)

    def sink(rows) -> None:
        out = None
        path = None
        try:
            for row in rows:
                if out is None:
                    # name by first row's url hash: deterministic per
                    # partition content, collision-safe across tasks
                    tag = hashlib.md5(
                        (row[url_col] or "").encode("utf-8", "replace")
                    ).hexdigest()[:12]
                    from pyspark import TaskContext

                    pid = TaskContext.get().partitionId()
                    path = os.path.join(out_dir, f"part-{pid:05d}-{tag}.warc.gz")
                    out = open(path + ".tmp", "wb")
                if date_col:
                    d = row[date_col]
                    date = (
                        d if isinstance(d, str)
                        else d.strftime("%Y-%m-%dT%H:%M:%SZ")
                    )
                else:
                    date = default_date
                body = bytes(row[content_col] or b"")
                rec = _render_record(
                    row[url_col] or "",
                    int(row[status_col] or 0),
                    dict(row[headers_col] or {}),
                    body,
                    date,
                )
                # one gzip member per record; mtime=0 keeps archive
                # bytes deterministic across runs
                out.write(gzip.compress(rec, 6, mtime=0))
        finally:
            if out is not None:
                out.close()
                os.replace(path + ".tmp", path)

    fetched.select(*cols).foreachPartition(sink)


def _parse_members(blob: bytes) -> Iterator[bytes]:
    """Concatenated gzip members → each member's decompressed bytes
    (zlib wbits=31 stops at member end; unused_data is the rest)."""
    import zlib

    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(31)
        try:
            data = d.decompress(blob[pos:]) + d.flush()
        except zlib.error:
            break  # torn tail
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        yield data
        pos += consumed


def _parse_record(rec: bytes) -> dict | None:
    try:
        head, rest = rec.split(_CRLF + _CRLF, 1)
        fields = {}
        for line in head.split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            fields[k.strip().lower()] = v.strip()
        if fields.get("warc-type") != "response":
            return None
        clen = int(fields.get("content-length", "0"))
        http = rest[:clen]
        hhead, body = http.split(_CRLF + _CRLF, 1)
        hlines = hhead.split(_CRLF)
        status = int(hlines[0].split(b" ")[1])
        headers = {}
        for hl in hlines[1:]:
            k, _, v = hl.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        headers.pop("content-length", None)
        return {
            "url": fields.get("warc-target-uri", ""),
            "status": status,
            "content": body,
            "content_type": headers.get("content-type"),
            "headers": headers,
            "warc_date": fields.get("warc-date", ""),
        }
    except Exception:
        return None  # torn/foreign record: skip, never kill the scan


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``*.warc.gz`` segments → fetch-shaped rows (WARC_ROWS_DDL).
    One task per segment file (gzip is unsplittable); response records
    only, torn records skipped."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc.gz")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for member in _parse_members(bytes(blob)):
                    rec = _parse_record(member)
                    if rec is not None:
                        rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "status", "content", "content_type",
                    "headers", "warc_date",
                ],
            )

    return files.select("content").mapInPandas(parse, WARC_ROWS_DDL)
