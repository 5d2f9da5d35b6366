"""WARC (Web ARChive, ISO 28500) source — the Common Crawl on-ramp.

Web-scale training corpora arrive as WARC: gzip'd files of
concatenated records (request/response/metadata/warcinfo), ~1 GB
each, millions of files. The Spark-shaped way to read them:

* ``spark.read.format("binaryFile")`` lists the files and hands each
  task whole-file bytes — WARC's per-record gzip members aren't
  splittable mid-file, so file granularity IS the parallel unit
  (1000 executors × N cores each want >= that many files, which
  Common Crawl's 64k-file segments satisfy by construction).
* One Arrow ``mapInPandas`` pass parses records with a pure-stdlib
  scanner (gzip multi-member decode + header/payload framing) and
  yields typed rows. No Python-per-row UDFs; one Python worker per
  file-partition streaming record batches out.
* Everything downstream (dedup, language ID, quality filters,
  `llm.filters.c4_clean`...) is ordinary DataFrame code over the
  returned columns.

Malformed tails (truncated final record, stray bytes between
members) end that file's scan quietly by default — the documented
Common Crawl reality — or raise with ``strict=True``.

Reference parity: the reference engine reads JSON/CSV only
(``/root/reference/temporal_retriever/app.py`` request bodies); this
extends the source family (`sources/parquet.py`, S7) with the
archive format every 100 TB text pipeline starts from.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, warc_type string, record_id string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "http_status int, http_content_type string, payload binary"
)

_MAX_HEADER_BYTES = 64 * 1024


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress (multi-member) gzip; pass plain bytes through."""
    if data[:2] == b"\x1f\x8b":
        # gzip.decompress handles concatenated members since 3.8
        return gzip.decompress(data)
    return data


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers


def iter_warc_records(
    data: bytes, *, strict: bool = False
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(warc_headers, payload)`` per record from raw bytes.

    Framing per ISO 28500: ``WARC/x.y CRLF headers CRLFCRLF payload
    (Content-Length bytes) CRLFCRLF``. A malformed record stops the
    scan (``strict=True`` raises instead) — later records can't be
    re-synchronized without the length chain.
    """
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(f"expected WARC/ magic at offset {pos}")
            return
        head_end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER_BYTES)
        if head_end < 0:
            if strict:
                raise ValueError(f"unterminated WARC header at offset {pos}")
            return
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(f"bad Content-Length at offset {pos}")
            return
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            if strict:
                raise ValueError(f"truncated payload at offset {pos}")
            return
        yield headers, data[body_start:body_end]
        pos = body_end


def split_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """``(status, content_type, body)`` from an HTTP response payload.

    Returns ``(None, None, payload)`` unchanged when the payload
    doesn't start with an HTTP status line (non-response records).
    """
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head_end = payload.find(b"\r\n\r\n", 0, _MAX_HEADER_BYTES)
    if head_end < 0:
        return None, None, payload
    head = payload[:head_end]
    status_line = head.split(b"\r\n", 1)[0]
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = _parse_headers(head).get("content-type")
    return status, ctype, payload[head_end + 4 :]


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    http_parse: bool = True,
    strict: bool = False,
) -> DataFrame:
    """WARC files -> one typed row per record.

    ``http_parse`` splits response payloads into
    (http_status, http_content_type, body); with it off the payload
    is the raw record block and the http columns are NULL.
    ``content_length`` is always the WARC header value (the raw
    record size), independent of HTTP splitting.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    cols = [f.split()[0] for f in WARC_SCHEMA.split(", ")]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = _maybe_gunzip(bytes(content))
                for h, payload in iter_warc_records(data, strict=strict):
                    status, http_ct, body = (
                        split_http_payload(payload)
                        if http_parse
                        else (None, None, payload)
                    )
                    rows.append(
                        (
                            fpath,
                            h.get("warc-type"),
                            h.get("warc-record-id"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            h.get("content-type"),
                            int(h["content-length"]),
                            status,
                            http_ct,
                            body,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def write_warc_bytes(records: list[tuple[dict[str, str], bytes]]) -> bytes:
    """Serialize records to WARC framing (test/fixture helper)."""
    out = io.BytesIO()
    for headers, payload in records:
        out.write(b"WARC/1.0\r\n")
        for k, v in headers.items():
            if k.lower() == "content-length":
                continue  # always derived from the payload
            out.write(f"{k}: {v}\r\n".encode("latin-1"))
        out.write(f"Content-Length: {len(payload)}\r\n".encode("latin-1"))
        out.write(b"\r\n")
        out.write(payload)
        out.write(b"\r\n\r\n")
    return out.getvalue()
