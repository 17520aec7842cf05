"""WARC record parsing for the fetch seam (S3).

The reference streams Common Crawl WARC files through jwat-warc and
keeps only ``WARC-Type: response`` records, whose HTTP payload then
feeds charset detection + HTML extraction
(``corpus/.../crawl/SaveCommonCrawlBase.java:127-148``). This module is
the rebuild's pure-Python WARC reader, shaped for Spark: WARC bytes
arrive as ordinary ``binary`` rows (one row per .warc file or chunk —
the fetch layer's payload column), and :func:`warc_records` explodes
them into one typed row per contained record inside ``mapInPandas``.
gzip members (``.warc.gz`` concatenated-member layout) are handled by
decompressing the payload when it carries the gzip magic.

Tolerant-by-contract: malformed records end the scan of that payload
and are reported in the ``truncated`` flag rather than raising — the
reference likewise swallows per-record errors into an exception
histogram.

A deterministic fixture builder (:func:`synth_warc`) lets tests and the
DuckDB oracle verify the parser end-to-end: the oracle recomputes the
expected record table straight from the generating spec while the Spark
side must round-trip build -> bytes -> parse.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CRLF = b"\r\n"

RECORD_SCHEMA = (
    "src string, record_ndx int, warc_type string, url string, "
    "http_status int, content_type string, body_len int, body binary, "
    "truncated boolean"
)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) of an HTTP response payload; the
    whole payload becomes the body when no HTTP preamble is present."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4:]
    lines = head.split(_CRLF)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(_CRLF.join(lines[1:])).get("content-type")
    return status, ctype, body


def parse_warc_bytes(data: bytes) -> tuple[list[dict], bool]:
    """Parse one WARC file's bytes into record dicts.

    Returns (records, truncated): truncated=True when the payload ends
    mid-record or a record is malformed (scan stops there, records
    before it are kept).
    """
    if data[:2] == b"\x1f\x8b":  # .warc.gz
        try:
            data = gzip.decompress(data)
        except OSError:
            return [], True
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        # offset form: data[pos:] would copy the remaining buffer once
        # per record (quadratic over a multi-GB WARC payload)
        if not data.startswith(b"WARC/", pos):
            return out, True
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return out, True
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return out, True
        body_start = hdr_end + 4
        if body_start + length > n:
            return out, True
        payload = data[body_start : body_start + length]
        status, ctype, body = _split_http(payload)
        out.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri"),
                "http_status": status,
                "content_type": ctype,
                "body": body,
            }
        )
        pos = body_start + length
    return out, False


def warc_records(
    df: DataFrame,
    src_col: str = "src",
    payload_col: str = "payload",
    responses_only: bool = True,
) -> DataFrame:
    """Explode WARC-file rows into record rows (mapInPandas; the parse
    is per-payload CPU inside the Arrow batch, no driver involvement).
    ``responses_only`` mirrors the reference's isResponse filter."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, payload in zip(pdf[src_col], pdf[payload_col]):
                # NULL payloads (the fetch layer's failed rows) and
                # payloads yielding zero kept records must still leave
                # an audit trail: a sentinel record_ndx=-1 row carries
                # the truncated flag instead of the file silently
                # disappearing from the output (tolerant-by-contract)
                if payload is None:
                    recs, truncated = [], True
                else:
                    recs, truncated = parse_warc_bytes(bytes(payload))
                ndx = 0
                for r in recs:
                    if responses_only and r["warc_type"] != "response":
                        continue
                    rows.append(
                        {
                            "src": src,
                            "record_ndx": ndx,
                            "warc_type": r["warc_type"],
                            "url": r["url"],
                            "http_status": r["http_status"],
                            "content_type": r["content_type"],
                            "body_len": len(r["body"]),
                            "body": r["body"],
                            "truncated": truncated,
                        }
                    )
                    ndx += 1
                if ndx == 0:
                    # ANY payload yielding zero kept records (NULL,
                    # truncated, or well-formed but all-filtered, e.g.
                    # request-only files under responses_only) leaves
                    # the sentinel; ``truncated`` carries its real value
                    rows.append(
                        {
                            "src": src, "record_ndx": -1, "warc_type": None,
                            "url": None, "http_status": None,
                            "content_type": None, "body_len": 0,
                            "body": None, "truncated": truncated,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "src", "record_ndx", "warc_type", "url", "http_status",
                    "content_type", "body_len", "body", "truncated",
                ],
            )

    return df.select(src_col, payload_col).mapInPandas(process, RECORD_SCHEMA)


def _record(warc_type: str, url: str | None, payload: bytes) -> bytes:
    headers = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    if url is not None:
        headers.append(b"WARC-Target-URI: " + url.encode())
    headers.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def synth_warc(
    docs: list[tuple[str, str]], compress: bool = False
) -> bytes:
    """Deterministic fixture WARC: a warcinfo record, then per (url,
    text) a request record (must be filtered out) and a response record
    whose HTTP body is the UTF-8 text."""
    parts = [_record("warcinfo", None, b"software: cc-dbp-spark-fixture")]
    for url, text in docs:
        parts.append(_record("request", url, b"GET " + url.encode()))
        body = text.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        parts.append(_record("response", url, http))
    data = b"".join(parts)
    return gzip.compress(data, mtime=0) if compress else data
