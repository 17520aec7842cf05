"""HTML -> interleaved span document extraction (M3/M4) — the crawl
ingest seam that turns fetched page bytes into the engine's
``(doc_id, spans)`` records.

Reference behavior being matched (NOT ported): boilerpipe-fork HTML ->
text with Title/Link/SectionHeader/Paragraph span annotations
(``corpus/.../crawl/HtmlToDocument.java:28-71``); the title is prepended
to the body with a blank line and every body annotation is offset-shifted
by the title length (``HtmlToDocument.java:42-48``); charset detection
runs on raw payload bytes before parsing (``corpus/.../CharsetDetect.java``).

This implementation is a small deterministic regex extractor (the
container has no HTML/boilerpipe library): good enough to exercise the
real Spark-side contract — Arrow-batched ``mapInPandas``, interleaved
span emission, offset discipline, charset column. Swapping in a real
extractor changes only ``_extract_one``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DOC_SCHEMA = (
    "doc_id string, charset string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_SCRIPT_RE = re.compile(r"<(script|style)[^>]*>.*?</\1>", re.I | re.S)
_BLOCK_RE = re.compile(
    r"<(?P<tag>h[1-6]|p)[^>]*>(?P<body>.*?)</(?P=tag)>|"
    r"<a\s[^>]*?href=[\"'](?P<href>[^\"']*)[\"'][^>]*>(?P<atext>.*?)</a>",
    re.I | re.S,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _clean(fragment: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", fragment)).strip()


def detect_charset(payload: bytes) -> str:
    """Deterministic charset sniff: BOM -> declared meta -> utf-8 trial ->
    iso-8859-1 fallback (the CharsetDetect role without the chardet lib)."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if payload.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    head = payload[:2048].lower()
    m = re.search(rb'charset=["\']?([a-z0-9_\-]+)', head)
    if m:
        return m.group(1).decode("ascii", "replace")
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "iso-8859-1"


def _extract_one(url: str, html: str) -> list[dict]:
    """One page -> offset-sorted interleaved spans. Title first at offset
    0; body spans shifted by len(title)+2 (the reference's '\\n\\n' join)."""
    stripped = _SCRIPT_RE.sub(" ", html)
    tm = _TITLE_RE.search(stripped)
    title = _clean(tm.group(1)) if tm else ""
    spans = []
    offset = 0
    if title:
        spans.append({"kind": "title", "text": title, "media_ref": None, "offset": 0})
        offset = len(title) + 2  # title + blank line, HtmlToDocument.java:42-48
    for m in _BLOCK_RE.finditer(stripped):
        if m.group("href") is not None:
            text = _clean(m.group("atext") or "")
            spans.append(
                {"kind": "link", "text": text, "media_ref": m.group("href"), "offset": offset}
            )
            offset += len(text) + 1
        else:
            tag = m.group("tag").lower()
            text = _clean(m.group("body") or "")
            if not text:
                continue
            kind = "section_header" if tag.startswith("h") else "paragraph"
            spans.append({"kind": kind, "text": text, "media_ref": None, "offset": offset})
            offset += len(text) + 1
    return spans


def html_to_documents(
    pages: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched extraction: (url, payload binary) -> (doc_id,
    charset, spans). Pages failing to decode yield empty span arrays
    (error rows, the fetch-layer exception-histogram pattern)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                cs = detect_charset(raw)
                try:
                    html = raw.decode(cs.replace("-sig", "") if cs != "utf-8-sig" else "utf-8-sig")
                    spans = _extract_one(url, html)
                except Exception:
                    spans = []
                out.append({"doc_id": url, "charset": cs, "spans": spans})
            yield pd.DataFrame(out)

    return pages.select(url_col, payload_col).mapInPandas(process, DOC_SCHEMA)
