"""HTML -> interleaved span document extraction (M3/M4) — the crawl
ingest seam that turns fetched page bytes into the engine's
``(doc_id, spans)`` records.

Reference behavior being matched (NOT ported): boilerpipe-fork HTML ->
text with Title/Link/SectionHeader/Paragraph span annotations
(``corpus/.../crawl/HtmlToDocument.java:28-71``); the title is prepended
to the body with a blank line and every body annotation is offset-shifted
by the title length (``HtmlToDocument.java:42-48``); charset detection
runs on raw payload bytes before parsing (``corpus/.../CharsetDetect.java``).

This implementation is a deterministic ``html.parser``-based extractor
(stdlib; the container has no boilerpipe library): a real tag tokenizer
handles NESTED and MALFORMED markup (unclosed blocks flush, stray end
tags are ignored), emits ``text_formatting`` spans for inline b/i/em/
strong runs and in-block ``link`` spans with exact in-document offsets,
and applies the reference's KeepEverythingWithMinKWords block filter
(``boilerpipe/.../TextDocument.java:124``: paragraph-class blocks under
``min_k_words`` words are dropped; titles/headers/links are kept).
Swapping in a boilerpipe-fidelity extractor changes only
:func:`_extract_one`.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

DOC_SCHEMA = (
    "doc_id string, charset string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)

DEFAULT_MIN_K_WORDS = 5  # KeepEverythingWithMinKWords' k

_WS_RE = re.compile(r"\s+")

_BLOCK_TAGS = {"p", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "blockquote"}
_HEADER_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_FMT_TAGS = {"b", "i", "em", "strong"}
_SKIP_TAGS = {"script", "style"}


class _Extractor(HTMLParser):
    """Streaming block builder: accumulates whitespace-collapsed text
    per block, tracking inline link/formatting runs as [start, end)
    positions INTO the block text (so annotation offsets survive the
    collapse exactly)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.blocks: list[tuple[str, str, str | None, list]] = []
        self._buf: list[str] = []
        self._kind: str | None = None
        self._href: str | None = None  # standalone-<a> block href
        self._open: list[list] = []  # [kind, start, href]
        self._done: list[tuple] = []  # (kind, start, end, href)
        self._skip = 0
        self._in_title = False

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        for o in self._open:  # dangling inline runs close at block end
            self._done.append((o[0], o[1], len(self._buf), o[2]))
        self._open = []
        text = "".join(self._buf).rstrip()
        # empty link blocks still emit: the href is the outlink signal
        # (image anchors etc.) even when the anchor has no text
        if self._kind == "link" and self._href is not None or (
            self._kind is not None and text
        ):
            inline = [
                (k, s, min(e, len(text)), h)
                for (k, s, e, h) in self._done
                if s < min(e, len(text))
            ]
            self.blocks.append((self._kind, text, self._href, inline))
        self._buf, self._done = [], []
        self._kind, self._href = None, None

    def _append(self, data: str) -> None:
        s = _WS_RE.sub(" ", data)
        if (not self._buf or self._buf[-1] == " ") and s.startswith(" "):
            s = s[1:]
        if s:
            self._buf.extend(s)

    # -- parser hooks ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "title":
            self._in_title = True
        elif tag in _BLOCK_TAGS:
            self._flush()
            self._kind = "section_header" if tag in _HEADER_TAGS else "paragraph"
        elif tag == "a":
            href = dict(attrs).get("href")
            if self._kind is None:
                self._flush()
                self._kind, self._href = "link", href
            else:
                self._open.append(["link", len(self._buf), href])
        elif tag in _FMT_TAGS:
            if self._kind is None:
                # formatting opening before any block: lazily start a
                # paragraph exactly as bare text does (handle_data) —
                # otherwise leading inline runs of block-less documents
                # were silently dropped while their text survived
                self._kind = "paragraph"
            self._open.append(["text_formatting", len(self._buf), None])

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "title":
            self._in_title = False
        elif tag in _BLOCK_TAGS or tag == "body" or tag == "html":
            self._flush()
        elif tag == "a":
            if self._kind == "link" and not any(o[0] == "link" for o in self._open):
                self._flush()
            else:
                self._close_inline("link")
        elif tag in _FMT_TAGS:
            self._close_inline("text_formatting")

    def _close_inline(self, kind: str) -> None:
        for i in range(len(self._open) - 1, -1, -1):
            if self._open[i][0] == kind:
                k, s, h = self._open.pop(i)
                self._done.append((k, s, len(self._buf), h))
                return

    def handle_data(self, data):
        if self._skip:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        if self._kind is None:
            if not data.strip():
                return
            self._kind = "paragraph"  # bare text outside any block
        self._append(data)


def detect_charset(payload: bytes) -> str:
    """Deterministic charset sniff (the CharsetDetect role without the
    chardet lib): BOM -> declared meta -> utf-8 trial -> BOM-less utf-16
    null-density heuristic -> legacy single-byte trial scoring.

    The legacy step decodes the high-byte tail under candidate codecs
    (cp1252 first — the WHATWG rule maps latin-1 labels to cp1252 —
    then cp1251 for Cyrillic) and keeps the codec whose non-ascii chars
    are most often alphabetic; ties break in candidate order, so the
    result is deterministic for any input."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if payload.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    head = payload[:2048].lower()
    m = re.search(rb'charset=["\']?([a-z0-9_\-]+)', head)
    if m:
        return m.group(1).decode("ascii", "replace")
    sample = payload[:8192]
    if sample:
        # BOM-less utf-16 first: interleaved NULs are VALID utf-8 bytes,
        # but no real utf-8 text is 30% NUL
        nulls = sample.count(0)
        if nulls / len(sample) >= 0.3:
            return "utf-16-le" if sample[1:2] == b"\x00" else "utf-16-be"
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    # high-byte density discriminates script families that alpha-ratio
    # cannot (cp1251 Cyrillic and cp1252 accented latin both decode to
    # letters): Cyrillic/Greek text is nearly ALL high bytes, latin text
    # sprinkles accents among ascii letters
    nonws = [b for b in sample if b not in (0x20, 0x09, 0x0A, 0x0D)]
    hi_density = (sum(b >= 0x80 for b in nonws) / len(nonws)) if nonws else 0.0
    candidates = (
        ("cp1251", "cp1252", "iso-8859-1")
        if hi_density >= 0.6
        else ("cp1252", "cp1251", "iso-8859-1")
    )
    best, best_score = "iso-8859-1", -1.0
    for codec in candidates:
        try:
            text = sample.decode(codec)
        except UnicodeDecodeError:
            continue
        hi = [c for b, c in zip(sample, text) if b >= 0x80]
        if not hi:
            return "iso-8859-1"
        score = sum(c.isalpha() for c in hi) / len(hi)
        if score > best_score:
            best, best_score = codec, score
    return best


def _block_features(blocks) -> list[tuple[int, float, float]]:
    """(num_words, link_density, text_density) per extractor block —
    the shallow text features of Kohlschütter et al. (WSDM 2010):
    link density = anchored words / words; text density = words per
    80-column wrapped line. A standalone link block is all-anchored."""
    feats = []
    for kind, text, href, inline in blocks:
        words = len(text.split())
        if kind == "link":
            linked = words
        else:
            linked = sum(
                len(text[s:e].split()) for (k, s, e, h) in inline if k == "link"
            )
        ld = (min(linked, words) / words) if words else 0.0
        td = words / max(1, -(-len(text) // 80))  # ceil-div line count
        feats.append((words, ld, td))
    return feats


def _nwr_is_content(prev, curr, nxt) -> bool:
    """The public boilerpipe NumWordsRulesClassifier decision tree
    (trained on numWords + linkDensity of the previous/current/next
    block; Kohlschütter et al.). prev/curr/nxt are (num_words,
    link_density) — (0, 0.0) beyond the document edges."""
    pw, pl = prev
    cw, cl = curr
    nw, _ = nxt
    if cl <= 0.333333:
        if pl <= 0.555556:
            if cw <= 16:
                if nw <= 15:
                    return pw > 4
                return True
            return True
        if cw <= 40:
            return nw > 17
        return True
    return False


def classify_density(blocks) -> list[bool]:
    """Content/boilerplate flag per block via the NumWordsRules tree:
    link-dense nav chrome and isolated short runs drop; long low-link
    blocks and short blocks flanked by content survive."""
    feats = [(w, ld) for (w, ld, _td) in _block_features(blocks)]
    edge = (0, 0.0)
    out = []
    for i in range(len(feats)):
        prev = feats[i - 1] if i > 0 else edge
        nxt = feats[i + 1] if i + 1 < len(feats) else edge
        out.append(_nwr_is_content(prev, feats[i], nxt))
    return out


def _extract_one(
    url: str,
    html: str,
    min_k_words: int = DEFAULT_MIN_K_WORDS,
    classifier: str = "min_k",
) -> list[dict]:
    """One page -> offset-sorted interleaved spans.

    Title first at offset 0; body blocks follow shifted by
    len(title)+2 (the reference's '\\n\\n' join,
    HtmlToDocument.java:42-48), each KEPT block advancing the offset by
    len(text)+1. Dropped blocks do not advance the offset — they are not
    part of the document text. Inline link/text_formatting spans carry
    offsets into the document (block offset + in-block position).

    classifier:
      * ``min_k`` (default, the reference's KeepEverythingWithMinKWords,
        boilerpipe/.../MinWordsFilter): paragraph-class blocks under
        ``min_k_words`` words drop; titles, headers and link blocks
        are exempt.
      * ``density``: the public boilerpipe NumWordsRules classification
        over (num_words, link_density) of prev/curr/next blocks —
        link-dense nav chrome drops with its inline spans; applies to
        every body block (the title is not a block)."""
    ex = _Extractor()
    ex.feed(html)
    ex.close()
    ex._flush()  # EOF inside an unclosed block
    title = _WS_RE.sub(" ", " ".join(ex.title_parts)).strip()
    keep = classify_density(ex.blocks) if classifier == "density" else None
    spans = []
    offset = 0
    if title:
        spans.append({"kind": "title", "text": title, "media_ref": None, "offset": 0})
        offset = len(title) + 2
    for bi, (kind, text, href, inline) in enumerate(ex.blocks):
        if keep is not None:
            if not keep[bi]:
                continue
        elif kind == "paragraph" and len(text.split()) < min_k_words:
            continue
        spans.append(
            {
                "kind": kind,
                "text": text,
                "media_ref": href if kind == "link" else None,
                "offset": offset,
            }
        )
        # inline runs emit for EVERY kept block — including standalone
        # link blocks, whose nested anchors/formatting (malformed but
        # common markup) carry outlink hrefs of their own
        for ik, s, e, ih in sorted(inline, key=lambda t: (t[1], t[2])):
            frag = text[s:e]
            lead = len(frag) - len(frag.lstrip())
            frag = frag.strip()
            if not frag:
                continue
            spans.append(
                {
                    "kind": ik,
                    "text": frag,
                    "media_ref": ih,
                    "offset": offset + s + lead,
                }
            )
        offset += len(text) + 1
    return spans


def html_to_documents(
    pages: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    min_k_words: int = DEFAULT_MIN_K_WORDS,
    classifier: str = "min_k",
) -> DataFrame:
    """Arrow-batched extraction: (url, payload binary) -> (doc_id,
    charset, spans). Pages failing to decode yield empty span arrays
    (error rows, the fetch-layer exception-histogram pattern).
    ``classifier`` selects the block filter — see :func:`_extract_one`."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                cs = detect_charset(raw)
                try:
                    html = raw.decode(cs.replace("-sig", "") if cs != "utf-8-sig" else "utf-8-sig")
                    spans = _extract_one(url, html, min_k_words, classifier)
                except Exception:
                    spans = []
                out.append({"doc_id": url, "charset": cs, "spans": spans})
            yield pd.DataFrame(out)

    return pages.select(url_col, payload_col).mapInPandas(process, DOC_SCHEMA)
