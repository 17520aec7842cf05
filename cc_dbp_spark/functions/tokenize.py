"""Offset-preserving rule tokenizer + abbreviation-guarded sentence
splitting — the fidelity step for the reference's annotator substrate.

The reference runs real NLP annotators: ``ClearNLPTokenize.java`` /
``Token.tokenize`` produce Token spans (contraction + punctuation
rules), ``ClearNLPSentence.java`` produces Sentence spans, and the
mention pipeline consumes those (``kbp/.../CreateTsvDataset.java:130-177``;
span snapping ``util/.../Span.java:365-429``). Round 1-3 of this rebuild
stood in whitespace tokens and a bare ``(?<=[.!?])\\s+`` sentence split;
this module upgrades both with public Penn-treebank-style rules while
keeping exact character offsets (half-open [start,end), the ``Span``
convention):

* punctuation splits off words ("(really)." -> "(", "really", ")", ".")
* abbreviations keep their period ("Dr.", "etc.", "U.S.", "e.g.")
* numbers keep internal group/decimal marks ("1,234.56", "80%")
* hyphen/apostrophe-connected compounds stay whole ("state-of-the-art",
  "o'clock")
* PTB contraction splits: "don't" -> "do" + "n't", "can't" -> "ca" +
  "n't", "it's" -> "it" + "'s"
* sentence split guards abbreviations and single-letter initials and
  requires a capital/digit continuation

On text with no punctuation (e.g. the ``[a-z0-9 ]`` driver corpus) the
rule tokenizer is exactly the whitespace tokenizer — same tokens, same
offsets — which is what keeps the single-space DuckDB mention oracles
value-identical while punctuation-bearing text now tokenizes like the
reference's annotators instead of like ``split(' ')``. The divergence
cases are pinned by differential tests (tests/test_gazetteer.py).
"""

from __future__ import annotations

import re

_WS_CHUNK = re.compile(r"\S+")

# common English abbreviations that keep their trailing period (public
# Penn/OpenNLP-style list; lowercased for the membership test)
ABBREVIATIONS = frozenset({
    "mr.", "mrs.", "ms.", "dr.", "prof.", "sr.", "jr.", "st.", "no.",
    "vs.", "etc.", "e.g.", "i.e.", "inc.", "ltd.", "co.", "corp.",
    "jan.", "feb.", "mar.", "apr.", "jun.", "jul.", "aug.", "sep.",
    "sept.", "oct.", "nov.", "dec.", "fig.", "eq.", "cf.", "al.",
    "ca.", "approx.",
})

# multi-initial abbreviations: U.S., e.g., Ph.D.-ish shapes
_MULTI_INITIAL = re.compile(r"^(?:[A-Za-z]{1,2}\.){2,}$")
# numbers with group/decimal marks, optional sign / trailing percent
_NUMBER = re.compile(r"^[+-]?\d+(?:[.,]\d+)*%?$")
# alnum runs connected by single hyphens/apostrophes, or one other char.
# [^\W_] = Unicode alphanumerics (\w minus underscore), matching the
# str.isalnum() classes the chunk fast path and peel loop use — an
# ASCII-only class here would shred accented/non-Latin words into
# per-character tokens whenever punctuation sits in the same chunk
_CORE_RE = re.compile(r"[^\W_]+(?:['’-][^\W_]+)*|[\W_]")
_CONTRACTION = re.compile(r"^([A-Za-z]+)(n['’]t)$", re.IGNORECASE)
_CLITIC = re.compile(r"^([A-Za-z]+)(['’](?:s|re|ve|ll|d|m))$", re.IGNORECASE)

# sentence boundary: sentence-final punct, NOT an abbreviation period,
# NOT a single-initial period, whitespace, then a capital/digit opener
# (optionally quoted/parenthesized). Java regex (variable-length
# alternation lookbehind) — used by Spark's F.split; the pure-Python
# twin below implements the same rule procedurally because the stdlib
# re module only supports fixed-width lookbehind.
SENTENCE_SPLIT_REGEX = (
    r"(?<=[.!?])"
    r"(?<!\b(?:Mr|Mrs|Ms|Dr|Prof|Sr|Jr|St|No|vs|etc|Inc|Ltd|Co|Corp"
    r"|Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec|Fig|Eq|cf|al"
    r"|e\.g|i\.e)\.)"
    r"(?<![A-Z]\.)"
    r"\s+(?=[\"'(\[]?[A-Z0-9])"
)

_SENT_CAND = re.compile(r"(?<=[.!?])\s+(?=[\"'(\[]?[A-Z0-9])")
_ABBR_TAIL = re.compile(
    r"\b(?:Mr|Mrs|Ms|Dr|Prof|Sr|Jr|St|No|vs|etc|Inc|Ltd|Co|Corp"
    r"|Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec|Fig|Eq|cf|al"
    r"|e\.g|i\.e)\.$|[A-Z]\.$"
)


def split_sentences(text: str) -> list[str]:
    """Pure-Python twin of ``F.split(text, SENTENCE_SPLIT_REGEX)`` —
    same boundaries, implemented procedurally (stdlib ``re`` cannot run
    the variable-length lookbehind Java accepts)."""
    parts, prev = [], 0
    for m in _SENT_CAND.finditer(text):
        if _ABBR_TAIL.search(text[:m.start()]):
            continue
        parts.append(text[prev:m.start()])
        prev = m.end()
    parts.append(text[prev:])
    return parts


def whitespace_tokenize_with_offsets(
    text: str,
) -> tuple[list[str], list[int], list[int]]:
    """The round-1-3 stand-in: whitespace tokens + char start/end
    (half-open). Kept as the differential baseline (RegexTokenize.java
    WHITESPACE mode) and for callers that need split(' ') parity."""
    toks, starts, ends = [], [], []
    for m in _WS_CHUNK.finditer(text):
        toks.append(m.group(0))
        starts.append(m.start())
        ends.append(m.end())
    return toks, starts, ends


def _is_unit(s: str) -> bool:
    return bool(
        s.lower() in ABBREVIATIONS or _MULTI_INITIAL.match(s) or _NUMBER.match(s)
    )


def _core_tokens(core: str, base: int, emit) -> None:
    for m in _CORE_RE.finditer(core):
        s = m.group(0)
        if s[0].isalnum():
            cm = _CONTRACTION.match(s) or _CLITIC.match(s)
            if cm:
                head, tail = cm.group(1), cm.group(2)
                emit(head, base + m.start(), base + m.start() + len(head))
                emit(tail, base + m.start() + len(head), base + m.end())
                continue
        emit(s, base + m.start(), base + m.end())


def _chunk_tokens(chunk: str, base: int, emit) -> None:
    lo, hi = 0, len(chunk)
    lead: list[int] = []
    trail: list[int] = []
    # peel surrounding punctuation one char at a time, stopping as soon
    # as the remainder is an atomic unit (abbreviation / number): that
    # keeps "U.S.," -> "U.S." + "," and "(1,234)" -> "(" "1,234" ")"
    while lo < hi and not _is_unit(chunk[lo:hi]):
        if not chunk[lo].isalnum():
            lead.append(lo)
            lo += 1
        elif not chunk[hi - 1].isalnum():
            trail.append(hi - 1)
            hi -= 1
        else:
            break
    for pos in lead:
        emit(chunk[pos], base + pos, base + pos + 1)
    core = chunk[lo:hi]
    if core:
        if _is_unit(core):
            emit(core, base + lo, base + hi)
        else:
            _core_tokens(core, base + lo, emit)
    for pos in reversed(trail):
        emit(chunk[pos], base + pos, base + pos + 1)


def rule_tokenize_with_offsets(
    text: str,
) -> tuple[list[str], list[int], list[int]]:
    """Penn-style rule tokens + exact char start/end (half-open).

    Identical to :func:`whitespace_tokenize_with_offsets` on text whose
    non-space characters are all alphanumeric; on punctuation-bearing
    text it applies the module rules (see module docstring)."""
    toks: list[str] = []
    starts: list[int] = []
    ends: list[int] = []

    def emit(s: str, a: int, b: int) -> None:
        toks.append(s)
        starts.append(a)
        ends.append(b)

    for m in _WS_CHUNK.finditer(text):
        chunk = m.group(0)
        # fast path: pure-alnum chunk (the overwhelmingly common case on
        # web text after HTML extraction) needs no rule machinery
        if chunk.isalnum():
            emit(chunk, m.start(), m.end())
        else:
            _chunk_tokens(chunk, m.start(), emit)
    return toks, starts, ends
