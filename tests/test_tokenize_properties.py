"""Property tests for the rule tokenizer (hypothesis): structural
invariants that must hold on ARBITRARY text, not just the curated
cases — the offsets are load-bearing for gazetteer char spans and the
span-sequence-equality contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cc_dbp_spark.functions import tokenize as tok

# mix of ascii words, unicode words, punctuation, numbers, whitespace
_text = st.text(
    alphabet=st.sampled_from(
        list("abc XY.9,!-'\"()/%:;\t\n") + ["é", "ü", "ж", "中"]
    ),
    max_size=80,
)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_offsets_are_exact_ordered_and_cover_nonspace(text):
    toks, starts, ends = tok.rule_tokenize_with_offsets(text)
    assert len(toks) == len(starts) == len(ends)
    prev_end = 0
    covered = 0
    for t, s, e in zip(toks, starts, ends):
        # half-open span [s, e) reproduces the token exactly
        assert 0 <= s < e <= len(text)
        assert text[s:e] == t
        # non-overlapping, strictly left-to-right
        assert s >= prev_end
        # only whitespace between tokens
        assert text[prev_end:s].strip() == ""
        prev_end = e
        covered += e - s
    assert text[prev_end:].strip() == ""
    # every non-space character belongs to exactly one token
    assert covered == sum(len(c) for c in text.split())


@settings(max_examples=300, deadline=None)
@given(_text)
def test_rule_equals_whitespace_on_punctuation_free_text(text):
    clean = " ".join("".join(ch for ch in text if ch.isalnum() or ch == " ").split())
    assert tok.rule_tokenize_with_offsets(clean) == (
        tok.whitespace_tokenize_with_offsets(clean)
    )


@settings(max_examples=200, deadline=None)
@given(_text)
def test_sentence_twin_parts_reassemble(text):
    parts = tok.split_sentences(text)
    # parts are ordered non-overlapping slices of the original; only
    # whitespace is consumed at the boundaries
    pos = 0
    for p in parts:
        idx = text.find(p, pos)
        assert idx >= 0
        assert text[pos:idx].strip() == ""
        pos = idx + len(p)
    assert text[pos:].strip() == ""
