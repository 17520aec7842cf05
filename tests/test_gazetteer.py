"""Gazetteer matcher: randomized differential test of the indexed
matcher vs the naive O(positions x entries) oracle — the reference's own
test strategy (TestGazetteerMatcher.java:65-136, fast vs baselineProcess
over random vocab/gazetteer/docs with exact span+id equality)."""

from __future__ import annotations

import random

import pytest

from cc_dbp_spark.operators import gazetteer as gaz

VOCAB = "alpha beta gamma delta Epsilon ZETA eta theta".split()


def _random_entries(rng: random.Random, n: int):
    entries = []
    for i in range(n):
        toks = tuple(rng.choices(VOCAB, k=rng.randint(1, 3)))
        entries.append((f"e{i}", toks, rng.random() < 0.3))
    return entries


def _random_text(rng: random.Random) -> str:
    words = [rng.choice(VOCAB + ["filler", "noise"]) for _ in range(rng.randint(0, 40))]
    if rng.random() < 0.3:
        words = [w.upper() if rng.random() < 0.5 else w.lower() for w in words]
    return " ".join(words)


def test_index_matches_naive_oracle():
    rng = random.Random(7)
    for trial in range(60):
        entries = _random_entries(rng, rng.randint(1, 12))
        idx = gaz.GazetteerIndex(entries)
        text = _random_text(rng)
        toks, _, _ = gaz.tokenize_with_offsets(text)
        assert sorted(idx.match_tokens(toks)) == sorted(gaz.naive_match(entries, text)), (
            f"trial {trial}: {entries} / {text!r}"
        )


def test_case_sensitivity_recheck():
    entries = [("cs", ("Alpha",), True), ("ci", ("alpha",), False)]
    idx = gaz.GazetteerIndex(entries)
    toks, _, _ = gaz.tokenize_with_offsets("alpha Alpha ALPHA")
    got = sorted(idx.match_tokens(toks))
    # ci matches all three case variants; cs only the exact "Alpha"
    assert got == sorted([("ci", 0, 1), ("ci", 1, 2), ("ci", 2, 3), ("cs", 1, 2)])


def test_multi_token_longest_first():
    entries = [("short", ("hash",), False), ("long", ("hash", "join"), False)]
    idx = gaz.GazetteerIndex(entries)
    toks, starts, ends = gaz.tokenize_with_offsets("big hash join now")
    got = idx.match_tokens(toks)
    assert got[0] == ("long", 1, 3)  # longest first at position 1
    assert ("short", 1, 2) in got


def test_char_offsets_halfopen():
    toks, starts, ends = gaz.tokenize_with_offsets("ab  cd e")
    assert toks == ["ab", "cd", "e"]
    assert starts == [0, 4, 7]
    assert ends == [2, 6, 8]


@pytest.mark.usefixtures("spark")
def test_spark_match_documents_equals_oracle(spark):
    rng = random.Random(11)
    entries = _random_entries(rng, 8)
    rows = [(i, _random_text(rng)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.entity_id, r.tok_start, r.tok_end, r.char_start, r.char_end)
        for r in gaz.match_documents(docs, entries).collect()
    }
    want = set()
    for did, text in rows:
        toks, starts, ends = gaz.tokenize_with_offsets(text)
        for eid, ts, te in gaz.naive_match(entries, text):
            want.add((did, eid, ts, te, starts[ts], ends[te - 1]))
    assert got == want
