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


# ------------------------------------------------- rule tokenizer fidelity


def test_rule_tokenizer_equals_whitespace_on_alnum_text():
    """On punctuation-free text (the driver corpus character set) the
    rule tokenizer IS the whitespace tokenizer — tokens and offsets —
    which is what keeps the single-space DuckDB mention oracles green
    after the substrate upgrade."""
    from cc_dbp_spark.functions import tokenize as tok

    rng = random.Random(11)
    words = "key agg row scan slow fast table value part hash 42 a the".split()
    for _ in range(50):
        text = " ".join(rng.choices(words, k=rng.randint(0, 30)))
        assert tok.rule_tokenize_with_offsets(text) == (
            tok.whitespace_tokenize_with_offsets(text)
        )


def test_rule_tokenizer_penn_style_rules():
    from cc_dbp_spark.functions import tokenize as tok

    cases = {
        # punctuation splits off; abbreviation keeps its period
        "Dr. Smith arrived (late).": ["Dr.", "Smith", "arrived", "(", "late", ")", "."],
        # PTB contractions
        "don't can't it's we're": ["do", "n't", "ca", "n't", "it", "'s", "we", "'re"],
        # numbers keep group/decimal marks; percent sticks
        "costs 1,234.56 or 80% more": ["costs", "1,234.56", "or", "80%", "more"],
        # multi-initial abbreviations survive with periods
        "made in the U.S. by e.g. robots": ["made", "in", "the", "U.S.", "by", "e.g.", "robots"],
        # hyphenated compounds stay whole; quotes split off
        'a "state-of-the-art" system': ["a", '"', "state-of-the-art", '"', "system"],
        # o'clock is connected, not a clitic
        "at 5 o'clock sharp,": ["at", "5", "o'clock", "sharp", ","],
        # Unicode words survive adjacent punctuation intact (the core
        # splitter uses the same Unicode alnum classes as the fast path)
        "a café, naïve-looking résumé.": ["a", "café", ",", "naïve-looking", "résumé", "."],
        "русский текст, пример!": ["русский", "текст", ",", "пример", "!"],
    }
    n_diverged = 0
    for text, want in cases.items():
        toks, starts, ends = tok.rule_tokenize_with_offsets(text)
        assert toks == want, f"{text!r}: {toks}"
        # offsets are exact, half-open, and consistent with the text
        for t, s, e in zip(toks, starts, ends):
            assert text[s:e] == t
        ws, _, _ = tok.whitespace_tokenize_with_offsets(text)
        n_diverged += toks != ws
    # divergence from the whitespace twin is the point of the upgrade
    # (the pure-number and pure-abbreviation cases legitimately
    # coincide: those chunks stay whole under both tokenizers)
    assert n_diverged >= 4


def test_gazetteer_matches_through_punctuation():
    """The upgrade's payoff: a phrase entry adjacent to punctuation now
    matches (whitespace tokens glued 'join,' to the comma and missed)."""
    entries = [("e:hashjoin", ("hash", "join"), False)]
    text = "use a hash join, then merge sort."
    idx = gaz.GazetteerIndex(entries)
    toks, starts, ends = gaz.tokenize_with_offsets(text)
    got = idx.match_tokens(toks)
    assert got == [("e:hashjoin", 2, 4)]
    # char span excludes the comma
    assert text[starts[2]:ends[3]] == "hash join"
    # the old whitespace twin misses it
    from cc_dbp_spark.functions import tokenize as tok

    ws_toks, _, _ = tok.whitespace_tokenize_with_offsets(text)
    assert idx.match_tokens(ws_toks) == []


def test_sentence_splitter_guards_abbreviations(spark):
    """Spark-side F.split(SENTENCE_SPLIT_REGEX) and the pure-Python twin
    agree; abbreviations and initials do NOT end sentences."""
    from pyspark.sql import functions as F

    from cc_dbp_spark.functions import tokenize as tok
    from cc_dbp_spark.operators import mentions

    texts = [
        "Dr. Smith arrived. He sat down.",
        "It cost 3.50 dollars. Then it rained!",
        "J. R. Hartley wrote it. True story.",
        "See e.g. the appendix. Also cf. Fig. 3 there.",
        "no caps after. this stays one sentence",
        "plain corpus text with no punctuation at all",
        "Ends mid",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r.doc_id, r.sent_id): r.sentence
        for r in mentions.sentences(df).collect()
    }
    for i, t in enumerate(texts):
        want = [s for s in tok.split_sentences(t) if s != ""]
        assert [got[(i, j)] for j in range(len(want))] == want, t
    # the guard cases split exactly where intended
    assert sum(1 for (i, _) in got if i == 0) == 2   # Dr. guarded
    assert sum(1 for (i, _) in got if i == 2) == 2   # initials guarded
    assert sum(1 for (i, _) in got if i == 3) == 2   # e.g./cf./Fig. guarded
    assert sum(1 for (i, _) in got if i == 4) == 1   # lowercase continuation


def test_match_documents_post_clean_in_kernel(spark):
    """match_documents(post_clean=True) must emit exactly
    clean_overlapping_matches(match_documents(...)) — the in-kernel
    PostGazClean is a plan optimization, not a semantic variant."""
    from cc_dbp_spark.operators import gazetteer as gaz

    entries = [
        ("e:hash", ("hash",), False),
        ("e:join", ("join",), False),
        ("e:hashjoin", ("hash", "join"), False),
        ("e:sortmerge", ("sort", "merge", "join"), False),
        ("e:sort", ("sort",), False),
        ("e:x", ("x",), False),
    ]
    texts = [
        "the hash join beats the sort merge join here",
        "hash alone and join alone survive",
        "x hash join x sort merge join x",
        "",
        "no entities at all in this one",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    kernel = sorted(
        tuple(r) for r in gaz.match_documents(df, entries, post_clean=True).collect()
    )
    twostep = sorted(
        tuple(r)
        for r in gaz.clean_overlapping_matches(
            gaz.match_documents(df, entries)
        ).collect()
    )
    assert kernel == twostep
    # the clean actually bit: nested single-token mentions are gone
    doc0 = {t[1] for t in kernel if t[0] == 0}
    assert "e:hashjoin" in doc0 and "e:hash" not in doc0
