"""Mention pipeline: hand-checked small cases + invariants of the
grouping/downsampling stages (reference semantics cited in
cc_dbp_spark/operators/mentions.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_dbp_spark.functions import parity
from cc_dbp_spark.operators import mentions as M

ENTRIES = [
    ("ent:hash", ("hash",), False),
    ("ent:join", ("join",), False),
    ("ent:sort", ("sort",), False),
    ("ent:hashjoin", ("hash", "join"), False),
]


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "hash join beats sort. sort wins"),
        (2, "hash then join then hash again"),
        (3, "nothing here"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_sentences_split(spark, docs):
    s = M.sentences(docs).collect()
    by_doc = {}
    for r in s:
        by_doc.setdefault(r.doc_id, []).append((r.sent_id, r.sentence))
    # the guarded splitter requires a capital/digit continuation, so the
    # lowercase "sort wins" does NOT open a new sentence (rule-tokenizer
    # round-4 semantics; "Sort wins" would split)
    assert by_doc[1] == [(0, "hash join beats sort. sort wins")]
    assert by_doc[3] == [(0, "nothing here")]
    caps = spark.createDataFrame(
        [(9, "hash join beats sort. Sort wins")], "doc_id bigint, text string"
    )
    got = [(r.sent_id, r.sentence) for r in M.sentences(caps).collect()]
    assert got == [(0, "hash join beats sort."), (1, "Sort wins")]


def test_mention_pairs_best_span_and_rewrite(spark, docs):
    sents = M.sentences(docs)
    pairs = {((r.doc_id, r.sent_id, r.id1, r.id2)): r for r in M.mention_pairs(sents, ENTRIES).collect()}
    # doc 2: "hash then join then hash again" — ent:hash at 0-4 and 20-24,
    # ent:join at 10-14; best hash-join pair is the closest: (10,14) vs (0,4)
    r = pairs[(2, 0, "ent:hash", "ent:join")]
    assert (r.s1, r.e1, r.s2, r.e2) == (0, 4, 10, 14)
    assert r.rewritten == "ARGONE then ARGTWO then hash again"
    # doc 1 is ONE sentence (lowercase continuation, guarded split).
    # PostGazClean (GazetteerEDL.java:41-70, applied between matcher and
    # pair generation) removes the single-token ent:hash/ent:join nested
    # inside the 2-token ent:hashjoin match, so NO (hash, join) pair is
    # fabricated for 'hash join ...' — only the container pairs survive
    assert (1, 0, "ent:hash", "ent:join") not in pairs
    assert (1, 0, "ent:join", "ent:sort") not in pairs
    r3 = pairs[(1, 0, "ent:hashjoin", "ent:sort")]
    assert (r3.s1, r3.e1, r3.s2, r3.e2) == (0, 9, 16, 20)  # closest sort wins
    assert r3.rewritten == "ARGONE beats ARGTWO. sort wins"


def test_relation_join_directions(spark, docs):
    sents = M.sentences(docs)
    pairs = M.mention_pairs(sents, ENTRIES)
    triples = spark.createDataFrame(
        [("ent:join", "rel:after", "ent:hash"), ("ent:hash", "rel:x", "ent:join")],
        "arg1 string, rel string, arg2 string",
    )
    lab = {(r.id1, r.id2): r.relations for r in M.relation_join(pairs, triples).collect()}
    # DirectionStyle.ignore (reference default): both directions attach
    # with the '>'/'<' prefixes STRIPPED into a sorted set
    assert lab[("ent:hash", "ent:join")] == "rel:after,rel:x"
    raw = {
        (r.id1, r.id2): r.relations
        for r in M.relation_join(pairs, triples, direction_style="raw").collect()
    }
    # raw keeps getRelations' encoding: '>'+rel forward, '<'+rel reverse
    assert raw[("ent:hash", "ent:join")] == "<rel:after,>rel:x"


def test_downsample_matches_kernel(spark, docs):
    sents = M.sentences(docs)
    pairs = M.mention_pairs(sents, ENTRIES)
    triples = spark.createDataFrame(
        [("ent:hash", "rel:x", "ent:join")], "arg1 string, rel string, arg2 string"
    )
    lab = M.relation_join(pairs, triples)
    kept = M.downsample_negatives(lab, 0.4).collect()
    for r in kept:
        if not r.is_positive:
            draw = parity.negative_downsample_priority([r.id1], [r.id2])[0]
            assert draw < 0.4
    # every positive survives
    pos = [r for r in lab.collect() if r.is_positive]
    assert len([r for r in kept if r.is_positive]) == len(pos)


def test_mention_groups_and_split(spark, docs):
    sents = M.sentences(docs)
    pairs = M.mention_pairs(sents, ENTRIES)
    triples = spark.createDataFrame(
        [("ent:hash", "rel:x", "ent:join")], "arg1 string, rel string, arg2 string"
    )
    lab = M.relation_join(pairs, triples)
    groups = M.assign_split(M.mention_groups(lab, min_mention_set=1)).collect()
    by_pair = {(g.id1, g.id2): g for g in groups}
    g = by_pair[("ent:hash", "ent:join")]
    assert g.positive and g.set_size >= 1
    for gg in groups:
        want = parity.sample_from_cdf(
            parity.split_location([gg.id1], [gg.id2]), [0.8, 0.9, 1.0]
        )[0]
        assert gg.split == ["train", "val", "test"][want]


def test_group_min_set_anti_join(spark):
    # synthetic: pair A appears 3x, pair B once -> B dropped at min=2
    rows = [
        (1, 0, "a", "b", 0, 1, 2, 3, f"s{i}", f"r{i}", False) for i in range(3)
    ] + [(2, 0, "c", "d", 0, 1, 2, 3, "s", "r", True)]
    lab = spark.createDataFrame(
        rows,
        "doc_id bigint, sent_id int, id1 string, id2 string, s1 int, e1 int, "
        "s2 int, e2 int, sentence string, rewritten string, is_positive boolean",
    )
    got = {(g.id1, g.id2) for g in M.mention_groups(lab, min_mention_set=2).collect()}
    assert got == {("a", "b")}


def test_sanitize_tsv(spark):
    df = spark.createDataFrame([("a\tb\nc\rd",)], "v string")
    assert df.select(M.sanitize_tsv(F.col("v")).alias("v")).collect()[0].v == "a b c d"


def test_attach_types_and_type_pair_filter(spark):
    pairs = spark.createDataFrame(
        [("e1", "e2"), ("e1", "e3"), ("e4", "e5")], "id1 string, id2 string"
    )
    types = spark.createDataFrame(
        [("e1", "Person"), ("e2", "Place"), ("e3", "Place"), ("e3", "Org")],
        "id string, type string",
    )
    typed = M.attach_types(pairs, types)
    got = {(r.id1, r.id2): (r.type1, r.type2) for r in typed.collect()}
    assert got[("e1", "e2")] == ("Person", "Place")
    assert got[("e1", "e3")] == ("Person", "multiType")
    assert got[("e4", "e5")] == ("unk", "unk")

    allowed = spark.createDataFrame([("Person", "Place")], "type_a string, type_b string")
    kept = {(r.id1, r.id2) for r in M.filter_by_type_pairs(typed, allowed).collect()}
    assert kept == {("e1", "e2")}


def test_filter_triples_by_counts(spark):
    triples = spark.createDataFrame(
        [("a", "r", "b"), ("a", "r", "c"), ("c", "r", "d")],
        "arg1 string, rel string, arg2 string",
    )
    counts = spark.createDataFrame(
        [("a", 10), ("b", 9), ("c", 1), ("d", 10)], "id string, cnt bigint"
    )
    got = {(r.arg1, r.rel, r.arg2) for r in M.filter_triples_by_counts(triples, counts, 5).collect()}
    assert got == {("a", "r", "b")}


def test_sentence_bounds_predicate(spark):
    """P8 exact bounds (CreateTsvDataset.java:167-170): tokens in
    [min,max] AND chars in [min,max]; boundary values kept."""
    rows = [
        (1, 0, "a"),                       # 1 token, 1 char -> drop (both)
        (2, 0, "a b"),                     # 2 tokens, 3 chars -> keep
        (3, 0, "w " * 49 + "w"),           # 50 tokens -> keep
        (4, 0, "w " * 100 + "w"),          # 101 tokens -> drop (tokens)
        (5, 0, "x" * 400),                 # 1 token, 400 chars -> drop (tokens)
        (6, 0, "y " + "x" * 398),          # 2 tokens, 400 chars -> keep
        (7, 0, "y " + "x" * 399),          # 401 chars -> drop (chars)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, sent_id int, sentence string")
    kept = {r.doc_id for r in M.sentence_bounds(df).collect()}
    assert kept == {2, 3, 6}


def _py_ratio_twin(rows, frac, target, tol=1.05):
    """Pure-Python twin of downsample_negatives_to_ratio over
    (id1, id2, is_positive) mention rows."""
    def draw(a, b):
        return parity.negative_downsample_priority([a], [b])[0]

    p1 = [r for r in rows if r[2] or draw(r[0], r[1]) <= frac]
    groups = {}
    for a, b, pos in p1:
        groups[(a, b)] = groups.get((a, b), False) or pos
    total, npos = len(groups), sum(groups.values())
    if npos <= 0:
        return p1, frac
    current = (total - npos) / npos
    if current > tol * target:
        retain = frac * (target / current)
        # the reference rescales the PHASE-1 OUTPUT (strict <)
        return [r for r in p1 if r[2] or draw(r[0], r[1]) < retain], retain
    return p1, frac


def test_downsample_to_ratio_matches_python_twin(spark):
    """Two-phase retune (RelexTsvDataset.java:120-157): many negative
    groups vs few positive -> the retain prob rescales and the kept set
    matches the pure-Python twin row for row."""
    ids = [f"ent:{c}" for c in "abcdefghijklmnop"]
    rows = []
    k = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            pos = k % 23 == 0  # sparse positives
            for m in range(1 + k % 3):  # 1-3 mentions per group
                rows.append((a, b, pos))
            k += 1
    lab = spark.createDataFrame(rows, "id1 string, id2 string, is_positive boolean")
    kept_df, retain = M.downsample_negatives_to_ratio(
        lab, sample_fraction=0.8, target_ratio=1.0
    )
    want_rows, want_retain = _py_ratio_twin(rows, 0.8, 1.0)
    assert retain == pytest.approx(want_retain, abs=0)
    assert retain < 0.8  # the rescale must actually have triggered
    got = sorted((r.id1, r.id2, r.is_positive) for r in kept_df.collect())
    assert got == sorted(want_rows)


def test_downsample_to_ratio_no_retune_when_within_tolerance(spark):
    rows = [("ent:a", "ent:b", True), ("ent:a", "ent:c", False)]
    lab = spark.createDataFrame(rows, "id1 string, id2 string, is_positive boolean")
    # phase-1 ratio is at most 1.0 <= 1.05*target -> no rescale
    kept_df, retain = M.downsample_negatives_to_ratio(
        lab, sample_fraction=1.0, target_ratio=1.0
    )
    assert retain == 1.0
    assert kept_df.count() == 2


def test_relation_join_aggregates_multi_relation_pairs(spark):
    """A pair holding several GT triples (taxonomy_expand shape) stays
    ONE mention row with the sorted relation set — not one row per
    relation (GroundTruth.getRelations returns the SET)."""
    pairs = spark.createDataFrame(
        [(1, 0, "e:a", "e:b", 0, 1, 2, 3, "s", "r")],
        "doc_id bigint, sent_id int, id1 string, id2 string, "
        "s1 int, e1 int, s2 int, e2 int, sentence string, rewritten string",
    )
    triples = spark.createDataFrame(
        [("e:a", "rel:x", "e:b"), ("e:a", "rel:sup", "e:b"), ("e:b", "rel:back", "e:a")],
        "arg1 string, rel string, arg2 string",
    )
    rows = M.relation_join(pairs, triples).collect()
    assert len(rows) == 1
    assert rows[0].relations == "rel:back,rel:sup,rel:x"
    assert rows[0].is_positive


def test_tensor_encode_resolves_punctuation_adjacent_args(spark):
    """The rule tokenizer matches entities next to punctuation, so the
    rewrite can produce 'ARGTWO,' — the encode must still resolve the
    placeholder (the reference re-tokenizes and finds the span;
    RelexTensors.java:134-142) instead of silently skipping the
    sentence."""
    rows = spark.createDataFrame(
        [("e:a", "e:b", True, 0, 0, "use ARGONE with ARGTWO, then rest")],
        "id1 string, id2 string, positive boolean, chunk int, "
        "sent_ndx int, ctx string",
    )
    vocab = spark.createDataFrame(
        [("use", 0), ("with", 1), ("then", 2), ("rest", 3)], "word string, widx int"
    )
    out = M.encode_tensor_rows(rows, vocab).collect()
    assert len(out) == 1
    # tokens: use ARGONE with ARGTWO , then rest -> the comma is its own
    # OOV token; words row = [0, -1, 1, -1, -1, 2, 3]
    assert list(out[0].words) == [0, -1, 1, -1, -1, 2, 3]
    assert list(out[0].pos1)[1] == 32 and list(out[0].pos2)[3] == 32


def test_tensor_encode_ignores_literal_placeholder_substrings(spark):
    """Literal document text containing the placeholder as an
    alphanumeric-adjacent substring ('ARGONEXT') must stay ONE token:
    unguarded padding split it into 'ARGONE'+'XT' and array_position's
    first-occurrence lookup anchored the arg span to the literal text
    instead of the real placeholder."""
    rows = spark.createDataFrame(
        [
            # literal ARGONEXT precedes the real ARGONE: with the old
            # unguarded padding a1 anchored at token 1 (wrong)
            ("e:a", "e:b", True, 0, 0, "see ARGONEXT then ARGONE hits ARGTWO"),
            # punctuation-adjacent literal: '.ARGONEXT' pads left but the
            # token stays intact, still != ARGONE
            ("e:c", "e:d", False, 0, 0, "pre.ARGONEXT ARGONE and ARGTWO"),
        ],
        "id1 string, id2 string, positive boolean, chunk int, "
        "sent_ndx int, ctx string",
    )
    vocab = spark.createDataFrame(
        [("see", 0), ("then", 1), ("hits", 2)], "word string, widx int"
    )
    out = {r.id1: r for r in M.encode_tensor_rows(rows, vocab).collect()}
    # toks: see ARGONEXT then ARGONE hits ARGTWO -> a1=3, a2=5
    a = out["e:a"]
    assert len(a.words) == 6
    assert list(a.pos1)[3] == 32 and list(a.pos2)[5] == 32
    # toks: pre. ARGONEXT ARGONE and ARGTWO -> a1=2, a2=4
    c = out["e:c"]
    assert len(c.words) == 5
    assert list(c.pos1)[2] == 32 and list(c.pos2)[4] == 32


def test_sentence_bounds_counts_whitespace_runs(spark):
    """Double spaces are not tokens; tabs separate tokens (the old
    literal-space split counted 'a  b' as 3 tokens and 'a\\tb' as 1)."""
    sents = spark.createDataFrame(
        [(1, 0, "a  b"), (2, 0, "a\tb"), (3, 0, "one"), (4, 0, "x " + "y " * 99 + "z")],
        "doc_id bigint, sent_id int, sentence string",
    )
    kept = {r.doc_id for r in M.sentence_bounds(sents).collect()}
    # 'a  b' = 2 tokens (kept), tab-separated = 2 tokens (kept),
    # 'one' = 1 token (dropped), 101 tokens (dropped)
    assert kept == {1, 2}


def test_sentence_bounds_token_notion_differential(spark):
    """P8 token-notion decision (sentence_bounds docstring): default =
    whitespace runs (native, oracle-replicable), tokens='rule' =
    reference Token parity. Differential pins (a) both modes identical
    on whitespace-clean text, (b) whitespace count <= rule count always
    (the rule tokenizer only splits within chunks), (c) the concrete
    divergence: a punctuation-heavy sentence whose rule count crosses a
    bound the whitespace count does not."""
    from cc_dbp_spark.functions.tokenize import rule_tokenize_with_offsets

    clean = [(i, 0, f"alpha beta gamma {i}") for i in range(4)]
    # 'one.' -> whitespace 1 token (dropped at min=2), rule 2 tokens
    # ('one', '.') -> kept under tokens='rule'
    punct = [(10, 0, "one."),
             # 3 whitespace chunks but 8 rule tokens: crosses max=5
             (11, 0, "(a)! (b)? c,")]
    sents = spark.createDataFrame(
        clean + punct, "doc_id bigint, sent_id int, sentence string"
    )
    ws = {r.doc_id for r in M.sentence_bounds(sents, max_tokens=5).collect()}
    rl = {r.doc_id for r in
          M.sentence_bounds(sents, max_tokens=5, tokens="rule").collect()}
    assert ws & {0, 1, 2, 3} == rl & {0, 1, 2, 3} == {0, 1, 2, 3}  # (a)
    # (c) concrete flips in both directions
    assert 10 not in ws and 10 in rl      # min bound: rule keeps
    assert 11 in ws and 11 not in rl      # max bound: rule drops
    # (b) ordering invariant on every fixture sentence
    for _, _, s in clean + punct:
        ws_n = len(s.split())
        rl_n = len(rule_tokenize_with_offsets(s)[0])
        assert ws_n <= rl_n


def test_relation_join_bidirectional_collapses_to_one(spark):
    """A relation held in BOTH directions must collapse to ONE set
    element under the default DirectionStyle.ignore (the '>'/'<'
    prefixes are stripped into a set, CreateTsvDataset.java:278-292) —
    relex_stats must count such a mention once, not twice."""
    pairs = spark.createDataFrame(
        [(1, 0, "e:a", "e:b", 0, 1, 2, 3, "s", "r")],
        "doc_id bigint, sent_id int, id1 string, id2 string, "
        "s1 int, e1 int, s2 int, e2 int, sentence string, rewritten string",
    )
    triples = spark.createDataFrame(
        [("e:a", "rel:r", "e:b"), ("e:b", "rel:r", "e:a")],
        "arg1 string, rel string, arg2 string",
    )
    rows = M.relation_join(pairs, triples).collect()
    assert rows[0].relations == "rel:r"
    stats = {r.relation: r.n_mentions
             for r in M.relex_stats(M.relation_join(pairs, triples)).collect()}
    assert stats["rel:r"] == 1


def test_downsample_phase_boundaries(spark):
    """Phase-1 keeps a negative whose draw EQUALS the fraction (skip
    only when strictly greater, CreateTsvDataset.java:198-204); the
    rescale phase drops a draw equal to retain (strict <,
    RelexTsvDataset.java:146)."""
    from cc_dbp_spark.functions import parity

    draw = parity.negative_downsample_priority(["e:a"], ["e:b"])[0]
    lab = spark.createDataFrame(
        [("e:a", "e:b", False)], "id1 string, id2 string, is_positive boolean"
    )
    assert M.downsample_negatives(lab, draw).count() == 1           # <=
    assert M.downsample_negatives(lab, draw, inclusive=False).count() == 0


def test_downsample_ratio_rescale_is_subset_of_phase1(spark):
    """A tolerance below 1 can push the rescaled retain ABOVE
    sample_fraction; the rescale must still filter the phase-1 output,
    never resurrect negatives phase 1 already dropped."""
    from cc_dbp_spark.functions import parity

    ids = [f"ent:{i}" for i in range(20)]
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            rows.append((a, b, (i * 31 + len(b)) % 17 == 0))
    lab = spark.createDataFrame(rows, "id1 string, id2 string, is_positive boolean")
    frac = 0.3
    kept_df, retain = M.downsample_negatives_to_ratio(
        lab, sample_fraction=frac, target_ratio=50.0, tolerance=0.01
    )
    # the scenario only bites when the retune fired AND overshot frac
    assert retain > frac
    for r in kept_df.filter(~F.col("is_positive")).collect():
        d = parity.negative_downsample_priority([r.id1], [r.id2])[0]
        assert d <= frac, "rescale resurrected a phase-1-dropped negative"


def test_downsample_ratio_zero_positives_drops_everything(spark):
    """npos == 0 with rows present: the reference's Infinity ratio fires
    the rescale branch with retain 0.0 — the dataset comes out EMPTY
    (RelexTsvDataset.java:134-146), not untouched."""
    lab = spark.createDataFrame(
        [("e:a", "e:b", False), ("e:c", "e:d", False)],
        "id1 string, id2 string, is_positive boolean",
    )
    kept, retain = M.downsample_negatives_to_ratio(
        lab, sample_fraction=1.0, target_ratio=1.0
    )
    assert retain == 0.0
    assert kept.count() == 0


def test_best_pair_tie_prefers_longer_span(spark):
    """Equal gaps at the same start resolve to the LONGER mention —
    bestSpanPair iterates annotation order (start asc, longer first,
    Span.java:633-638) and a strictly-greater update keeps the first."""
    # both e:A mentions are MULTI-token (PostGazClean only removes
    # nested single-token mentions, so both survive to pairing) and
    # share start + gap from e:B
    docs = spark.createDataFrame(
        [(1, "x alpha beta gamma")], "doc_id bigint, text string"
    )
    entries = [
        ("e:A", ("alpha", "beta", "gamma"), False),
        ("e:A", ("alpha", "beta"), False),
        ("e:B", ("x",), False),
    ]
    sents = M.sentences(docs)
    pairs = {(r.id1, r.id2): r for r in M.mention_pairs(sents, entries).collect()}
    r = pairs[("e:A", "e:B")]
    # equal gap, equal s1: e1 DESC picks 'alpha beta gamma' [2,18),
    # not 'alpha beta' [2,12)
    assert (r.s1, r.e1) == (2, 18)
