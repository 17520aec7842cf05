"""Multi-token dictionary (gazetteer) matching — the reference's hot
inner loop (J3: ``nlp/.../parse/GazetteerMatcher.java:109-241``, entries
bucketed token-by-token with a case-sensitivity re-check; naive oracle
``GazetteerMatcher.java:247-273``; differential test pattern
``nlp/src/test/.../parse/TestGazetteerMatcher.java:65-136``).

Spark-first layout:
* the gazetteer (small side) ships ONCE per executor via
  ``SparkContext.broadcast`` of a first-token hash index — the
  by-hand broadcast-join pattern the reference builds with
  executor-singleton statics (``GazetteerEDL.java:72-93``);
* matching runs inside ``mapInPandas`` (Arrow batches of documents,
  token arrays vectorized per batch; the candidate-verify loop touches
  only positions whose first token hits the index);
* output is one row per match: (doc_id, entity_id, tok_start, tok_end,
  char_start, char_end) — char spans use the same half-open [start,end)
  convention as the reference's ``Span`` (``util/.../Span.java:27-40``).

Longest-match-wins at each start position; overlapping shorter matches
starting inside a longer match are still reported (the reference emits
all matches and defers overlap cleanup to P12/PostGazClean).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from cc_dbp_spark.functions import tokenize as _tok

_MATCH_SCHEMA_TAIL = (
    "entity_id string, tok_start int, tok_end int, char_start int, char_end int"
)

# The tokenizer seam: round 4 upgrades the whitespace stand-in to the
# Penn-style rule tokenizer (reference substrate: ClearNLPTokenize.java
# via Token.tokenize, BuildGazetteer.java:88-90). On punctuation-free
# text the two are identical (tokens AND offsets); the divergence cases
# are pinned differentially in tests/test_gazetteer.py.
tokenize_with_offsets = _tok.rule_tokenize_with_offsets


class GazetteerIndex:
    """First-token hash index over entries; pickles into a broadcast.

    entries: iterable of (entity_id, tokens tuple, case_sensitive bool).
    Case-insensitive entries are indexed lowercased and verified
    lowercased; case-sensitive entries must match exactly (the
    reference's re-check, GazetteerMatcher.java:119-133).
    """

    def __init__(self, entries):
        self.by_first: dict[str, list[tuple[str, tuple[str, ...], bool]]] = {}
        self.max_len = 1
        for eid, toks, cs in entries:
            toks = tuple(toks)
            if not toks:
                continue
            key = toks[0] if cs else toks[0].lower()
            self.by_first.setdefault(key, []).append((eid, toks, cs))
            self.max_len = max(self.max_len, len(toks))
        # NOTE on "numpy-vectorize the candidate scan": measured on
        # 800k tokens/batch (2k docs x 400 tokens, 250 entries), a
        # batched prescan — np.concatenate + Series.str.lower +
        # pd.util.hash_array + int64 np.isin — costs 0.87s vs 0.61s for
        # this loop's per-token str.lower + C-level dict.get. CPython
        # dicts ARE the hash-index fast path here; the HashTokenMatcher
        # shape is kept (first-token bucket, verify only bucket hits),
        # the per-token probe stays a dict lookup by measurement.

    def match_at(self, toks, low, i: int) -> list[tuple[str, int, int]]:
        """Verify all entries anchored at position i; longest-first."""
        n = len(toks)
        merged = []
        cands = self.by_first.get(low[i])
        if cands:
            merged.extend(e for e in cands if not e[2])
        cands_cs = self.by_first.get(toks[i])
        if cands_cs:
            merged.extend(e for e in cands_cs if e[2])
        hits = []
        for eid, etoks, cs in merged:
            L = len(etoks)
            if i + L > n:
                continue
            if cs:
                ok = all(toks[i + j] == etoks[j] for j in range(L))
            else:
                ok = all(low[i + j] == etoks[j].lower() for j in range(L))
            if ok:
                hits.append((eid, i, i + L))
        hits.sort(key=lambda h: (-(h[2] - h[1]), h[0]))
        return hits

    def match_tokens(self, toks: list[str]) -> list[tuple[str, int, int]]:
        """All (entity_id, tok_start, tok_end) matches, longest-first per
        start position."""
        low = [t.lower() for t in toks]
        out = []
        for i in range(len(toks)):
            out.extend(self.match_at(toks, low, i))
        return out


def naive_match(entries, text: str) -> list[tuple[str, int, int]]:
    """O(positions x entries) oracle — the reference's baselineProcess
    (GazetteerMatcher.java:247-273). Same output contract as
    GazetteerIndex.match_tokens; used only in differential tests."""
    toks, _, _ = tokenize_with_offsets(text)
    low = [t.lower() for t in toks]
    out = []
    for i in range(len(toks)):
        hits = []
        for eid, etoks, cs in entries:
            etoks = tuple(etoks)
            L = len(etoks)
            if L == 0 or i + L > len(toks):
                continue
            if cs:
                ok = all(toks[i + j] == etoks[j] for j in range(L))
            else:
                ok = all(low[i + j] == etoks[j].lower() for j in range(L))
            if ok:
                hits.append((eid, i, i + L))
        hits.sort(key=lambda h: (-(h[2] - h[1]), h[0]))
        out.extend(hits)
    return out


def clean_overlapping_matches(matches: DataFrame) -> DataFrame:
    """P12 PostGazClean (``kbp/.../GazetteerEDL.java:41-70``): drop a
    match that covers <= 1 token and lies strictly inside a longer match
    of the same document. Self-join per doc on token-span containment —
    matches per doc are few, so the join stays narrow after the doc_id
    equi-key."""
    from pyspark.sql import functions as F

    short = matches.filter((F.col("tok_end") - F.col("tok_start")) <= 1).alias("s")
    longer = matches.alias("l")
    doomed = (
        short.join(
            longer,
            (F.col("s.doc_id") == F.col("l.doc_id"))
            & (F.col("l.tok_start") <= F.col("s.tok_start"))
            & (F.col("l.tok_end") >= F.col("s.tok_end"))
            & (
                (F.col("l.tok_end") - F.col("l.tok_start"))
                > (F.col("s.tok_end") - F.col("s.tok_start"))
            ),
            "left_semi",
        )
        .select("s.doc_id", "s.entity_id", "s.tok_start", "s.tok_end")
    )
    return matches.join(
        doomed, ["doc_id", "entity_id", "tok_start", "tok_end"], "left_anti"
    )


def mention_pairs_token_window(matches: DataFrame, window: int) -> DataFrame:
    """F3 token-window pair variant (``CreateTsvDatasetTokenWindow.java:165-176``),
    reference-exact forward-scan semantics. The Java loop walks entities
    AFTER the center in annotation order — ``Span.compareTo``
    (Span.java:633-638): start ascending, LONGER SPAN FIRST on equal
    starts — and **breaks at the first entity whose token END exceeds
    ``center.tok_end + window``** (the ``min(tokens.size, ...)`` clamp is
    a no-op for the predicate since any tok_end <= tokens.size by
    construction). The break excludes every later entity even when it
    would itself fit the window, so the kept set is the maximal PREFIX of
    the annotation-ordered successors satisfying
    ``other.tok_end <= center.tok_end + window`` — a filter formulation
    over-produces. Equal (start, end) ties take entity_id ascending (the
    reference leaves equal-span order to matcher emission; this is the
    deterministic stand-in, mirrored by the oracle). Equal-id pairs are
    dropped and output ids are normalized id1 < id2 with their positions.

    Scale shape: one shuffle groups mentions per doc_id; the sorted
    per-doc array is held ONCE per document (as the reference holds its
    per-doc annotation list once) — the break scan and the kept-pair
    construction both run as native lambdas INSIDE the still-grouped
    row, and only the actual pairs explode. An earlier formulation
    posexploded the centers first, which duplicated the O(m) array onto
    every one of m center rows — O(m^2) struct copies on a
    gazetteer-dense document even when every center's window was empty.
    Memory is O(m + kept pairs) per row; the pair count itself is the
    reference's own output bound (worst case all mentions share one
    token end, which the upstream doc-split/sentence bounds cap long
    before frontier scale). No per-doc cross join, no Python stage.
    """
    from pyspark.sql import functions as F

    ent = F.struct(
        F.col("tok_start").alias("ts"),
        (-F.col("tok_end")).alias("ned"),  # longer-first on equal starts
        F.col("entity_id").alias("eid"),
        F.col("tok_end").alias("te"),
    )
    g = matches.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(ent)).alias("ents")
    )

    def per_center(x, i):
        tail = F.slice(F.col("ents"), i + F.lit(2), F.size("ents"))
        limit = x["te"] + F.lit(window)
        # reference break: count the prefix of successors with
        # te <= limit, freezing at the first violation
        brk = F.aggregate(
            tail,
            F.struct(F.lit(0).alias("n"), F.lit(False).alias("stop")),
            lambda acc, y: F.struct(
                F.when(acc["stop"] | (y["te"] > limit), acc["n"])
                .otherwise(acc["n"] + 1)
                .alias("n"),
                (acc["stop"] | (y["te"] > limit)).alias("stop"),
            ),
            lambda acc: acc["n"],
        )
        return F.transform(
            F.slice(tail, F.lit(1), brk),
            lambda y: F.struct(
                x["eid"].alias("xid"), x["ts"].alias("xs"),
                y["eid"].alias("yid"), y["ts"].alias("ys"),
            ),
        )

    pairs = g.select(
        "doc_id",
        F.explode(F.flatten(F.transform("ents", per_center))).alias("p"),
    ).filter(F.col("p")["xid"] != F.col("p")["yid"])
    swap = F.col("p")["xid"] > F.col("p")["yid"]
    return pairs.select(
        "doc_id",
        F.when(swap, F.col("p")["yid"]).otherwise(F.col("p")["xid"]).alias("id1"),
        F.when(swap, F.col("p")["xid"]).otherwise(F.col("p")["yid"]).alias("id2"),
        F.when(swap, F.col("p")["ys"]).otherwise(F.col("p")["xs"]).alias("t1"),
        F.when(swap, F.col("p")["xs"]).otherwise(F.col("p")["ys"]).alias("t2"),
    ).distinct()


def match_documents(
    docs: DataFrame,
    entries,
    id_col: str = "doc_id",
    text_col: str = "text",
    post_clean: bool = False,
) -> DataFrame:
    """Annotate every document with gazetteer matches.

    The index builds once per Python worker from a broadcast (executor
    singleton, the RunPipelineSpark.java:46-51 lazy-init pattern);
    matching streams Arrow batches.

    ``post_clean=True`` applies P12 PostGazClean
    (``kbp/.../GazetteerEDL.java:41-70``) INSIDE the kernel, while the
    document's matches are still a local Python list — identical output
    to ``clean_overlapping_matches(match_documents(...))`` (pinned by
    test_match_documents_post_clean_in_kernel) without that version's
    two extra shuffle joins; matches per doc are few, so the O(m^2)
    containment scan is noise next to the matcher itself.
    """
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(list(entries))
    cache: dict[int, GazetteerIndex] = {}
    id_type = dict(docs.dtypes)[id_col]
    schema = f"doc_id {id_type}, {_MATCH_SCHEMA_TAIL}"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = cache.get(id(bc))
        if idx is None:
            idx = GazetteerIndex(bc.value)
            cache[id(bc)] = idx
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not text:
                    continue
                toks, starts, ends = tokenize_with_offsets(text)
                ms = idx.match_tokens(toks)
                if post_clean and ms:
                    # GazetteerEDL.java:41-70: drop a <=1-token match
                    # lying inside a strictly-longer match of the doc
                    ms = [
                        (eid, ts, te)
                        for eid, ts, te in ms
                        if not (
                            te - ts <= 1
                            and any(
                                lts <= ts and lte >= te and lte - lts > te - ts
                                for _, lts, lte in ms
                            )
                        )
                    ]
                for eid, ts, te in ms:
                    rows.append((did, eid, ts, te, starts[ts], ends[te - 1]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "entity_id", "tok_start", "tok_end",
                    "char_start", "char_end",
                ],
            )

    return docs.select(id_col, text_col).mapInPandas(process, schema)
