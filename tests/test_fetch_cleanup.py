"""Fetch stage (retries + error histogram), P12 overlap cleanup,
F3 token-window pairs, D9 block shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from cc_dbp_spark.operators import fetch as FE
from cc_dbp_spark.operators import gazetteer as gaz
from cc_dbp_spark.plans import layout


def test_fetch_retries_and_histogram(spark):
    doc_map = {"http://a": b"payload-a", "http://b": b"payload-b"}
    urls = spark.createDataFrame(
        [("http://a",), ("http://b",), ("http://missing",)], "url string"
    )
    # retry_sleep_s=0: fixture misses are EXPECTED; the default 2 s
    # inter-attempt sleep (reference contract) is for real transports
    out = FE.fetch_batch(urls, FE.make_fixture_fetcher(doc_map), retry_sleep_s=0.0)
    rows = {r.url: r for r in out.collect()}
    assert rows["http://a"].status == "fetched" and bytes(rows["http://a"].payload) == b"payload-a"
    assert rows["http://a"].attempts == 1
    assert rows["http://missing"].status == "failed"
    assert rows["http://missing"].attempts == FE.MAX_ATTEMPTS
    assert rows["http://missing"].error.startswith("KeyError")
    hist = {r.error_type: (r.n, r.total_attempts) for r in FE.error_histogram(out).collect()}
    assert hist["__ok__"] == (2, 2)
    assert hist["KeyError"] == (1, 3)


def test_error_histogram_never_counts_failures_as_ok(spark):
    """A failed row with a NULL or prefix-less error must not land in
    '__ok__' (regexp_extract(NULL) previously coalesced there)."""
    rows = [
        ("http://a", "fetched", 1, None),
        ("http://b", "failed", 3, None),
        ("http://c", "failed", 3, "no classifiable prefix"),
    ]
    df = spark.createDataFrame(
        rows, "url string, status string, attempts int, error string"
    )
    hist = {r.error_type: r.n for r in FE.error_histogram(df).collect()}
    assert hist == {"__ok__": 1, "__unknown__": 2}


def test_clean_overlapping_matches(spark):
    rows = [
        (1, "long", 0, 3, 0, 10),   # 3-token match
        (1, "sub1", 1, 2, 4, 7),    # 1-token inside long -> dropped
        (1, "edge", 0, 2, 0, 7),    # 2-token inside long -> kept (spans >1 token)
        (1, "outside", 5, 6, 20, 24),
        (2, "solo", 0, 1, 0, 4),    # no container in doc 2 -> kept
    ]
    m = spark.createDataFrame(
        rows, "doc_id bigint, entity_id string, tok_start int, tok_end int, "
        "char_start int, char_end int"
    )
    kept = {r.entity_id for r in gaz.clean_overlapping_matches(m).collect()}
    assert kept == {"long", "edge", "outside", "solo"}


def test_token_window_pairs(spark):
    rows = [
        (1, "a", 0, 1, 0, 1),
        (1, "b", 3, 4, 6, 8),
        (1, "c", 20, 21, 40, 42),
        (1, "a", 19, 20, 38, 39),  # second mention of a near c
    ]
    m = spark.createDataFrame(
        rows, "doc_id bigint, entity_id string, tok_start int, tok_end int, "
        "char_start int, char_end int"
    )
    got = {(r.id1, r.id2, r.t1, r.t2) for r in gaz.mention_pairs_token_window(m, window=5).collect()}
    assert got == {("a", "b", 0, 3), ("a", "c", 19, 20)}


def test_token_window_forward_scan_end_bound(spark):
    """Reference parity (CreateTsvDatasetTokenWindow.java:165-176): the
    scan walks successors in annotation order — Span.compareTo =
    (start asc, LONGER first) — and BREAKS at the first entity whose
    token end exceeds center.end + window, excluding every later entity
    even when it would itself fit."""
    rows = [
        (1, "ctr", 10, 11, 0, 1),
        # starts inside (12 <= 11+3=14) but ends at 18 > 14 -> violates
        (1, "longtail", 12, 18, 2, 9),
        # fits every bound, but sorts AFTER longtail (same start, shorter)
        (1, "fit", 12, 14, 2, 5),
        # nested same-start longer mention: sorts BEFORE ctr (longer first)
        (1, "nest", 10, 13, 0, 4),
        # early mention: its scan breaks immediately (nest.e 13 > 5+3)
        (1, "early", 4, 5, 0, 1),
    ]
    m = spark.createDataFrame(
        rows, "doc_id bigint, entity_id string, tok_start int, tok_end int, "
        "char_start int, char_end int"
    )
    got = {(r.id1, r.id2, r.t1, r.t2)
           for r in gaz.mention_pairs_token_window(m, window=3).collect()}
    # annotation order: early(4,5), nest(10,13), ctr(10,11),
    # longtail(12,18), fit(12,14).
    # early: bound 8, nest.e 13 > 8 -> break, none.
    # nest: bound 16 -> ctr(e11) kept; longtail(e18) > 16 -> BREAK,
    #   fit never reached even though fit.e 14 <= 16.
    # ctr: bound 14, longtail(e18) > 14 -> break immediately — fit is
    #   IN window (14 <= 14) but excluded by the break (divergence case).
    # longtail: bound 21 -> fit kept.
    assert got == {
        ("ctr", "nest", 10, 10),
        ("fit", "longtail", 12, 12),
    }


def test_block_shuffle_bounded_displacement(spark):
    df = spark.range(100).select(F.col("id"))
    out = [r.id for r in layout.block_shuffle(df, "id", block_size=10).collect()]
    assert sorted(out) == list(range(100))
    assert out != list(range(100))  # actually shuffled
    for pos, v in enumerate(out):
        assert v // 10 == pos // 10  # never leaves its block
    # deterministic
    out2 = [r.id for r in layout.block_shuffle(df, "id", block_size=10).collect()]
    assert out == out2
