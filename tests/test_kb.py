"""KB-assembly operators: literal cleaning, URI labels, label-collision
merge, type selection, taxonomy expansion, OPIC cash propagation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_dbp_spark.operators import kb


def test_clean_literal(spark):
    rows = [
        ("Hello World (disambiguation)",),
        ("  ,Spaced Out!  ",),
        ("x" * 50,),
        ("",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = [r[0] for r in df.select(kb.clean_literal(F.col("raw"))).collect()]
    assert got == ["hello_world", "spaced_out", None, None]


def test_uri_to_label(spark):
    rows = [
        ("http://db.org/resource/New_York_City",),
        ("http://db.org/resource/Python_%28language%29",),
    ]
    df = spark.createDataFrame(rows, "uri string")
    got = [r[0] for r in df.select(kb.uri_to_label(F.col("uri"))).collect()]
    assert got == ["New York City", "Python"]


def test_merge_label_collisions(spark):
    nodes = spark.createDataFrame(
        [
            ("n1", "Apple", 10.0),
            ("n2", "apple", 99.0),
            ("n3", "APPLE", 99.0),  # tie with n2 -> smaller id wins
            ("n4", "pear", 1.0),
        ],
        "id string, label string, popularity double",
    )
    remap = {r.id: r.canonical_id for r in kb.merge_label_collisions(nodes).collect()}
    assert remap == {"n1": "n2", "n2": "n2", "n3": "n2", "n4": "n4"}


def test_select_types(spark):
    rows = [("a", "T1")] * 5 + [("b", "T2")] * 3 + [("c", "T3")] * 1
    df = spark.createDataFrame([(i, t) for i, (a, t) in enumerate(rows)], "id bigint, type string")
    got = [(r.type, r.n_members) for r in kb.select_types(df, max_types=2, min_size=2).collect()]
    assert got == [("T1", 5), ("T2", 3)]


def test_taxonomy_expand(spark):
    triples = spark.createDataFrame(
        [("a", "child", "b"), ("c", "other", "d")], "arg1 string, rel string, arg2 string"
    )
    closure = spark.createDataFrame(
        [("child", "parent"), ("child", "grandparent")], "rel string, super_rel string"
    )
    got = {(r.arg1, r.rel, r.arg2) for r in kb.taxonomy_expand(triples, closure).collect()}
    assert got == {
        ("a", "child", "b"),
        ("a", "parent", "b"),
        ("a", "grandparent", "b"),
        ("c", "other", "d"),
    }


def test_opic_scores_conserve_and_rank(spark):
    # star graph: hub -> a,b,c ; a,b,c -> hub. Hub should dominate history.
    edges = spark.createDataFrame(
        [("hub", x) for x in "abc"] + [(x, "hub") for x in "abc"],
        "src string, dst string",
    )
    got = {r.node: r.history for r in kb.opic_scores(edges, n_rounds=3).collect()}
    assert set(got) == {"hub", "a", "b", "c"}
    assert got["hub"] > got["a"] == pytest.approx(got["b"]) == pytest.approx(got["c"])
    # total cash+history mass stays positive and finite
    assert all(v > 0 for v in got.values())


def test_filter_gazetteer_labels(spark):
    """BuildGazetteer.java:92-107 keep rule: count>=min AND (multi-word
    OR integer OR count<=max); missing idCounts entry -> count 0."""
    from cc_dbp_spark.operators import kb

    labels = spark.createDataFrame(
        [
            ("e:hot", "state"),          # single word, hot -> dropped
            ("e:hot", "state line"),     # multi-word survives any count
            ("e:hot", "1984"),           # integer survives any count
            ("e:cool", "widget"),        # single word, cool -> kept
            ("e:ghost", "ghost"),        # no idCounts row -> count 0 -> dropped
            ("e:cool", "  "),            # empty tokenization -> dropped
        ],
        "id string, label string",
    )
    counts = spark.createDataFrame(
        [("e:hot", 100_000), ("e:cool", 12)], "id string, cnt bigint"
    )
    kept = kb.filter_gazetteer_labels(labels, counts, min_count=1, max_count=50_000)
    got = {(r.id, r.label, r["count"]) for r in kept.collect()}
    assert got == {
        ("e:hot", "state line", 100_000),
        ("e:hot", "1984", 100_000),
        ("e:cool", "widget", 12),
    }
    # no-idCounts mode (countFiltered=false): every entity passes the
    # min gate at count=min_count; the max gate then never bites
    kept2 = kb.filter_gazetteer_labels(labels, None, min_count=1, max_count=50_000)
    assert kept2.count() == 5  # only the empty-token label drops


def test_filter_gazetteer_labels_parseint_boundary(spark):
    """Lang.isInteger == Integer.parseInt acceptance, exactly: the int32
    overflow boundary and leading zeros behave like the JVM (a hot
    entity's 10-digit label survives iff parseInt would accept it)."""
    from cc_dbp_spark.operators import kb

    cases = [
        ("2147483647", True),      # Integer.MAX_VALUE
        ("2147483648", False),     # overflow
        ("-2147483648", True),     # Integer.MIN_VALUE
        ("-2147483649", False),    # underflow
        ("+2147483647", True),     # explicit plus sign
        ("0002147483647", True),   # leading zeros, value fits
        ("0002147483648", False),  # leading zeros, value overflows
        ("00000000000", True),     # all zeros == 0
        ("12345678901", False),    # 11 significant digits
        ("999999999", True),       # 9 digits always fits
        ("12e4", False),           # not parseInt-acceptable
        ("-", False),
    ]
    labels = spark.createDataFrame(
        [("e:hot", lb) for lb, _ in cases], "id string, label string"
    )
    counts = spark.createDataFrame([("e:hot", 100_000)], "id string, cnt bigint")
    kept = kb.filter_gazetteer_labels(labels, counts, min_count=1, max_count=50_000)
    got = {r.label for r in kept.collect()}
    assert got == {lb for lb, ok in cases if ok}
