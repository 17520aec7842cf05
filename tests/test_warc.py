"""WARC reader tests: pure-python parser edge cases + the Spark
explode path (build -> bytes -> parse round trip)."""

from __future__ import annotations

import gzip

from cc_dbp_spark.sources import warc


DOCS = [
    ("http://a.ex.com/1", "hello world"),
    ("http://b.ex.com/2", "unicode café 漢字"),
    ("http://c.ex.com/3", ""),
]


def test_roundtrip_plain():
    recs, truncated = warc.parse_warc_bytes(warc.synth_warc(DOCS))
    assert not truncated
    # warcinfo + per doc (request, response)
    assert len(recs) == 1 + 2 * len(DOCS)
    resp = [r for r in recs if r["warc_type"] == "response"]
    assert [r["url"] for r in resp] == [u for u, _ in DOCS]
    for (u, t), r in zip(DOCS, resp):
        assert r["http_status"] == 200
        assert r["content_type"] == "text/html; charset=utf-8"
        assert r["body"] == t.encode("utf-8")


def test_roundtrip_gzip():
    recs, truncated = warc.parse_warc_bytes(warc.synth_warc(DOCS, compress=True))
    assert not truncated
    assert len([r for r in recs if r["warc_type"] == "response"]) == len(DOCS)


def test_truncated_payload_keeps_prefix():
    data = warc.synth_warc(DOCS)
    cut = data[: len(data) - 40]  # chop into the last record
    recs, truncated = warc.parse_warc_bytes(cut)
    assert truncated
    assert 0 < len(recs) < 1 + 2 * len(DOCS)


def test_garbage_and_bad_gzip():
    recs, truncated = warc.parse_warc_bytes(b"not a warc at all")
    assert truncated and recs == []
    recs, truncated = warc.parse_warc_bytes(b"\x1f\x8bbroken-gzip")
    assert truncated and recs == []


def test_missing_content_length_stops_scan():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    recs, truncated = warc.parse_warc_bytes(bad)
    assert truncated and recs == []


def test_non_http_payload_passthrough():
    rec = warc.synth_warc([])  # warcinfo only
    recs, truncated = warc.parse_warc_bytes(rec)
    assert not truncated
    assert recs[0]["warc_type"] == "warcinfo"
    assert recs[0]["http_status"] is None
    assert recs[0]["body"] == b"software: cc-dbp-spark-fixture"


def test_spark_explode_filters_responses(spark):
    rows = [("f0", warc.synth_warc(DOCS)), ("f1", warc.synth_warc(DOCS[:1], compress=True))]
    df = spark.createDataFrame(rows, "src string, payload binary")
    got = warc.warc_records(df).orderBy("src", "record_ndx").collect()
    assert [(r.src, r.record_ndx, r.url, r.body_len) for r in got] == [
        ("f0", 0, "http://a.ex.com/1", len(b"hello world")),
        ("f0", 1, "http://b.ex.com/2", len(DOCS[1][1].encode("utf-8"))),
        ("f0", 2, "http://c.ex.com/3", 0),
        ("f1", 0, "http://a.ex.com/1", len(b"hello world")),
    ]
    assert all(r.warc_type == "response" and r.http_status == 200 for r in got)
    assert all(not r.truncated for r in got)


def test_warc_null_and_garbage_payloads_leave_audit_trail(spark):
    """A NULL payload (the fetch layer's failed rows) or a payload that
    yields zero kept records must emit a sentinel truncated row instead
    of crashing (bytes(None) TypeError) or silently vanishing."""
    from cc_dbp_spark.sources import warc as W

    rows = [
        ("ok", W.synth_warc([("http://a.ex/x", "hello world")])),
        ("nullpay", None),
        ("garbage", b"not a warc at all"),
        # well-formed WARC whose records are ALL filtered out under
        # responses_only (warcinfo + request only): still audited, with
        # truncated carrying its real value (False)
        ("reqonly", W._record("request", "http://a.ex/x", b"GET /x")),
    ]
    df = spark.createDataFrame(rows, "src string, payload binary")
    got = {r.src: r for r in W.warc_records(df).collect()}
    assert got["ok"].record_ndx == 0 and not got["ok"].truncated
    assert got["nullpay"].record_ndx == -1 and got["nullpay"].truncated
    assert got["garbage"].record_ndx == -1 and got["garbage"].truncated
    assert got["reqonly"].record_ndx == -1 and not got["reqonly"].truncated
