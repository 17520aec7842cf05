"""Span operators (sort invariant, kind projection, doc split re-offset,
w2v lines) + source/sink contracts (fail-if-exists, rotation, splits,
NTriples/TSV scans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_dbp_spark.operators import spans as S
from cc_dbp_spark.sources import io as sio

SPANS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


@pytest.fixture()
def docs(spark):
    rows = [
        (
            "d1",
            [
                ("title", "Hello World", None, 0),
                ("text", "some body", None, 13),
                ("link", "click", "http://x/a", 23),
                ("media", "", "http://x/i.jpg", 29),
                ("paragraph", "More Text", None, 30),
            ],
        ),
        ("d2", [("text", "only", None, 0)]),
        ("d3", []),
    ]
    return spark.createDataFrame(rows, SPANS_SCHEMA)


def test_sort_and_invariant(spark, docs):
    shuffled = docs.withColumn("spans", F.reverse("spans"))
    assert {r.ok for r in S.spans_sorted_ok(shuffled).collect() if r.doc_id == "d1"} == {False}
    fixed = S.sort_spans(shuffled)
    assert all(r.ok for r in S.spans_sorted_ok(fixed).collect())


def test_filter_kinds_preserves_order(spark, docs):
    out = {r.doc_id: r.spans for r in S.filter_kinds(docs, ["link", "media"]).collect()}
    assert [s.kind for s in out["d1"]] == ["link", "media"]
    assert out["d2"] == []


def test_split_documents_reoffsets(spark, docs):
    parts = {r.doc_id: r for r in S.split_documents(docs, chunk=2).collect()}
    assert set(parts) == {"d1#0", "d1#1", "d1#2", "d2#0"}
    p1 = parts["d1#1"]
    # spans 3-4 (link@23, media@29) re-based to 0
    assert [(s.kind, s.offset) for s in p1.spans] == [("link", 0), ("media", 6)]
    assert all(r.spans[0].offset == 0 for r in parts.values())


def test_w2v_sentences(spark, docs):
    lines = {r.doc_id: r.line for r in S.w2v_sentences(docs).collect()}
    assert lines["d1"] == "hello_world some_body more_text"
    assert lines["d2"] == "only"
    assert "d3" not in lines


def test_w2v_overlap_drop(spark):
    """Differential vs the reference loop (CreateW2VFile.java:62-75):
    sort (start asc, longer first), keep a term only if it starts at or
    after the end of the last KEPT term. The third case below is the
    one a running-max formulation gets wrong: a DROPPED long span must
    not shadow later terms."""

    def ref_loop(spans):
        terms = sorted(
            ((o, o + len(t), t) for k, t, m, o in spans
             if k in S.TEXTY_KINDS and t != ""),
            key=lambda x: (x[0], -x[1]),
        )
        prev_end, out = 0, []
        for s, e, t in terms:
            if s < prev_end:
                continue
            prev_end = e
            out.append("_".join(t.strip().lower().split()))
        return " ".join(out)

    rows = [
        # entity span covering its tokens: longer-first wins, tokens drop
        ("a", [("text", "New York", None, 0), ("text", "New", None, 0),
               ("text", "York", None, 4)]),
        # partial overlap: second starts inside first -> dropped
        ("b", [("text", "abcdef", None, 0), ("text", "cdefgh", None, 2),
               ("text", "tail", None, 10)]),
        # dropped long span must NOT shadow: [0,3) kept, [1,10) dropped,
        # [4,6) kept (running-max over ALL prior ends would drop it)
        ("c", [("text", "abc", None, 0), ("text", "bcdefghij", None, 1),
               ("text", "xy", None, 4)]),
        # java trim: leading newline/tab stripped before '_'-joining
        ("d", [("text", "\n\t Hello  World \n", None, 0)]),
        # STABLE sort: equal start AND equal length — Collections.sort
        # keeps array order ('xy' first), so 'ab' is the overlap-dropped
        # one; a txt-comparing sort would keep 'ab' instead
        ("e", [("text", "xy", None, 0), ("text", "ab", None, 0)]),
    ]
    df = spark.createDataFrame(rows, SPANS_SCHEMA)
    got = {r.doc_id: r.line for r in S.w2v_sentences(df).collect()}
    want = {d: ref_loop(sp) for d, sp in rows}
    want = {d: line for d, line in want.items() if line != ""}
    assert got == want
    assert got["c"] == "abc xy"  # the anti-running-max case, pinned
    assert got["e"] == "xy"  # stability, not lexical-txt tie-break


def test_w2v_fixture_oracle_precondition():
    """The w2v_lines DuckDB oracle renders spans in ARRAY order while
    the engine sorts by (offset asc, length desc, index); their
    equivalence rests on the gate fixture's texty spans already being
    in that order with no overlaps. Assert the precondition directly so
    a regenerated fixture that breaks it fails HERE with a clear
    message, not in the driver gate as a word-order hash mismatch."""
    import duckdb

    from cc_dbp_spark import fixtures

    fd = fixtures.ensure_default()
    bad = duckdb.sql(
        f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(spans, s ->
                   s.kind IN ('text','title','paragraph','section_header')
                   AND s.text <> '') AS sp
          FROM read_parquet('{fd}/documents_spans.parquet')),
        u AS (
          SELECT doc_id, unnest(sp) AS s,
                 generate_subscripts(sp, 1) AS i
          FROM t)
        SELECT count(*)
        FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE b.s.offset < a.s.offset + length(a.s.text)
           OR (b.s.offset = a.s.offset
               AND length(b.s.text) > length(a.s.text))
        """
    ).fetchone()[0]
    assert bad == 0, (
        "fixture texty spans violate the w2v oracle precondition "
        "(array order must equal (offset asc, longer first) with no "
        f"overlaps) in {bad} docs — fix fixtures.py or make the "
        "w2v_lines oracle sort explicitly"
    )


def test_outlink_edges(spark, docs):
    edges = {(r.src, r.dst) for r in S.outlink_edges(docs).collect()}
    assert edges == {("d1", "http://x/a")}


def test_write_modes(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), (F.col("id") % 3).alias("k"))
    out = str(tmp_path / "t1")
    sio.write_table(df, out)
    with pytest.raises(sio.OutputExistsError):
        sio.write_table(df, out)
    sio.write_table(df, out, overwrite=True)  # explicit overwrite ok
    assert sio.read_table(spark, out).count() == 10


def test_write_rotating(spark, tmp_path):
    df = spark.range(100).coalesce(1)
    out = str(tmp_path / "rot")
    sio.write_rotating(df, out, max_records_per_file=30)
    files = [p for p in (tmp_path / "rot").glob("*.parquet")]
    assert len(files) >= 4  # ceil(100/30)


def test_write_split_dataset(spark, tmp_path):
    df = spark.range(30).select(
        "id", F.when(F.col("id") % 10 < 8, "train").otherwise("test").alias("split")
    )
    out = str(tmp_path / "ds")
    sio.write_split_dataset(df, out)
    assert (tmp_path / "ds" / "split=train").exists()
    back = sio.read_table(spark, out)
    assert back.filter(F.col("split") == "train").count() == 24


def test_read_ntriples(spark, tmp_path):
    p = tmp_path / "t.nt"
    p.write_text(
        "<http://a> <http://rel/x> <http://b> .\n"
        "# comment\n"
        "\n"
        '<http://c> <http://rel/y> "lit\\"eral" .\n'
    )
    rows = {(r.arg1, r.rel, r.arg2) for r in sio.read_ntriples(spark, str(p)).collect()}
    assert rows == {
        ("http://a", "http://rel/x", "http://b"),
        ("http://c", "http://rel/y", 'lit\\"eral'),
    }


def test_read_simple_tsv(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\t1\tx\nb\t2\ty\n")
    rows = sio.read_simple_tsv(spark, str(p), ["k", "n", "v"]).collect()
    assert {(r.k, r.n, r.v) for r in rows} == {("a", "1", "x"), ("b", "2", "y")}


def test_parquet_manifest_catalog(spark, tmp_path):
    from cc_dbp_spark.sources.catalog import ParquetManifestTables, iceberg_available

    assert not iceberg_available(spark)  # sandbox: parquet fallback active
    cat = ParquetManifestTables(tmp_path / "cat")
    s0 = cat.append("seen", spark.range(5).selectExpr("id", "0 AS round_seen"))
    s1 = cat.append("seen", spark.range(5, 8).selectExpr("id", "1 AS round_seen"))
    assert cat.snapshots("seen") == [s0, s1]
    assert cat.load(spark, "seen").count() == 8            # full table
    assert cat.load(spark, "seen", as_of=s0).count() == 5  # time travel
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cat.load(spark, "missing")


def test_download_kb_files_skip_if_exists(tmp_path):
    """S13 (SelectRelations.java:106-127): filename = last URL segment,
    existing files skip (resume contract), writes commit atomically, and
    a leftover .part from a crashed run is never trusted as complete."""
    from cc_dbp_spark.sources import download as dl

    calls = []

    def fake_fetch(url):
        calls.append(url)
        return f"payload-of-{dl.url_filename(url)}".encode()

    urls = [
        "http://downloads.example/2016-10/labels_en.ttl.bz2",
        "http://downloads.example/2016-10/instance_types_en.ttl.bz2",
    ]
    kb = tmp_path / "kb"
    first = dl.download_kb_files(urls, kb, fetch=fake_fetch)
    assert [r["action"] for r in first] == ["downloaded", "downloaded"]
    assert (kb / "labels_en.ttl.bz2").read_bytes() == b"payload-of-labels_en.ttl.bz2"
    assert len(calls) == 2

    # second run: both exist -> skipped, transport untouched
    second = dl.download_kb_files(urls, kb, fetch=fake_fetch)
    assert [r["action"] for r in second] == ["skipped", "skipped"]
    assert len(calls) == 2
    assert second[0]["n_bytes"] == len(b"payload-of-labels_en.ttl.bz2")

    # a crashed run's partial file does not satisfy skip-if-exists
    (kb / ".types.ttl.bz2.part").write_bytes(b"trunc")
    third = dl.download_kb_files(
        ["http://downloads.example/2016-10/types.ttl.bz2"], kb, fetch=fake_fetch
    )
    assert third[0]["action"] == "downloaded"
    assert (kb / "types.ttl.bz2").read_bytes() == b"payload-of-types.ttl.bz2"

    import pytest as _pt

    with _pt.raises(ValueError):
        dl.download_kb_files(["http://host.example/dir/"], kb, fetch=fake_fetch)
