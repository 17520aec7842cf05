"""End-to-end dataset build over the crawl fixtures: stage artifacts,
invariants, and output-exists resume (RelexBuildDataset pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cc_dbp_spark.plans.pipeline import DatasetBuilder, docs_to_corpus

GAZ = [(f"ent:{w}", (w,), False) for w in ["data", "spark", "crawl", "frontier", "host", "link", "queue", "index"]] + [
    ("ent:link_graph", ("link", "graph"), False)
]
TRIPLES = [
    ("ent:spark", "rel:runs", "ent:crawl"),
    ("ent:host", "rel:has", "ent:link"),
    ("ent:data", "rel:in", "ent:index"),
]


@pytest.fixture(scope="module")
def built(spark, fixture_dir, tmp_path_factory):
    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    out = tmp_path_factory.mktemp("dataset")
    triples = spark.createDataFrame(TRIPLES, "arg1 string, rel string, arg2 string")
    b = DatasetBuilder(spark, out, GAZ, triples, retain_negative_prob=0.8,
                       min_mention_set=2, max_mention_set=10, vocab_limit=20)
    res = b.run(docs)
    return b, res, docs


def test_corpus_reconstruction(spark, fixture_dir):
    docs = spark.read.parquet(str(fixture_dir / "documents_spans.parquet"))
    corpus = docs_to_corpus(docs)
    assert corpus.count() > 0
    row = corpus.first()
    assert row.text and " " in row.text
    # doc_id is the xxhash of the url; url preserved alongside
    assert corpus.filter(F.col("doc_url").startswith("http")).count() == corpus.count()


def test_stages_produce_artifacts(built):
    b, res, _ = built
    assert res["skipped"] == []
    assert res["pairs"].count() > 0
    g = res["groups"]
    assert g.filter(F.col("set_size") < 2).count() == 0
    assert {r.split for r in g.select("split").distinct().collect()} <= {"train", "val", "test"}
    assert res["tensors"].count() >= g.count()  # >=1 chunk per group
    # ladder maxes out at 93: every fixture word exceeds it, so the vocab
    # can't shrink below its 25 words (reference semantics: cap, not trim)
    v = res["vocab"]
    assert v.count() > 0 and v.first().min_count == 93
    stats = {r.relation: r.n_mentions for r in res["stats"].collect()}
    assert "__all__" in stats


def test_positive_groups_have_relations(built):
    _, res, _ = built
    pos = res["groups"].filter(F.col("positive"))
    if pos.count():
        pairs = {(r.id1, r.id2) for r in pos.select("id1", "id2").collect()}
        gt = {tuple(sorted((a, c))) for a, _, c in TRIPLES}
        for p in pairs:
            assert tuple(sorted(p)) in gt


def test_resume_skips_completed_stages(built):
    b, _, docs = built
    res2 = b.run(docs)
    assert set(res2["skipped"]) == {"corpus", "pairs", "groups", "tensors", "vocab", "stats"}
    # artifacts identical after resume (counts stable)
    assert res2["groups"].count() == b._read("groups").count()
