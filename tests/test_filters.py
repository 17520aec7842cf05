"""Unit tests for the partitioned bloom + cuckoo membership filters."""

from __future__ import annotations

import numpy as np

from cc_dbp_spark.operators.filters import BloomSpec, CuckooFilter


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_bloom_no_false_negatives():
    spec = BloomSpec(capacity=50_000, fpr=0.01, num_partitions=4)
    members = _hashes(20_000, 1)
    bm = spec.build_bitmap(members)
    assert spec.probe(members, bm).all()


def test_bloom_fpr_within_budget():
    spec = BloomSpec(capacity=50_000, fpr=0.01, num_partitions=4)
    members = _hashes(12_500, 2)  # one partition's share
    bm = spec.build_bitmap(members)
    probes = _hashes(50_000, 3)
    fpr = spec.probe(probes, bm).mean()
    assert fpr < 0.03, fpr  # 3x headroom over configured 1%


def test_bloom_empty():
    spec = BloomSpec(capacity=1000)
    bm = spec.build_bitmap(np.array([], dtype=np.int64))
    assert not spec.probe(_hashes(100, 4), bm).any()


def test_cuckoo_roundtrip_and_delete():
    cf = CuckooFilter(capacity=10_000)
    members = _hashes(5_000, 5)
    failed = cf.insert(members)
    assert failed == 0
    assert cf.contains(members).all()
    non = _hashes(10_000, 6)
    fpr = cf.contains(non).mean()
    assert fpr < 0.02, fpr
    # delete half, they must disappear (and the rest stay)
    half = members[:2500]
    removed = cf.delete(half)
    assert removed.all()
    assert cf.contains(members[2500:]).all()
    assert cf.contains(half).mean() < 0.02


def test_cuckoo_serialization():
    cf = CuckooFilter(capacity=1000)
    members = _hashes(400, 7)
    cf.insert(members)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains(members).all()


def test_bloom_spark_build_and_prune(spark):
    from cc_dbp_spark.operators import filters as flt
    from pyspark.sql import functions as F

    spec = BloomSpec(capacity=4096, fpr=0.01, num_partitions=4)
    seen = spark.createDataFrame(
        [(f"http://seen{i}.com",) for i in range(500)], "url string"
    ).withColumn("url_hash", F.xxhash64("url"))
    cands = spark.createDataFrame(
        [(f"http://seen{i}.com",) for i in range(0, 500, 5)]
        + [(f"http://new{i}.com",) for i in range(300)],
        "url string",
    ).withColumn("url_hash", F.xxhash64("url"))

    bloom = flt.build_bloom_df(seen, spec)
    new, maybe = flt.prune_with_bloom(cands, bloom, spec)
    new_urls = {r.url for r in new.collect()}
    maybe_urls = {r.url for r in maybe.collect()}
    # every truly-seen candidate must land in maybe (no false negatives)
    truly_seen = {f"http://seen{i}.com" for i in range(0, 500, 5)}
    assert truly_seen <= maybe_urls
    assert not (truly_seen & new_urls)
    # partition coverage: both sets nonempty, union = all candidates
    assert new_urls | maybe_urls == {r.url for r in cands.select("url").collect()}
    assert len(new_urls) > 200  # most new urls pruned past the anti-join
