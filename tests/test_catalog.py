"""Catalog seam contract tests (sources/catalog.py) — the one source
module that previously had no dedicated tests. The Iceberg adapter's
jar-dependent paths can't execute in this sandbox, so these pin the
contract around them: fully-qualified name construction, availability
gating, and the parquet+manifest fallback's full snapshot lifecycle
(append -> commit -> union load -> AS OF time travel), which is the
semantics the Iceberg path must match in deployment."""

from __future__ import annotations

import json

import pytest

from cc_dbp_spark.sources import catalog as cat


def test_iceberg_available_gates_on_catalog_conf(spark):
    # no ccdbp catalog configured in this sandbox
    assert cat.iceberg_available(spark) is False
    assert cat.iceberg_available(spark, "nope") is False
    spark.conf.set("spark.sql.catalog.cfgd", "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert cat.iceberg_available(spark, "cfgd") is True
    finally:
        spark.conf.unset("spark.sql.catalog.cfgd")


def test_iceberg_fq_names():
    t = cat.IcebergTables(None, "ccdbp", "crawl")
    assert t._fq("frontier") == "ccdbp.crawl.frontier"
    assert cat.IcebergTables(None, "c2")._fq("seen") == "c2.crawl.seen"


def test_parquet_manifest_snapshot_lifecycle(spark, tmp_path):
    tabs = cat.ParquetManifestTables(tmp_path)
    s0 = tabs.append("audit", spark.range(3).selectExpr("id", "id * 2 AS v"))
    s1 = tabs.append("audit", spark.range(3, 5).selectExpr("id", "id * 2 AS v"))
    assert tabs.snapshots("audit") == [s0, s1] == ["000000", "000001"]

    # load = union of all committed snapshots (append semantics)
    assert sorted(r.id for r in tabs.load(spark, "audit").collect()) == [0, 1, 2, 3, 4]
    # AS OF snapshot s0 = time travel to the first commit
    assert sorted(r.id for r in tabs.load(spark, "audit", as_of=s0).collect()) == [0, 1, 2]

    # the manifest write is the commit point and records paths in order
    man = json.loads((tmp_path / "audit" / "manifest.json").read_text())
    assert [m["snapshot_id"] for m in man] == [s0, s1]
    assert all((tmp_path / "audit" / f"snap-{m['snapshot_id']}").exists() for m in man)

    # unknown table / empty manifest raises instead of returning garbage
    with pytest.raises(FileNotFoundError):
        tabs.load(spark, "ghost")

    # snapshot dirs are append-only: re-appending never overwrites an
    # existing snapshot directory (errorifexists write mode)
    s2 = tabs.append("audit", spark.range(1).selectExpr("id", "id AS v"))
    assert s2 == "000002"
    assert len(tabs.snapshots("audit")) == 3
