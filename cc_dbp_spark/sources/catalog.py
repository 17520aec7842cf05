"""Table-catalog seam: Iceberg when a Spark catalog is configured,
parquet-directory tables with a JSON manifest otherwise.

The north-rule deployment target is Iceberg (snapshots = round
checkpoints, time travel = resume); this sandbox has no Iceberg jars, so
the fallback implements the SAME lifecycle — append-only snapshot
directories + a manifest recording (snapshot_id -> path) — behind one
interface, as SURVEY.md §7 prescribes ("fall back to Parquet + manifest
table if Iceberg jars unavailable — same semantics, keep an abstraction
seam"). `CrawlDriver` state checkpoints follow the identical scheme.
"""

from __future__ import annotations

import json
import pathlib
import time

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "ccdbp") -> bool:
    """True when an Iceberg catalog with this name is configured."""
    conf = spark.conf
    try:
        return bool(conf.get(f"spark.sql.catalog.{catalog}", None))
    except Exception:
        return False


class IcebergTables:
    """Thin adapter over the Iceberg DataFrame API (used when jars +
    catalog config exist — not exercisable in this sandbox)."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl"):
        self.spark, self.catalog, self.namespace = spark, catalog, namespace

    def _fq(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def append(self, table: str, df: DataFrame) -> str:
        df.writeTo(self._fq(table)).createOrReplace() if not self.spark.catalog.tableExists(
            self._fq(table)
        ) else df.writeTo(self._fq(table)).append()
        snaps = self.spark.sql(f"SELECT snapshot_id FROM {self._fq(table)}.snapshots ORDER BY committed_at DESC LIMIT 1")
        return str(snaps.collect()[0][0])

    def load(self, table: str, snapshot_id: str | None = None) -> DataFrame:
        if snapshot_id is None:
            return self.spark.table(self._fq(table))
        return (
            self.spark.read.option("snapshot-id", snapshot_id).table(self._fq(table))
        )


class ParquetManifestTables:
    """Fallback with the same contract: every append is a new snapshot
    directory; the manifest lists snapshots in commit order; `load`
    without a snapshot unions all committed snapshots (append semantics),
    with a snapshot id reads the table AS OF that snapshot."""

    def __init__(self, root: str | pathlib.Path):
        self.root = pathlib.Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _manifest_path(self, table: str) -> pathlib.Path:
        return self.root / table / "manifest.json"

    def _manifest(self, table: str) -> list[dict]:
        p = self._manifest_path(table)
        return json.loads(p.read_text()) if p.exists() else []

    def append(self, table: str, df: DataFrame) -> str:
        man = self._manifest(table)
        snap_id = f"{len(man):06d}"
        path = self.root / table / f"snap-{snap_id}"
        df.write.mode("errorifexists").parquet(str(path))
        man.append({"snapshot_id": snap_id, "path": str(path), "ts": time.time()})
        self._manifest_path(table).write_text(json.dumps(man))  # commit point
        return snap_id

    def snapshots(self, table: str) -> list[str]:
        return [m["snapshot_id"] for m in self._manifest(table)]

    def load(self, spark: SparkSession, table: str, as_of: str | None = None) -> DataFrame:
        man = self._manifest(table)
        if as_of is not None:
            man = [m for m in man if m["snapshot_id"] <= as_of]
        if not man:
            raise FileNotFoundError(f"no committed snapshots for table {table}")
        return spark.read.parquet(*[m["path"] for m in man])
