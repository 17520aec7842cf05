"""SparkSession factory with the engine's standard configuration.

Tuned for correctness-first determinism plus scale-minded defaults:
AQE on (runtime re-plan, skew-join splitting), Arrow pandas UDFs on,
shuffle partitions proportional to parallelism so two-parallelism
scaling comparisons are honest (SURVEY.md §7 risks).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cc-dbp-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # proportional to parallelism (honest N vs 4N scaling comparisons),
        # with a 3x multiplier: finer tasks overlap shuffle write/read with
        # compute and absorb stragglers (measured ~25-40% on the 8M-URL
        # scheduling round at both 2 and 8 cores)
        shuffle_partitions = max(cores * 3, 6)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local mode: driver == executor. 8g is deliberate: benchmarks
        # clear persisted localCheckpoint blocks between reps
        # (session.clear_persisted), which fixes the storage-eviction
        # churn that an accumulating heap showed — and A/B runs show a
        # 48g heap makes the first heavy pandas-UDF query pay a one-off
        # multi-10s stall (heap expansion + GC ergonomics), slowing the
        # whole suite 2-3x.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # local[N] shuffles go through the local filesystem: compression is
        # pure CPU overhead there (~40% of a shuffle-heavy round, measured
        # on the 8M-URL scheduling round). On a real multi-executor cluster
        # shuffles are network-bound — leave compression ON there (these
        # two lines are local-mode-only; tools/submit.sh does not set them).
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def clear_persisted(spark: SparkSession) -> int:
    """Unpersist every persistent RDD — including localCheckpoint blocks,
    which ``spark.catalog.clearCache()`` does NOT touch. Benchmarks call
    this between repetitions so storage from earlier reps can't evict /
    GC-thrash the rep being measured."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rdd in jmap.values():
        rdd.unpersist(True)
        n += 1
    return n


def warm_python_worker_pool(spark: SparkSession, cores: int | None = None) -> None:
    """Start one Python UDF worker per core slot before timed work.

    A cold pandas-UDF stage pays a per-worker import storm (pandas +
    pyarrow per process); with 32 concurrent cold workers that dwarfs the
    actual compute. Long-running executors on a real cluster amortize
    this once per executor lifetime — ``spark.python.worker.reuse``
    (default on) keeps the pool alive here, so one tiny many-task UDF
    stage up front removes the artifact from every later stage."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    if cores is None:
        cores = spark.sparkContext.defaultParallelism

    @F.pandas_udf(DoubleType())
    def _noop(x: pd.Series) -> pd.Series:
        return x.astype("float64")

    # three CHAINED pandas UDFs = three Arrow runners per task = 3 workers
    # per core slot, matching the worst per-stage runner fan-out in the
    # engine (a stage with N chained UDFs demands N workers per slot)
    x = F.col("id").cast("double")
    (
        spark.range(cores * 4)
        .repartition(cores * 4)
        .select(F.sum(_noop(_noop(_noop(x)))))  # nested -> 3 separate runners
        .collect()
    )
