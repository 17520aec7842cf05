"""Physical-layout helpers.

* :func:`partition_and_sort` — T8: the reference's manual external
  group-sort (hash groupId -> part file, per-file group-by rewrite,
  ``kbp/.../GroupRelexMentionTsvDataset.java:36-100``) is exactly
  ``repartition(n, key) + sortWithinPartitions(key)`` in Spark: the
  shuffle IS the external sort.
* :func:`sized_partitions` — choose a partition count so each
  partition's bytes fit the executor budget (spill-aware sizing).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_and_sort(df: DataFrame, key: str, num_parts: int, *extra_sort) -> DataFrame:
    """Co-locate each key in one partition and sort within partitions by
    (key, *extra_sort) — grouped-file output without a global sort."""
    return df.repartition(num_parts, F.col(key)).sortWithinPartitions(key, *extra_sort)


def sized_partitions(total_bytes: int, target_partition_bytes: int = 128 << 20,
                     min_parts: int = 1, max_parts: int = 200_000) -> int:
    """Partition count so each holds ~target bytes (default 128 MB)."""
    return max(min_parts, min(max_parts, math.ceil(total_bytes / target_partition_bytes)))


def block_shuffle(df: DataFrame, order_col: str, block_size: int,
                  seed_col: str | None = None) -> DataFrame:
    """D9 block shuffle (``util/.../BlockShuffler.java:30-60``): permute
    rows WITHIN consecutive fixed-size blocks of the `order_col` ordering
    while preserving order across blocks — local mixing with bounded
    displacement. Deterministic: the within-block order is the xxhash64
    of the order column (plus optional salt column)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(order_col))
    blocked = df.withColumn("__seq", F.row_number().over(w) - 1).withColumn(
        "__block", (F.col("__seq") / block_size).cast("bigint")
    )
    mix = F.xxhash64(F.col(order_col)) if seed_col is None else F.xxhash64(order_col, seed_col)
    return (
        blocked.withColumn("__mix", mix)
        .orderBy("__block", "__mix", order_col)
        .drop("__seq", "__block", "__mix")
    )


def write_bucketed_snapshot(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str = "url",
    path: str | None = None,
) -> None:
    """Write a state snapshot as a bucketed+sorted-by-key parquet table —
    the deployment layout for the frontier's exact seen-confirm anti-join
    (frontier.py module docs): with the seen side bucketed on the url,
    the confirm join shuffles ONLY the bloom-"maybe" candidate rows into
    the seen table's bucketing and streams each seen bucket once — NO
    exchange of the O(seen) side (plan-asserted in
    tests/test_serde_layout_streaming.py).
    Append-only deployments (Iceberg / Hive bucketed parquet) add one
    file per bucket per round.

    The data is also written sorted, one file per bucket; Spark only
    propagates that order into the join (eliding the seen-side
    in-partition re-sort too) under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — the
    re-sort it otherwise plans is per-partition CPU, not a shuffle.

    Bucket metadata lives in the session catalog (saveAsTable); pass
    ``path`` to place the data outside the warehouse dir.
    """
    # repartition on the SAME hash the bucketing uses -> exactly one file
    # per bucket, so readers can trust the per-bucket sort order and skip
    # the re-sort before a sort-merge join (multi-file buckets force one)
    w = (
        df.repartition(n_buckets, F.col(key))
        .sortWithinPartitions(key)
        .write.format("parquet")
        .mode("overwrite")
    )
    if path is not None:
        w = w.option("path", path)
    w.bucketBy(n_buckets, key).sortBy(key).saveAsTable(table)


def bucketed_anti_join(candidates: DataFrame, seen_table_df: DataFrame,
                       key: str = "url") -> DataFrame:
    """candidates NOT IN seen, shaped for the bucketed layout: the merge
    hint pins sort-merge (production seen sets are far beyond any
    broadcast threshold), so Catalyst plans exactly one Exchange — the
    candidate side shuffling into the seen table's bucketing."""
    return candidates.join(seen_table_df.hint("merge"), key, "left_anti")
