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
