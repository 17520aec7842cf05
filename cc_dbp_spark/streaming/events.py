"""Structured Streaming ingestion for the events stream.

The crawl pipeline itself is round-based batch by design (the reference
resumes by output-exists, SURVEY.md §2.9) — but the engine also exposes
a streaming surface for continuously-arriving event/metrics data:
file-source readStream -> watermarked tumbling-window aggregation ->
sink, with `availableNow` for catch-up/batch-parity runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with late-data
    handling via watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(
    agg: DataFrame, out_dir: str, checkpoint_dir: str, query_name: str = "events_agg"
):
    """Drain everything currently available, then stop — batch-parity
    execution of the streaming plan (used by tests to compare against
    the equivalent batch aggregation)."""
    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
    return q
