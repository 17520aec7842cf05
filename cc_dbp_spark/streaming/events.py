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


def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(src_dir)


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


# ------------------------------------------------------------ sessions
# Gap-based user sessionization — the engine's custom STATEFUL
# streaming operator (applyInPandasWithState) plus its batch twin.
# The batch twin is SQL-expressible (lag + cumulative sum), so the
# driver oracle value-checks it; the streaming operator is
# parity-tested against it (closed sessions match exactly).

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessions per user: a new session starts when the gap to the
    previous event exceeds `gap_minutes`. Pure window functions —
    shuffles once on user_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events ts is TIMESTAMP_NTZ; the session timezone is pinned UTC so
    # the cast is a pure type change
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    brk = F.when(gap.isNull() | (gap > gap_minutes * 60_000_000), 1).otherwise(0)
    sid = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - 1
    return (
        events.withColumn("session_id", sid)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``: per-user
    GroupState carries the one open session (start, last, n, sum);
    CLOSED sessions emit as soon as a later event proves the gap. The
    kernel is vectorized per batch (numpy gap/segment math); only the
    state carry is per-group."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = gap_minutes * 60 * 1_000_000_000

    from decimal import ROUND_HALF_UP, Decimal

    def round_half_up(x: float) -> float:
        # Spark's F.round = BigDecimal.valueOf(double) HALF_UP, i.e.
        # shortest-decimal-repr then round-half-up; pandas .round is
        # half-EVEN and diverges on exact halves (0.125 -> 0.12 vs 0.13)
        return float(Decimal(repr(float(x))).quantize(Decimal("0.01"), ROUND_HALF_UP))

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            s_start, s_last, s_n, s_sv = state.get
        else:
            s_start = None
        parts = [p[["ts", "event_id", "value"]] for p in pdfs]
        pdf = pd.concat(parts).sort_values(["ts", "event_id"]) if parts else None
        if pdf is None or not len(pdf):
            # zero-row invocation (empty chunk list OR empty chunks)
            yield pd.DataFrame(
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"]
            )
            return
        ts = pdf["ts"].astype("int64").to_numpy()  # ns
        vals = pdf["value"].to_numpy(dtype=np.float64)
        prev = ts[:-1]
        if s_start is not None:
            # the carried session's reach: an in-batch gap measured from
            # a LATE event (ts < stored last) must use the stored last
            # as the previous activity, or a session would wrongly split
            # (e.g. last=10min, batch=[5min, 38min], gap=30: 38-5 breaks
            # but 38-10 does not). If the carried session is already out
            # of reach of ts[0], s_last < every ts and the max is a no-op.
            prev = np.maximum(prev, s_last)
        brk = np.concatenate([[True], (ts[1:] - prev) > gap_ns])
        starts_idx = np.nonzero(brk)[0]
        ends_idx = np.concatenate([starts_idx[1:] - 1, [len(ts) - 1]])
        cs = np.concatenate([[0.0], np.cumsum(vals)])
        seg_start = ts[starts_idx]
        seg_end = ts[ends_idx]
        seg_n = ends_idx - starts_idx + 1
        seg_sv = cs[ends_idx + 1] - cs[starts_idx]
        rows = []  # (start_ns, end_ns, n, sv) of CLOSED sessions
        if s_start is not None:
            if ts[0] - s_last <= gap_ns:
                # carried session absorbs segment 0. Cross-microbatch
                # late events merge INTO the open session: its start
                # extends backward and its end never regresses below
                # the stored last (the old unconditional assignments
                # corrupted both when a later microbatch delivered
                # events out of order). Events later than s_last+gap
                # still open new sessions; a late event can NOT re-open
                # an already-EMITTED session (append-mode streaming
                # cannot retract — the watermark-style limitation).
                seg_start[0] = min(s_start, int(seg_start[0]))
                seg_end[0] = max(s_last, int(seg_end[0]))
                seg_n[0] += s_n
                seg_sv[0] += s_sv
            else:
                rows.append((s_start, s_last, s_n, s_sv))
        for i in range(len(seg_start) - 1):  # all but the still-open last
            rows.append((seg_start[i], seg_end[i], int(seg_n[i]), float(seg_sv[i])))
        state.update((int(seg_start[-1]), int(seg_end[-1]), int(seg_n[-1]), float(seg_sv[-1])))
        out = pd.DataFrame(rows, columns=["s", "e", "n", "sv"])
        yield pd.DataFrame(
            {
                "user_id": np.full(len(out), key[0], dtype=np.int64),
                "session_start": pd.to_datetime(out["s"].astype("int64"), utc=False),
                "session_end": pd.to_datetime(out["e"].astype("int64"), utc=False),
                "n_events": out["n"].astype("int64"),
                "sum_value": [round_half_up(v) for v in out["sv"]],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType="start long, last long, n bigint, sv double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
