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
        # batch-only segmentation: consecutive in-batch gap > gap breaks
        brk = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_ns])
        starts_idx = np.nonzero(brk)[0]
        ends_idx = np.concatenate([starts_idx[1:] - 1, [len(ts) - 1]])
        cs = np.concatenate([[0.0], np.cumsum(vals)])
        seg_start = ts[starts_idx]
        seg_end = ts[ends_idx]
        seg_n = ends_idx - starts_idx + 1
        seg_sv = cs[ends_idx + 1] - cs[starts_idx]
        # sessions in time order: [start, end, n, sv]
        sessions = [
            [int(seg_start[j]), int(seg_end[j]), int(seg_n[j]), float(seg_sv[j])]
            for j in range(len(seg_start))
        ]
        if s_start is not None:
            # an event CHAINS to the carried session iff it lies in
            # [s_start - gap, s_last + gap]: inside the interval the
            # session's own events are never more than gap apart, and
            # within gap of either edge it bridges to that edge. The
            # old condition (ts[0] - s_last <= gap, signed) absorbed
            # arbitrarily-early late events — a session [100', 110']
            # swallowed a late 5' event the batch twin keeps separate.
            # The interval can also BRIDGE in-batch segments (one
            # touching each side), so every reach segment merges; reach
            # segments are contiguous because the window's events form
            # one sorted index range. A late event can still NOT
            # re-open an already-EMITTED session (append-mode streaming
            # cannot retract — the watermark-style limitation).
            ev_in = (ts >= s_start - gap_ns) & (ts <= s_last + gap_ns)
            seg_reach = np.add.reduceat(ev_in, starts_idx) > 0
            if seg_reach.any():
                j0 = int(np.argmax(seg_reach))
                j1 = int(len(seg_reach) - 1 - np.argmax(seg_reach[::-1]))
                merged = [
                    min(s_start, sessions[j0][0]),
                    max(s_last, sessions[j1][1]),
                    s_n + sum(s[2] for s in sessions[j0 : j1 + 1]),
                    s_sv + sum(s[3] for s in sessions[j0 : j1 + 1]),
                ]
                sessions = sessions[:j0] + [merged] + sessions[j1 + 1 :]
            else:
                # out of reach: the carried session is its own session,
                # slotted by time (earlier batch segments stay earlier)
                at = sum(1 for s in sessions if s[0] < s_start)
                sessions.insert(at, [s_start, s_last, s_n, s_sv])
        # the LAST session by time stays open in state; the rest are
        # proven closed by the gap to their successor
        rows = [tuple(s) for s in sessions[:-1]]
        last = sessions[-1]
        state.update((int(last[0]), int(last[1]), int(last[2]), float(last[3])))
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
