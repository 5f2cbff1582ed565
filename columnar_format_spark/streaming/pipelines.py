"""Structured Streaming pipelines over the events table.

The reference has no streaming surface (SURVEY.md §2.2); these define
the engine's streaming capabilities: watermarks, tumbling/sliding/
session windows, and watermark-bounded deduplication — each built so
its batch equivalent is testable (tests/test_streaming.py runs every
pipeline on a file stream and cross-checks against the batch answer).

Scale notes: all of these are single-shuffle stateful aggregations;
state size is bounded by the watermark horizon (late data beyond
10 minutes is dropped), which is what keeps state stores finite on an
unbounded 100 TB/day stream. At real scale the file source becomes
Kafka — the DataFrame logic is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")


def events_stream(spark: SparkSession, src_dir: str,
                  max_files_per_trigger: int = 4) -> DataFrame:
    """File-based micro-batch stream of events parquet files (the
    testdata table materialized with microsecond timestamps)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type with a 10-minute
    watermark: count + exact int64-cents value sum (order-independent,
    so incremental state updates across micro-batches stay exact)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("bigint"))
             .cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def sliding_avg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes: per-window event volume
    (each event lands in 2 windows)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows per user (the streaming twin of batch
    q33_sessionize)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id", "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Drop duplicate event_ids arriving within the watermark horizon —
    the streaming form of exact dedup (bounded state, unlike a global
    dropDuplicates which would accumulate every key ever seen)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (event count, value total in cents) kept in explicit
    group state — the shape any bespoke accumulator (fraud score,
    rate limiter, session model) takes when window/dedup built-ins
    don't fit.

    Values aggregate as integer cents (np.rint(value*100)): exact and
    order-independent, so results are identical however the shuffle
    delivers rows — double addition here would make output depend on
    arrival order.

    Scale: state is one small tuple per live user, partitioned by the
    groupBy key; Arrow batches stream through the Python worker, so a
    hot key never materializes more than one batch.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(np.rint(pdf["value"].to_numpy() * 100).astype(np.int64).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]})

    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, n_events long, sum_cents long",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "append"):
    """Drain a bounded file stream into an in-memory table; returns the
    query (caller awaits termination then reads spark.table(name))."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
