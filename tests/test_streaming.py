"""Structured Streaming pipelines: run each over a bounded file stream
(availableNow trigger) and cross-check against the equivalent batch
computation on the same data."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events table re-materialized as multiple parquet files with
    microsecond timestamps (the raw file has TIMESTAMP(NANOS), which
    neither batch-default nor streaming Spark accepts)."""
    from columnar_format_spark.registry import table

    out = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, SF_SMALL, "events").repartition(4).write.mode("overwrite").parquet(out)
    assert glob.glob(os.path.join(out, "*.parquet"))
    return out


def drain(spark, stream_df, name, output_mode="append"):
    from columnar_format_spark.streaming.pipelines import run_to_memory

    q = run_to_memory(stream_df, name, output_mode)
    q.awaitTermination(120)
    q.stop()
    return spark.table(name)


def test_tumbling_counts_match_batch(spark, events_dir):
    from columnar_format_spark.streaming import pipelines as P

    stream = P.events_stream(spark, events_dir, max_files_per_trigger=2)
    got = drain(spark, P.tumbling_counts(stream), "t_tumbling", "complete").collect()

    batch = spark.read.parquet(events_dir)
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sliding_windows_cover_each_event_twice(spark, events_dir):
    from columnar_format_spark.streaming import pipelines as P

    stream = P.events_stream(spark, events_dir)
    got = drain(spark, P.sliding_avg(stream), "t_sliding", "complete")
    n_events = spark.read.parquet(events_dir).count()
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * n_events


def test_session_windows_match_batch_sessionize(spark, events_dir):
    """Session-window session count per user == batch lag+cumsum
    sessionization (q33) with the same 30-min gap."""
    from pyspark.sql import Window

    from columnar_format_spark.streaming import pipelines as P

    stream = P.events_stream(spark, events_dir)
    got = drain(spark, P.session_windows(stream), "t_session", "complete")
    got_sessions = (got.groupBy("user_id")
                    .agg(F.count(F.lit(1)).alias("n_sessions")).collect())

    batch = spark.read.parquet(events_dir).withColumn("es", F.unix_timestamp("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = batch.withColumn(
        "is_new",
        F.when((F.col("es") - F.lag("es").over(w) > 1800)
               | F.lag("es").over(w).isNull(), 1).otherwise(0))
    want = (marked.groupBy("user_id").agg(F.sum("is_new").alias("n_sessions"))
            .collect())
    assert sorted(map(tuple, got_sessions)) == sorted(map(tuple, want))


def test_dedup_within_watermark(spark, events_dir, tmp_path):
    """Duplicated input collapses back to unique event_ids."""
    from columnar_format_spark.streaming import pipelines as P

    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(events_dir)
    base.union(base).repartition(4).write.mode("overwrite").parquet(dup_dir)

    stream = P.events_stream(spark, dup_dir)
    got = drain(spark, P.dedup_within_watermark(stream), "t_dedup")
    n_unique = base.select("event_id").distinct().count()
    assert got.select("event_id").distinct().count() == n_unique
    # watermark-bounded dedup may keep late duplicates, but never loses events
    assert got.count() >= n_unique
