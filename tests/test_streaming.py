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


def test_late_data_dropped_behind_watermark(spark, tmp_path):
    """Watermark semantics with real multi-batch arrival, pinning
    Spark's one-batch-delayed watermark commit: the watermark computed
    at the end of batch N becomes ACTIVE in batch N+1, and a late row
    is dropped only when its window end precedes the active watermark.

    Four single-file micro-batches (maxFilesPerTrigger=1, mtime-ordered):
      f1: 4 events in [10:00, 10:30]  -> window 10:00 accumulates
      f2: 1 event at 13:00            -> end-of-batch wm becomes 12:50
      f3: 1 event at 14:00            -> active wm 12:50 closes window
                                         [10:00, 11:00), emitting 4
      f4: 1 LATE event at 10:15       -> active wm 13:50 > window end
                                         11:00: DROPPED by the operator
    Final append output: window 10:00 with exactly the 4 on-time rows;
    13:00/14:00 windows never finalize before end-of-stream.
    """
    import os
    import time

    import pandas as pd

    from columnar_format_spark.streaming import pipelines as P

    src = str(tmp_path / "late_events")
    os.makedirs(src)

    def write_file(name: str, ts_list, mtime: int):
        pdf = pd.DataFrame({
            "event_id": range(len(ts_list)),
            "ts": pd.to_datetime(ts_list).astype("datetime64[us]"),
            "user_id": [1] * len(ts_list),
            "event_type": ["click"] * len(ts_list),
            "value": [1.0] * len(ts_list),
            "props": ["{}"] * len(ts_list),
        })
        path = os.path.join(src, name)
        pdf.to_parquet(path)
        os.utime(path, (mtime, mtime))

    base = int(time.time())
    write_file("f1.parquet", ["2024-01-01 10:00:00", "2024-01-01 10:10:00",
                              "2024-01-01 10:20:00", "2024-01-01 10:30:00"], base - 400)
    write_file("f2.parquet", ["2024-01-01 13:00:00"], base - 300)
    write_file("f3.parquet", ["2024-01-01 14:00:00"], base - 200)
    write_file("f4.parquet", ["2024-01-01 10:15:00"], base - 100)  # late

    from columnar_format_spark.streaming.pipelines import run_to_memory

    stream = P.events_stream(spark, src, max_files_per_trigger=1)
    q = run_to_memory(P.tumbling_counts(stream), "t_late", "append")
    q.awaitTermination(120)
    dropped = sum(op.get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress for op in p.get("stateOperators", []))
    q.stop()
    got = spark.table("t_late").collect()
    by_window = {r["window_start"].strftime("%H:%M"): r["n_events"] for r in got}
    assert by_window.get("10:00") == 4, by_window  # late row NOT counted
    assert "13:00" not in by_window and "14:00" not in by_window
    assert dropped == 1  # the operator itself reported the late-row drop


def test_stream_incremental_dedup_first_arrival_wins(spark, tmp_path):
    """q127's multi-batch semantics: one file per micro-batch, a
    fingerprint repeated across batches gets exactly ONE 'new' (the
    first ARRIVAL), later occurrences 'dup_within_batch' via state,
    history fingerprints always 'dup_of_history' — and no row is lost
    or duplicated across the drain."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    # batch 0: fp_a (doc 10), fp_h (doc 11, in history)
    # batch 1: fp_a again (doc 5 — SMALLER id, must still be a dup:
    #          first arrival won), fp_b (doc 20, new)
    src = str(tmp_path / "inc")
    os.makedirs(src)
    pd.DataFrame({"doc_id": [10, 11], "fingerprint": ["fp_a", "fp_h"]}) \
        .to_parquet(os.path.join(src, "b0.parquet"))
    pd.DataFrame({"doc_id": [5, 20], "fingerprint": ["fp_a", "fp_b"]}) \
        .to_parquet(os.path.join(src, "b1.parquet"))

    hist = spark.createDataFrame([("fp_h", 1)], "fingerprint string, in_hist int")
    stream = (
        spark.readStream.schema("doc_id long, fingerprint string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    joined = stream.join(hist, "fingerprint", "left")

    def label(key, pdfs, state):
        prev_min = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows["in_hist"].notna().any():
            status = pd.Series("dup_of_history", index=rows.index)
        else:
            batch_min = int(rows["doc_id"].min())
            if prev_min is None:
                status = pd.Series("dup_within_batch", index=rows.index)
                status[rows["doc_id"] == batch_min] = "new"
                state.update((batch_min,))
            else:
                status = pd.Series("dup_within_batch", index=rows.index)
                state.update((min(prev_min, batch_min),))
        yield pd.DataFrame({
            "doc_id": rows["doc_id"],
            "fingerprint": key[0],
            "status": status,
        })

    labeled = joined.groupBy("fingerprint").applyInPandasWithState(
        label,
        outputStructType="doc_id long, fingerprint string, status string",
        stateStructType="min_id long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    got = {(r.doc_id, r.status)
           for r in drain(spark, labeled, "t_inc_dedup").collect()}
    assert got == {
        (10, "new"),                # first arrival of fp_a
        (11, "dup_of_history"),
        (5, "dup_within_batch"),    # smaller id, but arrived second
        (20, "new"),
    }
