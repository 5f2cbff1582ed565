"""Structured Streaming pipelines as oracle-checked registry queries.

Each entry stages the events table as a parquet file stream, runs the
pipeline with ``trigger(availableNow=True)`` into a memory sink, and
returns the drained table. The stream is bounded, so the final state
equals the batch answer and an exact DuckDB oracle applies — the same
pipelines are exercised with multi-batch triggers (where watermarks
actually drop late data) in tests/test_streaming.py.

Determinism: the oracle entries run the whole stage as ONE micro-batch
(no maxFilesPerTrigger); with multiple batches the file arrival order
would decide which events fall behind the watermark — real streaming
behavior, but not reproducible in an engine-vs-oracle hash compare.

The reference has no streaming surface (SURVEY.md §2.2); these define
the engine's streaming semantics per BASELINE.json's north star.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QUERIES, register, table
from ..staging import clone_dataset, run_dir, stage_once
from .pipelines import (
    dedup_within_watermark,
    session_windows,
    sliding_avg,
    stateful_user_totals,
    tumbling_counts,
)

def _stage_events(spark: SparkSession, sf_dir: str, variant: str = "plain") -> str:
    """Stage the (micros-timestamp) events table once per session as an
    8-file parquet directory the file source can tail."""
    def write(d: str) -> None:
        ev = table(spark, sf_dir, "events")
        if variant == "doubled":
            ev = ev.unionAll(ev)  # exact duplicate of every row
        if variant == "sentinel":
            # end-of-stream punctuation for OUTER-join drains: one row
            # per joined event_type, 2h past max event time, so the
            # final watermark provably passes every real row and the
            # unmatched-row flush fires. (A production stream keeps
            # flowing and never needs this; a bounded drain does.)
            # Sentinels carry user_id/event_id -1 and are filtered out
            # of results.
            import datetime

            mx = ev.agg(F.max("ts")).first()[0]
            sent_ts = mx + datetime.timedelta(hours=2)
            sent = spark.createDataFrame(
                [(-1, sent_ts, -1, t, None, None)
                 for t in ("purchase", "click")],
                schema=("event_id long, ts timestamp, user_id long, "
                        "event_type string, value double, props string"))
            ev = ev.unionByName(sent)
        ev.repartition(8).write.mode("overwrite").parquet(d)

    return stage_once(("stream", sf_dir, variant), f"stream_{variant}_", write)


def _drain(stream_df: DataFrame, output_mode: str,
           no_data_batches: bool = True) -> DataFrame:
    """Run a bounded stream to completion into a memory table.

    State-store sizing: stateful operators create one state store per
    shuffle partition, each paying init/commit overhead per micro-batch.
    Size that to the stream's state volume (small here) rather than the
    batch default — the standard knob on a real deployment too, where
    you provision state partitions for throughput, not for the
    cluster-wide batch shuffle width. Restored after the drain so batch
    queries keep the session default.

    ``no_data_batches=False`` disables the trailing empty micro-batch
    (``spark.sql.streaming.noDataMicroBatches.enabled``, restored
    after the drain). ONLY valid for sinks whose OUTPUT is complete
    from the data batches — e.g. a stream-stream INNER join, where
    matches emit as rows arrive and the no-data batch exists purely to
    evict state a bounded drain discards anyway (r14 probe: that empty
    batch was 1.25 s of q84's 5.2 s drain — 16 state-store commits
    over zero rows). Watermark-FLUSHED outputs (outer joins, append-
    mode aggregations) NEED the no-data batch; callers keep the
    default for those.
    """
    spark = stream_df.sparkSession
    name = "q_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    # measured on q84 (stream-stream join, sf0.1): state partitions
    # 2/4/8/16 -> 1.7/2.0/2.7/3.9 s — per-partition store init/commit
    # is the fixed cost, so provision for state volume, not core count
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                   "true" if no_data_batches else "false")
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                       prev_ndb)
    return spark.table(name)


def _events_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    from .pipelines import EVENT_SCHEMA

    return spark.readStream.schema(EVENT_SCHEMA).parquet(src_dir)


@register(
    "q80_stream_tumbling",
    oracle="""
    SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
            / 100.0) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q80_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window counts/sums per event_type, computed by
    Structured Streaming (watermark + window aggregation, memory sink,
    availableNow). Bounded input ⇒ final state == batch groupBy, which
    is what the oracle checks.

    Scale: stateful agg keyed by (window, type); state is bounded by
    the watermark horizon, so an unbounded stream holds ~horizon/hour
    windows per type regardless of total volume.
    """
    src = _stage_events(spark, sf_dir)
    out = _drain(tumbling_counts(_events_stream(spark, src)), "complete")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


@register(
    "q81_stream_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800
                  OR LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new,
             event_id
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked)
    SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           user_id, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def q81_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-min gap) via native streaming
    session_window. Oracle is the gaps-and-islands formulation; Spark
    merges events whose half-open [t, t+gap) windows overlap, so a gap
    of exactly 30:00 starts a NEW session (>= in the oracle, unlike
    batch q33's >).

    Scale: session state is per live (user, session) and closes at the
    watermark — the canonical unbounded-stream sessionization.
    """
    src = _stage_events(spark, sf_dir)
    out = _drain(session_windows(_events_stream(spark, src)), "complete")
    return out.select(
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "user_id", "n_events",
    )


@register(
    "q82_stream_dedup",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           user_id, event_type, value
    FROM events
    """,
)
def q82_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup: the stream carries every
    event TWICE (staged doubled); dropDuplicatesWithinWatermark keeps
    one row per event_id, so the output equals the original table —
    exactly what the oracle asserts. Duplicate rows are byte-identical,
    so the surviving-row choice is immaterial.

    Scale: state holds only ids within the watermark horizon — the
    bounded-memory form of exact dedup on an unbounded stream.
    """
    src = _stage_events(spark, sf_dir, variant="doubled")
    out = _drain(dedup_within_watermark(_events_stream(spark, src)), "append")
    return out.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "user_id", "event_type", "value",
    )


@register(
    "q83_stream_stateful",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY user_id
    """,
)
def q83_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals in explicit group state. Single bounded
    batch ⇒ the update-mode output is one final row per user, equal to
    the batch aggregation (integer-cents arithmetic makes the total
    order-independent, hence oracle-exact).
    """
    src = _stage_events(spark, sf_dir)
    out = _drain(stateful_user_totals(_events_stream(spark, src)), "update")
    return out.select("user_id", "n_events", "sum_cents")


@register(
    "q84_stream_stream_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    """,
)
def q84_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's clicks in the preceding 30 minutes. Both sides carry
    watermarks and the join has an explicit event-time range, so Spark
    can bound the buffered state on each side; with one bounded
    availableNow batch, every in-range pair emits and the append-mode
    output equals the batch join — which is what the oracle checks.

    Scale: the join keys on user_id so both streams co-partition; the
    time-range condition caps state to the watermark horizon per side
    — without it, stream-stream state grows unboundedly.
    """
    src = _stage_events(spark, sf_dir)
    purchases = (
        _events_stream(spark, src)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id"), F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        _events_stream(spark, src)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id"), F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(purchases.user_id, "purchase_id", "click_id", "p_ts", "c_ts")
    # inner join: every match emits in the data batches; skip the
    # state-eviction-only empty batch (see _drain)
    out = _drain(joined, "append", no_data_batches=False)
    return out.select(
        "user_id", "purchase_id", "click_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


@register(
    "q101_stream_sliding",
    oracle="""
    WITH t AS (
      SELECT to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
               AS g30
      FROM events WHERE ts IS NOT NULL),
    e AS (SELECT unnest([g30, g30 - INTERVAL 30 MINUTE]) AS ws FROM t)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events
    FROM e GROUP BY ws
    """,
)
def q101_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window stream aggregation (1-hour windows every 30
    minutes, each event in 2 windows) — the streaming twin of batch
    q99, running the SAME F.window call under a watermark with
    complete-mode state. Bounded input => final state equals the
    batch/oracle answer.

    Scale: stateful agg keyed by window only; state is bounded by the
    watermark horizon x overlap factor (2 here) regardless of stream
    volume.
    """
    src = _stage_events(spark, sf_dir)
    out = _drain(sliding_avg(_events_stream(spark, src)), "complete")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
    )


def _stage_incoming_docs(spark: SparkSession, sf_dir: str) -> str:
    """The q113 'incoming batch' half of documents (doc_bucket >= the
    history cut), fingerprinted, staged once as a 4-file parquet dir
    the file source can tail — only (doc_id, fingerprint) ever enters
    the stream, never text."""
    from ..functions.dedup import _HIST_CUT, normalized
    from ..functions.text import doc_bucket

    def write(d: str) -> None:
        docs = table(spark, sf_dir, "documents")
        inc = (
            docs.select(
                "doc_id",
                F.md5(normalized(F.col("text"))).alias("fingerprint"),
                doc_bucket().alias("b"),
            )
            .filter(F.col("b") >= _HIST_CUT)
            .select("doc_id", "fingerprint")
        )
        inc.repartition(4).write.mode("overwrite").parquet(d)

    return stage_once(("stream-incdocs", sf_dir), "stream_incdocs_", write)


@register(
    "q127_stream_incremental_dedup",
    oracle=None,  # set right after: reuses q113's exact SQL
)
def q127_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q113 (incremental dedup): incoming documents
    arrive as a STREAM, history is a STATIC distinct-fingerprint
    table; each doc is labeled dup_of_history / dup_within_batch / new
    by a stream-static left join feeding a custom stateful operator
    (applyInPandasWithState keyed on fingerprint, state = the smallest
    doc_id seen). Bounded drain => labels equal the batch rule, and
    q113's DuckDB oracle applies verbatim.

    Multi-batch caveat (the honest streaming semantics, exercised in
    tests/test_streaming.py): across micro-batches, first-arrival wins
    — a later batch can't retroactively relabel an earlier 'new' even
    if a smaller doc_id arrives, so 'new' means "first fingerprint
    occurrence to ARRIVE", which is the deployable daily-ingestion
    contract.

    Scale: history broadcasts when dim-sized / shuffle-joins when not
    (AQE's call); state per live fingerprint is ONE int64, partitioned
    by the group key; Arrow batches stream through the Python worker.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.dedup import _HIST_CUT, normalized
    from ..functions.text import doc_bucket

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(normalized(F.col("text"))).alias("fingerprint"),
        doc_bucket().alias("b"))
    hist = (d.filter(F.col("b") < _HIST_CUT)
            .select("fingerprint").distinct()
            .withColumn("in_hist", F.lit(1)))

    src = _stage_incoming_docs(spark, sf_dir)
    stream = spark.readStream.schema("doc_id long, fingerprint string") \
        .parquet(src)
    joined = stream.join(hist, "fingerprint", "left")

    def label(key, pdfs, state: GroupState):
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
    return _drain(labeled, "append")


# the streaming pipeline must satisfy the SAME contract as batch q113
from ..functions.dedup import _incremental_sql as _inc_sql  # noqa: E402

QUERIES["q127_stream_incremental_dedup"].oracle = _inc_sql()


@register(
    "q159_stream_outer_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM (SELECT * FROM events
          WHERE event_type = 'purchase' AND ts IS NOT NULL) p
    LEFT JOIN (SELECT * FROM events
               WHERE event_type = 'click' AND ts IS NOT NULL) c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    """,
)
def q159_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: q84's purchase-to-click
    attribution, but purchases with NO click in the preceding 30
    minutes must still emit (with null click columns) — the semantics
    a funnel/attribution pipeline actually needs, and the harder
    streaming case: an unmatched left row can only be emitted once the
    WATERMARK proves no matching right row can still arrive. Bounded
    availableNow input drains the state fully, so the append output
    equals the batch LEFT JOIN the oracle runs.

    Scale: same state bounds as the inner join (both sides keyed by
    user_id, buffered only within the watermark horizon + join range);
    the null-emission adds no state, only a per-key high-watermark
    check at eviction time. Null-event-time rows are filtered before
    the watermark (they can never be state-safe in an outer join) —
    mirrored exactly in the oracle.
    """
    src = _stage_events(spark, sf_dir, "sentinel")
    purchases = (
        _events_stream(spark, src)
        .filter((F.col("event_type") == "purchase")
                & F.col("ts").isNotNull())
        .select(F.col("user_id"), F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "10 minutes")
    )
    clicks = (
        _events_stream(spark, src)
        .filter((F.col("event_type") == "click") & F.col("ts").isNotNull())
        .select(F.col("user_id").alias("c_user_id"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user_id)
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select(purchases.user_id, "purchase_id", "click_id", "p_ts", "c_ts")
    out = _drain(joined, "append")
    return out.filter(F.col("purchase_id") >= 0).select(
        "user_id", "purchase_id", "click_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


@register(
    "q161_stream_upsert",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             o_totalprice * 2 AS o_totalprice,
             'U' || CAST(o_orderkey % 3 AS VARCHAR) AS o_orderstatus
      FROM orders WHERE o_orderkey % 9 < 3),
    merged AS (
      SELECT * FROM src
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey % 9 >= 3)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           (CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100.0) AS sum_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def q161_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC-apply: a change stream (three parquet files, one
    micro-batch each via maxFilesPerTrigger=1) upserts into a live
    COLF dataset through foreachBatch + merge_into — the
    streaming-lakehouse ingestion pattern (Delta/Iceberg MERGE inside
    foreachBatch). Each change file carries a DISJOINT key slice
    (o_orderkey % 9 == 0/1/2), so the final state is independent of
    batch order; the oracle is the batch upsert over the union of all
    changes. Every micro-batch lands as ONE snapshot commit under the
    CAS parent check, so a reader never sees a half-applied batch and
    a concurrent writer fails loudly instead of silently interleaving.

    Scale: per batch, touched-file discovery is the zone-map-prunable
    key semi-join and the rewrite touches only files holding changed
    keys — merge cost follows the CHANGE volume, not the dataset
    size, which is what makes continuous upsert into a 100 TB table
    affordable.
    """
    import shutil

    from ..colf.datasource import register as register_ds
    from ..colf.maintenance import merge_into

    register_ds(spark)
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        F.col("o_totalprice").alias("o_totalprice"),
        F.col("o_orderstatus").alias("o_orderstatus"),
    )

    def write(d: str) -> None:
        (o.repartitionByRange(4, "o_orderkey").write.format("colf")
         .option("version", "2").mode("append").save(d + "/ds"))
        for i in range(3):
            (o.filter(F.col("o_orderkey") % 9 == i)
             .select("o_orderkey",
                     (F.col("o_totalprice") * 2).alias("o_totalprice"),
                     F.concat(F.lit("U"), (F.col("o_orderkey") % 3)
                              .cast("string")).alias("o_orderstatus"))
             .coalesce(1).write.mode("overwrite")
             .parquet(f"{d}/changes/batch={i}"))

    tmpl = stage_once(("stream-upsert", sf_dir), "colf_upsert_tmpl_", write)
    path = run_dir(("stream-upsert-run", sf_dir), "colf_upsert_") + "/ds"
    clone_dataset(tmpl + "/ds", path)

    changes = (spark.readStream
               .schema("o_orderkey int, o_totalprice double, "
                       "o_orderstatus string")
               .option("maxFilesPerTrigger", "1")
               .option("recursiveFileLookup", "true")
               .parquet(tmpl + "/changes"))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_into(batch_df.sparkSession, path, batch_df, ["o_orderkey"])

    q = (changes.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation",
                 run_dir(("stream-upsert-ck", sf_dir), "upsert_ck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    back = spark.read.format("colf").load(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
         .cast("bigint").cast("double") / F.lit(100.0)).alias("sum_price"),
        F.min(F.col("o_orderkey").cast("bigint")).alias("min_key"),
        F.max(F.col("o_orderkey").cast("bigint")).alias("max_key"),
    )
