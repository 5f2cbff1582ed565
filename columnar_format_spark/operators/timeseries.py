"""Time-series and fuzzy-matching operators: calendar gap-fill with
last-observation-carried-forward, median/deterministic-mode
aggregates, interval-overlap joins, blocked Levenshtein fuzzy
matching, and batch sliding windows.

Like everything in operators/, the reference
(satyakalla890/columnar-format) has no query surface (SURVEY.md §2.2);
these queries widen the engine's native Spark coverage with the DuckDB
oracle as the correctness gate. Determinism rules: registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import QUERIES, register, table
from .relational import cents, dsum, sql_cents, sql_dsum

# ---------------------------------------------------------------------------
# Calendar gap-fill + LOCF

# Sparse-series threshold: daily revenue restricted to high-value
# events so (event_type, day) cells go empty and the fill path is
# actually exercised (present cells / calendar cells: 7/~35 at
# sf0.001, 54/150 at sf0.01, 147/150 at sf0.1).
GAPFILL_MIN_VALUE = 250


@register(
    "q95_gapfill_locf",
    oracle=f"""
    WITH src AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             {sql_cents('value')} AS c
      FROM events WHERE value > {GAPFILL_MIN_VALUE}),
    daily AS (
      SELECT event_type, d, SUM(c) AS rev_c,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM src GROUP BY event_type, d),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM src),
    cal AS (
      SELECT t.event_type, CAST(g.gs AS DATE) AS d
      FROM (SELECT DISTINCT event_type FROM src) t
      CROSS JOIN (SELECT unnest(generate_series((SELECT d0 FROM bounds),
                                                (SELECT d1 FROM bounds),
                                                INTERVAL 1 DAY)) AS gs) g)
    SELECT event_type, strftime(f.d, '%Y-%m-%d') AS day,
           (rev_c IS NULL) AS is_gap,
           CAST(COALESCE(last_value(rev_c IGNORE NULLS) OVER w, 0)
                AS DOUBLE) / 100.0 AS rev_filled,
           COALESCE(n_events, 0) AS n_events
    FROM (SELECT c.event_type, c.d, dl.rev_c, dl.n_events
          FROM cal c LEFT JOIN daily dl
            ON c.event_type = dl.event_type AND c.d = dl.d) f
    WINDOW w AS (PARTITION BY event_type ORDER BY f.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q95_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-calendar gap-fill with last-observation-carried-forward:
    daily high-value revenue per event type, densified onto the full
    min→max day calendar (sequence + explode), missing days filled
    with the most recent prior observation (last(ignorenulls) over an
    unbounded-preceding window). The canonical time-series
    densification every metrics store needs; is_gap keeps the
    fill observable.

    Determinism: revenue sums exact int64 cents (registry rule 1); the
    calendar is derived from data bounds, not wall-clock.

    Scale: bounds and the distinct type list derive from the
    per-(type, day) `daily` aggregate (every src row lands in a daily
    group, so min/max/distinct over daily equal those over src).
    Catalyst column-prunes daily's three consumers DIFFERENTLY, which
    defeats exchange reuse: the executed plan scans the fact table
    three times, but each scan reads only 2-3 columns under the
    pushed value filter, so total I/O is about one wide scan's worth.
    The operator deliberately stays lazy and stateless — persisting
    daily would collapse it to one scan, but leaks a session-lifetime
    cache entry per sf_dir and makes repeat runs (bench reps, retries)
    silently measure cached reads instead of the real cost. A
    production metrics store materializes the daily rollup as a
    TABLE (q36's continuous-aggregate pattern), not a query-internal
    cache. The calendar cross-join builds from a 1-row broadcast of
    the bounds; LOCF is one window keyed by event_type — state per
    group is the day count, not the event count. Series with
    high-cardinality keys would swap the global bounds for per-key
    min/max from the same aggregate.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value") > GAPFILL_MIN_VALUE)
    src = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        cents("value").alias("c"),
    )
    daily = src.groupBy("event_type", "d").agg(
        F.sum("c").alias("rev_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    cal = (
        daily.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("d"),
        )
    )
    filled = cal.join(daily, ["event_type", "d"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("rev_c").isNull().alias("is_gap"),
        (F.coalesce(F.last("rev_c", ignorenulls=True).over(w), F.lit(0))
         .cast("double") / 100.0).alias("rev_filled"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Median + deterministic mode

@register(
    "q96_median_mode",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus,
             {sql_cents('o_totalprice')} AS pc
      FROM orders),
    med AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
             quantile_cont(pc, 0.5) / 100.0 AS median_price
      FROM c GROUP BY o_orderpriority),
    sc AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      FROM c GROUP BY o_orderpriority, o_orderstatus),
    md AS (
      SELECT o_orderpriority, o_orderstatus AS mode_status,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY n DESC, o_orderstatus) AS rk
      FROM sc)
    SELECT med.o_orderpriority, med.n_orders, med.median_price,
           md.mode_status
    FROM med JOIN md ON med.o_orderpriority = md.o_orderpriority
    WHERE md.rk = 1
    """,
)
def q96_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median order price and modal order status per priority. Median
    runs on exact int64 cents so the one interpolation at the 0.5
    fraction is bit-identical across engines; mode is computed as
    count + row_number with an explicit (count DESC, status ASC)
    tie-break because both engines' native mode() leaves ties
    undefined — unacceptable under the value-hash gate (and under
    stage retries at scale, registry rule 6).

    Scale: median is Spark's exact percentile aggregate (one shuffle,
    per-group state); mode adds a (priority, status) pre-aggregate —
    status cardinality is 3, so the window input is tiny. For
    high-cardinality mode keys the same shape holds: the heavy
    reduction happens in the first hash aggregate.
    """
    o = table(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority", "o_orderstatus",
        cents("o_totalprice").alias("pc"),
    )
    med = c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.median("pc") / 100.0).alias("median_price"),
    )
    sc = c.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"))
    rk = F.row_number().over(
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("n").desc(), "o_orderstatus"))
    md = (
        sc.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("o_orderpriority", F.col("o_orderstatus").alias("mode_status"))
    )
    return med.join(md, "o_orderpriority")


# ---------------------------------------------------------------------------
# Interval-overlap join

# Promotion windows [start, end) — a tiny dimension defined inline; an
# order "participates" when its 30-day fulfillment interval
# [o_orderdate, o_orderdate+30d) overlaps the promo window.
PROMOS = [
    ("summer95", "1995-06-01", "1995-09-01"),
    ("holiday95", "1995-11-15", "1996-01-15"),
    ("spring96", "1996-03-01", "1996-06-01"),
    ("relaunch97", "1997-01-01", "1997-07-01"),
]


@register(
    "q97_interval_overlap",
    oracle=f"""
    SELECT p.promo,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o.o_totalprice")} AS revenue
    FROM orders o
    JOIN (VALUES {", ".join(f"('{n}', TIMESTAMP '{s} 00:00:00', TIMESTAMP '{e} 00:00:00')" for n, s, e in PROMOS)})
         p(promo, p_start, p_end)
      ON o.o_orderdate < p.p_end
     AND p.p_start < o.o_orderdate + INTERVAL 30 DAY
    GROUP BY p.promo
    """,
)
def q97_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: orders whose 30-day fulfillment interval
    [o_orderdate, o_orderdate+30d) overlaps each promotion window
    [start, end), with order count and exact-cents revenue per promo.
    The third non-equi join family next to value-in-band (q16) and
    as-of (q17): overlap is the two-sided strict inequality
    a_start < b_end AND b_start < a_end.

    Scale: the promo side is a literal 4-row dimension —
    F.broadcast forces a BroadcastNestedLoopJoin, which is the RIGHT
    plan when one side is tiny: the fact table never shuffles and each
    task filters its split against the in-memory promo list. For two
    LARGE interval sets the rewrite is equi-join on overlapping
    calendar buckets (bucket = date range chunk) + residual predicate,
    same shape as q16's banding.
    """
    o = table(spark, sf_dir, "orders")
    from ..session import local_df

    promos = local_df(
        spark,
        [(n, f"{s} 00:00:00", f"{e} 00:00:00") for n, s, e in PROMOS],
        "promo string, p_start string, p_end string",
    ).select(
        "promo",
        F.col("p_start").cast("timestamp").alias("p_start"),
        F.col("p_end").cast("timestamp").alias("p_end"),
    )
    j = o.join(
        F.broadcast(promos),
        (F.col("o_orderdate") < F.col("p_end"))
        & (F.col("p_start") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
    )
    return j.groupBy("promo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Blocked Levenshtein fuzzy match

LEV_MAX = 3


@register(
    "q98_fuzzy_blocked",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name,
             split_part(p_name, ' ', 1) AS adj,
             split_part(p_name, ' ', 2) AS noun
      FROM part)
    SELECT a.noun, a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.adj, b.adj) AS INTEGER) AS lev
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.adj, b.adj) <= {LEV_MAX}
    """,
)
def q98_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: near-identical part names found by
    exact-blocking on the noun token, then Levenshtein distance on the
    adjective within each block (edit distance <= 3). The
    record-linkage primitive for catalog/entity dedup where MinHash
    (q52) is too coarse: string edit distance, made tractable by
    blocking.

    Scale: the all-pairs comparison is O(n^2) only WITHIN a block —
    the blocking key turns it into an equi-join Spark shuffles by
    noun; skewed blocks split under AQE. Distinct-name reduction
    happens before the join, so the pair expansion sees unique keys
    (64 names here, not 2000 rows). levenshtein() is a codegen'd JVM
    builtin — no Python in the loop.
    """
    p = table(spark, sf_dir, "part")
    names = p.select("p_name").distinct().select(
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adj"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, (F.col("a.noun") == F.col("b.noun"))
               & (F.col("a.p_name") < F.col("b.p_name")))
        .withColumn("lev", F.levenshtein(F.col("a.adj"), F.col("b.adj")))
        .filter(F.col("lev") <= LEV_MAX)
        .select(
            F.col("a.noun").alias("noun"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("lev").cast("int").alias("lev"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 upsert (MERGE semantics)

SCD2_EFFECTIVE = "1996-01-01"


@register(
    "q100_scd2_upsert",
    oracle=f"""
    WITH cur AS (
      SELECT c_custkey, c_nationkey, '1995-01-01' AS valid_from
      FROM customer),
    upd AS (
      SELECT c_custkey, CAST((c_nationkey + 1) % 25 AS BIGINT) AS new_nat
      FROM customer WHERE c_custkey % 10 = 3)
    SELECT c_custkey, c_nationkey, valid_from,
           '{SCD2_EFFECTIVE}' AS valid_to, FALSE AS is_current
    FROM cur JOIN upd USING (c_custkey)
    UNION ALL
    SELECT c.c_custkey, u.new_nat AS c_nationkey,
           '{SCD2_EFFECTIVE}' AS valid_from,
           NULL AS valid_to, TRUE AS is_current
    FROM cur c JOIN upd u USING (c_custkey)
    UNION ALL
    SELECT c.c_custkey, c.c_nationkey, c.valid_from,
           NULL AS valid_to, TRUE AS is_current
    FROM cur c LEFT JOIN upd u USING (c_custkey)
    WHERE u.c_custkey IS NULL
    """,
)
def q100_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 upsert — MERGE INTO semantics
    expressed as pure DataFrame ops: a change batch (here: customers
    with key % 10 = 3 moving to a new nation) closes the current
    version (valid_to = effective date, is_current = false) and
    appends a new open version, while untouched rows pass through.
    The warehouse-maintenance primitive behind every dimension feed;
    on a table format with native MERGE (Delta/Iceberg) the same plan
    runs under the hood.

    Scale: ONE shuffle joins dimension against the change batch (both
    keyed on c_custkey — and when the change batch is small, as
    change batches are, Spark broadcasts it and the dimension never
    shuffles); the three output branches are projections of that one
    join, so the union does not re-scan. Never a row-at-a-time
    upsert loop.
    """
    c = table(spark, sf_dir, "customer")
    cur = c.select("c_custkey", "c_nationkey",
                   F.lit("1995-01-01").alias("valid_from"))
    # `matched` marks key presence in the change batch — the MERGE
    # match condition. Discriminating on new_nat itself would silently
    # reclassify a matched-but-NULL update value as "untouched".
    upd = (
        c.filter(F.col("c_custkey") % 10 == 3)
        .select("c_custkey",
                ((F.col("c_nationkey") + 1) % 25).cast("bigint").alias("new_nat"),
                F.lit(True).alias("matched"))
    )
    j = cur.join(F.broadcast(upd), "c_custkey", "left")
    matched = F.col("matched").isNotNull()
    closed = j.filter(matched).select(
        "c_custkey", "c_nationkey", "valid_from",
        F.lit(SCD2_EFFECTIVE).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(matched).select(
        "c_custkey", F.col("new_nat").alias("c_nationkey"),
        F.lit(SCD2_EFFECTIVE).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    untouched = j.filter(~matched).select(
        "c_custkey", "c_nationkey", "valid_from",
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionAll(opened).unionAll(untouched)


@register(
    "q110_temporal_join",
    oracle=f"""
    WITH cur AS (
      SELECT c_custkey, c_nationkey,
             TIMESTAMP '1995-01-01 00:00:00' AS valid_from
      FROM customer),
    upd AS (
      SELECT c_custkey, CAST((c_nationkey + 1) % 25 AS BIGINT) AS new_nat
      FROM customer WHERE c_custkey % 10 = 3),
    versions AS (
      SELECT c.c_custkey, c.c_nationkey, c.valid_from,
             TIMESTAMP '{SCD2_EFFECTIVE} 00:00:00' AS valid_to
      FROM cur c JOIN upd u USING (c_custkey)
      UNION ALL
      SELECT c.c_custkey, u.new_nat,
             TIMESTAMP '{SCD2_EFFECTIVE} 00:00:00', NULL
      FROM cur c JOIN upd u USING (c_custkey)
      UNION ALL
      SELECT c.c_custkey, c.c_nationkey, c.valid_from, NULL
      FROM cur c LEFT JOIN upd u USING (c_custkey)
      WHERE u.c_custkey IS NULL)
    SELECT v.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum("o.o_totalprice")} AS revenue
    FROM orders o
    JOIN versions v
      ON o.o_custkey = v.c_custkey
     AND o.o_orderdate >= v.valid_from
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    GROUP BY v.c_nationkey
    """,
)
def q110_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension join: every order enriched
    with the SCD2 customer version that was valid AT o_orderdate —
    q100's versioned output consumed the way a warehouse actually
    uses it ([valid_from, valid_to) containment, NULL = open-ended),
    then revenue per effective nation. Orders span 1995-2001 so both
    version eras contribute.

    Scale: the version table is ~1.1 rows per dimension key — no
    forced broadcast hint, because "dimension-sized" still means
    SF-proportional: Catalyst/AQE broadcasts it while it fits (as at
    bench SFs, keeping the fact table shuffle-free) and falls back to
    a shuffle join on the key when it does not. The validity
    predicate evaluates inside the join on the key equality (at most
    2 versions per key here, bounded by update frequency in general);
    for version sets too large even to shuffle-join comfortably, the
    rewrite is the q17 as-of pattern: sort versions per key and
    range-match.
    """
    versions = QUERIES["q100_scd2_upsert"].fn(spark, sf_dir).select(
        "c_custkey", "c_nationkey",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    o = table(spark, sf_dir, "orders")
    j = o.join(
        versions,
        (o.o_custkey == versions.c_custkey)
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull()
           | (F.col("o_orderdate") < F.col("valid_to"))),
    )
    return j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Batch sliding windows

@register(
    "q99_sliding_window_batch",
    oracle=f"""
    WITH t AS (
      SELECT event_type, {sql_cents('value')} AS c,
             to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
               AS g30
      FROM events WHERE ts IS NOT NULL),
    e AS (
      SELECT event_type, c,
             unnest([g30, g30 - INTERVAL 30 MINUTE]) AS ws
      FROM t)
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(c) AS DOUBLE) / 100.0 AS sum_value
    FROM e GROUP BY ws, event_type
    """,
)
def q99_sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation in batch: 1-hour windows advancing
    every 30 minutes over the events table (each event lands in
    exactly 2 windows), per-type counts and exact-cents value sums.
    The batch twin of streaming/pipelines.sliding_avg — same F.window
    call, same results, which is the point: the engine's window
    semantics are mode-agnostic. The oracle derives each event's two
    member windows from the 30-minute epoch grid.

    Scale: F.window expands each row to its member windows BEFORE the
    aggregation, so partial aggregation still combines map-side; the
    shuffle carries per-(window, type) rows — window count is
    time-bounded, never data-bounded. Cost grows linearly with
    length/slide (2x here).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


ANOM_WIN = 100      # trailing rows per event_type
ANOM_MIN_WIN = 20   # warm-up: skip rows with fewer trailing samples
ANOM_Z = 3          # |z| threshold


@register(
    "q162_anomaly_zscore",
    oracle=f"""
    WITH base AS (
      SELECT event_id, event_type, ts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             value
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    w AS (
      SELECT event_id, event_type, ts, value, c,
             COUNT(*)  OVER win AS n,
             SUM(c)    OVER win AS s,
             SUM(c*c)  OVER win AS ss
      FROM base
      WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING))
    SELECT event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           value,
           CAST(n AS BIGINT) AS n_window
    FROM w
    WHERE n >= {ANOM_MIN_WIN}
      AND (n - 1) * (c * n - s) * (c * n - s)
          > {ANOM_Z * ANOM_Z} * n * (n * ss - s * s)
    """,
)
def q162_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection as a batch window op: flag
    events whose value sits more than 3 sample standard deviations
    from the trailing-100 mean of their event_type. The z-test is
    evaluated ENTIRELY in exact int64 cent arithmetic —
    (n-1)·(c·n−s)² > 9·n·(n·ss−s²) — so Spark and DuckDB flag the
    bit-identical row set (a float mean/stddev would make borderline
    rows engine-dependent; registry.py rule 1).

    Scale: one shuffle on event_type, trailing-rows frames evaluated
    in a single pass per partition; int64 products stay inside
    whole-stage codegen. Skew note: event_type has few distinct values
    — at 100 TB the partition key would widen to (event_type,
    entity_id) or day buckets, the same re-keying every per-entity
    window op in this repo uses (q20 pattern). Warm-up rows (<20
    trailing samples) are skipped on both sides.
    """
    ev = (table(spark, sf_dir, "events")
          .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select("event_id", "event_type", "ts", "value",
                  cents("value").alias("c")))
    win = (Window.partitionBy("event_type").orderBy("ts", "event_id")
           .rowsBetween(-ANOM_WIN, -1))
    w = ev.select(
        "event_id", "event_type", "ts", "value", "c",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("c").over(win).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(win).alias("ss"),
    )
    dev = F.col("c") * F.col("n") - F.col("s")
    var_term = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (w.filter((F.col("n") >= ANOM_MIN_WIN)
                     & ((F.col("n") - 1) * dev * dev
                        > F.lit(ANOM_Z * ANOM_Z) * F.col("n") * var_term))
            .select("event_id", "event_type",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                    "value",
                    F.col("n").cast("bigint").alias("n_window")))
