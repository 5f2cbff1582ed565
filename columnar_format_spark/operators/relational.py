"""Relational query surface: filters, joins (all types, broadcast,
as-of, range), aggregations (hash agg, rollup/cube/grouping sets,
distinct, approx), window functions (4 frame shapes), sort/limit/top-k,
set operations, scalar functions, JSON.

The reference (satyakalla890/columnar-format) has NO query surface —
reader.py/writer.py are scan/storage only (SURVEY.md §2.2) — so these
queries define the engine's native Spark capabilities over the testdata
star schema. Every query follows the determinism rules in registry.py.

Scale notes (100 TB design intent) are in each query's docstring; the
general rules: dimension tables (region/nation/customer/supplier/part)
are broadcast; fact-fact joins shuffle on their join key and rely on
AQE for skew; aggregations are expressed so Spark plans partial
(map-side) aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, table

# ---------------------------------------------------------------------------
# deterministic-aggregation helpers (see registry.py rules)

DEC = "decimal(18,2)"


def cents(col: str, scale: int = 2) -> Column:
    """A 2dp-double money column as exact int64 hundredths: round via
    the (deterministic, engine-identical) double→decimal cast, then
    scale into BIGINT. Sums over cents are pure int64 — exact in any
    aggregation order and ~2× faster than Decimal128 accumulation
    (int64 adds stay inside whole-stage codegen's primitive path).
    Overflow bound: |money| < 10^16-scale per row leaves ≥10^12 rows
    per group before an int64 sum can overflow — safe past SF1000."""
    return (F.col(col).cast(f"decimal(18,{scale})") * (10 ** scale)).cast("bigint")


def dsum(c: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a 2dp-double column: exact int64 cents
    sum, one deterministic IEEE division back to double."""
    return F.sum((c.cast(f"decimal(18,{scale})") * (10 ** scale)).cast("bigint")) \
        .cast("double") / F.lit(float(10 ** scale))


def davg(c: Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact cents sum, two IEEE divisions of
    identical operands in both engines."""
    return dsum(c, scale) / F.count(c)


def money(col: str) -> Column:
    return F.col(col).cast(DEC)


def ts_str(c: Column) -> Column:
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# SQL-side equivalents (DuckDB). SUM(BIGINT) yields HUGEINT there; the
# value is the same exact integer Spark holds in its BIGINT sum, so the
# CAST..AS DOUBLE is the identical IEEE conversion on both engines.
def sql_cents(x: str, scale: int = 2) -> str:
    return f"CAST(CAST({x} AS DECIMAL(18,{scale})) * {10 ** scale} AS BIGINT)"


def sql_dsum(x: str, scale: int = 2) -> str:
    return f"(CAST(SUM({sql_cents(x, scale)}) AS DOUBLE) / {float(10 ** scale)})"


def sql_davg(x: str, scale: int = 2) -> str:
    return f"({sql_dsum(x, scale)} / COUNT({x}))"


# The TPC-H revenue pattern price*(1-discount) as an exact int64 sum:
# price_cents (~1e7 for TPC-H-shaped prices) × discount-complement
# (≤100) is ≤1e9 per row → ≥9e9 rows per group before int64 overflow —
# safe at SF1000 (6e9-row lineitem). Three-factor products (e.g. q01's
# charge) exceed that budget and stay in Decimal128.
def rev_isum(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    return (F.sum(cents(price) * (F.lit(100) - cents(disc))).cast("double")
            / F.lit(1.0e4))


def sql_rev_isum(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (f"(CAST(SUM({sql_cents(price)} * (100 - {sql_cents(disc)}))"
            f" AS DOUBLE) / 10000.0)")


# ---------------------------------------------------------------------------
# Aggregations


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           (CAST(SUM({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})) AS DOUBLE) / 10000.0) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary. Flagship query.

    Scale: single shuffle on the (tiny-cardinality) group keys; Spark
    plans partial hash aggregation map-side so the shuffle carries one
    row per (flag,status) per task regardless of input size. Filter and
    the 7-column projection push down to the parquet scan.
    """
    li = table(spark, sf_dir, "lineitem")
    # disc_price in int64 cents² (price_cents ~1e7 × discount-complement
    # ≤100 → ≤1e9/row, ≥9e9 rows/group before overflow — fine at SF1000
    # where the whole table is 6e9 rows). charge is a THREE-factor
    # product (≤1.2e11/row → overflow at ~8e7 rows/group) so it stays
    # in exact Decimal128 — per-aggregate choice, both engines mirrored.
    disc_price_i = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    charge = (money("l_extendedprice") * (F.lit(1) - money("l_discount"))
              * (F.lit(1) + money("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(disc_price_i).cast("double") / F.lit(1.0e4)).alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS rebate,
           strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_ts
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + narrow projection (TPC-H-Q6 shaped scan).

    Scale: no shuffle at all — filter + projection only. All four
    predicates and the 7-column ReadSchema push into the parquet scan
    (verified via .explain: PushedFilters on l_shipdate/l_discount/
    l_quantity).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_discount",
            (money("l_extendedprice") * money("l_discount")).cast("double").alias("rebate"),
            ts_str(F.col("l_shipdate")).alias("ship_ts"),
        )
    )


@register(
    "q03_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q03_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals. Scale: Spark expands rollup to a union
    of grouping sets inside a single hash-aggregate — one shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@register(
    "q04_agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q04_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
    )


@register(
    "q05_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {sql_davg('o_totalprice')} AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q05_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(o_totalprice) AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "q06_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q06_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggs (Spark plans expand +
    two-phase agg). MIN/MAX on doubles are order-independent — no
    decimal cast needed."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


# HLL++ rsd for q07, and the audited relative-error ceiling: 5x the
# rsd (observed max error 3.3% across sf0.001-0.1; 10% never trips
# unless the sketch machinery actually breaks).
HLL_RSD = 0.02
HLL_ERR_CEIL = 5 * HLL_RSD


@register(
    "q07_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS orders_within_bound, true AS parts_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q07_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct counts, emitted as a bounds audit
    with an EXACT oracle (round 5, replacing rows-only): per group the
    exact distinct counts plus booleans certifying the HLL estimate
    landed within HLL_ERR_CEIL relative error — the oracle pins the
    booleans to true, so a driver row turns red if the sketch drifts
    (the q135 pattern: hash the machinery's guarantee, not its
    engine-specific internals).

    Scale: HLL is THE distinct-count at 100 TB — exact count(distinct)
    shuffles every distinct key; HLL sketches merge in fixed space.
    The exact twin here is the audit tier (one extra Expand agg),
    exactly the q117/q128 pairing.
    """
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", HLL_RSD).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", HLL_RSD).alias("approx_parts"),
        F.count_distinct("l_orderkey").cast("bigint").alias("exact_orders"),
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.lit(HLL_ERR_CEIL) * F.col(e))
    return agg.select(
        "l_returnflag", "exact_orders", "exact_parts",
        within("approx_orders", "exact_orders").alias("orders_within_bound"),
        within("approx_parts", "exact_parts").alias("parts_within_bound"),
    )


# ---------------------------------------------------------------------------
# Joins


@register(
    "q10_join_broadcast_star",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_items,
           {sql_rev_isum()} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 25
    GROUP BY p_brand
    """,
)
def q10_join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint: no shuffle of the fact
    table, only the final tiny agg shuffle. At 100 TB the part dim at
    the same ratio is ~20 GB — too big to broadcast whole, but the
    p_size filter runs first and the broadcast carries only the
    filtered, 2-column projection; with AQE a shuffled-hash fallback is
    automatic if it exceeds the threshold."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 25).select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rev_isum().alias("revenue"),
        )
    )


@register(
    "q11_join_left",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q11_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (their
    total_spend is NULL, n_orders 0). Scale: both sides shuffle on
    custkey; at 100 TB this is a sort-merge join with AQE skew split."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_spend"),
        )
    )


@register(
    "q12_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
    """,
)
def q12_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one big order.
    Scale: semi-join carries no payload columns from the right side and
    Spark de-dups build keys — cheapest of the join family."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q13_join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q13_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "q14_join_full_outer",
    oracle="""
    WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         ss AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cc.nk, ss.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
    """,
)
def q14_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (agg-before-join:
    shrinks both inputs to ≤25 rows before the join — the right order
    at any scale)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cc = c.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    ss = s.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cc.join(ss, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "q15_star_revenue_by_region",
    oracle=f"""
    SELECT r_name,
           {sql_rev_isum()} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    GROUP BY r_name
    """,
)
def q15_star_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 5-way star join, revenue by region.

    Scale: the only big-big join is lineitem⋈orders (shuffle on
    orderkey). customer/nation/region are broadcast — customer at 100 TB
    ratio is ~2 GB after the 2-column projection; if that tips over the
    threshold AQE demotes it to shuffled hash join.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            rev_isum().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q16_range_join_bands",
    oracle=f"""
    WITH bands AS (
      SELECT i AS band_id, i * 100.0 AS lo, (i + 1) * 100.0 AS hi
      FROM range(0, 50) t(i))
    SELECT band_id, COUNT(*) AS n_parts,
           {sql_dsum('p_retailprice')} AS sum_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band_id
    """,
)
def q16_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: parts into 100-unit price bands.

    Scale: the bands side is tiny and broadcast, so the non-equi
    condition is evaluated stream-side with zero shuffle (a broadcast
    nested-loop join) — the standard trick for interval joins against a
    small interval table.
    """
    p = table(spark, sf_dir, "part")
    bands = spark.range(0, 50).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 100.0).alias("lo"),
        ((F.col("id") + 1) * 100.0).alias("hi"),
    )
    return (
        p.join(F.broadcast(bands),
               (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum(F.col("p_retailprice")).alias("sum_price"),
        )
    )


@register(
    "q17_asof_join",
    oracle="""
    SELECT e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
           strftime((SELECT MAX(s.ts) FROM events s
                     WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                       AND s.ts <= e.ts), '%Y-%m-%d %H:%M:%S') AS last_signup_ts
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def q17_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the most recent signup at or
    before it by the same user. Spark lacks a native ASOF join, so this
    uses the union-then-window formulation: tag both sides, sort by
    (ts, tag) within user, and carry the last signup ts forward with
    last(ignorenulls) — one shuffle on user_id, no self-join blowup.

    Scale: this is THE scalable as-of pattern — a naive theta join
    (s.ts <= e.ts) is quadratic per user; the union+window is
    O(n log n) per user partition and streams through one window pass.
    """
    e = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_probe"),
        F.lit(None).cast("timestamp").alias("signup_ts"),
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_probe"),
        F.col("ts").alias("signup_ts"),
    )
    # signups sort before errors at equal ts (is_probe 0 < 1) → "<=" semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = errors.unionByName(signups).withColumn(
        "last_signup_ts", F.last("signup_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_probe") == 1).select(
        "event_id",
        ts_str(F.col("ts")).alias("error_ts"),
        ts_str(F.col("last_signup_ts")).alias("last_signup_ts"),
    )


# ---------------------------------------------------------------------------
# Window functions


@register(
    "q20_window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def q20_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (unique tie-break on
    orderkey → deterministic). Scale: Spark rewrites rn<=k into a
    per-partition top-k (WindowGroupLimit) before the shuffle, so the
    shuffle carries ≤k rows per (task, key)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q21_window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           (CAST(SUM({sql_cents('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0) AS running_spend
    FROM orders
    """,
)
def q21_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (ROWS frame, unique order → exact
    int64-cents prefix sums are identical in any engine)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double")
         / F.lit(100.0)).alias("running_spend"),
    )


@register(
    "q22_window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
              - LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS delta_prev
    FROM orders
    """,
)
def q22_window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: change vs the customer's previous order (exact decimal
    subtraction; first order per customer → NULL)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    p = money("o_totalprice")
    return o.select(
        "o_custkey", "o_orderkey",
        (p - F.lag(p).over(w)).cast("double").alias("delta_prev"),
    )


@register(
    "q23_window_range_30d",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           (CAST(SUM({sql_cents('o_totalprice')}) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0) AS spend_30d
    FROM orders
    """,
)
def q23_window_range_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing-30-day spend per customer. Range frames are
    defined by the ORDER BY value, so equal-timestamp peers are all
    included — deterministic without a tie-break."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").withColumn(
        "epoch_s", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double")
         / F.lit(100.0)).alias("spend_30d"),
    )


@register(
    "q24_window_ntile_rank",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS bal_quartile,
           RANK() OVER (ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS nation_dense_rank
    FROM customer
    """,
)
def q24_window_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / RANK / DENSE_RANK. The global-ORDER windows funnel into
    one partition — fine for ranked reports sized like this output; at
    100 TB you'd pre-aggregate or bucket first (see q20 for the
    scalable per-group pattern)."""
    from pyspark.sql import Window

    c = table(spark, sf_dir, "customer")
    w_bal = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_seg = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w_bal).alias("bal_quartile"),
        F.rank().over(w_bal).alias("bal_rank"),
        F.dense_rank().over(w_seg).alias("nation_dense_rank"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops


@register(
    "q25_top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q25_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit. Scale: Spark executes this as
    TakeOrderedAndProject — each task keeps a k-row heap, the driver
    merges heaps; no global sort ever materializes."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q26_set_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q26_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey"))
    return a.union(b).distinct()


@register(
    "q27_set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q27_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two key sets."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return a.intersect(b)


@register(
    "q28_set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q28_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers minus those who ever ordered."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.select("c_custkey").subtract(o.select(F.col("o_custkey").alias("c_custkey")))


# ---------------------------------------------------------------------------
# Scalar functions / JSON / conditional


@register(
    "q30_scalar_sampler",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
           length(o_orderpriority) AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(sqrt(CAST(o_orderkey AS DOUBLE)) AS DOUBLE) AS key_sqrt,
           abs(o_custkey - 100) AS key_dist,
           o_orderkey % 7 AS key_mod
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def q30_scalar_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar-function sampler (all whole-stage-codegen
    JVM built-ins; sqrt of identical doubles is IEEE-identical)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_initial"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_eoy"),
        F.sqrt(F.col("o_orderkey").cast("double")).alias("key_sqrt"),
        F.abs(F.col("o_custkey") - 100).alias("key_dist"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@register(
    "q31_json_extract",
    oracle=f"""
    SELECT json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q31_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from events.props + aggregation."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.select(
            k.alias("k_str"),
            (k.cast("bigint") % 10).alias("k_bucket"),
            F.col("value"),
        )
        .groupBy("k_str", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


@register(
    "q32_conditional_agg",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           (CAST(SUM(CASE WHEN event_type = 'purchase'
                          THEN {sql_cents('value')} ELSE 0 END) AS DOUBLE)
            / 100.0) AS purchase_value,
           CAST(MAX(CASE WHEN event_type = 'error' THEN value END) AS DOUBLE) AS max_error_value
    FROM events
    GROUP BY user_id
    """,
)
def q32_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN inside aggregates (pivot-style conditional agg)."""
    e = table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(is_purchase, 1)).alias("n_purchases"),
        (F.sum(F.when(is_purchase, cents("value")).otherwise(F.lit(0)))
         .cast("double") / F.lit(100.0)).alias("purchase_value"),
        F.max(F.when(F.col("event_type") == "error", F.col("value"))).alias("max_error_value"),
    )


@register(
    "q33_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS es,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM marked)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q33_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via lag + running
    sum — the batch analog of Structured Streaming's session_window
    (see streaming/pipelines.py). One shuffle on user_id; both windows
    share it.

    Gap arithmetic is in exact integer MICROSECONDS (unix_micros /
    epoch_us): unix_timestamp() truncates to whole seconds, which
    shifts events whose true gap straddles 1800s across session
    boundaries relative to the sub-second-aware oracle."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").withColumn(
        # cast bridges TIMESTAMP_NTZ parquet columns (session tz is UTC,
        # so NTZ -> LTZ is the identity on the epoch value)
        "es", F.unix_micros(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.withColumn(
        "is_new",
        F.when(
            (F.col("es") - F.lag("es").over(w) > 1800 * 1_000_000)
            | F.lag("es").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn("session_id", F.sum("is_new").over(wrun))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ts_str(F.min("ts")).alias("session_start"),
        ts_str(F.max("ts")).alias("session_end"),
    )


# ---------------------------------------------------------------------------
# Skew handling & time-series rollups

SALT_BUCKETS = 8


@register(
    "q18_salted_skew_join",
    oracle=f"""
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           {sql_dsum('l.l_extendedprice')} AS sum_price,
           {sql_dsum('o.o_totalprice')} AS sum_order_total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def q18_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact-fact join, provably result-identical to the
    plain join (the oracle IS the unsalted join): the probe side gets a
    deterministic salt (l_linenumber % SALT_BUCKETS), the build side is
    replicated once per salt value, and the join key becomes
    (orderkey, salt) — a hot orderkey's rows now spread over
    SALT_BUCKETS reducers instead of one.

    Scale: this is the manual fallback when AQE's skew-join splitting
    can't help (e.g. a single key beyond any split threshold, or
    aggregation-after-join pinned to the same partitioning). The cost
    is SALT_BUCKETS× replication of the build side — pick the smallest
    salt that caps the hottest reducer. Salt must be DERIVED (not
    random): retries/speculative tasks must salt identically.
    """
    li = table(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % SALT_BUCKETS).cast("int"))
    orders = table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))))
    joined = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"]) & (li["salt"] == orders["salt"]),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        dsum(F.col("o_totalprice")).alias("sum_order_total"),
    )


@register(
    "q36_time_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_bucket,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 1 THEN NULL
                ELSE strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') END AS hour_bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                            (date_trunc('day', ts)))
    """,
)
def q36_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly and daily
    continuous-aggregate rows produced in ONE pass via grouping sets
    (the hour level reuses the day grouping's shuffle; a real
    deployment materializes this incrementally per arriving partition).

    Scale: one shuffle keyed by the finest bucket; coarser levels are
    merged map-side by the grouping-sets expansion rather than
    rescanning the fact table per resolution.
    """
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_rollup_src")
    return spark.sql(f"""
        SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd HH:mm:ss') AS day_bucket,
               CASE WHEN grouping(date_trunc('hour', ts)) = 1 THEN NULL
                    ELSE date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') END AS hour_bucket,
               COUNT(1) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events_rollup_src
        GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                                (date_trunc('day', ts)))
    """)


@register(
    "q29_window_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_key,
           CAST(LAST_VALUE(o_orderkey) OVER
                (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS BIGINT) AS last_key
    FROM orders
    WHERE o_orderkey < 5000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q29_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist (exact
    rationals — identical in any engine) + first/last value over an
    unbounded frame. Completes the window family beyond ranking (q20/
    q24) and offsets (q22).

    Scale: one shuffle on the partition key; the unbounded-following
    frame for last_value requires the full partition, which is why the
    key (priority) must be low-cardinality-safe or pre-bucketed.
    """
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).cast("bigint").alias("first_key"),
        F.last("o_orderkey").over(w_full).cast("bigint").alias("last_key"),
    )


@register(
    "q88_right_cross_join",
    oracle="""
    WITH pairs AS (
      SELECT r.r_name, n.n_name, n.n_nationkey FROM region r CROSS JOIN nation n
    )
    SELECT p.r_name, p.n_name,
           CAST(COUNT(s.s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COALESCE(SUM(CASE WHEN s.s_acctbal > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_positive_bal
    FROM supplier s
    RIGHT JOIN pairs p
      ON s.s_nationkey = p.n_nationkey AND p.r_name <> 'AFRICA'
    GROUP BY p.r_name, p.n_name
    """,
)
def q88_right_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-outer + cross join, completing the join matrix (q10-q18
    cover inner/left/semi/anti/full/range/as-of/salted): every
    (region, nation) pair from a cross join is preserved by a right
    join against suppliers, so nations with zero suppliers — and all
    AFRICA pairs, excluded by the non-equi join condition — still
    appear with zero counts. COUNT(col) vs COUNT(*) null semantics
    under the preserved side is exactly what this pins.

    Scale: both dimension sides are tiny (5 x 25 rows) — the cross
    join is a broadcast nested loop and the right join broadcasts the
    125-row pair table, so the only scan that matters is supplier and
    nothing shuffles.
    """
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name", "n_nationkey")
    pairs = r.crossJoin(n)
    s = table(spark, sf_dir, "supplier")
    joined = s.join(
        F.broadcast(pairs),
        (s.s_nationkey == pairs.n_nationkey) & (pairs.r_name != "AFRICA"),
        "right",
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count("s_suppkey").cast("bigint").alias("n_suppliers"),
        F.coalesce(
            F.sum(F.when(F.col("s_acctbal") > 0, 1).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("n_positive_bal"),
    )
