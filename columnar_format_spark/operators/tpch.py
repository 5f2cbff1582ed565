"""TPC-H classic query shapes (Q3, Q5, Q7, Q10, Q13, Q18) over the
synthetic star schema — multi-way join ordering, join-then-aggregate-
then-topk, dimension-attribute equi-conditions through the fact row,
left-join count distributions, and aggregate-subquery semijoins: the
canonical warehouse workloads a Catalyst-based engine must plan well.

Like everything in operators/, the reference
(satyakalla890/columnar-format) has no query surface (SURVEY.md §2.2);
these queries widen the engine's native Spark coverage with the DuckDB
oracle as the correctness gate. Determinism rules: registry.py
(revenue = exact int64 cents product-sums, rev_isum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, table
from .relational import rev_isum, sql_rev_isum

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1996-01-01"
Q7_NATIONS = ("NATION_18", "NATION_19")


@register(
    "q103_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_rev_isum('l.l_extendedprice', 'l.l_discount')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = '{Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q103_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): unshipped-as-of-date revenue per
    order for one market segment, top-10 by revenue (tie-broken by
    order key for a well-defined set — registry rule 6). Revenue is
    the exact int64 cents product-sum (rev_isum).

    Scale: no forced broadcast hints — the date-filtered orders side
    is still SF-proportional (fact-sized), so Catalyst/AQE must pick:
    broadcast while the filtered sides fit (as they do at bench SFs,
    keeping lineitem — the 100 TB side — shuffle-free), shuffle join
    beyond that. The top-10 is TakeOrderedAndProject, no global sort
    materialization. All three filters push to the parquet scans.
    """
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT).select("c_custkey")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < Q3_DATE
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > Q3_DATE
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    j = li.join(o, li.l_orderkey == o.o_orderkey) \
          .join(c, o.o_custkey == c.c_custkey)
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev_isum().alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q104_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           {sql_rev_isum('l.l_extendedprice', 'l.l_discount')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
       OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}')
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
)
def q104_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations per ship-year — a 6-way join where the nation-pair
    predicate can only be applied AFTER both sides are joined in.

    Scale: only the 25-row nation sides carry broadcast hints;
    supplier/customer/orders are left to Catalyst/AQE size estimation
    — supplier and customer are 1/10000th and 1/10th of lineitem and
    broadcast at bench SFs (the all-broadcast chain pinned in
    tests/test_plans.py), while orders is fact-sized and must be
    allowed to fall back to a shuffle join at large SF rather than
    OOM the driver on a forced broadcast. The pair filter prunes most
    rows right after the LAST join, before the aggregate's map-side
    partial.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    a, b = Q7_NATIONS
    j = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(rev_isum().alias("revenue"))
    )


@register(
    "q105_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q105_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of
    orders-per-customer INCLUDING zero-order customers — the left
    join is the point: an inner join would silently drop the c_count=0
    bucket.

    Scale: shuffle 1 keys both sides on custkey for the left join +
    count; shuffle 2 is counts-of-counts over one row per customer.
    COUNT(o_orderkey) counts non-null ORDER keys, so unmatched
    customers count 0, not 1 — the classic left-join-count trap, pinned
    by the oracle.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist"))


Q5_REGION = "ASIA"
Q5_DATE_LO, Q5_DATE_HI = "1996-01-01", "1997-01-01"
Q10_DATE_LO, Q10_DATE_HI = "1996-01-01", "1996-04-01"
Q18_QTY = 300


@register(
    "q124_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           {sql_rev_isum('l.l_extendedprice', 'l.l_discount')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q5_DATE_HI} 00:00:00'
    GROUP BY n.n_name
    """,
)
def q124_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation from
    orders where the customer and the line's supplier share a nation
    inside one region, over one order-year. The c_nationkey =
    s_nationkey equi-condition is the defining subtlety — it binds two
    DIMENSION attributes through the fact row, so it can only be
    applied once both dimension joins have landed.

    Scale: nation/region broadcast (25/5 rows); supplier and customer
    are left to AQE sizing like q104; the one-year order filter pushes
    to the orders scan and shrinks the fact join's probe side before
    lineitem joins in. One final 25-group aggregate with map-side
    partials.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q5_DATE_LO)
        & (F.col("o_orderdate") < Q5_DATE_HI)
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q5_REGION).select("r_regionkey")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy("n_name").agg(rev_isum().alias("revenue"))


@register(
    "q125_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_rev_isum('l.l_extendedprice', 'l.l_discount')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q10_DATE_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q10_DATE_HI} 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q125_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): the 20 customers who
    generated the most revenue on RETURNED lineitems in one quarter —
    the churn-risk report. Tie-broken by customer key (registry rule
    6) so the top-20 set is well-defined.

    Scale: both selective filters (quarter, returnflag) push to their
    scans; the aggregate groups on customer (high cardinality) and the
    top-20 is TakeOrderedAndProject over the partial-agged result —
    no global sort. Raw c_acctbal passes through untouched (registry
    rule 3).
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q10_DATE_LO)
        & (F.col("o_orderdate") < Q10_DATE_HI)
    ).select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev_isum().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q126_tpch_q18",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q18_QTY})
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q126_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large volume customer): orders whose total line
    quantity exceeds a threshold, with their customer — the classic
    aggregate-subquery-as-semijoin shape. Quantities are integral
    doubles, summed as exact BIGINTs.

    Scale: the HAVING subquery is a partial-agged groupBy on
    l_orderkey joined back as a LEFT SEMI join — Catalyst plans the IN
    as a semijoin keyed on the same l_orderkey partitioning the outer
    aggregate reuses; the threshold prunes the semijoin build side to
    a sliver before it meets orders. Top-100 by totalprice is
    TakeOrderedAndProject, tie-broken by order key.
    """
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("tq"))
        .filter(F.col("tq") > Q18_QTY)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                  "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Round-4 widening: the remaining TPC-H shapes expressible over this
# testdata (no partsupp table; lineitem has no commit/receipt dates or
# shipmode — the affected queries are ADAPTED, each documented).

Q4_LO, Q4_HI = "1996-01-01", "1996-04-01"
Q6_LO, Q6_HI = "1996-01-01", "1997-01-01"
Q6_QTY = 24
Q8_REGION, Q8_TYPE, Q8_NATION = "ASIA", "STANDARD", "NATION_3"
Q8_LO, Q8_HI = "1996-01-01", "1997-12-31"
Q9_WORD = "red"
Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"
Q16_BRAND, Q16_TYPE_PREFIX = "Brand#15", "ECONOMY"
Q16_SIZES = (1, 9, 19, 29, 39, 49)
Q17_BRAND = "Brand#12"
Q21_LATE_DAYS = 90
Q22_NATIONS = (3, 7, 11, 15, 19, 23)
Q22_CUTOFF = "2000-01-01"


def _vol() -> "F.Column":
    """Per-row revenue as exact int64 ten-thousandths (cents × discount
    complement) — summable in any order; see rev_isum's overflow
    budget note."""
    from .relational import cents

    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


SQL_VOL = ("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
           " * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))")


@register(
    "q138_tpch_q4",
    oracle=f"""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '{Q4_HI} 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q138_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), ADAPTED: the reference
    predicate l_commitdate < l_receiptdate has no testdata columns, so
    the correlated EXISTS is l_shipdate > o_orderdate instead — same
    shape (quarter filter + correlated-EXISTS semijoin + priority
    histogram), different lateness definition.

    Scale: the EXISTS compiles to a LEFT SEMI join on l_orderkey with
    the extra non-equi conjunct evaluated on the joined row; the
    quarter filter pushes to the orders scan and shrinks the probe
    side ~60× before the semijoin. 5-group aggregate, map-side
    partials.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q4_LO) & (F.col("o_orderdate") < Q4_HI)
    ).select("o_orderkey", "o_orderpriority", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count"))


@register(
    "q139_tpch_q6",
    oracle=f"""
    SELECT (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)
                     * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS DOUBLE) / 10000.0) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_LO} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q6_HI} 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < {Q6_QTY}
    """,
)
def q139_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure pushed-filter
    scan-and-sum — revenue that would vanish if discounts in a band
    were dropped for small quantities over one year.

    Scale: zero joins, zero wide shuffles — every predicate reaches
    PushedFilters on the parquet (and COLF zone-map) scan, the sum is
    a map-side partial + 1-row final. The canonical "is your scan
    path clean" probe. price_cents × discount_cents is an exact int64
    (≤1e9/row); the /1e4 at the end reconstructs price*discount.
    """
    from .relational import cents

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q6_LO) & (F.col("l_shipdate") < Q6_HI)
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < Q6_QTY)
    )
    return li.agg(
        (F.sum(cents("l_extendedprice") * cents("l_discount"))
         .cast("double") / F.lit(1.0e4)).alias("revenue"))


@register(
    "q140_tpch_q8",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           (CAST(SUM(CASE WHEN n1.n_name = '{Q8_NATION}'
                          THEN {SQL_VOL} ELSE 0 END) AS DOUBLE)
            / CAST(SUM({SQL_VOL}) AS DOUBLE)) AS mkt_share
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation n2   ON n2.n_nationkey = c.c_nationkey
    JOIN region r    ON r.r_regionkey = n2.n_regionkey
    JOIN part p      ON p.p_partkey = l.l_partkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation n1   ON n1.n_nationkey = s.s_nationkey
    WHERE r.r_name = '{Q8_REGION}'
      AND p.p_type = '{Q8_TYPE}'
      AND o.o_orderdate BETWEEN TIMESTAMP '{Q8_LO} 00:00:00'
                            AND TIMESTAMP '{Q8_HI} 00:00:00'
    GROUP BY o_year
    """,
)
def q140_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one supplier nation's share
    of revenue for a part type sold into one region's market, per
    order-year — conditional aggregation over a 7-table star join.

    Scale: nation/region broadcast; part is SF-proportional but tiny
    relative to lineitem and the p_type filter prunes it ~6× before
    AQE sizes the join; supplier/customer/orders as in q104. The
    share is a ratio of two exact int64 sums computed in ONE
    aggregate pass (no second scan for the denominator) — the CASE
    trick every Catalyst conditional-agg plan should use; the final
    double division is deterministic.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q8_LO)
        & (F.col("o_orderdate") <= f"{Q8_HI} 00:00:00")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_type") == Q8_TYPE).select("p_partkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_regionkey").alias("c_rk"))
    r = table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION).select("r_regionkey")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
    )
    vol = _vol()
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.sum(F.when(F.col("supp_nation") == Q8_NATION, vol)
                   .otherwise(F.lit(0))).cast("double")
             / F.sum(vol).cast("double")).alias("mkt_share"))
    )


@register(
    "q141_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           {sql_rev_isum('l.l_extendedprice', 'l.l_discount')} AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%{Q9_WORD}%'
    GROUP BY nation, o_year
    """,
)
def q141_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit), ADAPTED: no partsupp table, so
    profit omits the ps_supplycost*l_quantity term and reduces to
    discounted revenue — the SHAPE is intact: substring match on part
    name, 5-way join, profit by supplier nation × order year.

    Scale: the LIKE '%word%' cannot push as a range but DOES push as
    a parquet residual filter on the part scan (~1/6 selectivity
    here); part joins lineitem on partkey BEFORE orders joins in, so
    the fact table is pruned by the part filter first — join order
    matters and Catalyst gets it from the size estimates. 25×years
    output groups.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_WORD)).select("p_partkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"),
                  F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(rev_isum().alias("sum_profit"))
    )


@register(
    "q142_tpch_q15",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM({SQL_VOL}) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_LO} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q15_HI} 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           (CAST(rev.r AS DOUBLE) / 10000.0) AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q142_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue
    in one quarter — the view + scalar-MAX-subquery shape.

    Scale: one partial-agged groupBy on l_suppkey; the MAX is a 1-row
    aggregate of that result joined back as a broadcast equality (no
    second scan of lineitem, the aggregated frame is reused for both
    the max and the join). Ties all surface (spec semantics), made
    deterministic by the exact int64 revenue — no double-noise ties.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q15_LO) & (F.col("l_shipdate") < Q15_HI)
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy("l_suppkey").agg(F.sum(_vol()).alias("r"))
    top = rev.agg(F.max("r").alias("rmax"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev.r == F.col("rmax"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            (F.col("r").cast("double") / F.lit(1.0e4))
            .alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q143_tpch_q16",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> '{Q16_BRAND}'
      AND p.p_type NOT LIKE '{Q16_TYPE_PREFIX}%'
      AND p.p_size IN {Q16_SIZES}
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q143_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), ADAPTED: with no
    partsupp table the part↔supplier relation is DISTINCT
    (l_partkey, l_suppkey) from lineitem, and the "customer
    complaints" exclusion becomes s_name LIKE '%7' — shape intact:
    negated filters, NOT-IN anti-join, COUNT(DISTINCT supplier) per
    part attribute triple.

    Scale: the distinct pair projection is one shuffle on the pair
    key (at 100 TB this is the expensive step — a real deployment
    materializes it once, exactly what partsupp IS); the NOT IN
    compiles to a broadcast anti-join (supplier is the small side);
    COUNT(DISTINCT) over (brand,type,size) reuses Spark's two-phase
    distinct-aggregate expansion.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_BRAND)
        & (~F.col("p_type").startswith(Q16_TYPE_PREFIX))
        & (F.col("p_size").isin(*Q16_SIZES))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_name").endswith("7")).select(
        F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint")
             .alias("supplier_cnt"))
    )


@register(
    "q144_tpch_q17",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey,
             SUM(CAST(l_quantity AS BIGINT)) AS sq,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT (CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100.0 / 7.0)
           AS avg_yearly
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}'
      AND 5 * pa.cnt * CAST(l.l_quantity AS BIGINT) < pa.sq
    """,
)
def q144_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue lost if
    orders below 20% of a part's average quantity were not taken —
    the correlated AVG subquery, decorrelated into an aggregate
    joined back on partkey.

    The 20%-of-average comparison is cross-multiplied into pure
    int64 (5·cnt·qty < Σqty) so both engines compare exact integers —
    no double AVG anywhere (quantities are integral doubles).

    Scale: per-part aggregate and the join-back share the same
    partkey partitioning (one exchange reused); the brand filter
    prunes part ~25× and semi-prunes lineitem through the join.
    The container predicate of spec-Q17 has no testdata column and
    is dropped (documented adaptation).
    """
    from .relational import cents

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    pa = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"))
    p = table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND).select("p_partkey")
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.lit(5) * F.col("cnt")
                * F.col("l_quantity").cast("bigint") < F.col("sq"))
    )
    return j.agg(
        (F.sum(cents("l_extendedprice")).cast("double") / F.lit(100.0)
         / F.lit(7.0)).alias("avg_yearly"))


Q19_BRANCHES = (("Brand#12", 5, 1, 11), ("Brand#23", 10, 10, 20),
                ("Brand#24", 15, 20, 30))


@register(
    "q145_tpch_q19",
    oracle=f"""
    SELECT {sql_rev_isum('l.l_extendedprice', 'l.l_discount')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = '{Q19_BRANCHES[0][0]}'
           AND p.p_size BETWEEN 1 AND {Q19_BRANCHES[0][1]}
           AND l.l_quantity BETWEEN {Q19_BRANCHES[0][2]}
                                AND {Q19_BRANCHES[0][3]})
       OR (p.p_brand = '{Q19_BRANCHES[1][0]}'
           AND p.p_size BETWEEN 1 AND {Q19_BRANCHES[1][1]}
           AND l.l_quantity BETWEEN {Q19_BRANCHES[1][2]}
                                AND {Q19_BRANCHES[1][3]})
       OR (p.p_brand = '{Q19_BRANCHES[2][0]}'
           AND p.p_size BETWEEN 1 AND {Q19_BRANCHES[2][1]}
           AND l.l_quantity BETWEEN {Q19_BRANCHES[2][2]}
                                AND {Q19_BRANCHES[2][3]})
    """,
)
def q145_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), ADAPTED: the container/shipmode
    conjuncts have no testdata columns; the defining structure — a
    disjunction of brand×size×quantity conjunction branches that
    straddles the join — is intact.

    Scale: Catalyst extracts the join-side-local implications of the
    OR: part gets (brand IN (...) AND p_size<=15-ish) pushed, lineitem
    gets the quantity envelope pushed, and the full disjunction is
    re-checked post-join. The part side shrinks to a broadcastable
    sliver at any SF (brand+size is ~1/100 of part).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = None
    for brand, size_hi, q_lo, q_hi in Q19_BRANCHES:
        branch = ((F.col("p_brand") == brand)
                  & F.col("p_size").between(1, size_hi)
                  & F.col("l_quantity").between(q_lo, q_hi))
        cond = branch if cond is None else (cond | branch)
    return j.filter(cond).agg(rev_isum().alias("revenue"))


@register(
    "q146_tpch_q21",
    oracle=f"""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate
                            + INTERVAL {Q21_LATE_DAYS} DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q146_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), ADAPTED:
    "late" is l_shipdate > o_orderdate + 90 days (no commit/receipt
    dates in the testdata). The EXISTS/NOT-EXISTS pair — another
    supplier participated, no OTHER supplier was late — is
    decorrelated into per-order supplier counts: a late line
    qualifies iff its order has >1 distinct suppliers and exactly 1
    distinct LATE supplier. Set-identical to the correlated form (the
    oracle runs the textbook EXISTS version to prove it).

    Scale: the rewrite turns two correlated subqueries into two
    partial-agged groupBys on l_orderkey that share the late-join's
    partitioning — O(lineitem) total, no nested-loop re-scan per row
    (the correlated form is quadratic if the optimizer fails to
    decorrelate; doing it structurally removes the risk). Top-20 is
    TakeOrderedAndProject.
    """
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS"))
    n_supp = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"),
                "left_semi")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp")))
    n_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late_supp")))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    q = (
        late.join(n_supp.filter(F.col("n_supp") > 1), "l_orderkey")
        .join(n_late.filter(F.col("n_late_supp") == 1), "l_orderkey")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
    )
    return (
        q.groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q147_tpch_q22",
    oracle=f"""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           (CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100.0) AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN {Q22_NATIONS}
      AND CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
          * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                             AS BIGINT))
             FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q147_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), ADAPTED: the phone-prefix
    country code becomes c_nationkey (no phone column), and "never
    placed an order" becomes "no order since {Q22_CUTOFF}" (every
    testdata customer has SOME order) — shape intact: scalar
    AVG-subquery threshold, NOT-EXISTS anti-join, per-country
    aggregate of the rich-but-idle customers.

    The above-average test is cross-multiplied into exact int64
    (cents·count > Σcents) so no floating AVG exists on either
    engine — double AVG would be aggregation-order-dependent.

    Scale: the threshold stats are ONE 1-row aggregate broadcast into
    the filter; the NOT EXISTS is a shuffle anti-join against the
    date-pruned orders slice; output is ≤25 groups. Customer is
    scanned twice (stats + candidates) — at 100 TB the stats pass
    reads only the acctbal column (columnar pruning makes the second
    scan ~1% of table bytes).
    """
    from .relational import cents

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal")
    stats = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(cents("c_acctbal")).alias("sum_pos"))
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= Q22_CUTOFF
    ).select(F.col("o_custkey").alias("c_custkey"))
    cand = (
        c.filter(F.col("c_nationkey").isin(*Q22_NATIONS))
        .crossJoin(F.broadcast(stats))
        .filter(cents("c_acctbal") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, "c_custkey", "left_anti")
    )
    return cand.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        (F.sum(cents("c_acctbal")).cast("double") / F.lit(100.0))
        .alias("totacctbal"))


# ---------------------------------------------------------------------------
# Round 7: the four remaining TPC-H shapes (Q2, Q11, Q12, Q20) — with
# these the full 22-query suite is covered (Q1=q01, Q14=q72, rest in
# this module). The testdata has no partsupp table, so Q2/Q11/Q20
# derive a supply relation from lineitem — (l_partkey, l_suppkey)
# pairs with exact-int cost/availability aggregates — keeping each
# query's SHAPE (correlated min, scalar-subquery HAVING, nested
# semi-joins) intact.

Q2_SIZE_LO, Q2_SIZE_HI = 10, 20
Q2_TYPE_SUFFIX = "ANDARD"
Q2_REGION = "EUROPE"
Q11_NATION = "NATION_19"
Q11_MULT = 2.0  # value × n_parts > K × Σvalue, i.e. > K× the average
Q12_LO, Q12_HI = "1996-01-01", "1997-01-01"
Q20_NAME_PREFIX = "blue"
Q20_LO, Q20_HI = "1996-01-01", "1997-01-01"

# Derived supply relation (partsupp stand-in), shared by Q2/Q11/Q20:
# one row per (l_partkey, l_suppkey) with exact int64 aggregates.
_SQL_SUPPLY = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS ps_cost_c,
             SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
"""


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp: cheapest observed price (exact cents,
    order-independent MIN) and total shipped quantity per pair —
    MATERIALIZED once per (process, sf_dir) as a parquet dataset and
    read back, so Q2/Q11/Q20 each scan a ~|partsupp| table instead of
    re-running the lineitem groupBy per invocation.

    Scale: the one-time build is ONE partial-agged groupBy over
    lineitem — at 100 TB a map-side-combined shuffle on the
    (partkey, suppkey) composite, output ~|partsupp| ≪ |lineitem|
    rows; in production this staged table is exactly what a warehouse
    would keep as a maintained derived table, clustered on ps_partkey
    so the three consumers' part-side joins prune."""
    from .relational import cents
    from ..staging import stage_once

    def write(d: str) -> None:
        (table(spark, sf_dir, "lineitem")
         .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
         .groupBy(F.col("l_partkey").alias("ps_partkey"),
                  F.col("l_suppkey").alias("ps_suppkey"))
         .agg(F.min(cents("l_extendedprice")).alias("ps_cost_c"),
              F.sum(F.col("l_quantity").cast("bigint")).alias("ps_availqty"))
         .repartitionByRange(4, "ps_partkey")
         .write.mode("overwrite").parquet(d))

    return spark.read.parquet(
        stage_once(("tpch-supply", sf_dir), "tpch_supply_", write))


@register(
    "q175_tpch_q2",
    oracle=f"""
    WITH supply AS ({_SQL_SUPPLY}),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = '{Q2_REGION}'),
    cand AS (
      SELECT p.p_partkey, p.p_name, ps.ps_suppkey, ps.ps_cost_c
      FROM part p JOIN supply ps ON p.p_partkey = ps.ps_partkey
      JOIN eu ON ps.ps_suppkey = eu.s_suppkey
      WHERE p.p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
        AND p.p_type LIKE '%{Q2_TYPE_SUFFIX}')
    SELECT eu.s_acctbal, eu.s_name, eu.n_name,
           c.p_partkey, c.p_name, eu.s_suppkey,
           (CAST(c.ps_cost_c AS DOUBLE) / 100.0) AS supplycost
    FROM cand c JOIN eu ON c.ps_suppkey = eu.s_suppkey
    WHERE c.ps_cost_c = (SELECT MIN(c2.ps_cost_c) FROM cand c2
                         WHERE c2.p_partkey = c.p_partkey)
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name,
             c.p_partkey, eu.s_suppkey
    LIMIT 100
    """,
)
def q175_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), ADAPTED: supplycost comes
    from the lineitem-derived supply relation (_supply). The shape is
    the classic correlated-MIN subquery — for each qualifying part,
    keep only region suppliers achieving that part's minimum cost —
    expressed as a window MIN over the candidate set (one pass, no
    self-join re-scan).

    Scale: part filter prunes to ~4 % before the supply join; the
    supplier→nation→region side is dimension-sized and broadcast. The
    window partitions by p_partkey over the already-filtered candidate
    set (tiny), not over raw supply. Top-100 with a total order
    (acctbal DESC, nation, name, partkey, suppkey — unique)."""
    from pyspark.sql.window import Window

    sup = _supply(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
        & F.col("p_type").endswith(Q2_TYPE_SUFFIX)
    ).select("p_partkey", "p_name")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    eu = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        sup.join(p, sup.ps_partkey == p.p_partkey)
        .join(F.broadcast(eu), sup.ps_suppkey == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_c", F.min("ps_cost_c").over(w))
        .filter(F.col("ps_cost_c") == F.col("min_c"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "s_suppkey",
            (F.col("ps_cost_c").cast("double") / F.lit(100.0))
            .alias("supplycost"))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                 "p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "q176_tpch_q11",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey AS ps_partkey,
             SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT)) AS value_c
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = '{Q11_NATION}'
      GROUP BY l.l_partkey)
    SELECT ps_partkey, (CAST(value_c AS DOUBLE) / 100.0) AS part_value
    FROM val
    WHERE CAST(value_c AS DOUBLE)
          * (SELECT CAST(COUNT(*) AS DOUBLE) FROM val) >
          {Q11_MULT} * (SELECT CAST(SUM(value_c) AS DOUBLE) FROM val)
    """,
)
def q176_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), ADAPTED: part value is the exact
    int64 sum of price-cents × quantity over one nation's lineitems
    (no partsupp availqty/supplycost). The shape is the classic
    scalar-subquery HAVING: keep parts whose value exceeds a multiple
    of the GLOBAL average part value (value×n > K×total) — unlike the
    spec's fixed 0.0001/SF fraction this threshold is scale-invariant,
    so the query stays selective-but-nonempty at every SF.

    Scale: one partial-agged groupBy on l_partkey after a broadcast
    nation→supplier semi-filter; the global (total, count) is a 1-row
    aggregate of the SAME grouped frame broadcast back as a crossJoin
    — the fact table is scanned once. Both comparison sides are single
    IEEE products of identical exact-int operands in both engines."""
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation").filter(
            F.col("n_name") == Q11_NATION)),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    from .relational import cents

    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    val = (
        li.join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(cents("l_extendedprice")
                   * F.col("l_quantity").cast("bigint")).alias("value_c"))
    )
    total = val.agg(F.sum("value_c").alias("total_c"),
                    F.count(F.lit(1)).alias("n_parts"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_c").cast("double")
                * F.col("n_parts").cast("double")
                > F.lit(Q11_MULT) * F.col("total_c").cast("double"))
        .select("ps_partkey",
                (F.col("value_c").cast("double") / F.lit(100.0))
                .alias("part_value"))
    )


@register(
    "q177_tpch_q12",
    oracle=f"""
    SELECT l.l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q12_LO} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{Q12_HI} 00:00:00'
    GROUP BY ship_class
    """,
)
def q177_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority), ADAPTED: the
    testdata lineitem has no l_shipmode/commitdate/receiptdate, so
    l_linestatus stands in as the ship class and the late-delivery
    predicate reduces to the ship-date year window. The shape is
    intact: fact-to-orders join, per-class dual CASE-WHEN counts
    splitting priorities into high (URGENT/HIGH) vs low.

    Scale: the date window pushes into the lineitem scan (~1/7 of
    rows); the join is a shuffle hash on orderkey; counts are pure
    int64 partial aggregates — 2 output groups."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q12_LO) & (F.col("l_shipdate") < Q12_HI)
    ).select("l_orderkey", "l_linestatus")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
    )


@register(
    "q178_tpch_q20",
    oracle=f"""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS BIGINT)) AS qty_y
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q20_LO} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q20_HI} 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    supply AS ({_SQL_SUPPLY}),
    excess AS (
      SELECT ps.ps_suppkey
      FROM supply ps
      JOIN shipped sh ON ps.ps_partkey = sh.l_partkey
                     AND ps.ps_suppkey = sh.l_suppkey
      WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part
              WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
        AND 2 * ps.ps_availqty > 3 * sh.qty_y)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT ps_suppkey FROM excess)
    ORDER BY s.s_name, s.s_acctbal
    """,
)
def q178_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), ADAPTED: availability is
    the derived supply relation's total shipped quantity, and the
    excess test keeps pairs whose total is more than 1.5× the one-year
    shipped quantity (the classic availqty > 0.5×qty shape with both
    sides exact int64 — 2·avail > 3·qty avoids any float). The nested
    IN-subquery chain (name-prefix parts → excess pairs → suppliers)
    is intact, expressed as semi-joins.

    Scale: the part name-prefix filter pushes down as a range (prefix
    = sortable bound) and semi-joins supply BEFORE the year-window
    aggregate joins in; all joins after the fact-table groupBys are
    dimension-sized. Final IN = left_semi join on suppkey."""
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(Q20_NAME_PREFIX)).select("p_partkey")
    shipped = (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= Q20_LO)
                & (F.col("l_shipdate") < Q20_HI))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty_y"))
    )
    sup = _supply(spark, sf_dir)
    excess = (
        sup.join(F.broadcast(p), sup.ps_partkey == p.p_partkey, "left_semi")
        .join(shipped, (sup.ps_partkey == shipped.l_partkey)
              & (sup.ps_suppkey == shipped.l_suppkey))
        .filter(F.lit(2) * F.col("ps_availqty") > F.lit(3) * F.col("qty_y"))
        .select("ps_suppkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal")
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name", "s_acctbal")
    )
