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
