"""TPC-H classic query shapes (Q3, Q7, Q13) over the synthetic star
schema — multi-way join ordering, join-then-aggregate-then-topk, and
left-join count distributions, the canonical warehouse workloads a
Catalyst-based engine must plan well.

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
