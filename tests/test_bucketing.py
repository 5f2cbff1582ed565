"""Bucketed-table co-located joins: writing both sides bucketed on the
join key lets Spark plan the join with NO exchange on either side —
the pre-shuffle pattern for repeated fact-fact joins at 100 TB, where
re-shuffling the big table per query is the dominant cost
(SCALING.md §2)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice")
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice")
    for df, key, name in [(li, "l_orderkey", "b_lineitem"),
                          (o, "o_orderkey", "b_orders")]:
        (df.write.bucketBy(4, key).sortBy(key)
         .option("path", str(d / name))
         .mode("overwrite").saveAsTable(name))
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_name)
            .join(spark.table(o_name),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # the join itself consumes the bucketed distribution directly;
        # only the final single-group aggregate may exchange
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
        # and it is correct
        want = (
            spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
            .join(spark.read.parquet(f"{SF_SMALL}/orders.parquet"),
                  F.col("l_orderkey") == F.col("o_orderkey")).count()
        )
        assert joined.first()["n"] == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
