"""SQL surface over COLF datasets: register_table makes spark.sql a
first-class entry point (views over the datasource read, full option
surface incl. time travel and the change feed), and an upgrade canary
pins the upstream PySpark 4.1.2 gap that keeps catalog tables
(CREATE TABLE ... USING colf) from scanning."""

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import register, register_table


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


@pytest.fixture()
def ds(colf_spark, tmp_path):
    p = str(tmp_path / "sqlds")
    (colf_spark.range(0, 200)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 7).cast("double").alias("v"),
             (F.col("id") % 3).cast("string").alias("g"))
     .repartitionByRange(4, "k").write.format("colf")
     .mode("overwrite").save(p))
    return p


def test_register_table_full_sql_surface(colf_spark, ds):
    register_table(colf_spark, "t_sql", ds)
    got = colf_spark.sql("""
        SELECT g, COUNT(*) AS n, SUM(CAST(v AS BIGINT)) AS sv
        FROM t_sql WHERE k >= 100 GROUP BY g ORDER BY g""").collect()
    assert [r["n"] for r in got] == [33, 34, 33]
    # joins between a colf view and any other relation
    colf_spark.range(0, 3).select(
        F.col("id").cast("string").alias("g"),
        F.lit(10).alias("w")).createOrReplaceTempView("t_dim")
    j = colf_spark.sql("""
        SELECT SUM(w) AS tw FROM t_sql JOIN t_dim USING (g)
        WHERE t_sql.k < 10""").first()
    assert j["tw"] == 100


def test_register_table_time_travel_and_cdc(colf_spark, ds):
    from columnar_format_spark.colf.maintenance import delete_where

    (colf_spark.range(200, 250)
     .select(F.col("id").cast("int").alias("k"),
             F.lit(0.0).alias("v"), F.lit("x").alias("g"))
     .coalesce(1).write.format("colf").mode("append").save(ds))
    delete_where(colf_spark, ds, "k < 20", mode="mor")
    register_table(colf_spark, "t_now", ds)
    register_table(colf_spark, "t_v1", ds, snapshot=1)
    register_table(colf_spark, "t_cdc", ds, readChangeFeed=True)
    row = colf_spark.sql("""
        SELECT (SELECT COUNT(*) FROM t_now) AS n_now,
               (SELECT COUNT(*) FROM t_v1) AS n_v1,
               (SELECT COUNT(*) FROM t_cdc
                WHERE _change_type = 'delete') AS n_dels""").first()
    assert (row["n_now"], row["n_v1"], row["n_dels"]) == (230, 200, 20)


def test_register_table_pushdown_prunes_files(colf_spark, ds):
    """Pushdown through the SQL surface is the same zone-map pruning
    as the DataFrame API: a key-range WHERE on the range-partitioned
    dataset must scan fewer files than the full set."""
    from pyspark.sql.datasource import GreaterThan

    from columnar_format_spark.colf.datasource import ColfReader

    register_table(colf_spark, "t_push", ds)
    full = ColfReader({"path": ds}, None)
    full.pushed = []
    pruned = ColfReader({"path": ds}, None)
    pruned.pushFilters([GreaterThan(("k",), 150)])
    assert len(pruned.partitions()) < len(full.partitions())
    # and the SQL result is exact
    assert colf_spark.sql(
        "SELECT COUNT(*) AS n FROM t_push WHERE k > 150").first()["n"] == 49


def test_create_table_using_colf_upstream_canary(colf_spark, ds):
    """UPGRADE CANARY (PySpark 4.1.2): CREATE TABLE ... USING colf
    creates fine (schema inference receives the table options), but
    the SCAN constructs the Python data source with an EMPTY options
    map, so the first SELECT fails loudly. When a Spark upgrade makes
    this test fail (the SELECT succeeds), switch register_table to
    real catalog tables and delete this canary."""
    colf_spark.sql("DROP TABLE IF EXISTS colf_canary")
    colf_spark.sql(
        f"CREATE TABLE colf_canary USING colf OPTIONS (path '{ds}')")
    try:
        with pytest.raises(Exception, match="requires a path"):
            colf_spark.sql("SELECT COUNT(*) FROM colf_canary").collect()
    finally:
        colf_spark.sql("DROP TABLE IF EXISTS colf_canary")
