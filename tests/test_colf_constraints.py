"""Table CHECK constraints (Delta's ADD/DROP CONSTRAINT model):
writes validate rows executor-side before any file lands; violations
fail the job with nothing committed. (The reference has no constraint
concept — engine infrastructure, SURVEY.md §2.2.)"""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import load_snapshots
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    add_constraint,
    drop_constraint,
    update_where,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    from columnar_format_spark.colf.datasource import register

    register(spark)
    return spark


def _kv(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"), F.lit(tag).alias("tag"))


def test_constraint_lifecycle(colf_spark, tmp_path):
    path = str(tmp_path / "ds")
    _kv(colf_spark, 0, 100).repartition(2).write.format("colf") \
        .mode("overwrite").save(path)

    # adding a constraint existing data violates is refused
    with pytest.raises(ColfFormatError, match="existing"):
        add_constraint(colf_spark, path, "k_big", "k >= 50")
    res = add_constraint(colf_spark, path, "k_nonneg", "k >= 0")
    assert res["n_checked_rows"] == 100
    with pytest.raises(ColfFormatError, match="already exists"):
        add_constraint(colf_spark, path, "k_nonneg", "k >= 0")
    add_constraint(colf_spark, path, "tag_domain", "tag IN ('a','b')")

    # violating append fails with NOTHING committed
    head0 = load_snapshots(path)[-1]["version"]
    with pytest.raises(Exception, match="tag_domain"):
        _kv(colf_spark, 100, 110, tag="x").coalesce(1).write \
            .format("colf").mode("append").save(path)
    assert load_snapshots(path)[-1]["version"] == head0
    assert colf_spark.read.format("colf").load(path).count() == 100

    # a valid append lands; NULL satisfies (SQL-standard CHECK)
    nulls = colf_spark.range(100, 105).select(
        F.col("id").cast("int").alias("k"),
        F.lit(None).cast("string").alias("tag"))
    nulls.coalesce(1).write.format("colf").mode("append").save(path)
    assert colf_spark.read.format("colf").load(path).count() == 105

    # DML rewrite enforcement: an UPDATE that would break the domain
    # fails and leaves the table intact
    head1 = load_snapshots(path)[-1]["version"]
    with pytest.raises(Exception, match="tag_domain"):
        update_where(colf_spark, path, {"tag": "'z'"}, "k < 10")
    assert load_snapshots(path)[-1]["version"] == head1
    assert colf_spark.read.format("colf").load(path) \
        .filter(F.col("tag") == "z").count() == 0
    # a domain-respecting UPDATE goes through the same rewrite path
    update_where(colf_spark, path, {"tag": "'b'"}, "k < 10")
    assert colf_spark.read.format("colf").load(path) \
        .filter(F.col("tag") == "b").count() == 10

    # drop, then the formerly violating write succeeds
    drop_constraint(path, "tag_domain")
    with pytest.raises(ColfFormatError, match="no constraint"):
        drop_constraint(path, "tag_domain")
    _kv(colf_spark, 200, 205, tag="x").coalesce(1).write \
        .format("colf").mode("append").save(path)
    assert colf_spark.read.format("colf").load(path).count() == 110


def test_constraint_survives_overwrite_and_bad_sql_is_loud(
        colf_spark, tmp_path):
    path = str(tmp_path / "ds")
    _kv(colf_spark, 0, 10).coalesce(1).write.format("colf") \
        .mode("overwrite").save(path)
    add_constraint(colf_spark, path, "k_nonneg", "k >= 0")
    # constraints survive overwrite (Delta semantics) and validate it
    with pytest.raises(Exception, match="k_nonneg"):
        colf_spark.range(-5, 0).select(
            F.col("id").cast("int").alias("k"),
            F.lit("a").alias("tag")).coalesce(1).write \
            .format("colf").mode("overwrite").save(path)
    _kv(colf_spark, 5, 8).coalesce(1).write.format("colf") \
        .mode("overwrite").save(path)
    assert colf_spark.read.format("colf").load(path).count() == 3
    # a constraint referencing a column the write lacks fails loudly
    add_constraint(colf_spark, path, "tag_set", "tag IS NOT NULL")
    with pytest.raises(Exception, match="failed to evaluate"):
        colf_spark.range(0, 3).select(
            F.col("id").cast("int").alias("k")).coalesce(1).write \
            .format("colf").mode("overwrite").save(path)
