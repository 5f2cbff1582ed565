"""Additive schema evolution for COLF datasets (engine extension;
datasource.py `dataset_union_columns`): later appends may ADD columns;
older files read them as typed NULLs; type changes and dropped columns
are rejected. The parquet-schema-merging model, on the sidecar-manifest
dataset convention."""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    live_files,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError, read_schema


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


@pytest.fixture()
def evolved(colf_spark, tmp_path):
    """4 old files (id, v) then 2 new files (id, v, tag)."""
    p = str(tmp_path / "ds")
    old = colf_spark.range(0, 8000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 0.5).alias("v"))
    old.repartition(4).write.format("colf").mode("append").save(p)
    new = colf_spark.range(8000, 12000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 0.5).alias("v"),
        (F.col("id") % 3).cast("string").alias("tag"))
    new.repartition(2).write.format("colf").mode("append").save(p)
    return p


def test_union_schema_and_null_fill(colf_spark, evolved):
    back = colf_spark.read.format("colf").load(evolved)
    assert [f.name for f in back.schema.fields] == ["id", "v", "tag"]
    assert back.count() == 12_000
    # old rows: tag IS NULL; new rows: tag populated
    assert back.filter("tag IS NULL").count() == 8000
    assert back.filter("tag IS NOT NULL AND id < 8000").count() == 0
    assert back.filter("tag = '1'").count() == \
        sum(1 for i in range(8000, 12000) if i % 3 == 1)


def test_selective_read_of_new_column_only(colf_spark, evolved):
    only = (colf_spark.read.format("colf")
            .option("columns", "tag").load(evolved))
    vals = [r.tag for r in only.collect()]
    assert len(vals) == 12_000
    assert sum(v is None for v in vals) == 8000


def test_append_missing_column_rejected(colf_spark, evolved):
    bad = colf_spark.range(5).select(F.col("id").cast("int").alias("id"))
    with pytest.raises(Exception, match="missing dataset column"):
        bad.write.format("colf").mode("append").save(evolved)


def test_append_type_change_rejected(colf_spark, evolved):
    bad = colf_spark.range(5).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 0.5).alias("v"),
        F.col("id").cast("int").alias("tag"))  # tag was utf8
    with pytest.raises(Exception, match="type"):
        bad.write.format("colf").mode("append").save(evolved)


def test_zone_map_pruning_keeps_old_files(colf_spark, evolved):
    # a filter on the NEW column must not prune pre-evolution files
    # (their manifest entries lack the column -> conservative keep;
    # their rows are all-NULL, so IS NULL must retain all 8000)
    back = colf_spark.read.format("colf").load(evolved)
    assert back.filter("tag IS NULL").count() == 8000
    # and an equality on the new column still returns only new rows
    assert back.filter("tag = '0'").count() == \
        sum(1 for i in range(8000, 12000) if i % 3 == 0)


def test_v3_striped_evolution(colf_spark, tmp_path):
    p = str(tmp_path / "v3ds")
    old = colf_spark.range(0, 10_000).select(
        F.col("id").cast("int").alias("id"))
    (old.coalesce(1).write.format("colf").option("version", "3")
     .option("stripeRows", "2500").mode("append").save(p))
    new = colf_spark.range(10_000, 12_000).select(
        F.col("id").cast("int").alias("id"),
        F.lit("x").alias("tag"))
    (new.coalesce(1).write.format("colf").option("version", "3")
     .option("stripeRows", "2500").mode("append").save(p))
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 12_000
    assert back.filter("tag IS NULL").count() == 10_000
    assert back.filter("tag = 'x'").count() == 2000


def test_compact_migrates_to_union_schema(colf_spark, evolved):
    from columnar_format_spark.colf.maintenance import compact

    n = compact(colf_spark, evolved, 2)
    assert n == 2
    # every post-compaction file carries the full union schema
    for f in live_files(evolved):
        assert [c.name for c in read_schema(f).columns] == ["id", "v", "tag"]
    back = colf_spark.read.format("colf").load(evolved)
    assert back.count() == 12_000
    assert back.filter("tag IS NULL").count() == 8000


def test_delete_where_on_new_column_spares_null_rows(colf_spark, evolved):
    """DELETE WHERE tag = '0': the condition is NULL on every
    pre-evolution row, and SQL DELETE only removes TRUE rows — the
    8000 old rows must all survive."""
    from columnar_format_spark.colf.maintenance import delete_where

    stats = delete_where(colf_spark, evolved, "tag = '0'")
    expect_deleted = sum(1 for i in range(8000, 12000) if i % 3 == 0)
    assert stats["n_deleted_rows"] == expect_deleted
    back = colf_spark.read.format("colf").load(evolved)
    assert back.count() == 12_000 - expect_deleted
    assert back.filter("tag IS NULL").count() == 8000


def test_stream_read_of_evolved_dataset(colf_spark, evolved, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        colf_spark.readStream.format("colf").load(evolved)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = colf_spark.read.parquet(out)
    assert back.count() == 12_000
    assert back.filter("tag IS NULL").count() == 8000
