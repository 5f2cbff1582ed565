"""Copy-on-write row-level UPDATE (maintenance.update_where): only
files containing matches rewrite, matching rows get the SET
expressions, NULL-condition rows survive unchanged, and the dataset's
layout metadata (version/stripes/sort/partition tuples) rides through
the rewrite — the same contracts delete_where pins, for the remaining
DML verb."""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    current_sort_order,
    live_files,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import update_where


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


@pytest.fixture()
def ds(colf_spark, tmp_path):
    p = str(tmp_path / "upds")
    (colf_spark.range(1000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise((F.col("id") % 3).cast("string")).alias("g"))
     .repartitionByRange(4, "k")
     .write.format("colf").mode("overwrite").save(p))
    return p


def test_update_metadata_planned(colf_spark, ds):
    """A range condition over the range-partitioned layout discovers
    its touched file from zone maps alone and rewrites only it."""
    before = {os.path.basename(f) for f in live_files(ds)}
    stats = update_where(colf_spark, ds, {"v": "v * 10"}, "k <= 100")
    assert stats["discovery"] == "metadata"
    assert stats["n_updated_rows"] == 101
    assert stats["n_rewritten_files"] == 1
    assert stats["n_kept_files"] == 3
    after = {os.path.basename(f) for f in live_files(ds)}
    assert len(before & after) == 3  # untouched files byte-identical
    back = colf_spark.read.format("colf").load(ds)
    assert back.count() == 1000  # UPDATE removes nothing
    assert back.filter("k <= 100").agg(
        F.sum("v")).first()[0] == pytest.approx(
        sum((i % 7) * 10 for i in range(101)))
    assert back.filter("k > 100").agg(F.sum("v")).first()[0] == \
        pytest.approx(sum(i % 7 for i in range(101, 1000)))
    # pre-update version still time-travels
    v1 = colf_spark.read.format("colf").option("snapshot", "1").load(ds)
    assert v1.agg(F.sum("v")).first()[0] == pytest.approx(
        sum(i % 7 for i in range(1000)))


def test_update_null_condition_rows_unchanged(colf_spark, ds):
    """SQL semantics: rows where the condition is NULL (g IS NULL
    here) must survive UNCHANGED, not get updated."""
    stats = update_where(colf_spark, ds, {"v": "-1.0"}, "g = '1'")
    back = colf_spark.read.format("colf").load(ds)
    n_null = back.filter("g IS NULL").count()
    assert n_null == 100
    assert back.filter("g IS NULL AND v = -1.0").count() == 0
    assert back.filter("v = -1.0").count() == stats["n_updated_rows"]
    assert stats["n_updated_rows"] == back.filter("g = '1'").count()


def test_update_multi_assignment_and_cross_column(colf_spark, ds):
    update_where(colf_spark, ds,
                 {"v": "k + v", "g": "'upd'"}, "k >= 990")
    back = colf_spark.read.format("colf").load(ds).filter("k >= 990")
    rows = {r["k"]: (r["v"], r["g"]) for r in back.collect()}
    assert len(rows) == 10
    for k, (v, g) in rows.items():
        assert v == pytest.approx(k + (k % 7)) and g == "upd"


def test_update_noop_and_guards(colf_spark, ds):
    v0 = len(live_files(ds))
    stats = update_where(colf_spark, ds, {"v": "0.0"}, "k = 999999")
    assert stats["n_updated_rows"] == 0 and stats["n_rewritten_files"] == 0
    assert len(live_files(ds)) == v0
    with pytest.raises(ColfFormatError):
        update_where(colf_spark, ds, {"nope": "1"}, "k = 1")
    with pytest.raises(ValueError):
        update_where(colf_spark, ds, {}, "k = 1")


def test_update_scan_fallback_and_sorted_v3(colf_spark, tmp_path):
    """An expression condition falls back to scan discovery; a sorted
    v3 dataset keeps its recorded order and stripe granularity through
    the rewrite."""
    p = str(tmp_path / "upv3")
    (colf_spark.range(8000).select(
        ((F.col("id") * 48271) % 8000).cast("int").alias("k"),
        (F.col("id") % 5).cast("double").alias("v"))
     .repartitionByRange(2, "k")
     .write.format("colf").option("version", "3")
     .option("stripeRows", "1000").option("sortOrder", "k")
     .mode("overwrite").save(p))
    stats = update_where(colf_spark, p, {"v": "v + 100"}, "k % 2 = 0")
    assert stats["discovery"] == "scan"
    assert stats["n_updated_rows"] == 4000
    assert current_sort_order(p) == ["k"]
    for f in live_files(p):
        rows = (colf_spark.read.format("colf")
                .option("files", os.path.basename(f)).load(p)
                .select("k").collect())
        vals = [r[0] for r in rows]
        assert vals == sorted(vals)  # in-file sort preserved
    back = colf_spark.read.format("colf").load(p)
    assert back.filter("k % 2 = 0 AND v < 100").count() == 0
    assert back.filter("k % 2 = 1 AND v >= 100").count() == 0


def test_update_preserves_partition_tuples(colf_spark, tmp_path):
    """An UPDATE touching one partition's file must keep the rewritten
    file value-homogeneous (its manifest tuple intact) so exact
    partition pruning survives the rewrite — as long as the SET does
    not touch the partition column itself."""
    from columnar_format_spark.colf.datasource import (live_files,
                                                       load_manifest)

    p = str(tmp_path / "pupds")
    (colf_spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("int").alias("k"),
        F.lit(1.0).alias("v"))
     .coalesce(1).write.format("colf")
     .option("partitionColumns", "g").mode("overwrite").save(p))
    stats = update_where(colf_spark, p, {"v": "2.0"}, "g = '1'")
    assert stats["n_updated_rows"] == 100
    assert stats["n_rewritten_files"] == 1  # only g=1's file
    man = load_manifest(p)
    tuples = sorted(man[__import__("os").path.basename(f)]
                    ["partition"]["g"] for f in live_files(p))
    assert tuples == ["0", "1", "2"]
    back = colf_spark.read.format("colf").load(p)
    assert back.filter("g = '1' AND v = 2.0").count() == 100
    assert back.filter("g <> '1' AND v = 2.0").count() == 0
