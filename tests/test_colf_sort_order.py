"""Recorded sort orders (Iceberg sort-order metadata): ``sortOrder``
in-file sorts every written part file, the order is recorded in the
snapshot log, appends inherit it, CoW rewrites keep touched files
sorted, and compact() re-clusters by it instead of round-robin
scrambling — the metadata that makes a sorted layout SURVIVE
maintenance."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

from columnar_format_spark.colf.datasource import (
    ColfReader,
    current_sort_order,
    live_files,
    load_manifest,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    compact,
    delete_where,
    set_sort_order,
    vacuum,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _df(colf_spark, n=10_000):
    # a scrambled key so in-file order is the WRITER's doing
    return colf_spark.range(n).select(
        ((F.col("id") * 48271) % n).cast("int").alias("k"),
        (F.col("id") % 13).cast("int").alias("v"))


def _file_is_sorted(colf_spark, path, f, col="k"):
    rows = (colf_spark.read.format("colf")
            .option("files", os.path.basename(f))
            .load(path).select(col).collect())
    vals = [r[0] for r in rows]
    return vals == sorted(vals)


@pytest.fixture()
def sorted_ds(colf_spark, tmp_path):
    p = str(tmp_path / "sds")
    (_df(colf_spark).repartitionByRange(4, "k")
     .write.format("colf").option("version", "3")
     .option("stripeRows", "1000").option("sortOrder", "k")
     .mode("overwrite").save(p))
    return p


def test_writer_sorts_in_file_and_records_order(colf_spark, sorted_ds):
    assert current_sort_order(sorted_ds) == ["k"]
    files = live_files(sorted_ds)
    assert len(files) == 4
    for f in files:
        assert _file_is_sorted(colf_spark, sorted_ds, f)
    # range-partitioned + in-file sorted → per-stripe zone maps are
    # disjoint: a narrow band plans a sliver of the stripes
    df = colf_spark.read.format("colf").load(sorted_ds)
    r = ColfReader({"path": sorted_ds, "pruning": "on"}, df.schema)
    r.pushFilters([GreaterThanOrEqual(("k",), 4000),
                   LessThanOrEqual(("k",), 4400)])
    stripes = [p for p in r.partitions() if p.file is not None]
    assert len(stripes) <= 2  # ~400/10000 rows → ≤2 of 40 stripes
    # the answer stays right
    assert df.filter(F.col("k").between(4000, 4400)).count() == 401


def test_append_inherits_sort_order(colf_spark, sorted_ds):
    (_df(colf_spark, 2000).coalesce(1).write.format("colf")
     .mode("append").save(sorted_ds))
    assert current_sort_order(sorted_ds) == ["k"]
    newest = max(live_files(sorted_ds), key=os.path.getmtime)
    assert _file_is_sorted(colf_spark, sorted_ds, newest)


def test_compact_preserves_sorted_layout(colf_spark, sorted_ds):
    """THE point of recording the order: compaction re-clusters by it
    (repartitionByRange + in-file sort), so stripe pruning keeps
    working after maintenance instead of silently degrading."""
    compact(colf_spark, sorted_ds, 2)
    assert current_sort_order(sorted_ds) == ["k"]
    files = live_files(sorted_ds)
    assert len(files) == 2
    for f in files:
        assert _file_is_sorted(colf_spark, sorted_ds, f)
    # cross-FILE disjointness survived too (range repartition)
    man = load_manifest(sorted_ds)
    spans = sorted((man[os.path.basename(f)]["columns"]["k"]["min"],
                    man[os.path.basename(f)]["columns"]["k"]["max"])
                   for f in files)
    assert spans[0][1] < spans[1][0]
    df = colf_spark.read.format("colf").load(sorted_ds)
    assert df.count() == 10_000


def test_delete_rewrite_keeps_files_sorted(colf_spark, sorted_ds):
    stats = delete_where(colf_spark, sorted_ds, "k = 4242")
    assert stats["n_deleted_rows"] == 1
    for f in live_files(sorted_ds):
        assert _file_is_sorted(colf_spark, sorted_ds, f)
    back = colf_spark.read.format("colf").load(sorted_ds)
    assert back.count() == 9_999


def test_set_sort_order_api_and_vacuum_carry(colf_spark, tmp_path):
    p = str(tmp_path / "uds")
    (_df(colf_spark, 3000).coalesce(2).write.format("colf")
     .mode("overwrite").save(p))
    assert current_sort_order(p) in (None, [])
    v = set_sort_order(p, ["k"])
    assert v >= 1 and current_sort_order(p) == ["k"]
    with pytest.raises(ColfFormatError):
        set_sort_order(p, ["nope"])
    # spec-less appends push the sort-bearing snapshot past keep_last
    for _ in range(2):
        (_df(colf_spark, 100).coalesce(1).write.format("colf")
         .mode("append").save(p))
    vacuum(p, keep_last=1)
    assert current_sort_order(p) == ["k"]
    # appends after truncation still inherit and sort
    (_df(colf_spark, 500).coalesce(1).write.format("colf")
     .mode("append").save(p))
    newest = max(live_files(p), key=os.path.getmtime)
    assert _file_is_sorted(colf_spark, p, newest)


def test_overwrite_inherits_sort_order(colf_spark, sorted_ds):
    """Iceberg model: sort order is TABLE metadata, so a data overwrite
    without an explicit sortOrder keeps (and re-records) it; an
    explicit empty sortOrder clears it; an overwrite whose schema
    drops the sort column clears it (it can't be satisfied)."""
    (_df(colf_spark, 3000).coalesce(2).write.format("colf")
     .mode("overwrite").save(sorted_ds))
    assert current_sort_order(sorted_ds) == ["k"]
    for f in live_files(sorted_ds):
        assert _file_is_sorted(colf_spark, sorted_ds, f)
    # appends after the overwrite still inherit
    (_df(colf_spark, 200).coalesce(1).write.format("colf")
     .mode("append").save(sorted_ds))
    newest = max(live_files(sorted_ds), key=os.path.getmtime)
    assert _file_is_sorted(colf_spark, sorted_ds, newest)
    # explicit empty sortOrder clears
    (_df(colf_spark, 500).coalesce(1).write.format("colf")
     .option("sortOrder", "").mode("overwrite").save(sorted_ds))
    assert current_sort_order(sorted_ds) in (None, [])


def test_overwrite_new_schema_drops_stale_sort(colf_spark, tmp_path):
    p = str(tmp_path / "schemachange")
    (_df(colf_spark, 1000).coalesce(1).write.format("colf")
     .option("sortOrder", "k").mode("overwrite").save(p))
    assert current_sort_order(p) == ["k"]
    (colf_spark.range(100).select(F.col("id").cast("int").alias("other"))
     .coalesce(1).write.format("colf").mode("overwrite").save(p))
    assert current_sort_order(p) in (None, [])


def test_sort_composes_with_partition_spec(colf_spark, tmp_path):
    """sortOrder + partitionColumns: each value-homogeneous split file
    is internally sorted on the sort column."""
    p = str(tmp_path / "pds")
    df = colf_spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        ((F.col("id") * 48271) % 2000).cast("int").alias("k"))
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "grp").option("sortOrder", "k")
     .mode("overwrite").save(p))
    assert current_sort_order(p) == ["k"]
    man = load_manifest(p)
    for f in live_files(p):
        assert man[os.path.basename(f)]["partition"]["grp"] in ("0", "1")
        assert _file_is_sorted(colf_spark, p, f)
