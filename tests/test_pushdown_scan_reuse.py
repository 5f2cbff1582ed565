"""Upstream PySpark 4.1.2 scan-cache hazard, pinned.

PythonDataSourceV2 (the Scala TableProvider behind every Python data
source) caches ONE PythonDataSourceReadInfo per relation
(`readInfo` field, getOrCreateReadInfo/setReadInfo), and
PythonScanBuilder.pushFilters unconditionally OVERWRITES it with the
filtered planning's result whenever any filter is a supported type.
A later NO-FILTER query on the same DataFrame object reuses that
cached scan — including the file pruning and residual row masks our
reader derived from the other query's filters — and silently returns
filtered results. Queries WITH filters always re-plan (each pushdown
runs fresh), so filtered→filtered is safe; the broken shape is
exactly "filtered action, then unfiltered action, same DataFrame
object".

Nothing reader-side can fix this: for the no-filter query neither
pushFilters nor partitions() is re-invoked (verified by tracing the
planner worker), so the stale state is replayed entirely JVM-side.

Engine contract, enforced by audit and these tests:
1. every product code path uses fresh `spark.read...load(path)` per
   logical query (the cache lives on the per-load TableProvider, so
   fresh loads are always correct);
2. a user who must reuse one DataFrame across filtered and unfiltered
   actions can make scans filter-neutral with
   ``option("pruning", "off").option("rowFilter", "off")``;
3. the canary below asserts the upstream behavior — when a PySpark
   upgrade fixes it, the canary FAILS and both the workaround advice
   and this file should be retired.
"""

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import register


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


@pytest.fixture()
def ds(colf_spark, tmp_path):
    p = str(tmp_path / "reuseds")
    (colf_spark.range(100).select(F.col("id").cast("int").alias("k"))
     .repartition(2).write.format("colf").mode("overwrite").save(p))
    return p


def test_fresh_loads_are_always_correct(colf_spark, ds):
    """The engine-internal pattern: one load per logical query. The
    scan cache lives on the per-load TableProvider instance, so a
    fresh load after someone else's filtered action is untouched."""
    df1 = colf_spark.read.format("colf").load(ds)
    assert df1.filter("k >= 95").count() == 5
    df2 = colf_spark.read.format("colf").load(ds)
    assert df2.count() == 100
    assert df2.filter("k < 10").count() == 10
    assert colf_spark.read.format("colf").load(ds).count() == 100


def test_filtered_then_filtered_reuse_is_correct(colf_spark, ds):
    """Queries WITH filters re-run the pushdown cycle each time, so
    same-DataFrame reuse across different filters stays correct."""
    df = colf_spark.read.format("colf").load(ds)
    assert df.filter("k >= 95").count() == 5
    assert df.filter("k >= 90").count() == 10
    assert df.filter("k < 10").count() == 10


def test_safe_mode_options_make_reuse_filter_neutral(colf_spark, ds):
    """pruning=off + rowFilter=off: the reader derives nothing from
    pushed filters, so the cached scan is identical whatever was
    planned last — the documented workaround for DataFrame reuse."""
    df = (colf_spark.read.format("colf")
          .option("pruning", "off").option("rowFilter", "off").load(ds))
    assert df.filter("k >= 95").count() == 5
    assert df.count() == 100           # correct despite the reuse
    assert df.filter("k < 50").count() == 50
    assert df.count() == 100


def test_single_plan_multi_scan_needs_fresh_loads(colf_spark, ds):
    """The hazard also bites WITHIN one query: a plan holding two scan
    subtrees over the SAME load() executes both with the last-pushed
    readInfo (one subtree reads the other's pruned file set). Fresh
    loads per subtree — the engine-wide rule — are correct; so is the
    filter-neutral safe mode."""
    a = (colf_spark.read.format("colf").load(ds)
         .agg(F.count(F.lit(1)).alias("na")))
    f = (colf_spark.read.format("colf").load(ds)
         .filter("k >= 95").agg(F.count(F.lit(1)).alias("nf")))
    row = a.crossJoin(f).first()
    assert (row["na"], row["nf"]) == (100, 5)
    sdf = (colf_spark.read.format("colf")
           .option("pruning", "off").option("rowFilter", "off").load(ds))
    x = sdf.filter("k >= 95").agg(F.count(F.lit(1)).alias("n1"))
    y = sdf.filter("k < 10").agg(F.count(F.lit(1)).alias("n2"))
    row2 = x.crossJoin(y).first()
    assert (row2["n1"], row2["n2"]) == (5, 10)


def test_upstream_scan_cache_canary(colf_spark, ds):
    """Asserts the UPSTREAM BUG is still present (filtered scan reused
    by a no-filter query on the same DataFrame). If this test FAILS,
    the installed PySpark fixed the single-slot readInfo cache:
    retire this file and the option("pruning","off") reuse advice in
    register()'s docstring."""
    df = colf_spark.read.format("colf").load(ds)
    assert df.filter("k >= 95").count() == 5
    assert df.count() == 5             # WRONG on purpose — see above
