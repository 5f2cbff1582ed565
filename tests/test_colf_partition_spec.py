"""Partition-spec evolution (Iceberg model): the spec is TABLE
metadata recorded in the snapshot log — overwrites define it, appends
inherit it, a mismatched append fails loudly unless it explicitly
evolves the spec, and maintenance rewrites converge the dataset back
into the CURRENT spec. Existing files always keep their layout and
their manifest partition tuples (readers prune per-file either way)."""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    current_partition_spec,
    effective_partition_spec,
    inferred_partition_spec,
    live_files,
    load_manifest,
    load_snapshots,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    compact,
    evolve_partition_spec,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _df(colf_spark, lo, hi):
    return colf_spark.range(lo, hi).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 3).cast("string").alias("a"),
        (F.col("id") % 2).cast("string").alias("b"),
        (F.col("id") * 0.5).alias("v"))


def _tuples(path):
    man = load_manifest(path)
    return {os.path.basename(f): tuple(
        ((man.get(os.path.basename(f)) or {}).get("partition") or {}).keys())
        for f in live_files(path)}


@pytest.fixture()
def part_a(colf_spark, tmp_path):
    """A dataset overwritten with partitionColumns=a (spec recorded)."""
    p = str(tmp_path / "ds")
    (_df(colf_spark, 0, 300).repartition(3, "a").write.format("colf")
     .option("partitionColumns", "a").mode("overwrite").save(p))
    return p


def test_overwrite_records_spec(part_a):
    assert current_partition_spec(part_a) == ["a"]
    assert effective_partition_spec(part_a) == ["a"]
    assert set(_tuples(part_a).values()) == {("a",)}


def test_plain_append_inherits_spec(colf_spark, part_a):
    (_df(colf_spark, 300, 500).repartition(3, "a").write.format("colf")
     .mode("append").save(part_a))
    # no partitionColumns given, yet the new files are a-partitioned
    assert set(_tuples(part_a).values()) == {("a",)}
    assert current_partition_spec(part_a) == ["a"]
    back = colf_spark.read.format("colf").load(part_a)
    assert back.count() == 500
    assert back.agg(F.sum("id")).first()[0] == sum(range(500))


def test_matching_append_ok(colf_spark, part_a):
    (_df(colf_spark, 300, 400).repartition(3, "a").write.format("colf")
     .option("partitionColumns", "a").mode("append").save(part_a))
    assert set(_tuples(part_a).values()) == {("a",)}


def test_mismatched_append_fails_loudly(colf_spark, part_a):
    with pytest.raises(Exception) as ei:
        (_df(colf_spark, 300, 400).repartition(3, "b").write.format("colf")
         .option("partitionColumns", "b").mode("append").save(part_a))
    assert "evolvePartitionSpec" in str(ei.value)
    # nothing committed: dataset unchanged
    assert colf_spark.read.format("colf").load(part_a).count() == 300


def test_unpartitioned_append_to_specced_fails(colf_spark, part_a):
    with pytest.raises(Exception) as ei:
        (_df(colf_spark, 300, 400).write.format("colf")
         .option("partitionColumns", "").mode("append").save(part_a))
    assert "evolvePartitionSpec" in str(ei.value)


def test_evolve_via_option(colf_spark, part_a):
    (_df(colf_spark, 300, 500).repartition(2, "b").write.format("colf")
     .option("partitionColumns", "b")
     .option("evolvePartitionSpec", "true").mode("append").save(part_a))
    assert current_partition_spec(part_a) == ["b"]
    t = _tuples(part_a)
    assert set(t.values()) == {("a",), ("b",)}  # old files keep layout
    # mixed layout reads completely and correctly
    back = colf_spark.read.format("colf").load(part_a)
    assert back.count() == 500
    assert back.agg(F.sum("id")).first()[0] == sum(range(500))
    # subsequent plain appends inherit the NEW spec
    (_df(colf_spark, 500, 600).repartition(2, "b").write.format("colf")
     .mode("append").save(part_a))
    new = {f for f, cols in _tuples(part_a).items() if cols == ("b",)}
    assert len(new) >= 2


def test_compact_rewrites_to_current_spec(colf_spark, part_a):
    (_df(colf_spark, 300, 500).repartition(2, "b").write.format("colf")
     .option("partitionColumns", "b")
     .option("evolvePartitionSpec", "true").mode("append").save(part_a))
    compact(colf_spark, part_a, 2)
    # every live file now carries the CURRENT spec's tuple
    assert set(_tuples(part_a).values()) == {("b",)}
    back = colf_spark.read.format("colf").load(part_a)
    assert back.count() == 500
    assert back.agg(F.sum("id")).first()[0] == sum(range(500))


def test_evolve_api_metadata_only(colf_spark, part_a):
    files_before = sorted(live_files(part_a))
    v = evolve_partition_spec(part_a, ["b"])
    assert current_partition_spec(part_a) == ["b"]
    assert sorted(live_files(part_a)) == files_before  # no data movement
    snaps = load_snapshots(part_a)
    assert snaps[-1]["version"] == v and snaps[-1]["spec"] == ["b"]
    # un-partition future writes
    evolve_partition_spec(part_a, [])
    assert current_partition_spec(part_a) == []
    (_df(colf_spark, 300, 350).coalesce(1).write.format("colf")
     .mode("append").save(part_a))
    t = _tuples(part_a)
    assert any(cols == () for cols in t.values())


def test_evolve_api_validates(part_a):
    with pytest.raises(ColfFormatError):
        evolve_partition_spec(part_a, ["nope"])
    with pytest.raises(ColfFormatError):
        evolve_partition_spec(part_a, ["v"])  # float64


def test_legacy_inference_still_works(colf_spark, tmp_path):
    """A dataset whose snapshots never recorded a spec (simulated by
    stripping the key) still infers from the uniform manifest layout."""
    p = str(tmp_path / "legacy")
    (_df(colf_spark, 0, 200).repartition(2, "a").write.format("colf")
     .option("partitionColumns", "a").mode("overwrite").save(p))
    from columnar_format_spark.colf.datasource import (load_snapshots,
                                                       write_snapshots)

    snaps = load_snapshots(p)
    for s in snaps:
        s.pop("spec", None)
    write_snapshots(p, snaps)
    assert current_partition_spec(p) is None
    assert inferred_partition_spec(p) == ["a"]
    assert effective_partition_spec(p) == ["a"]
    # plain append inherits the inferred spec
    (_df(colf_spark, 200, 300).repartition(2, "a").write.format("colf")
     .mode("append").save(p))
    assert set(_tuples(p).values()) == {("a",)}


def test_vacuum_preserves_recorded_spec(colf_spark, part_a):
    """The spec is often recorded by a snapshot OLDER than vacuum's
    retention horizon (the defining overwrite); expiring that snapshot
    must carry the spec forward, or appends silently stop inheriting
    and rewrites drop the layout."""
    from columnar_format_spark.colf.maintenance import vacuum

    # several spec-less append commits push the spec-bearing v1 out of
    # any keep_last=1 horizon
    for lo in (300, 400):
        (_df(colf_spark, lo, lo + 50).repartition(2, "a")
         .write.format("colf").mode("append").save(part_a))
    assert current_partition_spec(part_a) == ["a"]
    vacuum(part_a, keep_last=1)
    snaps = load_snapshots(part_a)
    assert len(snaps) == 1
    assert current_partition_spec(part_a) == ["a"]
    # carried under the DEDICATED inherited key: the kept snapshot's
    # original contents stay byte-faithful — it never committed a
    # "spec", so vacuum must not fabricate one (history rewrite)
    assert "spec" not in snaps[0] and snaps[0]["inherited_spec"] == ["a"]
    # inheritance still works after the history truncation
    (_df(colf_spark, 500, 550).repartition(2, "a")
     .write.format("colf").mode("append").save(part_a))
    assert set(_tuples(part_a).values()) == {("a",)}
