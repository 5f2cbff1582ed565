"""Recorded z-order clustering (Delta OPTIMIZE ZORDER's model):
``set_clustering`` is a metadata commit; ``compact()`` re-clusters the
layout by the rank-normalized Morton interleave so each file's zone
maps cover a small RECTANGLE of the key space; vacuum carries the
metadata past its adopting snapshot; clustering and sort order share
one layout slot."""

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    current_clustering,
    current_sort_order,
    load_manifest,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    compact,
    set_clustering,
    set_sort_order,
    vacuum,
)

N = 40_000
FILES = 16


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _df(colf_spark):
    # two independent scrambled keys over a wide range (odd-constant
    # scaling) — the shape where fixed-width interleave degrades and
    # hash layout prunes nothing
    return colf_spark.range(N).select(
        ((F.col("id") * 48271) % N).cast("int").alias("a"),
        ((F.col("id") * 69621) % N).cast("int").alias("b"),
        (F.col("id") % 9).cast("double").alias("v"))


@pytest.fixture()
def ds(colf_spark, tmp_path):
    p = str(tmp_path / "clds")
    _df(colf_spark).repartition(8).write.format("colf") \
        .mode("overwrite").save(p)
    return p


def _overlapping(path, lo_a, hi_a, lo_b, hi_b):
    man = load_manifest(path)
    n = 0
    for s in man.values():
        a, b = s["columns"]["a"], s["columns"]["b"]
        if (a["min"] <= hi_a and a["max"] >= lo_a
                and b["min"] <= hi_b and b["max"] >= lo_b):
            n += 1
    return n


def test_compact_reclusters_by_recorded_zorder(colf_spark, ds):
    assert current_clustering(ds) is None
    v = set_clustering(ds, ["a", "b"])
    assert v == 2 and current_clustering(ds) == ["a", "b"]
    # hash layout: a 10%x10% rectangle overlaps everything
    lo_a, hi_a = N * 3 // 10, N * 4 // 10
    before = colf_spark.read.format("colf").load(ds).filter(
        (F.col("a").between(lo_a, hi_a))
        & (F.col("b").between(lo_a, hi_a))).agg(
        F.count(F.lit(1)), F.sum("v")).first()
    compact(colf_spark, ds, FILES)
    assert current_clustering(ds) == ["a", "b"]
    hit = _overlapping(ds, lo_a, hi_a, lo_a, hi_a)
    assert hit * 2 <= FILES, (
        f"z-clustered rectangle overlaps {hit}/{FILES} files — "
        f"compaction is not restoring multi-column pruning")
    # layout never changes an answer
    after = colf_spark.read.format("colf").load(ds).filter(
        (F.col("a").between(lo_a, hi_a))
        & (F.col("b").between(lo_a, hi_a))).agg(
        F.count(F.lit(1)), F.sum("v")).first()
    assert tuple(after) == tuple(before)
    assert colf_spark.read.format("colf").load(ds).count() == N


def test_clustering_and_sort_share_one_slot(colf_spark, ds):
    set_clustering(ds, ["a", "b"])
    set_sort_order(ds, ["a"])
    assert current_sort_order(ds) == ["a"]
    assert current_clustering(ds) in (None, [])
    set_clustering(ds, ["a", "b"])
    assert current_clustering(ds) == ["a", "b"]
    assert current_sort_order(ds) in (None, [])


def test_clustering_guards(colf_spark, ds, tmp_path):
    with pytest.raises(ColfFormatError):
        set_clustering(ds, ["a"])          # 1-D z-order is a sort
    with pytest.raises(ColfFormatError):
        set_clustering(ds, ["a", "nope"])  # unknown column
    p = str(tmp_path / "strds")
    (colf_spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 3).cast("string").alias("s"))
     .coalesce(1).write.format("colf").mode("overwrite").save(p))
    with pytest.raises(ColfFormatError):
        set_clustering(p, ["k", "s"])      # utf8 dimension


def test_vacuum_carries_clustering(colf_spark, ds):
    set_clustering(ds, ["a", "b"])
    for _ in range(2):  # push the cluster-bearing snapshot out
        (_df(colf_spark).limit(100).coalesce(1).write.format("colf")
         .mode("append").save(ds))
    vacuum(ds, keep_last=1)
    assert current_clustering(ds) == ["a", "b"]
    # compaction after the truncation still re-clusters
    compact(colf_spark, ds, FILES)
    lo, hi = N * 3 // 10, N * 4 // 10
    assert _overlapping(ds, lo, hi, lo, hi) * 2 <= FILES


def test_set_clustering_cli(colf_spark, ds, capsys):
    import json as _json

    from columnar_format_spark.colf.cli import main as cli_main

    assert cli_main(["set_clustering", ds, "a", "b"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["cluster"] == ["a", "b"]
    assert cli_main(["partitions", ds]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["clustering"] == ["a", "b"]


def test_zorder_helpers_match_numpy_reference(colf_spark):
    """cluster.py's JVM-side rank-bucket and Morton interleave must
    agree with a plain numpy re-implementation on the same data."""
    import numpy as np
    from pyspark.sql import functions as F

    from columnar_format_spark.colf.cluster import (
        interleave_ranks, rank_bucket, rank_cuts, with_zorder)

    rng = np.random.RandomState(3)
    a = (rng.randn(2000) * 1000).astype(int)
    b = rng.randint(0, 10, 2000)  # heavy ties: bucket must still work
    df = colf_spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a long, b long")

    cuts = rank_cuts(df, ["a", "b"], bits=4)
    got = (df.withColumn("ra", rank_bucket("a", cuts[0]))
           .withColumn("rb", rank_bucket("b", cuts[1]))
           .withColumn("z", interleave_ranks(["ra", "rb"], bits=4))
           .collect())
    for r in got:
        ra = int(np.sum(np.asarray(cuts[0]) <= r["a"]))
        rb = int(np.sum(np.asarray(cuts[1]) <= r["b"]))
        assert (r["ra"], r["rb"]) == (ra, rb)
        z = 0
        for i in range(4):
            z |= ((ra >> i) & 1) << (2 * i)
            z |= ((rb >> i) & 1) << (2 * i + 1)
        assert r["z"] == z
    # rank_bucket is monotone -> range predicates survive the transform
    rows = sorted((r["a"], r["ra"]) for r in got)
    assert all(x[1] <= y[1] for x, y in zip(rows, rows[1:]))
    # with_zorder adds exactly _zval and drops its scratch columns
    cols = with_zorder(df, ["a", "b"], bits=4).columns
    assert cols == ["a", "b", "_zval"]


def test_interleave_dimension_cap():
    import pytest as _pytest

    from columnar_format_spark.colf.cluster import interleave_ranks

    with _pytest.raises(ValueError):
        interleave_ranks([f"c{i}" for i in range(8)], bits=8)  # 64 > 62


def test_append_sort_order_clears_clustering(colf_spark, ds):
    """The one-layout-slot invariant holds for WRITER-recorded sort
    orders too: an append carrying an explicit ``sortOrder`` records
    the new sort AND clears a previously recorded clustering —
    otherwise compact() would keep z-ordering by the stale keys,
    ignoring the newer recorded sort."""
    set_clustering(ds, ["a", "b"])
    _df(colf_spark).limit(10).coalesce(1).write.format("colf") \
        .option("sortOrder", "a").mode("append").save(ds)
    assert current_sort_order(ds) == ["a"]
    assert current_clustering(ds) in (None, [])
    # and an append with NO sortOrder (inheriting) must not touch the
    # recorded clustering
    set_clustering(ds, ["a", "b"])
    _df(colf_spark).limit(10).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    assert current_clustering(ds) == ["a", "b"]
