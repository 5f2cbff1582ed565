"""Equality deletes (Iceberg v2's predicate-as-metadata flavor):
``delete_where(mode="eq")`` commits the parsed condition with a
sequence number — zero scans, zero files written — and readers mask
matching rows in files whose first-appearance version predates it.
NULL semantics, sequence gating, projection independence, schema
evolution, stripes, and the interplay with position deletes and CoW
rewrites are all pinned here."""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    load_snapshots,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    compact,
    delete_where,
    rollback,
    update_where,
    vacuum,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _df(colf_spark, lo, hi):
    return colf_spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.when(F.col("id") % 10 == 9, None)
        .otherwise((F.col("id") % 3).cast("string")).alias("g"))


@pytest.fixture()
def ds(colf_spark, tmp_path):
    p = str(tmp_path / "eqds")
    _df(colf_spark, 0, 200).repartition(4).write.format("colf") \
        .mode("overwrite").save(p)
    return p


def test_eq_delete_is_pure_metadata(colf_spark, ds):
    listing = sorted(os.listdir(ds))
    s = delete_where(colf_spark, ds, "g = '1'", mode="eq")
    assert s["mode"] == "merge-on-read-eq"
    assert s["n_deleted_rows"] is None        # unknowable without a scan
    assert s["n_delete_files"] == 0 and s["n_rewritten_files"] == 0
    assert sorted(os.listdir(ds)) == listing  # not one new byte... file
    got = colf_spark.read.format("colf").load(ds)
    # unfiltered action FIRST (filtered-then-unfiltered reuse of one
    # DataFrame is the upstream scan-cache hazard pinned in
    # test_pushdown_scan_reuse.py); ids ≡1 mod 3 minus the ≡9 mod 10
    # NULLs: 60 rows masked
    assert got.count() == 200 - (66 - 6)
    assert got.filter("g = '1'").count() == 0
    # NULL-g rows SURVIVE (NULL = '1' is not TRUE — SQL semantics)
    assert got.filter("g IS NULL").count() == 20
    # projection excluding g still masks identically
    assert (colf_spark.read.format("colf").option("columns", "k")
            .load(ds).count()) == 140
    # time travel to the pre-delete version is unmasked
    assert (colf_spark.read.format("colf").option("snapshot", "1")
            .load(ds).count()) == 200


def test_eq_sequence_gating_appends_survive(colf_spark, ds):
    delete_where(colf_spark, ds, "k < 50", mode="eq")
    assert colf_spark.read.format("colf").load(ds).count() == 150
    # appended rows MATCHING the predicate survive: the delete's
    # sequence predates the append (streaming-upsert semantics)
    _df(colf_spark, 0, 10).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 160
    assert got.filter("k < 10").count() == 10
    # a SECOND eq delete (later seq) masks the appended file too
    delete_where(colf_spark, ds, "k < 5", mode="eq")
    got2 = colf_spark.read.format("colf").load(ds)
    assert got2.count() == 155
    assert got2.filter("k < 5").count() == 0


def test_eq_delete_rejects_inexact_conditions(colf_spark, ds):
    with pytest.raises(ColfFormatError, match="exactly-evaluable"):
        delete_where(colf_spark, ds, "k < 5 OR g = '1'", mode="eq")
    with pytest.raises(ColfFormatError, match="exactly-evaluable"):
        delete_where(colf_spark, ds, "k + 1 = 5", mode="eq")
    with pytest.raises(ColfFormatError):
        delete_where(colf_spark, ds, "nope = 3", mode="eq")
    with pytest.raises(ColfFormatError, match="NaN"):
        delete_where(colf_spark, ds, "v > NaN", mode="eq")
    # the documented fallbacks handle those shapes
    s = delete_where(colf_spark, ds, "k < 5 OR g = '1'")
    assert s["n_deleted_rows"] == 63  # 5 low + 60 g='1' minus overlap 2


def test_eq_on_evolved_and_striped_files(colf_spark, tmp_path):
    """A file that PREDATES the predicate column reads it as typed
    NULLs — its rows survive (NULL comparison FALSE); v3 stripe tasks
    mask independently."""
    p = str(tmp_path / "eqevo")
    (colf_spark.range(100).select(F.col("id").cast("int").alias("k"))
     .coalesce(1).write.format("colf")
     .option("version", "3").option("stripeRows", "25")
     .mode("overwrite").save(p))
    (colf_spark.range(100, 150)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 2).cast("double").alias("extra"))
     .coalesce(1).write.format("colf")
     .option("version", "3").option("stripeRows", "25")
     .mode("append").save(p))
    delete_where(colf_spark, p, "extra = 1.0", mode="eq")
    got = colf_spark.read.format("colf").load(p)
    assert got.count() == 125                 # old file untouched
    assert got.filter("extra = 1.0").count() == 0
    assert got.filter("k < 100").count() == 100
    delete_where(colf_spark, p, "k >= 10 AND k < 60", mode="eq")
    got2 = colf_spark.read.format("colf").load(p)
    assert got2.count() == 75                 # masks span stripes
    assert got2.filter("k >= 10 and k < 60").count() == 0


def test_eq_interplay_with_positions_and_cow(colf_spark, ds):
    """All three delete flavors stack on one dataset; CoW verbs count
    only VISIBLE rows; compact materializes the whole stack."""
    delete_where(colf_spark, ds, "k >= 180", mode="eq")     # -20
    delete_where(colf_spark, ds, "k < 20", mode="mor")      # -20
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 160
    # CoW delete overlapping BOTH masked ranges: only visible rows
    s = delete_where(colf_spark, ds, "k >= 170 OR k < 30")
    assert s["n_deleted_rows"] == 20          # 170-179 and 20-29 only
    assert colf_spark.read.format("colf").load(ds).count() == 140
    # CoW metadata-planned delete on the eq-carrying dataset: the
    # visible-rows count comes from a reader count, stays exact
    s2 = delete_where(colf_spark, ds, "k >= 160")
    assert s2["n_deleted_rows"] == 10
    # update over the survivors
    u = update_where(colf_spark, ds, {"v": "v + 500"}, "k >= 150",
                     mode="mor")
    assert u["n_updated_rows"] == 10
    got3 = colf_spark.read.format("colf").load(ds)
    assert got3.count() == 130
    assert got3.filter("v >= 500").count() == 10
    compact(colf_spark, ds, 2, retain=True)
    snaps = load_snapshots(ds)
    assert "eq_deletes" not in snaps[-1] and "deletes" not in snaps[-1]
    vacuum(ds, keep_last=1)
    got4 = colf_spark.read.format("colf").load(ds)
    assert got4.count() == 130 and got4.filter("v >= 500").count() == 10


def test_eq_rollback_restores_predicates(colf_spark, ds):
    delete_where(colf_spark, ds, "k >= 100", mode="eq")     # v2
    assert colf_spark.read.format("colf").load(ds).count() == 100
    rollback(ds, 1)
    assert colf_spark.read.format("colf").load(ds).count() == 200
    rollback(ds, 2)
    assert colf_spark.read.format("colf").load(ds).count() == 100


def test_eq_delete_cli_sparkless(colf_spark, ds, capsys):
    """`eq_delete <ds> "<condition>"` — row-level DML from the shell
    with NO Spark session (the equality path is spark-free by
    construction), visible to every reader."""
    import json as _json
    import subprocess
    import sys as _sys

    from columnar_format_spark.colf.cli import main as cli_main

    assert cli_main(["eq_delete", ds, "k >= 150"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["mode"] == "merge-on-read-eq" and out["version"] == 2
    assert colf_spark.read.format("colf").load(ds).count() == 150
    # and it genuinely needs no JVM: run it as a bare subprocess
    r = subprocess.run(
        [_sys.executable, "-m", "columnar_format_spark.colf.cli",
         "eq_delete", ds, "k < 10"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"})
    assert r.returncode == 0, r.stderr
    assert _json.loads(r.stdout)["version"] == 3
    assert colf_spark.read.format("colf").load(ds).count() == 140
    # bad condition refuses loudly from the shell too
    r2 = subprocess.run(
        [_sys.executable, "-m", "columnar_format_spark.colf.cli",
         "eq_delete", ds, "k < 5 OR g = '1'"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"})
    assert r2.returncode != 0


def test_eq_projection_away_on_evolved_file(colf_spark, tmp_path):
    """The nastiest composition: the eq predicate column is BOTH
    projected away by the query AND absent from an old evolved file —
    the mask must still be exact (typed-NULL fill from the spec's own
    coltype, never from the projected schema)."""
    p = str(tmp_path / "eqproj")
    (colf_spark.range(100).select(F.col("id").cast("int").alias("k"))
     .coalesce(1).write.format("colf").mode("overwrite").save(p))
    (colf_spark.range(100, 150)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 2).cast("double").alias("extra"))
     .coalesce(1).write.format("colf").mode("append").save(p))
    delete_where(colf_spark, p, "extra = 0.0", mode="eq")
    # project ONLY k: the old file's rows all survive (extra is NULL
    # there), the new file loses its 25 extra=0.0 rows
    got = (colf_spark.read.format("colf").option("columns", "k")
           .load(p))
    assert got.count() == 125
    full = colf_spark.read.format("colf").load(p)
    assert full.count() == 125
    assert full.filter("extra = 0.0").count() == 0
    assert full.filter("k < 100").count() == 100


def test_vacuum_preserves_eq_sequence_gating(colf_spark, ds):
    """Fuzz-found (seed 314159): vacuum prunes the metadata log, and a
    file's first-appearance version in the PRUNED log is newer than
    its true first version — without the inherited_fseq carry, an old
    file would suddenly look newer than the equality delete masking it
    and its deleted rows would resurrect. The carry must hold through
    REPEATED vacuums and further commits."""
    delete_where(colf_spark, ds, "k >= 150", mode="eq")    # v2, seq 2
    assert colf_spark.read.format("colf").load(ds).count() == 150
    vacuum(ds, keep_last=1)                                # log = [v2]
    assert colf_spark.read.format("colf").load(ds).count() == 150
    # survives further commits and a second prune
    _df(colf_spark, 300, 310).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    assert colf_spark.read.format("colf").load(ds).count() == 160
    vacuum(ds, keep_last=1)
    assert colf_spark.read.format("colf").load(ds).count() == 160
    # a post-vacuum eq delete still masks the carried-forward files
    delete_where(colf_spark, ds, "k < 10", mode="eq")
    assert colf_spark.read.format("colf").load(ds).count() == 150
