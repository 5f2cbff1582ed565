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


# ---------------------------------------------------------------------------
# FIELD-ID schema evolution (rename / drop / widen): the Iceberg model
# on top of the additive union — ids embedded in post-evolution files,
# a frozen bootstrap name mapping resolving reference-written/
# pre-evolution files, schema resolved at the read's snapshot.

def _evo_ds(colf_spark, tmp_path, name="evods"):
    p = str(tmp_path / name)
    (colf_spark.range(0, 100)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 7).cast("double").alias("v"),
             (F.col("id") % 3).cast("string").alias("g"))
     .repartition(2).write.format("colf").mode("overwrite").save(p))
    return p


def test_rename_reads_across_old_and_new_files(colf_spark, tmp_path):
    from columnar_format_spark.colf.maintenance import rename_column

    p = _evo_ds(colf_spark, tmp_path)
    rename_column(p, "v", "score")
    # new-name append lands next to old-name files
    (colf_spark.range(100, 150)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 7).cast("double").alias("score"),
             (F.col("id") % 3).cast("string").alias("g"))
     .coalesce(1).write.format("colf").mode("append").save(p))
    got = colf_spark.read.format("colf").load(p)
    assert got.columns == ["k", "score", "g"]
    assert got.count() == 150
    # the renamed column is ONE column across both file generations
    assert (colf_spark.read.format("colf").load(p)
            .filter("score IS NULL").count() == 0)
    # filters push down by the new name; old files stay correct
    assert (colf_spark.read.format("colf").load(p)
            .filter("score >= 3").count()
            == sum(1 for i in range(150) if i % 7 >= 3))
    # time travel to the pre-rename version shows the old name
    tv = colf_spark.read.format("colf").option("snapshot", "1").load(p)
    assert tv.columns == ["k", "v", "g"]
    assert tv.count() == 100


def test_rename_guards(colf_spark, tmp_path):
    from columnar_format_spark.colf.maintenance import (delete_where,
                                                        rename_column)

    p = _evo_ds(colf_spark, tmp_path)
    with pytest.raises(ColfFormatError, match="unknown column"):
        rename_column(p, "nope", "x")
    with pytest.raises(ColfFormatError, match="taken"):
        rename_column(p, "v", "g")
    with pytest.raises(ColfFormatError, match="invalid column name"):
        rename_column(p, "v", "bad name")
    delete_where(colf_spark, p, "g = '0'", mode="eq")
    with pytest.raises(ColfFormatError, match="equality deletes"):
        rename_column(p, "g", "grp")
    # other columns still evolvable
    rename_column(p, "v", "score")


def test_rename_guard_on_layout_columns(colf_spark, tmp_path):
    from columnar_format_spark.colf.maintenance import (rename_column,
                                                        set_sort_order)

    p = str(tmp_path / "layoutds")
    (colf_spark.range(0, 50)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 5).cast("string").alias("g"))
     .write.format("colf").option("partitionColumns", "g")
     .mode("overwrite").save(p))
    with pytest.raises(ColfFormatError, match="partition spec"):
        rename_column(p, "g", "grp")
    set_sort_order(p, ["k"])
    with pytest.raises(ColfFormatError, match="sort order"):
        rename_column(p, "k", "key")


def test_drop_hides_without_resurrection(colf_spark, tmp_path):
    from columnar_format_spark.colf.maintenance import compact, drop_column

    p = _evo_ds(colf_spark, tmp_path)
    drop_column(p, "g")
    got = colf_spark.read.format("colf").load(p)
    assert got.columns == ["k", "v"]
    # re-adding the NAME creates a fresh field: old data stays hidden,
    # even after a compaction rewrites the old files
    (colf_spark.range(100, 110)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 7).cast("double").alias("v"),
             F.lit(9.0).alias("g"))
     .coalesce(1).write.format("colf").mode("append").save(p))
    assert (colf_spark.read.format("colf").load(p)
            .filter("g IS NOT NULL").count() == 10)
    compact(colf_spark, p, 2, retain=True)
    assert (colf_spark.read.format("colf").load(p)
            .filter("g IS NOT NULL").count() == 10)
    # time travel pre-drop still sees the old column
    tv = colf_spark.read.format("colf").option("snapshot", "1").load(p)
    assert "g" in tv.columns
    with pytest.raises(ColfFormatError, match="only column"):
        ds2 = str(tmp_path / "one")
        (colf_spark.range(3).select(F.col("id").cast("int").alias("k"))
         .write.format("colf").mode("overwrite").save(ds2))
        drop_column(ds2, "k")


def test_widen_int32_to_float64(colf_spark, tmp_path):
    from columnar_format_spark.colf.maintenance import widen_column

    p = _evo_ds(colf_spark, tmp_path)
    widen_column(p, "k")
    got = colf_spark.read.format("colf").load(p)
    assert dict(got.dtypes)["k"] == "double"
    assert got.agg(F.sum("k")).first()[0] == sum(range(100))
    # appends must write the widened type
    with pytest.raises(Exception, match="float64"):
        (colf_spark.range(100, 110)
         .select(F.col("id").cast("int").alias("k"),
                 F.lit(0.0).alias("v"), F.lit("x").alias("g"))
         .coalesce(1).write.format("colf").mode("append").save(p))
    (colf_spark.range(100, 110)
     .select(F.col("id").cast("double").alias("k"),
             F.lit(0.0).alias("v"), F.lit("x").alias("g"))
     .coalesce(1).write.format("colf").mode("append").save(p))
    assert (colf_spark.read.format("colf").load(p)
            .agg(F.sum("k")).first()[0] == sum(range(110)))
    with pytest.raises(ColfFormatError, match="only legal promotion"):
        widen_column(p, "g")


def test_evolved_dataset_mor_masks_and_cdc(colf_spark, tmp_path):
    """Interplay: MoR deletes, the change feed, and a rename all on one
    dataset — masks stay exact through by-ID resolution and CDC emits
    in the CURRENT schema."""
    from columnar_format_spark.colf.maintenance import (delete_where,
                                                        rename_column)

    p = _evo_ds(colf_spark, tmp_path)
    delete_where(colf_spark, p, "v >= 5", mode="mor")     # v2: id%7 in {5,6}
    rename_column(p, "v", "score")                        # v3
    (colf_spark.range(100, 120)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 7).cast("double").alias("score"),
             (F.col("id") % 3).cast("string").alias("g"))
     .coalesce(1).write.format("colf").mode("append").save(p))  # v4
    # position deletes address the ORIGINAL files only; the v4 append
    # is untouched by them
    expect = sum(1 for i in range(100) if i % 7 < 5) + 20
    assert colf_spark.read.format("colf").load(p).count() == expect
    cdc = (colf_spark.read.format("colf")
           .option("readChangeFeed", "true").load(p))
    assert "score" in cdc.columns and "v" not in cdc.columns
    rows = cdc.collect()
    n_del = sum(1 for r in rows if r["_change_type"] == "delete")
    n_ins = sum(1 for r in rows if r["_change_type"] == "insert")
    assert (n_ins - n_del) == expect
    # deleted rows surface under the current name with their values
    assert all(r["score"] >= 5 for r in rows
               if r["_change_type"] == "delete")


def test_timestamp_as_of_resolves_era_schema(colf_spark, tmp_path):
    """timestampAsOf on an EVOLVED dataset must declare (and read) the
    asOf era's schema, exactly like option snapshot=N — schema() used
    to ignore the option and leak the head schema into the past."""
    from columnar_format_spark.colf.datasource import (load_snapshots,
                                                       write_snapshots)
    from columnar_format_spark.colf.maintenance import rename_column

    p = str(tmp_path / "ds")
    colf_spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "k int, v double") \
        .coalesce(1).write.format("colf").mode("overwrite").save(p)
    rename_column(p, "v", "score")
    colf_spark.createDataFrame(
        [(10, 1.5)], "k int, score double").coalesce(1) \
        .write.format("colf").mode("append").save(p)
    # pin commit times: v1 @1000, later commits @2000+
    snaps = load_snapshots(p)
    for s in snaps:
        s["ts"] = 1000.0 if s["version"] == 1 else 2000.0 + s["version"]
    write_snapshots(p, snaps)

    past = colf_spark.read.format("colf") \
        .option("timestampAsOf", "1500").load(p)
    assert past.columns == ["k", "v"]  # era schema, PRE-rename name
    assert sorted(r["v"] for r in past.collect()) == [float(i)
                                                      for i in range(6)]
    now = colf_spark.read.format("colf").load(p)
    assert now.columns == ["k", "score"]
    assert now.filter("score IS NULL").count() == 0


def test_rename_refused_while_historical_eq_delete_retained(
        colf_spark, tmp_path):
    """Even after compact() materializes an equality delete, the
    retained log still holds its predicate — a CDC replay from 0
    re-evaluates it against the CURRENT schema, so renaming/dropping
    the predicate column is refused until the commit is vacuumed."""
    from columnar_format_spark.colf.format import ColfFormatError
    from columnar_format_spark.colf.maintenance import (
        compact, delete_where, rename_column, vacuum)

    p = str(tmp_path / "ds")
    colf_spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "k int, v double") \
        .coalesce(1).write.format("colf").mode("overwrite").save(p)
    delete_where(colf_spark, p, "k < 5", mode="eq")
    compact(colf_spark, p, 1, retain=True)  # live eq list now empty

    with pytest.raises(ColfFormatError, match="retained equality-delete"):
        rename_column(p, "k", "key")
    # full-history CDC still replays (this is what the guard protects)
    rows = colf_spark.read.format("colf") \
        .option("readChangeFeed", "true").load(p).collect()
    assert {r["_change_type"] for r in rows} == {"insert", "delete"}

    vacuum(p, keep_last=1)  # prunes the eq commit from the log
    rename_column(p, "k", "key")  # now legal
    assert colf_spark.read.format("colf").load(p).columns == ["key", "v"]


def test_maintenance_survives_rename_of_sketched_column(
        colf_spark, tmp_path):
    """Round-10 advice regression: bloom/NDV sidecar keys are PHYSICAL
    names, so after a metadata-only rename of a sketched column every
    maintenance rewrite used to fail the writer's unknown-column check
    (maintenance bricked until sketches were hand-cleared). The names
    now translate through the field-ID schema; rewrites re-sketch
    under the NEW name and table_ndv merges mixed-era sketches."""
    from columnar_format_spark.colf.datasource import load_blooms
    from columnar_format_spark.colf.maintenance import (
        compact, delete_where, rename_column, table_ndv)

    p = str(tmp_path / "ds")
    (colf_spark.range(0, 4000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("int").alias("g"))
     .repartition(3).write.format("colf")
     .option("bloomColumns", "k")
     .option("ndvColumns", "k,g").option("ndvK", "256")
     .mode("overwrite").save(p))
    rename_column(p, "k", "key")

    # mixed-era manifests (all files still keyed "k") merge under the
    # current name
    nd0 = table_ndv(p, columns=["key"])
    assert abs(nd0["key"]["estimate"] - 4000) / 4000 < 0.16

    # CoW delete rewrites the touched files — previously ColfFormatError
    res = delete_where(colf_spark, p, "key < 1000")
    assert res["n_deleted_rows"] == 1000
    compact(colf_spark, p, 2, retain=True)

    back = colf_spark.read.format("colf").load(p)
    assert back.columns == ["key", "g"]
    assert back.count() == 3000
    # fresh sketches and blooms live under the NEW physical name
    nd = table_ndv(p, columns=["key", "g"])
    assert abs(nd["key"]["estimate"] - 3000) / 3000 < 0.16
    assert nd["g"] == {"estimate": 5.0, "exact": True, "rsd": 0.0}
    # live files' blooms carry the NEW name (dead files' entries
    # linger in the sidecar until vacuum reclaims them)
    blo = load_blooms(p)
    live = [os.path.basename(f) for f in live_files(p)]
    assert live and all("key" in blo[b]["columns"] for b in live)


def test_maintenance_survives_drop_of_sketched_column(
        colf_spark, tmp_path):
    """Dropping a sketched column must not brick later rewrites: the
    dead name silently leaves the ndv/bloom option lists, and the
    dropped column's sketches vanish from table_ndv instead of
    poisoning its missing-sketch refusal."""
    from columnar_format_spark.colf.maintenance import (
        compact, drop_column, table_ndv)

    p = str(tmp_path / "ds")
    (colf_spark.range(0, 2000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 7).cast("int").alias("junk"))
     .repartition(2).write.format("colf")
     .option("bloomColumns", "junk")
     .option("ndvColumns", "k,junk").option("ndvK", "256")
     .mode("overwrite").save(p))
    drop_column(p, "junk")

    assert sorted(table_ndv(p)) == ["k"]  # junk's sketches are gone
    compact(colf_spark, p, 1, retain=True)  # previously bricked
    back = colf_spark.read.format("colf").load(p)
    assert back.columns == ["k"]
    assert back.count() == 2000
    nd = table_ndv(p, columns=["k"])
    assert abs(nd["k"]["estimate"] - 2000) / 2000 < 0.16
