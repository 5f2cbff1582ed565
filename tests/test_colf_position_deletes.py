"""Merge-on-read position deletes (Iceberg v2's model): a
``delete_where(..., mode="mor")`` writes (file, pos) sidecars and one
metadata commit — NO data file is rewritten — and every reader masks
the deleted ordinals at decode time. compact() materializes deletes
away; vacuum() reclaims expired sidecars; rollback restores the
target's delete list."""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    load_snapshots,
    register,
)
from columnar_format_spark.colf.maintenance import (
    compact,
    delete_where,
    rollback,
    snapshot_changelog,
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
        (F.col("id") % 3).cast("string").alias("g"))


@pytest.fixture()
def ds(colf_spark, tmp_path):
    p = str(tmp_path / "mords")
    _df(colf_spark, 0, 200).repartition(4).write.format("colf") \
        .mode("overwrite").save(p)
    return p


def _data_files(p):
    return {f: os.path.getmtime(os.path.join(p, f))
            for f in os.listdir(p) if f.endswith(".colf")}


def test_mor_delete_rewrites_nothing(colf_spark, ds):
    """THE merge-on-read contract: the delete commits without touching
    any data file — same basenames, same mtimes, same bytes — yet
    reads mask the rows out, and the pre-delete snapshot still time
    travels to the full count."""
    before = _data_files(ds)
    stats = delete_where(colf_spark, ds, "k >= 150", mode="mor")
    assert stats["mode"] == "merge-on-read"
    assert stats["n_deleted_rows"] == 50
    assert stats["n_rewritten_files"] == 0
    assert stats["n_delete_files"] >= 1
    assert _data_files(ds) == before          # zero data-file churn
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 150
    assert got.agg(F.max("k")).first()[0] == 149
    tt = (colf_spark.read.format("colf").option("snapshot", "1")
          .load(ds))
    assert tt.count() == 200                   # time travel unaffected
    # the sidecars are regular COLF files, listed in the snapshot
    snaps = load_snapshots(ds)
    assert all(b.endswith(".colfd") for b in snaps[-1]["deletes"])


def test_mor_deletes_stack_and_appends_inherit(colf_spark, ds):
    delete_where(colf_spark, ds, "k < 10", mode="mor")
    delete_where(colf_spark, ds, "k >= 190", mode="mor")
    assert colf_spark.read.format("colf").load(ds).count() == 180
    _df(colf_spark, 500, 510).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 190                  # append inherits masks
    # a re-delete of already-masked rows is an exact noop (the scan
    # itself reads through the masks)
    s = delete_where(colf_spark, ds, "k < 10", mode="mor")
    assert s["n_deleted_rows"] == 0 and s["n_delete_files"] == 0
    assert len(load_snapshots(ds)) == 4        # noop did not commit


def test_mor_on_v3_striped_files(colf_spark, tmp_path):
    """Positions address ORIGINAL file ordinals; a v3 scan plans one
    task per stripe, so each task must re-base the mask by its
    stripe's start ordinal. Wrong re-basing would delete the wrong
    rows in every stripe but the first."""
    p = str(tmp_path / "morv3")
    (_df(colf_spark, 0, 10_000).coalesce(1).write.format("colf")
     .option("version", "3").option("stripeRows", "1000")
     .mode("overwrite").save(p))
    stats = delete_where(colf_spark, p, "k % 100 = 7", mode="mor")
    assert stats["n_deleted_rows"] == 100
    got = colf_spark.read.format("colf").load(p)
    assert got.count() == 9_900
    assert got.filter("k % 100 = 7").count() == 0
    # sums prove exactly the right rows vanished
    expect = sum(k for k in range(10_000) if k % 100 != 7)
    assert got.agg(F.sum(F.col("k").cast("bigint"))).first()[0] == expect
    # a filtered read composes with the mask (residual filter path)
    assert got.filter("k >= 9000").count() == 990


def test_mor_update_and_cow_interplay(colf_spark, ds):
    """CoW verbs on a MoR-carrying dataset: the rewrite materializes
    the touched files' masks (reader-applied), keeps untouched files'
    masks live, and counts only VISIBLE rows as deleted/updated."""
    delete_where(colf_spark, ds, "k >= 100 and k < 150", mode="mor")
    assert colf_spark.read.format("colf").load(ds).count() == 150
    # CoW delete overlapping the masked range: only visible rows count
    s = delete_where(colf_spark, ds, "k >= 120")  # 120-149 masked already
    assert s["n_deleted_rows"] == 50              # 150-199 visible only
    assert colf_spark.read.format("colf").load(ds).count() == 100
    # CoW update over the survivor set stays exact (fresh load per
    # action — the upstream scan-cache hazard pinned in
    # test_pushdown_scan_reuse.py forbids filtered-then-unfiltered
    # reuse of ONE DataFrame object)
    u = update_where(colf_spark, ds, {"v": "v + 1000"}, "k < 5")
    assert u["n_updated_rows"] == 5
    got = colf_spark.read.format("colf").load(ds)
    assert got.filter("v >= 1000").count() == 5
    assert colf_spark.read.format("colf").load(ds).count() == 100


def test_mor_changelog_and_rollback(colf_spark, ds):
    delete_where(colf_spark, ds, "k >= 195", mode="mor")   # v2: -5
    cl = snapshot_changelog(colf_spark, ds, 1, 2).collect()
    assert sorted((r["_change_type"], r["k"]) for r in cl) == [
        ("delete", k) for k in range(195, 200)]
    # rollback restores the pre-delete visibility (the head's delete
    # list must NOT leak into the restored version)
    rollback(ds, 1)
    assert colf_spark.read.format("colf").load(ds).count() == 200
    # and rolling forward again restores the masks
    rollback(ds, 2)
    assert colf_spark.read.format("colf").load(ds).count() == 195


def test_mor_compact_materializes_vacuum_reclaims(colf_spark, ds):
    delete_where(colf_spark, ds, "k < 20", mode="mor")
    assert compact(colf_spark, ds, 2, retain=True) == 2
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 180
    assert got.agg(F.min("k")).first()[0] == 20
    snaps = load_snapshots(ds)
    assert "deletes" not in snaps[-1]          # materialized away
    removed = vacuum(ds, keep_last=1)
    assert any(b.endswith(".colfd") for b in removed)
    assert not any(f.endswith(".colfd") for f in os.listdir(ds))
    assert colf_spark.read.format("colf").load(ds).count() == 180
    # vacuum with the delete-carrying snapshot still retained keeps
    # the sidecars (their loss would resurrect rows)
    delete_where(colf_spark, ds, "k >= 170", mode="mor")
    vacuum(ds, keep_last=2)
    assert colf_spark.read.format("colf").load(ds).count() == 150


def test_pos_column_is_original_ordinal(colf_spark, ds):
    """The virtual _colf_pos column addresses pre-mask ordinals: after
    a MoR delete, surviving rows keep their ORIGINAL positions (so a
    second delete's sidecar coordinates stay valid), and it composes
    with pushed filters."""
    import pyspark.sql.functions as Fx

    delete_where(colf_spark, ds, "k < 50", mode="mor")
    got = (colf_spark.read.format("colf")
           .option("withFileColumn", "true")
           .option("withPosColumn", "true").load(ds))
    rows = got.select("k", "_colf_file", "_colf_pos").collect()
    assert len(rows) == 150
    # per file, positions are unique and within the file's row count
    seen = {}
    for r in rows:
        key = (r["_colf_file"], r["_colf_pos"])
        assert key not in seen
        seen[key] = r["k"]
    # filtered read keeps the same (file, pos) → k mapping
    sub = (got.filter(Fx.col("k") >= 180)
           .select("k", "_colf_file", "_colf_pos").collect())
    assert len(sub) == 20
    for r in sub:
        assert seen[(r["_colf_file"], r["_colf_pos"])] == r["k"]


def test_mor_update_delete_plus_append(colf_spark, ds):
    """update_where(mode="mor"): matched rows masked via sidecars, new
    images appended, pre-existing files byte-untouched — and the verb
    algebra (exactly-once visibility of images, time-travel isolation,
    stacking with MoR deletes) holds through the reader."""
    before = _data_files(ds)
    s = update_where(colf_spark, ds, {"v": "v + 1000"}, "k < 10",
                     mode="mor")
    assert s["mode"] == "merge-on-read"
    assert (s["n_updated_rows"], s["n_rewritten_files"]) == (10, 0)
    assert s["n_delete_files"] >= 1 and s["n_new_files"] >= 1
    # pre-existing files untouched; the appended image files are new
    after = _data_files(ds)
    assert all(after[f] == m for f, m in before.items())
    assert len(after) == len(before) + s["n_new_files"]
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 200
    assert got.filter("v >= 1000").count() == 10
    assert got.filter("k < 10 and v < 1000").count() == 0
    assert (colf_spark.read.format("colf").option("snapshot", "1")
            .load(ds).filter("v >= 1000").count()) == 0
    # an updated image can itself be MoR-deleted
    d = delete_where(colf_spark, ds, "k = 3", mode="mor")
    assert d["n_deleted_rows"] == 1
    got2 = colf_spark.read.format("colf").load(ds)
    assert got2.count() == 199 and got2.filter("k = 3").count() == 0
    # compact materializes the whole stack; vacuum reclaims
    compact(colf_spark, ds, 2, retain=True)
    vacuum(ds, keep_last=1)
    assert not any(f.endswith(".colfd") for f in os.listdir(ds))
    got3 = colf_spark.read.format("colf").load(ds)
    assert got3.count() == 199 and got3.filter("v >= 1000").count() == 9


def test_stream_refuses_live_deletes_unless_opted_in(colf_spark, ds,
                                                     tmp_path):
    """A file-granularity stream cannot retract already-emitted rows,
    so a dataset whose published head carries live MoR masks refuses
    to start streaming (Delta's ignoreDeletes contract); compacting
    the masks away unblocks it; option('ignoreDeletes','true') is the
    explicit mask-blind opt-in."""
    import glob

    from columnar_format_spark.colf.format import ColfFormatError

    delete_where(colf_spark, ds, "k < 50", mode="mor")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain(reader):
        q = (reader.load(ds).writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        files = glob.glob(out + "/*.parquet")
        return colf_spark.read.parquet(out).count() if files else 0

    with pytest.raises(Exception, match="ignoreDeletes"):
        drain(colf_spark.readStream.format("colf"))
    # opt-in streams mask-blind (documented): all 200 original rows
    n = drain(colf_spark.readStream.format("colf")
              .option("ignoreDeletes", "true"))
    assert n == 200
    # materializing the masks AND pruning the replayable lineage
    # (compact + vacuum — a fresh stream replays per-commit file
    # additions, so pre-compaction commits would re-deliver the old
    # files mask-blind) unblocks clean streaming
    compact(colf_spark, ds, 2, retain=True)
    vacuum(ds, keep_last=1)
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")

    q = (colf_spark.readStream.format("colf").load(ds)
         .writeStream.format("parquet").option("path", out2)
         .option("checkpointLocation", ckpt2)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert colf_spark.read.parquet(out2).count() == 150


def test_mor_merge_masks_matches_appends_source(colf_spark, ds):
    """merge_into(mode="mor"): matched rows masked via position
    sidecars (exact for key TUPLES — not per-column predicates), whole
    source appended, pre-existing files untouched; re-merging the same
    source is idempotent on the visible state."""
    from columnar_format_spark.colf.maintenance import merge_into

    src = (colf_spark.range(10, 20)
           .select(F.col("id").cast("int").alias("k"),
                   F.lit(1000.0).alias("v"),
                   F.lit("U").alias("g"))
           .unionAll(colf_spark.range(500, 505)
                     .select(F.col("id").cast("int").alias("k"),
                             F.lit(-1.0).alias("v"),
                             F.lit("N").alias("g"))))
    before = _data_files(ds)
    s = merge_into(colf_spark, ds, src, ["k"], mode="mor")
    assert s["mode"] == "merge-on-read"
    assert (s["n_replaced_rows"], s["n_source_rows"]) == (10, 15)
    assert s["n_rewritten_files"] == 0
    assert s["n_delete_files"] >= 1 and s["n_new_files"] >= 1
    after = _data_files(ds)
    assert all(after[f] == m for f, m in before.items())
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 205
    assert got.filter("g = 'U'").count() == 10
    assert got.filter("k >= 10 and k < 20 and g != 'U'").count() == 0
    assert got.filter("k >= 500").count() == 5
    # duplicate source keys rejected in MoR mode too
    with pytest.raises(ValueError, match="duplicate"):
        merge_into(colf_spark, ds, src.unionAll(src.limit(1)), ["k"],
                   mode="mor")
    # idempotent re-merge: its own appended rows now match and mask
    s2 = merge_into(colf_spark, ds, src, ["k"], mode="mor")
    assert s2["n_replaced_rows"] == 15
    got2 = colf_spark.read.format("colf").load(ds)
    assert got2.count() == 205
    assert got2.filter("g = 'U'").count() == 10
    # the full stack compacts + vacuums away
    compact(colf_spark, ds, 2, retain=True)
    vacuum(ds, keep_last=1)
    got3 = colf_spark.read.format("colf").load(ds)
    assert got3.count() == 205 and got3.filter("g = 'U'").count() == 10


def test_mor_streaming_cdc_upsert(colf_spark, ds, tmp_path):
    """The shape MoR exists for: a streaming CDC feed upserted into a
    live COLF table via foreachBatch + merge_into(mode='mor') — every
    micro-batch is one metadata commit (masks + appended batch), no
    file is ever rewritten, and the table converges to last-write-wins
    per key."""
    import glob
    import json

    from columnar_format_spark.colf.maintenance import merge_into

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    files_before = set(_data_files(ds))

    def upsert(batch_df, batch_id):
        merge_into(batch_df.sparkSession, ds, batch_df, ["k"],
                   mode="mor")

    # two CDC batches: both touch key 5; batch 2 must win
    rows1 = [{"k": 5, "v": 100.0, "g": "b1"},
             {"k": 600, "v": 1.0, "g": "b1"}]
    rows2 = [{"k": 5, "v": 200.0, "g": "b2"},
             {"k": 601, "v": 2.0, "g": "b2"}]
    with open(feed_dir + "/b1.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows1))
    q = (colf_spark.readStream.schema("k int, v double, g string")
         .json(feed_dir)
         .writeStream.foreachBatch(upsert)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    with open(feed_dir + "/b2.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows2))
    q = (colf_spark.readStream.schema("k int, v double, g string")
         .json(feed_dir)
         .writeStream.foreachBatch(upsert)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 202                    # 200 + 2 new keys
    assert [(r["v"], r["g"]) for r in
            got.filter("k = 5").collect()] == [(200.0, "b2")]
    assert got.filter("k >= 600").count() == 2
    # not one pre-existing data file was rewritten across the batches
    assert files_before <= set(_data_files(ds))
    for f, m in _data_files(ds).items():
        if f in files_before:
            assert _data_files(ds)[f] == m


def test_stream_fails_at_mid_stream_mor_commit(colf_spark, ds):
    """The ignoreDeletes contract must hold MID-stream too: a MoR
    delete committed after the stream starts fails the next trigger at
    the offending commit (Delta's behavior), instead of silently
    emitting mask-blind batches."""
    from columnar_format_spark.colf.datasource import ColfStreamReader
    from columnar_format_spark.colf.format import ColfFormatError

    schema = colf_spark.read.format("colf").load(ds).schema
    rdr = ColfStreamReader({"path": ds}, schema)   # clean start: no masks
    end = rdr.latestOffset()
    assert rdr._offset_files(end)                  # initial files planned
    delete_where(colf_spark, ds, "k < 50", mode="mor")
    with pytest.raises(ColfFormatError, match="ignoreDeletes"):
        rdr.latestOffset()
    # the opted-in reader keeps going past the same commit
    rdr2 = ColfStreamReader({"path": ds, "ignoreDeletes": "true"}, schema)
    rdr2.latestOffset()


def test_mor_merge_empty_source_adds_no_junk_file(colf_spark, ds):
    """An empty merge source must be a no-op commit: the writer's
    0-row part-00000-empty.colf sentinel must NOT be moved into the
    dataset as a collision-prone fixed-name live file."""
    from columnar_format_spark.colf.datasource import live_files
    from columnar_format_spark.colf.maintenance import merge_into

    src = _df(colf_spark, 0, 0)                    # empty, right schema
    s = merge_into(colf_spark, ds, src, ["k"], mode="mor")
    assert s["n_source_rows"] == 0 and s["n_replaced_rows"] == 0
    assert s["n_new_files"] == 0
    basenames = {os.path.basename(f) for f in live_files(ds)}
    assert "part-00000-empty.colf" not in basenames
    assert colf_spark.read.format("colf").load(ds).count() == 200


def test_dml_after_staged_commit_keeps_wap_isolation(colf_spark, ds):
    """A DML commit landing while a WAP stage is in flight must base
    its live set on the PUBLISHED head — not snaps[-1] — or the staged
    files would leak into published reads before publish_wap."""
    (_df(colf_spark, 900, 910).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))
    staged_v = None
    from columnar_format_spark.colf.datasource import load_snapshots as _ls
    staged_v = _ls(ds)[-1]["version"]
    delete_where(colf_spark, ds, "k < 20", mode="mor")
    got = colf_spark.read.format("colf").load(ds)
    assert got.count() == 180                      # staged rows invisible
    from columnar_format_spark.colf.maintenance import publish_wap
    publish_wap(ds, staged_v)
    assert colf_spark.read.format("colf").load(ds).count() == 190


def test_rewrite_delete_files_coalesces_sidecars(colf_spark, ds):
    """Minor compaction (Iceberg RewritePositionDeleteFiles): three MoR
    commits' sidecars merge to one, visible rows identical, zero
    data-file bytes touched, dead entries dropped after a CoW rewrite
    removes their target file."""
    from columnar_format_spark.colf.datasource import (live_files,
                                                       load_snapshots)
    from columnar_format_spark.colf.maintenance import rewrite_delete_files

    delete_where(colf_spark, ds, "k < 10", mode="mor")
    delete_where(colf_spark, ds, "k >= 190", mode="mor")
    update_where(colf_spark, ds, {"v": "-1.0"}, "k = 100", mode="mor")
    head = load_snapshots(ds)[-1]
    assert len(head["deletes"]) >= 3
    # CoW-delete a sliver: rewrites its file, leaving sidecar entries
    # that address the now-dead file
    delete_where(colf_spark, ds, "k = 101", mode="cow")
    visible = sorted(r["k"] for r in
                     colf_spark.read.format("colf").load(ds).collect())
    before = {f: (os.path.getmtime(f), os.path.getsize(f))
              for f in live_files(ds)}
    n_dels_before = len(load_snapshots(ds)[-1]["deletes"])
    stats = rewrite_delete_files(colf_spark, ds)
    assert stats["n_delete_files_after"] == 1
    assert stats["n_delete_files_before"] == n_dels_before
    assert stats["n_dead_entries_dropped"] >= 1
    after = {f: (os.path.getmtime(f), os.path.getsize(f))
             for f in live_files(ds)}
    assert after == before              # zero data-file bytes touched
    head = load_snapshots(ds)[-1]
    assert len(head["deletes"]) == 1
    assert head.get("data_change") is False
    got = sorted(r["k"] for r in
                 colf_spark.read.format("colf").load(ds).collect())
    assert got == visible               # same rows through new sidecars
    # pre-rewrite version still time-travels through the OLD sidecars
    tv = (colf_spark.read.format("colf")
          .option("snapshot", str(stats["version"] - 1)).load(ds))
    assert sorted(r["k"] for r in tv.collect()) == visible
    # idempotent-ish: a second rewrite is a single-sidecar no-op shape
    stats2 = rewrite_delete_files(colf_spark, ds)
    assert stats2["n_delete_files_after"] == 1
    assert stats2["n_positions"] == stats["n_positions"]


def test_rewrite_delete_files_noop_without_masks(colf_spark, ds):
    from columnar_format_spark.colf.datasource import load_snapshots
    from columnar_format_spark.colf.maintenance import rewrite_delete_files

    v0 = load_snapshots(ds)[-1]["version"]
    stats = rewrite_delete_files(colf_spark, ds)
    assert stats == {"version": v0, "n_delete_files_before": 0,
                     "n_delete_files_after": 0, "n_positions": 0,
                     "n_dead_entries_dropped": 0}
    assert load_snapshots(ds)[-1]["version"] == v0


def test_rewrite_deletes_noop_gate_verifies_post_vacuum(colf_spark, ds):
    """The no-op gate's post-vacuum blind spot (round-12 verdict item
    #7): after retention prunes both the CoW commit that killed a data
    file AND the MoR commit that introduced the sidecar masking it,
    the sidecar's recorded intro version is the replay basis — whose
    snapshot can no longer PROVE the sidecar clean. The gate must then
    verify the sidecar's file column directly and do the rewrite,
    dropping the dead entries, instead of skipping."""
    from columnar_format_spark.colf.datasource import load_snapshots
    from columnar_format_spark.colf.format import (read_columns,
                                                   read_columns_arrow)
    from columnar_format_spark.colf.maintenance import rewrite_delete_files

    delete_where(colf_spark, ds, "k < 10", mode="mor")
    rewrite_delete_files(colf_spark, ds)       # coalesce to ONE sidecar
    head = load_snapshots(ds)[-1]
    assert len(head["deletes"]) == 1
    sidecar0 = head["deletes"][0]
    # CoW-delete a VISIBLE row from a file the sidecar addresses: the
    # rewrite retires that basename, orphaning the sidecar's entries
    addressed = sorted(set(read_columns_arrow(
        os.path.join(ds, sidecar0), ["file"])["file"].to_pylist()))
    victim = max(read_columns(os.path.join(ds, addressed[0]), ["k"])["k"])
    assert victim >= 10                         # not already masked
    delete_where(colf_spark, ds, f"k = {victim}", mode="cow")
    visible = sorted(r["k"] for r in
                     colf_spark.read.format("colf").load(ds).collect())
    # push both commits past retention, then prune: the retained log
    # starts at a replay basis that postdates the removal
    _df(colf_spark, 200, 210).write.format("colf").mode("append").save(ds)
    _df(colf_spark, 210, 220).write.format("colf").mode("append").save(ds)
    vacuum(ds, keep_last=2)
    head = load_snapshots(ds)[-1]
    assert len(head["deletes"]) == 1
    sidecar = head["deletes"][0]
    live_now = set(head["files"])
    dead = [f for f in set(read_columns_arrow(
                os.path.join(ds, sidecar), ["file"])["file"].to_pylist())
            if f not in live_now]
    assert dead, "scenario must leave dead entries in the sidecar"
    stats = rewrite_delete_files(colf_spark, ds)
    assert "skipped" not in stats, stats
    assert stats["n_dead_entries_dropped"] >= 1
    got = sorted(r["k"] for r in
                 colf_spark.read.format("colf").load(ds).collect())
    assert got == sorted(visible + list(range(200, 220)))
    # the rewritten sidecars carry no dead entries
    head2 = load_snapshots(ds)[-1]
    for d in head2["deletes"]:
        files = set(read_columns_arrow(
            os.path.join(ds, d), ["file"])["file"].to_pylist())
        assert files <= set(head2["files"])


def test_rewrite_deletes_noop_gate_skips_clean_post_vacuum(colf_spark,
                                                           ds):
    """Counterpart: post-vacuum with NO dead entries the direct check
    proves the sidecar clean and the gate still skips — the auto-
    detect must not turn every post-vacuum table into a rewrite."""
    from columnar_format_spark.colf.datasource import load_snapshots
    from columnar_format_spark.colf.maintenance import rewrite_delete_files

    delete_where(colf_spark, ds, "k < 10", mode="mor")
    _df(colf_spark, 200, 210).write.format("colf").mode("append").save(ds)
    _df(colf_spark, 210, 220).write.format("colf").mode("append").save(ds)
    vacuum(ds, keep_last=2)
    v0 = load_snapshots(ds)[-1]["version"]
    stats = rewrite_delete_files(colf_spark, ds)
    assert stats.get("skipped") == "stats-noop", stats
    assert load_snapshots(ds)[-1]["version"] == v0
