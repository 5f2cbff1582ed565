"""Named snapshot refs (tags), write-audit-publish staged commits, and
the row-accurate changelog — the Iceberg ref/WAP/CDC surfaces on the
COLF metadata log: tags pin versions past vacuum, staged commits stay
invisible to normal reads and to append inheritance until published,
and the changelog sees through CoW rewrites."""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    live_files,
    load_refs,
    load_snapshots,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    create_tag,
    delete_where,
    drop_ref,
    publish_wap,
    snapshot_changelog,
    vacuum,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _df(colf_spark, lo, hi):
    return colf_spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("string").alias("g"))


@pytest.fixture()
def ds(colf_spark, tmp_path):
    p = str(tmp_path / "refds")
    _df(colf_spark, 0, 100).coalesce(2).write.format("colf") \
        .mode("overwrite").save(p)                      # v1: 100 rows
    _df(colf_spark, 100, 150).coalesce(1).write.format("colf") \
        .mode("append").save(p)                         # v2: 150 rows
    return p


# ---------------------------------------------------------------- tags

def test_tag_read_and_immutability(colf_spark, ds):
    assert create_tag(ds, "baseline", 1) == 1
    got = colf_spark.read.format("colf").option("ref", "baseline").load(ds)
    assert got.count() == 100
    # default pins the published head
    assert create_tag(ds, "head") == 2
    # tags are immutable
    with pytest.raises(ColfFormatError):
        create_tag(ds, "baseline", 2)
    # unknown ref / version are loud (reader errors cross the JVM
    # boundary as AnalysisException wrapping the ColfFormatError text)
    with pytest.raises(Exception, match="unknown ref 'nope'"):
        colf_spark.read.format("colf").option("ref", "nope").load(ds).count()
    with pytest.raises(ColfFormatError):
        create_tag(ds, "x", 99)
    drop_ref(ds, "head")
    assert sorted(load_refs(ds)) == ["baseline"]
    with pytest.raises(ColfFormatError):
        drop_ref(ds, "head")


def test_ref_and_snapshot_options_exclusive(colf_spark, ds):
    create_tag(ds, "t1", 1)
    with pytest.raises(Exception, match="mutually exclusive"):
        (colf_spark.read.format("colf").option("ref", "t1")
         .option("snapshot", "2").load(ds).count())


def test_vacuum_retains_tagged_snapshot(colf_spark, ds):
    """THE point of tags: the pinned version stays readable past the
    retention horizon — vacuum must keep both its log entry and its
    part files, even when a retained COMPACTION has made them
    non-live (the case where vacuum otherwise deletes them)."""
    from columnar_format_spark.colf.maintenance import compact

    create_tag(ds, "audit", 1)
    compact(colf_spark, ds, 1, retain=True)             # v3: all rewritten
    deleted = vacuum(ds, keep_last=1)
    versions = [s["version"] for s in load_snapshots(ds)]
    assert 1 in versions and 3 in versions and 2 not in versions
    # v2's only-its-own file (the appended one) was reclaimable; v1's
    # two files were pinned by the tag and must survive
    assert len(deleted) == 1
    got = colf_spark.read.format("colf").option("ref", "audit").load(ds)
    assert got.count() == 100
    assert got.agg(F.sum("k")).first()[0] == sum(range(100))
    # current read unaffected
    assert colf_spark.read.format("colf").load(ds).count() == 150


# ----------------------------------------------------------------- WAP

def test_wap_staged_commit_invisible_until_published(colf_spark, ds):
    (_df(colf_spark, 150, 175).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # v3 staged
    snaps = load_snapshots(ds)
    st = snaps[-1]
    assert st["staged"] and st["version"] == 3 and st["parent"] == 2
    assert len(st["added"]) == 1
    # invisible to normal reads and to live_files
    assert colf_spark.read.format("colf").load(ds).count() == 150
    assert len(live_files(ds)) == 3
    # auditable by explicit snapshot
    audit = (colf_spark.read.format("colf")
             .option("snapshot", "3").load(ds))
    assert audit.count() == 175
    # publish = fast-forward; now visible
    v = publish_wap(ds, 3)
    assert v == 4
    assert colf_spark.read.format("colf").load(ds).count() == 175
    # double-publish is loud
    with pytest.raises(ColfFormatError):
        publish_wap(ds, 3)
    # publishing a normal commit is loud
    with pytest.raises(ColfFormatError):
        publish_wap(ds, 2)


def test_wap_cherry_pick_after_interim_append(colf_spark, ds):
    (_df(colf_spark, 150, 175).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # v3 staged
    # an interim PUBLISHED append builds on v2, not on the staged v3
    _df(colf_spark, 200, 210).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                        # v4 published
    assert colf_spark.read.format("colf").load(ds).count() == 160
    publish_wap(ds, 3)                                  # cherry-pick
    assert colf_spark.read.format("colf").load(ds).count() == 185


def test_wap_rejects_overwrite_and_metadata_change(colf_spark, ds):
    with pytest.raises(Exception):
        (_df(colf_spark, 0, 10).write.format("colf")
         .option("wap", "true").mode("overwrite").save(ds))
    with pytest.raises(Exception):
        (_df(colf_spark, 0, 10).coalesce(1).write.format("colf")
         .option("wap", "true").option("sortOrder", "k")
         .mode("append").save(ds))


def test_wap_only_log_reads_empty(colf_spark, tmp_path):
    """First-ever commit staged: the published table is EMPTY — the
    reader must not leak the staged files via the listing fallback."""
    p = str(tmp_path / "wapfirst")
    (_df(colf_spark, 0, 10).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(p))
    assert live_files(p) == []
    assert colf_spark.read.format("colf").load(p).count() == 0
    publish_wap(p, 1)
    assert colf_spark.read.format("colf").load(p).count() == 10


def test_vacuum_retains_unpublished_staged(colf_spark, ds):
    (_df(colf_spark, 150, 175).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # v3 staged
    _df(colf_spark, 200, 210).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                        # v4 published
    vacuum(ds, keep_last=1)
    versions = [s["version"] for s in load_snapshots(ds)]
    assert 3 in versions and 4 in versions
    publish_wap(ds, 3)
    assert colf_spark.read.format("colf").load(ds).count() == 185


# ----------------------------------------------------------- changelog

def test_changelog_sees_through_cow_rewrite(colf_spark, ds):
    delete_where(colf_spark, ds, "k >= 140")            # v3: -10 rows
    _df(colf_spark, 300, 305).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                        # v4: +5 rows
    log = snapshot_changelog(colf_spark, ds, 2)
    rows = {(r["_change_type"], r["k"]) for r in log.collect()}
    assert {t for t, _ in rows} == {"insert", "delete"}
    assert {k for t, k in rows if t == "delete"} == set(range(140, 150))
    assert {k for t, k in rows if t == "insert"} == set(range(300, 305))
    # pure-insert increment: no deletes reported
    log2 = snapshot_changelog(colf_spark, ds, 3, 4).collect()
    assert all(r["_change_type"] == "insert" for r in log2)
    assert len(log2) == 5
    # identical versions diff to nothing
    assert snapshot_changelog(colf_spark, ds, 2, 2).count() == 0
    with pytest.raises(ColfFormatError):
        snapshot_changelog(colf_spark, ds, 99)


def test_changelog_reads_only_unique_files(colf_spark, ds):
    """The metadata-level cancellation: a pure append's changelog must
    plan scans over ONLY the per-side-unique files — the files common
    to both versions cancel before any I/O."""
    from columnar_format_spark.colf.datasource import ColfReader

    _df(colf_spark, 300, 310).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                        # v3
    snaps = {s["version"]: set(s["files"]) for s in load_snapshots(ds)}
    common = snaps[2] & snaps[3]
    only_to = snaps[3] - snaps[2]
    assert common and only_to  # the appended-to files really are shared
    # the exact reader configuration changelog's v_to side uses
    schema = colf_spark.read.format("colf").load(ds).schema
    r = ColfReader({"path": ds, "snapshot": "3",
                    "files": ",".join(sorted(only_to))}, schema)
    planned = {os.path.basename(p.file) for p in r.partitions()
               if p.file is not None}
    assert planned == only_to
    assert not planned & common


# ------------------------------------------------------------ rollback

def test_rollback_restores_earlier_version(colf_spark, ds):
    delete_where(colf_spark, ds, "k >= 100")            # v3: back to 100
    assert colf_spark.read.format("colf").load(ds).count() == 100
    from columnar_format_spark.colf.maintenance import rollback

    v = rollback(ds, 2)                                 # undo the delete
    assert v == 4
    assert colf_spark.read.format("colf").load(ds).count() == 150
    # abandoned version still time-travels
    assert (colf_spark.read.format("colf").option("snapshot", "3")
            .load(ds).count() == 100)
    with pytest.raises(ColfFormatError):
        rollback(ds, 99)
    # rolling back to a staged commit is loud — publish it instead
    (_df(colf_spark, 500, 510).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # v5 staged
    with pytest.raises(ColfFormatError):
        rollback(ds, 5)


def test_rollback_cli(colf_spark, ds, capsys):
    from columnar_format_spark.colf.cli import main as cli_main

    _df(colf_spark, 900, 910).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                        # v3: 160
    assert cli_main(["rollback", ds, "2"]) == 0
    import json as _json

    out = _json.loads(capsys.readouterr().out)
    assert out == {"restored": 2, "version": 4}
    assert colf_spark.read.format("colf").load(ds).count() == 150


# ------------------------------------------------------------- branches

def test_branch_appends_isolated_until_fast_forward(colf_spark, ds):
    from columnar_format_spark.colf.maintenance import (create_branch,
                                                        fast_forward)

    assert create_branch(ds, "dev") == 2        # fork at published head
    for lo in (500, 600):                       # two staged appends
        (_df(colf_spark, lo, lo + 20).coalesce(1).write.format("colf")
         .option("branch", "dev").mode("append").save(ds))
    # published table untouched; branch accumulates both commits
    assert colf_spark.read.format("colf").load(ds).count() == 150
    br = colf_spark.read.format("colf").option("ref", "dev").load(ds)
    assert br.count() == 190
    refs = load_refs(ds)
    assert refs["dev"]["version"] == 4 and len(refs["dev"]["added"]) == 2
    # land it: one metadata commit, all 190 rows published
    v = fast_forward(ds, "dev")
    assert colf_spark.read.format("colf").load(ds).count() == 190
    # the branch re-based onto the landed head: empty delta, new head
    refs = load_refs(ds)
    assert refs["dev"]["version"] == v and refs["dev"]["added"] == []
    # further branch appends stage on the landed state
    (_df(colf_spark, 700, 705).coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))
    assert colf_spark.read.format("colf").load(ds).count() == 190
    assert (colf_spark.read.format("colf").option("ref", "dev")
            .load(ds).count() == 195)


def test_branch_cherry_pick_over_interim_publish(colf_spark, ds):
    from columnar_format_spark.colf.maintenance import (create_branch,
                                                        fast_forward)

    create_branch(ds, "dev")
    (_df(colf_spark, 500, 520).coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))
    # main moves while the branch is in flight
    _df(colf_spark, 800, 810).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    assert colf_spark.read.format("colf").load(ds).count() == 160
    fast_forward(ds, "dev")                     # cherry-pick union
    assert colf_spark.read.format("colf").load(ds).count() == 180


def test_branch_guards(colf_spark, ds):
    from columnar_format_spark.colf.maintenance import (create_branch,
                                                        fast_forward,
                                                        rollback)

    with pytest.raises(Exception, match="unknown branch"):
        (_df(colf_spark, 0, 5).coalesce(1).write.format("colf")
         .option("branch", "nope").mode("append").save(ds))
    create_branch(ds, "dev")
    with pytest.raises(ColfFormatError):
        create_branch(ds, "dev")                # name collision
    with pytest.raises(Exception, match="mutually exclusive"):
        (_df(colf_spark, 0, 5).coalesce(1).write.format("colf")
         .option("branch", "dev").option("wap", "true")
         .mode("append").save(ds))
    with pytest.raises(Exception):
        (_df(colf_spark, 0, 5).write.format("colf")
         .option("branch", "dev").mode("overwrite").save(ds))
    with pytest.raises(ColfFormatError):
        fast_forward(ds, "nope")
    # a tag is not fast-forwardable; a branch commit is not a rollback
    # target
    create_tag(ds, "t", 1)
    with pytest.raises(ColfFormatError):
        fast_forward(ds, "t")
    (_df(colf_spark, 500, 505).coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))     # v3 branch
    with pytest.raises(ColfFormatError):
        rollback(ds, 3)


def test_vacuum_keeps_branch_head_expires_intermediates(colf_spark, ds):
    from columnar_format_spark.colf.maintenance import (create_branch,
                                                        fast_forward)

    create_branch(ds, "dev")
    for lo in (500, 600):
        (_df(colf_spark, lo, lo + 20).coalesce(1).write.format("colf")
         .option("branch", "dev").mode("append").save(ds))  # v3, v4
    _df(colf_spark, 800, 810).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                            # v5 published
    vacuum(ds, keep_last=1)
    versions = [s["version"] for s in load_snapshots(ds)]
    assert 4 in versions and 5 in versions      # head + published kept
    assert 3 not in versions                    # intermediate expired
    # the branch still reads and still lands
    assert (colf_spark.read.format("colf").option("ref", "dev")
            .load(ds).count() == 190)
    fast_forward(ds, "dev")
    assert colf_spark.read.format("colf").load(ds).count() == 200


def test_stream_sink_rejects_staging_options(colf_spark, ds, tmp_path):
    """The streaming sink must not silently publish micro-batches a
    caller asked to stage."""
    from columnar_format_spark.colf.datasource import ColfStreamArrowWriter

    schema = colf_spark.read.format("colf").load(ds).schema
    with pytest.raises(ColfFormatError, match="not supported on the"
                       " streaming sink"):
        ColfStreamArrowWriter({"path": ds, "wap": "true"}, schema, False)
    with pytest.raises(ColfFormatError, match="not supported on the"
                       " streaming sink"):
        ColfStreamArrowWriter({"path": ds, "branch": "dev"}, schema, False)


def test_vacuum_spec_carry_skips_staged_oldest(colf_spark, tmp_path):
    """The inherited_* vacuum carry must land on a PUBLISHED kept
    snapshot: staged/branch entries are invisible to the spec/sort
    scans, so pinning onto one would silently lose the metadata."""
    from columnar_format_spark.colf.datasource import (
        current_sort_order, load_snapshots as _ls)
    from columnar_format_spark.colf.maintenance import set_sort_order

    p = str(tmp_path / "carryds")
    _df(colf_spark, 0, 100).coalesce(2).write.format("colf") \
        .mode("overwrite").save(p)                      # v1
    set_sort_order(p, ["k"])                            # v2 carries sort
    (_df(colf_spark, 100, 120).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(p))     # v3 staged
    _df(colf_spark, 200, 210).coalesce(1).write.format("colf") \
        .mode("append").save(p)                         # v4 published
    # keep_last=2 keeps v3 (staged, also pinned) + v4; the sort-bearing
    # v2 expires — the carry must land on v4, not the staged v3
    vacuum(p, keep_last=2)
    assert current_sort_order(p) == ["k"]
    for s in _ls(p):
        if s.get("staged"):
            assert "inherited_sort" not in s and "sort" not in s


def test_changelog_audits_staged_snapshot(colf_spark, ds):
    """The WAP audit tier: diff the STAGED snapshot against the
    published head before publishing — exactly the staged rows, all
    inserts, none leaked."""
    (_df(colf_spark, 150, 170).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # v3 staged
    log = snapshot_changelog(colf_spark, ds, 2, 3).collect()
    assert all(r["_change_type"] == "insert" for r in log)
    assert sorted(r["k"] for r in log) == list(range(150, 170))


def test_cli_diff_staged_version(colf_spark, ds, capsys):
    import json as _json

    from columnar_format_spark.colf.cli import main as cli_main

    (_df(colf_spark, 150, 170).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # v3 staged
    # 'current' resolves to the published head (v2), not the staged v3
    assert cli_main(["diff", ds, "2", "current"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["v2"] == 2 and out["n_added"] == 0 and out["n_removed"] == 0
    assert cli_main(["diff", ds, "2", "3"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert (out["n_added"], out["n_removed"]) == (20, 0)


def test_stream_source_skips_staged_until_published(colf_spark, ds,
                                                    tmp_path):
    """A streaming consumer tailing the dataset must NOT receive a
    staged (WAP) commit's rows until publish — then it gets exactly
    them, once."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        (colf_spark.readStream.format("colf").load(ds)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination(120))
        import glob
        files = glob.glob(out + "/*.parquet")
        return (colf_spark.read.parquet(out).count() if files else 0)

    assert drain() == 150                               # v1+v2
    (_df(colf_spark, 500, 520).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # staged
    assert drain() == 150                               # nothing new
    publish_wap(ds, 3)
    assert drain() == 170                               # exactly once


def test_fast_forward_recovers_from_crash_before_ref_update(colf_spark,
                                                            ds):
    """Crash-window recovery: fast_forward commits the published
    snapshot FIRST and re-bases the ref second. If the process dies
    between the two, the branch ref still carries its delta — a
    retried fast_forward must land a byte-identical file set (an
    idempotent no-op version), never lose or duplicate rows."""
    from columnar_format_spark.colf.datasource import (commit_snapshot,
                                                       published_snapshots)
    from columnar_format_spark.colf.maintenance import (create_branch,
                                                        fast_forward)

    create_branch(ds, "dev")
    (_df(colf_spark, 500, 520).coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))
    # simulate the crash: replay ONLY the commit half of fast_forward
    snaps = load_snapshots(ds)
    ref = load_refs(ds)["dev"]
    pub = published_snapshots(snaps)
    commit_snapshot(ds, sorted(set(pub[-1]["files"]) | set(ref["added"])),
                    expected_parent=snaps[-1]["version"], ff_from="dev")
    assert colf_spark.read.format("colf").load(ds).count() == 170
    # the ref was never re-based — recovery is just calling it again
    fast_forward(ds, "dev")
    assert colf_spark.read.format("colf").load(ds).count() == 170
    snaps = load_snapshots(ds)
    assert snaps[-1]["files"] == snaps[-2]["files"]  # idempotent union
    assert load_refs(ds)["dev"]["added"] == []


def test_swap_compact_refuses_with_refs_or_staged(colf_spark, ds):
    """Default (swap-mode) compact() rebuilds the directory from the
    published live set — it must REFUSE when named refs or unpublished
    staged/branch commits exist, because the rmtree would silently
    destroy the _refs.json sidecar (tags are documented to survive any
    retention horizon) and the staged part files vacuum() pins.
    retain=True preserves all of it and must keep working."""
    from columnar_format_spark.colf.maintenance import compact, create_branch

    create_tag(ds, "keep", 1)
    with pytest.raises(ColfFormatError, match="swap-mode"):
        compact(colf_spark, ds, 1)
    drop_ref(ds, "keep")
    (_df(colf_spark, 500, 520).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # staged v3
    with pytest.raises(ColfFormatError, match="swap-mode"):
        compact(colf_spark, ds, 1)
    # retain mode keeps the log/refs/staged files — and the staged
    # commit still publishes cleanly after the compaction
    assert compact(colf_spark, ds, 1, retain=True) == 1
    assert colf_spark.read.format("colf").load(ds).count() == 150
    publish_wap(ds, 3)
    assert colf_spark.read.format("colf").load(ds).count() == 170
    # a live branch ref refuses too (the swap would destroy the
    # branch's lineage); once the ref is dropped and the staged commit
    # is published, nothing is pinned and swap mode works again
    create_branch(ds, "dev")
    with pytest.raises(ColfFormatError, match="swap-mode"):
        compact(colf_spark, ds, 1)
    drop_ref(ds, "dev")
    assert compact(colf_spark, ds, 1) == 1
    assert colf_spark.read.format("colf").load(ds).count() == 170


def test_staged_new_column_stays_out_of_published_schema(colf_spark, ds):
    """A WAP/branch append that ADDS a column must not leak it into
    published reads before publish (it would surface as all-NULL) —
    the dataset schema derives from the published live set, not the
    raw directory listing."""
    (colf_spark.range(500, 520)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 5).cast("string").alias("g"),
             F.col("id").cast("double").alias("extra"))
     .coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))    # staged v3
    pub = colf_spark.read.format("colf").load(ds)
    assert pub.columns == ["k", "g"] and pub.count() == 150
    # auditing the staged snapshot itself DOES see the new column
    aud = (colf_spark.read.format("colf")
           .option("snapshot", "3").load(ds))
    assert "extra" in aud.columns
    # after publish the column joins the published schema (older files
    # read it as typed NULLs)
    publish_wap(ds, 3)
    pub2 = colf_spark.read.format("colf").load(ds)
    assert "extra" in pub2.columns and pub2.count() == 170
    assert pub2.filter(F.col("extra").isNull()).count() == 150


def test_cli_diff_current_excludes_branch_commit(colf_spark, ds, capsys):
    """`diff <ds> v current` on a dataset whose NEWEST commit is an
    unpublished branch append must diff against the published table,
    not the branch head (same predicate as published_snapshots)."""
    import json as _json

    from columnar_format_spark.colf.cli import main as cli_main
    from columnar_format_spark.colf.maintenance import create_branch

    create_branch(ds, "dev")
    (_df(colf_spark, 500, 560).coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))  # branch v3
    assert cli_main(["diff", ds, "1", "current"]) == 0
    out = _json.loads(capsys.readouterr().out)
    # published head is v2 (+50 rows over v1); the branch's +60 rows
    # must not appear
    assert (out["n_added"], out["n_removed"]) == (50, 0)
    assert out["v2"] == 2
    assert cli_main(["changelog", ds, "2", "current"]) == 0
    assert capsys.readouterr().out.strip() == ""        # v2 == current


def test_cli_diff_changelog_schema_evolution_union(colf_spark, ds,
                                                   capsys):
    """Diff/changelog across versions whose unique files carry
    DIFFERENT column sets (additive evolution): rows decode against
    the fixed union schema — missing columns as None — so values are
    never mislabeled and tuples of equal arity cancel correctly."""
    import json as _json

    from columnar_format_spark.colf.cli import main as cli_main

    (colf_spark.range(200, 203)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 5).cast("string").alias("g"),
             F.col("id").cast("double").alias("extra"))
     .coalesce(1).write.format("colf").mode("append").save(ds))  # v3
    assert cli_main(["changelog", ds, "2", "current"]) == 0
    lines = [_json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    assert [(r["op"], r["k"], r["extra"]) for r in lines] == [
        ("insert", 200, 200.0), ("insert", 201, 201.0),
        ("insert", 202, 202.0)]
    # and the older side of an evolved diff labels its rows with
    # extra=None instead of shifting values into the wrong columns
    assert cli_main(["changelog", ds, "1", "current"]) == 0
    lines = [_json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines()]
    inserts = [r for r in lines if r["op"] == "insert"]
    assert {r["extra"] for r in inserts if r["k"] >= 200} == {200.0,
                                                              201.0,
                                                              202.0}
    assert all(r["extra"] is None for r in inserts if r["k"] < 200)


def test_cli_diff_refuses_vacuumed_unless_tag_pins(colf_spark, ds,
                                                   capsys):
    """The CDC cross-version guarantee: diff/changelog REFUSE (loud
    SystemExit, not wrong numbers) when a diffed version's part file
    was vacuumed — and a tag pinning that version keeps it diffable
    past the retention horizon."""
    import json as _json

    from columnar_format_spark.colf.cli import main as cli_main

    from columnar_format_spark.colf.maintenance import compact

    compact(colf_spark, ds, 1, retain=True)            # v3: all-new files
    create_tag(ds, "pin1", 1)
    vacuum(ds, keep_last=1)                            # keeps v3 + pinned v1
    capsys.readouterr()
    # the tag keeps v1 in the log AND its part files on disk: the diff
    # stays row-accurate past the retention horizon
    snaps = {s["version"] for s in load_snapshots(ds)}
    assert snaps == {1, 3}                             # v2 expired
    assert cli_main(["diff", ds, "1", "current"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert (out["n_added"], out["n_removed"]) == (50, 0)
    # a part file lost OUT OF BAND (partial restore, manual cleanup):
    # refusal with a loud message, never silently wrong numbers
    victim = sorted(set(load_snapshots(ds)[0]["files"]))[0]
    os.remove(os.path.join(ds, victim))
    with pytest.raises(SystemExit):
        cli_main(["diff", ds, "1", "current"])
    assert "vacuum" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli_main(["changelog", ds, "1", "current"])


def test_branch_ref_read_sees_branch_schema(colf_spark, ds):
    """schema() resolves the SAME snapshot/ref options the reader
    does: a branch append that ADDS a column is invisible to published
    reads, but a read by the branch ref (or its snapshot) must carry
    the new column."""
    from columnar_format_spark.colf.maintenance import create_branch

    create_branch(ds, "dev")
    (colf_spark.range(500, 520)
     .select(F.col("id").cast("int").alias("k"),
             (F.col("id") % 5).cast("string").alias("g"),
             F.col("id").cast("double").alias("extra"))
     .coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))
    pub = colf_spark.read.format("colf").load(ds)
    assert pub.columns == ["k", "g"] and pub.count() == 150
    br = colf_spark.read.format("colf").option("ref", "dev").load(ds)
    assert "extra" in br.columns
    assert br.count() == 170
    assert br.filter(F.col("extra").isNotNull()).count() == 20


def test_branch_first_commit_inherits_fork_point_deletes(colf_spark, ds):
    """A branch's FIRST commit inherits delete state from the fork
    point, never from whatever the published head mutated to after the
    fork: a MoR delete on main post-fork must not mask branch reads of
    rows never deleted on the branch."""
    from columnar_format_spark.colf.maintenance import create_branch

    create_branch(ds, "dev")                       # fork at v2 (150 rows)
    delete_where(colf_spark, ds, "k < 10", mode="mor")   # main: 140 visible
    (_df(colf_spark, 500, 510).coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))   # first branch commit
    br = colf_spark.read.format("colf").option("ref", "dev").load(ds)
    assert br.count() == 160                       # 150 fork + 10 appended
    assert br.filter("k < 10").count() == 10       # never deleted on branch
    # main unaffected by the branch append
    assert colf_spark.read.format("colf").load(ds).count() == 140


def test_branch_first_commit_keeps_fork_point_masks(colf_spark, ds):
    """The converse: masks live AT the fork survive a main-side
    compact (which clears the published head's delete list) — the
    branch must not resurrect rows deleted before the fork."""
    from columnar_format_spark.colf.maintenance import compact, create_branch

    delete_where(colf_spark, ds, "k < 10", mode="mor")   # v3: 140 visible
    create_branch(ds, "dev")                             # fork at v3
    compact(colf_spark, ds, 2, retain=True)              # main: deletes=[]
    (_df(colf_spark, 500, 510).coalesce(1).write.format("colf")
     .option("branch", "dev").mode("append").save(ds))
    br = colf_spark.read.format("colf").option("ref", "dev").load(ds)
    assert br.count() == 150                       # 140 fork-visible + 10
    assert br.filter("k < 10").count() == 0        # masks NOT resurrected


def test_eq_delete_between_stage_and_publish_spares_published_rows(
        colf_spark, ds):
    """Iceberg cherry-pick sequence semantics: a WAP-staged file's
    sequence number is assigned at PUBLISH, so an equality delete
    committed between stage and publish does not mask the published
    rows (they are 'newer' than the delete)."""
    (_df(colf_spark, 500, 510).coalesce(1).write.format("colf")
     .option("wap", "true").mode("append").save(ds))
    staged_v = load_snapshots(ds)[-1]["version"]
    # eq delete on main, committed AFTER the stage, matching staged keys
    delete_where(colf_spark, ds, "k >= 500", mode="eq")
    publish_wap(ds, staged_v)
    # fresh read per action (the pinned PythonDataSourceV2 scan-reuse
    # hazard: a pushed filter replays into a later unfiltered action
    # on the same DataFrame — see tests/test_pushdown_scan_reuse.py)
    assert (colf_spark.read.format("colf").load(ds)
            .filter("k >= 500").count() == 10)     # cherry-pick survives
    assert colf_spark.read.format("colf").load(ds).count() == 160
