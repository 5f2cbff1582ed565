"""Change Data Feed (readChangeFeed) — batch and streaming row-level
CDC over the COLF metadata log (Delta CDF / Iceberg changelog-scan
model): appends replay as inserts, MoR delete/update/merge commits as
exact delete (+insert) rows from their delta sidecars, equality deletes
as predicate matches among rows still visible at the parent version,
and data_change=false rewrites (compact retain) as ZERO rows.
Copy-on-write rewrites refuse loudly unless skipChangeCommits."""

import os
from collections import Counter

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
    merge_into,
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
    p = str(tmp_path / "cdcds")
    _df(colf_spark, 0, 200).repartition(4).write.format("colf") \
        .mode("overwrite").save(p)
    return p


def _cdc(colf_spark, path, **opts):
    r = colf_spark.read.format("colf").option("readChangeFeed", "true")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load(path)


def _replay(rows):
    """Fold CDC rows into table state; returns sorted live tuples."""
    state = Counter()
    for r in sorted(rows, key=lambda r: r["_commit_version"]):
        key = (r["k"], r["v"], r["g"])
        state[key] += 1 if r["_change_type"] == "insert" else -1
    assert all(c >= 0 for c in state.values()), "deleted a non-live row"
    return sorted(k for k, c in state.items() for _ in range(c))


def test_batch_cdc_replay_reconstructs_mor_history(colf_spark, ds):
    """The headline contract: folding the change feed reproduces the
    table exactly, across MoR delete, MoR update, MoR merge, and an
    equality delete — with per-commit counts exact."""
    delete_where(colf_spark, ds, "k < 10", mode="mor")            # v2
    update_where(colf_spark, ds, {"g": "'U'"}, "k >= 190", mode="mor")  # v3
    src = (colf_spark.range(50, 60)
           .select(F.col("id").cast("int").alias("k"),
                   F.lit(-1.0).alias("v"), F.lit("M").alias("g"))
           .unionAll(colf_spark.range(500, 505)
                     .select(F.col("id").cast("int").alias("k"),
                             F.lit(-2.0).alias("v"),
                             F.lit("N").alias("g"))))
    merge_into(colf_spark, ds, src, ["k"], mode="mor")            # v4
    delete_where(colf_spark, ds, "g = 'N'", mode="eq")            # v5
    rows = _cdc(colf_spark, ds).collect()
    per = Counter((r["_commit_version"], r["_change_type"]) for r in rows)
    assert per == {
        (1, "insert"): 200,
        (2, "delete"): 10,
        (3, "delete"): 10, (3, "insert"): 10,   # update = del + ins
        (4, "delete"): 10, (4, "insert"): 15,   # merge masks + appends
        (5, "delete"): 5,                        # eq hits the N rows
    }
    table = sorted((r["k"], r["v"], r["g"]) for r in
                   colf_spark.read.format("colf").load(ds).collect())
    assert _replay(rows) == table
    # every row carries a commit timestamp from the log
    assert all(r["_commit_timestamp"] is not None for r in rows)


def test_cdc_eq_delete_respects_parent_masks_and_sequence(colf_spark, ds):
    """An equality delete's CDC rows are its matches among rows still
    VISIBLE at the parent: rows already MoR-deleted don't re-delete,
    and files appended after the eq commit are sequence-exempt."""
    delete_where(colf_spark, ds, "k < 50 AND g = '0'", mode="mor")  # v2
    delete_where(colf_spark, ds, "g = '0'", mode="eq")              # v3
    _df(colf_spark, 300, 310).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                                    # v4
    rows = _cdc(colf_spark, ds).collect()
    v3_dels = [r for r in rows
               if r["_commit_version"] == 3 and r["_change_type"] == "delete"]
    # g='0' rows: k%3==0 -> 67 of 200; 17 of them (k<50) died at v2
    assert len(v3_dels) == 50
    assert all(r["g"] == "0" and r["k"] >= 50 for r in v3_dels)
    v4_ins = [r for r in rows if r["_commit_version"] == 4]
    assert len(v4_ins) == 10            # appends exempt from the eq mask
    assert _replay(rows) == sorted(
        (r["k"], r["v"], r["g"]) for r in
        colf_spark.read.format("colf").load(ds).collect())


def test_cdc_version_window_and_validation(colf_spark, ds):
    _df(colf_spark, 200, 250).coalesce(1).write.format("colf") \
        .mode("append").save(ds)                                    # v2
    delete_where(colf_spark, ds, "k < 5", mode="mor")               # v3
    got = _cdc(colf_spark, ds, startingVersion=1, endingVersion=2)
    assert Counter(r["_change_type"] for r in got.collect()) \
        == {"insert": 50}
    got = _cdc(colf_spark, ds, startingVersion=2)
    assert Counter(r["_change_type"] for r in got.collect()) \
        == {"delete": 5}
    with pytest.raises(Exception, match="endingVersion"):
        _cdc(colf_spark, ds, startingVersion=3, endingVersion=1).count()
    with pytest.raises(Exception, match="incompatible"):
        (colf_spark.read.format("colf")
         .option("readChangeFeed", "true").option("snapshot", "1")
         .load(ds).count())


def test_cdc_refuses_cow_rewrites_unless_skipped(colf_spark, ds):
    delete_where(colf_spark, ds, "k = 7", mode="cow")               # v2
    with pytest.raises(Exception, match="skipChangeCommits"):
        _cdc(colf_spark, ds).count()
    got = _cdc(colf_spark, ds, skipChangeCommits=True)
    assert Counter(r["_change_type"] for r in got.collect()) \
        == {"insert": 200}              # the rewrite commit is skipped


def test_compact_emits_zero_cdc_rows_and_marks_data_change(colf_spark, ds):
    delete_where(colf_spark, ds, "k < 20", mode="mor")
    before = _cdc(colf_spark, ds).count()
    compact(colf_spark, ds, 2, retain=True)
    assert load_snapshots(ds)[-1].get("data_change") is False
    assert _cdc(colf_spark, ds).count() == before
    # and the replayed state still matches the table
    assert _replay(_cdc(colf_spark, ds).collect()) == sorted(
        (r["k"], r["v"], r["g"]) for r in
        colf_spark.read.format("colf").load(ds).collect())


def test_tailing_stream_skips_compaction_rewrites(colf_spark, ds, tmp_path):
    """data_change=false also fixes the REGULAR stream's double-
    delivery hazard: a retained compaction's rewritten files are not
    re-delivered to a tailing consumer."""
    import glob

    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    def drain():
        q = (colf_spark.readStream.format("colf").load(ds)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return (colf_spark.read.parquet(out).count()
                if glob.glob(out + "/*.parquet") else 0)

    assert drain() == 200
    compact(colf_spark, ds, 2, retain=True)
    assert drain() == 200               # nothing re-delivered
    _df(colf_spark, 200, 210).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    assert drain() == 210               # appends still flow
    # a FRESH stream post-vacuum replays the compacted baseline
    vacuum(ds, keep_last=2)
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    q = (colf_spark.readStream.format("colf").load(ds)
         .writeStream.format("parquet").option("path", out2)
         .option("checkpointLocation", ckpt2)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert colf_spark.read.parquet(out2).count() == 210


def test_streaming_cdc_tails_mor_commits(colf_spark, ds, tmp_path):
    """The round-9 capability hole, closed: a STREAM over a dataset
    with live MoR/equality deletes is consumable as a changelog —
    each drain picks up exactly the commits since its checkpoint."""
    import glob

    delete_where(colf_spark, ds, "k < 10", mode="mor")
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    def drain():
        q = (colf_spark.readStream.format("colf")
             .option("readChangeFeed", "true").load(ds)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return (colf_spark.read.parquet(out)
                if glob.glob(out + "/*.parquet") else None)

    got = drain()
    per = Counter((r["_commit_version"], r["_change_type"])
                  for r in got.collect())
    assert per == {(1, "insert"): 200, (2, "delete"): 10}
    # commits landing between drains arrive incrementally
    delete_where(colf_spark, ds, "g = '2'", mode="eq")
    _df(colf_spark, 400, 405).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    got = drain()
    per = Counter((r["_commit_version"], r["_change_type"])
                  for r in got.collect())
    assert per[(3, "delete")] == 63     # g='2' minus the 3 dead at v2
    assert per[(4, "insert")] == 5
    assert _replay(got.collect()) == sorted(
        (r["k"], r["v"], r["g"]) for r in
        colf_spark.read.format("colf").load(ds).collect())


def test_streaming_cdc_rejects_rate_cap(colf_spark, ds):
    with pytest.raises(Exception, match="maxFilesPerTrigger"):
        q = (colf_spark.readStream.format("colf")
             .option("readChangeFeed", "true")
             .option("maxFilesPerTrigger", "1").load(ds)
             .writeStream.format("noop").trigger(availableNow=True)
             .start())
        q.awaitTermination(60)
        if q.exception():
            raise q.exception()


def test_cdc_refuses_vacuumed_baseline(colf_spark, ds):
    """A checkpointed CDC consumer whose startingVersion predates the
    vacuum-pruned log must fail loudly (Delta's out-of-retention CDF
    error), never silently re-deliver the retained live set as
    inserts; startingVersion=0 (explicit full bootstrap) stays
    legal."""
    _df(colf_spark, 200, 240).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    _df(colf_spark, 240, 260).coalesce(1).write.format("colf") \
        .mode("append").save(ds)
    # consumer checkpointed at v1; vacuum prunes to the head only
    vacuum(ds, keep_last=1)
    with pytest.raises(Exception, match="predates the retained log"):
        _cdc(colf_spark, ds, startingVersion=1).count()
    # full bootstrap from scratch is still the documented path: the
    # retained head replays as pure inserts of the live set
    rows = _cdc(colf_spark, ds, startingVersion=0).collect()
    assert all(r["_change_type"] == "insert" for r in rows)
    assert len(rows) == 260


def test_changelog_planning_is_metadata_bounded(colf_spark, ds,
                                                monkeypatch):
    """Round 12: a changelog plan materializes ONLY the batch window's
    versions + its baseline — never the full O(commits x files)
    history fold (it runs on every micro-batch poll). Pinned
    structurally: full-history load_snapshots bombs, the plan still
    works, and the materialize call asks for exactly the needed
    versions."""
    import columnar_format_spark.colf.datasource as dsm
    from columnar_format_spark.colf.datasource import (
        materialize_log_versions, plan_changelog_partitions)

    for lo in (200, 240, 280):
        _df(colf_spark, lo, lo + 40).coalesce(1).write.format("colf") \
            .mode("append").save(ds)
    head = load_snapshots(ds)[-1]["version"]
    assert head == 4

    asked = []
    real = materialize_log_versions

    def spying(path, versions):
        asked.append(sorted(versions))
        return real(path, versions)

    def bomb(path):
        raise AssertionError("changelog plan folded the full history")

    monkeypatch.setattr(dsm, "materialize_log_versions", spying)
    monkeypatch.setattr(dsm, "load_snapshots", bomb)
    # a tailing trigger: one new commit against its baseline
    parts = plan_changelog_partitions(ds, head - 1, head)
    assert asked == [[head - 1, head]]
    assert parts, "the tail commit's insert partitions are missing"
    # and a bootstrap from 0 asks for every published version once
    asked.clear()
    parts0 = plan_changelog_partitions(ds, 0, None)
    assert asked == [[1, 2, 3, 4]]
    assert len(parts0) >= len(parts)


def test_single_huge_commit_microbatch_is_parallel_not_a_stall(
        colf_spark, tmp_path):
    """The changelog's rate-limit floor is ONE COMMIT per micro-batch
    (maxCommitsPerTrigger; splitting a commit would tear its
    atomicity — Delta CDF has the same floor). The carried round-11/12
    concern was a consumer STALL on one huge commit. Measured here at
    a 100k-row single-commit write: the plan fans out to one partition
    per file/stripe WITHIN the commit (no single-task convoy), and the
    availableNow pass over the commit clears in seconds. Pins the
    close-as-not-needed decision for per-commit sub-offset chunking:
    intra-commit parallelism is already file/stripe-grained; only the
    OFFSET granularity is commit-level."""
    import time

    from columnar_format_spark.colf.datasource import (
        plan_changelog_partitions)

    p = str(tmp_path / "bigcommit")
    _df(colf_spark, 0, 100_000).repartition(4).write.format("colf") \
        .option("version", "3").option("stripeRows", "8192") \
        .mode("overwrite").save(p)
    assert load_snapshots(p)[-1]["version"] == 1

    # structural: the single commit plans to many executor partitions
    parts = plan_changelog_partitions(p, 0, 1, False)
    assert len(parts) >= 12, f"one-task convoy: {len(parts)} partitions"

    out = str(tmp_path / "out")
    t0 = time.monotonic()
    q = (colf_spark.readStream.format("colf")
         .option("readChangeFeed", "true")
         .option("maxCommitsPerTrigger", "1").load(p)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    wall = time.monotonic() - t0
    got = colf_spark.read.parquet(out)
    assert got.count() == 100_000
    assert got.select("_change_type").distinct().collect()[0][0] == "insert"
    # the measurement: a 100k-row commit is one micro-batch and far
    # from a stall (generous bound; observed single-digit seconds)
    assert wall < 90, f"single-commit micro-batch took {wall:.1f}s"
