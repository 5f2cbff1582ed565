"""COLF streaming source & sink: the dataset-directory convention
extended to micro-batches — the source tails new part files, the sink
appends one part file per task per batch with the zone-map manifest
kept current. Offsets are replayable file lists (exactly-once within
a checkpoint)."""

import os

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import load_manifest, register

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _drain(q):
    q.awaitTermination()


def test_stream_read_tails_new_files(spark, tmp_path):
    d = str(tmp_path / "ds")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    region = spark.read.parquet(f"{SF_SMALL}/region.parquet").select(
        F.col("r_regionkey").cast("int").alias("k"), F.col("r_name").alias("name"))
    region.coalesce(1).write.format("colf").mode("append").save(d)

    def run_batch():
        # parquet sink + shared checkpoint: rows ACCUMULATE, so any
        # re-delivery of an already-consumed file would show up as
        # duplicate rows below
        q = (
            spark.readStream.format("colf").load(d)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        _drain(q)
        return [(r.k, r.name) for r in spark.read.parquet(out).collect()]

    first = run_batch()
    want = {(r.k, r.name) for r in region.collect()}
    assert set(first) == want and len(first) == len(want)

    # append more files: the next run must deliver ONLY the new rows
    extra = spark.createDataFrame([(100, "newland"), (101, "newsea")], "k int, name string")
    extra.coalesce(1).write.format("colf").mode("append").save(d)
    second = run_batch()
    assert set(second) == want | {(100, "newland"), (101, "newsea")}
    assert len(second) == len(want) + 2  # no duplicates = no re-delivery


def test_stream_write_appends_and_manifests(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet").select(
        F.col("n_nationkey").cast("int").alias("k"), F.col("n_name").alias("name"))
    nation.write.mode("overwrite").parquet(src)

    q = (
        spark.readStream.schema("k int, name string").parquet(src)
        .writeStream.format("colf")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    _drain(q)

    back = spark.read.format("colf").load(out)
    assert {(r.k, r.name) for r in back.collect()} == \
           {(r.k, r.name) for r in nation.collect()}
    m = load_manifest(out)
    files = {f for f in os.listdir(out) if f.endswith(".colf")}
    assert files and set(m) == files  # every part file has zone maps

    # second batch appends (same checkpoint, new source file)
    extra = spark.createDataFrame([(900, "atlantis")], "k int, name string")
    extra.coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.schema("k int, name string").parquet(src)
        .writeStream.format("colf")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    _drain(q)
    back2 = spark.read.format("colf").load(out)
    assert back2.count() == nation.count() + 1
    assert set(load_manifest(out)) == {f for f in os.listdir(out) if f.endswith(".colf")}


def test_stream_roundtrip_colf_to_colf(spark, tmp_path):
    """source and sink composed: tail a COLF dataset, transform, write
    a COLF dataset."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame([(i, float(i) * 1.5) for i in range(100)], "k int, v double")
    df.coalesce(2).write.format("colf").mode("append").save(src)
    q = (
        spark.readStream.format("colf").load(src)
        .withColumn("v2", F.col("v") * 2)
        .writeStream.format("colf")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    _drain(q)
    back = spark.read.format("colf").load(out)
    assert back.count() == 100
    assert back.agg(F.sum(F.col("v2").cast("decimal(18,2)")).cast("double")).first()[0] == \
        sum(i * 1.5 * 2 for i in range(100))


@pytest.mark.slow
def test_stream_multibatch_replays_each_file_once(spark, tmp_path):
    """maxFilesPerTrigger=1 forces one micro-batch per part file: the
    final aggregate must equal the batch answer — each file consumed
    exactly once across batches (the offset-replay contract q109's
    single-batch oracle check cannot distinguish)."""
    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(300)], "k int, g int, v double")
    df.repartition(6).write.format("colf").mode("append").save(src)

    agg = (
        spark.readStream.format("colf")
        .option("maxFilesPerTrigger", "1")
        .load(src)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"))
    )
    import time

    # availableNow snapshots its end offset from the FIRST capped
    # read, so a rate-limited drain needs a continuous trigger:
    # poll until the complete-mode state covers every file, then stop.
    name = "t_multibatch"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .trigger(processingTime="50 milliseconds").start())
    want = {r["g"]: (r["n"], r["s"]) for r in (
        df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"))
    ).collect()}
    got = {}
    deadline = time.time() + 90
    while time.time() < deadline:
        got = {r["g"]: (r["n"], r["s"])
               for r in spark.table(name).collect()}
        if got == want:
            break
        time.sleep(0.5)
    q.stop()
    assert got == want
    # the rate limit must have split the drain into one batch per file
    n_batches = sum(1 for pr in q.recentProgress if pr["numInputRows"] > 0)
    assert n_batches == 6, n_batches


def _mk_reader(spark, path, **opts):
    import warnings

    from pyspark.sql.types import StructType

    from columnar_format_spark.colf.datasource import ColfStreamReader

    schema = StructType.fromDDL("k int, name string")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # maxFilesPerTrigger caveat
        return ColfStreamReader({"path": path, **opts}, schema)


def _seed_files(spark, d, n_files):
    df = spark.createDataFrame(
        [(i, f"row{i}") for i in range(n_files * 10)], "k int, name string")
    df.repartition(n_files).write.format("colf").mode("append").save(d)


def test_stream_reader_is_executor_side(spark, tmp_path):
    """The source must use the full DataSourceStreamReader API (reads
    planned as per-file InputPartitions executed in tasks), NOT the
    Simple API whose read() materializes every batch on the driver —
    and each partition read must come back Arrow-columnar."""
    import pyarrow as pa
    from pyspark.sql.datasource import DataSourceStreamReader

    from columnar_format_spark.colf.datasource import ColfDataSource

    d = str(tmp_path / "ds")
    _seed_files(spark, d, 3)
    r = _mk_reader(spark, d)
    assert isinstance(r, DataSourceStreamReader)
    # the Simple path must be gone (it is what driver-materialized rows)
    assert "simpleStreamReader" not in ColfDataSource.__dict__
    end = r.latestOffset()
    parts = r.partitions({"files": []}, end)
    assert len(parts) == 3  # one InputPartition per file = per-task read
    batches = list(r.read(parts[0]))
    assert len(batches) == 1 and isinstance(batches[0], pa.RecordBatch)
    assert batches[0].num_rows == 10


@pytest.mark.slow
def test_stream_restart_resumes_exactly_once(spark, tmp_path):
    """End-to-end through the real engine: a rate-limited stream is
    stopped mid-drain and restarted from its checkpoint; after new
    files arrive, the sink must hold every row exactly once — the
    restart path where a capped latestOffset briefly trails the
    checkpoint (unit-tested above) must not re-deliver or drop."""
    import time

    d = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _seed_files(spark, d, 6)  # 60 rows

    def start():
        return (
            spark.readStream.format("colf")
            .option("maxFilesPerTrigger", "1").load(d)
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds").start()
        )

    def rows():
        try:
            return sorted((r.k, r.name) for r in spark.read.parquet(out).collect())
        except Exception:
            return []

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(rows()) < 20:  # ≥2 batches in
        time.sleep(0.2)
    q.stop()  # mid-drain stop
    assert 0 < len(rows()) <= 60

    # new data arrives while the query is down
    extra = spark.createDataFrame([(900, "x"), (901, "y")], "k int, name string")
    extra.coalesce(1).write.format("colf").mode("append").save(d)

    q = start()
    want = sorted([(i, f"row{i}") for i in range(60)] + [(900, "x"), (901, "y")])
    got = []
    deadline = time.time() + 90
    while time.time() < deadline:
        got = rows()
        if got == want:
            break
        time.sleep(0.5)
    q.stop()
    assert got == want  # every row exactly once across the restart


def test_stream_reader_offset_capping_and_replay(spark, tmp_path):
    """Offset semantics, driven directly: offsets are constant-size
    (version, k) cursors into the metadata log; the cap admits N files
    per latestOffset; batches are exactly end−start; a capped cursor
    computed on a fresh reader against an existing checkpoint (restart)
    sits "behind" it, yields one EMPTY catch-up batch, and never
    re-delivers."""
    d = str(tmp_path / "ds")
    _seed_files(spark, d, 5)  # ONE log commit with 5 files
    r = _mk_reader(spark, d, maxFilesPerTrigger="2")
    assert r.initialOffset() == {"v": 0, "k": 0}
    o1 = r.latestOffset()
    assert o1 == {"v": 1, "k": 2}  # constant-size cursor, 2 admitted
    assert len(r.partitions({"v": 0, "k": 0}, o1)) == 2
    o2 = r.latestOffset()
    assert o2 == {"v": 1, "k": 4}
    assert len(r.partitions(o1, o2)) == 2

    # restart: fresh reader, checkpoint already covers 4 files; first
    # latestOffset runs with no baseline and caps to the 2 earliest
    # files — "behind" the checkpoint
    r2 = _mk_reader(spark, d, maxFilesPerTrigger="2")
    stale = r2.latestOffset()
    assert stale == {"v": 1, "k": 2}
    # batch = end − start = empty: no re-delivery, just a no-op batch
    assert r2.partitions(o2, stale) == []
    # partitions() rehydrated the baseline from the checkpoint offsets:
    # the next offset admits only the genuinely-new 5th file
    o3 = r2.latestOffset()
    assert o3 == {"v": 1, "k": 5}
    assert len(r2.partitions(o2, o3)) == 1


def test_stream_offsets_upgrade_from_legacy(spark, tmp_path):
    """A checkpoint written by the old reader holds sorted-basename
    LIST offsets; the new reader must replay its WAL batch from them,
    then continue with cursor offsets without re-delivering or
    dropping a file (both forms expand to file sets; batches are set
    differences)."""
    d = str(tmp_path / "ds")
    _seed_files(spark, d, 5)
    names = sorted(os.path.basename(f) for f in os.listdir(d)
                   if f.endswith(".colf"))
    r = _mk_reader(spark, d, maxFilesPerTrigger="2")
    # WAL replay of a legacy batch: old-format start AND end offsets
    parts = r.partitions({"files": names[:2]}, {"files": names[:4]})
    assert sorted(os.path.basename(p.file) for p in parts) == names[2:4]
    r.commit({"files": names[:4]})
    # next offset is cursor-form and admits ONLY the unconsumed 5th
    # file (the 4 legacy-consumed files advance the cursor for free)
    o = r.latestOffset()
    assert o == {"v": 1, "k": 5}
    parts2 = r.partitions({"files": names[:4]}, o)  # mixed-form batch
    assert [os.path.basename(p.file) for p in parts2] == [names[4]]


@pytest.mark.slow
def test_stream_offsets_stay_constant_size_across_commits(spark, tmp_path):
    """The offset payload must not grow with the file count — the old
    format serialized every consumed basename into every commit."""
    import json as _json

    d = str(tmp_path / "ds")
    _seed_files(spark, d, 3)
    r = _mk_reader(spark, d)
    small = len(_json.dumps(r.latestOffset()))
    for i in range(20):  # 20 more single-file append commits
        spark.createDataFrame([(1000 + i, "x")], "k int, name string") \
            .coalesce(1).write.format("colf").mode("append").save(d)
    big = len(_json.dumps(r.latestOffset()))
    assert big <= small + 4  # a couple of digits, not O(files)


def test_stream_reader_legacy_mode_for_logless_dirs(spark, tmp_path):
    """Dirs without a metadata log (reference writer, hand-assembled)
    keep the legacy list offsets — still correct, documented O(files)."""
    from columnar_format_spark.colf.format import ColfColumn, ColfSchema, write_colf

    d = str(tmp_path / "refdir")
    os.makedirs(d)
    for i, name in enumerate(["a.colf", "b.colf"]):
        write_colf(os.path.join(d, name),
                   ColfSchema(1, [ColfColumn("k", "int32", False),
                                  ColfColumn("name", "utf8", False)]),
                   {"k": [i], "name": [f"r{i}"]})
    r = _mk_reader(spark, d)
    o = r.latestOffset()
    assert o == {"files": ["a.colf", "b.colf"]}
    parts = r.partitions(r.initialOffset(), o)
    assert sorted(os.path.basename(p.file) for p in parts) == \
        ["a.colf", "b.colf"]


def test_stream_write_v2_option(spark, tmp_path):
    """The streaming sink honors option('version', '2') — micro-batch
    part files carry the v2 preamble/encodings and read back exactly."""
    from columnar_format_spark.colf.format import read_schema

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = spark.range(200).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 5).cast("string").alias("tag"))
    df.coalesce(1).write.format("colf").mode("append").save(src)
    q = (
        spark.readStream.format("colf").load(src)
        .writeStream.format("colf")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .option("version", "2")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = [os.path.join(out, f) for f in os.listdir(out)
             if f.endswith(".colf")]
    assert files
    for f in files:
        s = read_schema(f)
        assert s.version == 2
        assert {c.name: c.encoding for c in s.columns} == {
            "id": "delta", "tag": "dict"}
    back = spark.read.format("colf").load(out)
    assert back.count() == 200
    assert back.agg(F.sum("id")).first()[0] == sum(range(200))


def test_stream_write_builds_blooms(spark, tmp_path):
    """Streaming sink + bloomColumns: every micro-batch's part files
    land with Bloom entries in the sidecar, so a batch point lookup
    over the streamed dataset prunes exactly like over a batch-written
    one."""
    from pyspark.sql.datasource import EqualTo

    from columnar_format_spark.colf.datasource import ColfReader, load_blooms

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (spark.range(0, 2000, 2).select(F.col("id").cast("int").alias("k"))
     .repartition(4).write.mode("overwrite").parquet(src))
    q = (
        spark.readStream.schema("k int").parquet(src)
        .writeStream.format("colf")
        .option("path", out)
        .option("bloomColumns", "k")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    _drain(q)
    files = {f for f in os.listdir(out) if f.endswith(".colf")}
    blooms = load_blooms(out)
    assert files and files <= set(blooms)
    schema = spark.read.format("colf").load(out).schema
    r = ColfReader({"path": out}, schema)
    r.pushFilters([EqualTo(("k",), 999)])  # odd: absent everywhere
    opened = len([p for p in r.partitions() if p.file is not None])
    assert opened <= 1  # blooms prove absence (±1 fp)
    assert (spark.read.format("colf").load(out)
            .filter(F.col("k") == 1000).count()) == 1


def test_merge_replay_after_midcommit_crash_is_idempotent(
        spark, tmp_path, monkeypatch):
    """Writer-side exactly-once for the foreachBatch MERGE sink (q161's
    apply path): a merge that dies AFTER moving its rewritten files
    into the live dir but BEFORE the snapshot commit must be invisible
    to readers, and replaying the same batch must apply it exactly
    once — visibility is the CAS snapshot commit, never the file
    moves."""
    from columnar_format_spark.colf import maintenance as M

    d = str(tmp_path / "ds")
    (spark.range(100).select(F.col("id").cast("int").alias("k"),
                             (F.col("id") * 1.0).alias("v"))
     .repartition(4).write.format("colf").mode("append").save(d))
    src = spark.range(0, 10).select(F.col("id").cast("int").alias("k"),
                                    F.lit(999.0).alias("v"))

    real_commit = M.commit_snapshot

    def crashing_commit(*a, **kw):
        raise RuntimeError("simulated crash before snapshot commit")

    monkeypatch.setattr(M, "commit_snapshot", crashing_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        M.merge_into(spark, d, src, ["k"])
    monkeypatch.setattr(M, "commit_snapshot", real_commit)

    # the crashed attempt is invisible (orphan part files are not in
    # any committed snapshot): reads still see the pre-merge dataset
    after_crash = spark.read.format("colf").load(d)
    assert after_crash.count() == 100
    assert after_crash.filter("v = 999.0").count() == 0

    # replaying the SAME batch applies it exactly once
    res = M.merge_into(spark, d, src, ["k"])
    assert res["n_source_rows"] == 10
    back = spark.read.format("colf").load(d)
    assert back.count() == 100
    assert back.filter("v = 999.0").count() == 10
    assert back.groupBy("k").count().filter("count > 1").count() == 0


def test_merge_same_batch_twice_is_content_idempotent(spark, tmp_path):
    """Replay after a SUCCESSFUL commit (lost checkpoint): re-merging
    the identical batch must leave the dataset byte-for-value identical
    — MERGE is content-idempotent, the exactly-once guarantee a
    replayed foreachBatch needs."""
    from columnar_format_spark.colf.maintenance import merge_into

    d = str(tmp_path / "ds")
    (spark.range(60).select(F.col("id").cast("int").alias("k"),
                            (F.col("id") * 1.0).alias("v"))
     .repartition(3).write.format("colf").mode("append").save(d))
    src = spark.range(0, 7).select(F.col("id").cast("int").alias("k"),
                                   F.lit(-1.0).alias("v"))

    merge_into(spark, d, src, ["k"])
    first = sorted(map(tuple, spark.read.format("colf").load(d).collect()))
    r2 = merge_into(spark, d, src, ["k"])
    second = sorted(map(tuple, spark.read.format("colf").load(d).collect()))
    assert first == second
    assert r2["n_replaced_rows"] == 7  # replay replaces with equal rows


def test_stream_sink_partition_columns(spark, tmp_path):
    """The streaming sink honors partitionColumns: every micro-batch
    file is value-homogeneous with its tuple in the manifest, so a
    CDC-fed dataset keeps exact partition pruning as it grows."""
    src = str(tmp_path / "psrc")
    out = str(tmp_path / "pout")
    ckpt = str(tmp_path / "pckpt")
    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(40)], "k int, grp string")
    df.coalesce(2).write.mode("overwrite").parquet(src)

    q = (
        spark.readStream.schema("k int, grp string").parquet(src)
        .writeStream.format("colf")
        .option("path", out)
        .option("partitionColumns", "grp")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    _drain(q)

    manifest = load_manifest(out)
    assert manifest
    for entry in manifest.values():
        part = entry["partition"]["grp"]
        cstats = entry["columns"]["grp"]
        assert cstats["min"] == cstats["max"] == part
    assert {e["partition"]["grp"] for e in manifest.values()} == {"a", "b"}
    back = spark.read.format("colf").load(out)
    assert sorted(r["k"] for r in back.collect()) == list(range(40))


def test_stream_reader_byte_capping(spark, tmp_path):
    """maxBytesPerTrigger is a soft cap (Delta semantics): files admit
    until the batch's cumulative size reaches the cap — the crossing
    file included — and the first file always admits. Composes with
    maxFilesPerTrigger."""
    d = str(tmp_path / "ds")
    _seed_files(spark, d, 5)  # one commit, 5 similar-size files
    sz = min(os.path.getsize(os.path.join(d, f))
             for f in os.listdir(d) if f.endswith(".colf"))

    # cap below one file: exactly one file per offset (progress holds)
    r = _mk_reader(spark, d, maxBytesPerTrigger=str(sz // 2))
    o1 = r.latestOffset()
    assert o1 == {"v": 1, "k": 1}
    assert len(r.partitions({"v": 0, "k": 0}, o1)) == 1

    # cap at ~1.5 files: two files admit (the crossing file included)
    r2 = _mk_reader(spark, d, maxBytesPerTrigger=str(sz + sz // 2))
    o = r2.latestOffset()
    assert o == {"v": 1, "k": 2}

    # file cap tighter than byte cap wins
    r3 = _mk_reader(spark, d, maxFilesPerTrigger="1",
                    maxBytesPerTrigger=str(10 * sz))
    assert r3.latestOffset() == {"v": 1, "k": 1}

    # changelog mode refuses byte caps (per-commit atomicity)
    import pytest as _pytest

    from columnar_format_spark.colf.format import ColfFormatError

    with _pytest.raises(ColfFormatError, match="maxBytesPerTrigger"):
        _mk_reader(spark, d, readChangeFeed="true",
                   maxBytesPerTrigger="100")


def test_stream_sink_embeds_field_ids_on_evolved_dataset(spark, tmp_path):
    """A micro-batch append to a schema-EVOLVED dataset must embed the
    table's field IDs (the batch writer's contract): without them the
    renamed column resolves only through the frozen bootstrap name
    mapping — which holds the historical name — and every streamed row
    would silently decode as NULL."""
    from columnar_format_spark.colf.maintenance import rename_column

    src = str(tmp_path / "esrc")
    out = str(tmp_path / "eout")
    ckpt = str(tmp_path / "eckpt")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], "k int, val string")
    base.coalesce(1).write.format("colf").mode("overwrite").save(out)
    rename_column(out, "val", "name")

    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(5, 10)], "k int, name string")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema("k int, name string").parquet(src)
        .writeStream.format("colf")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    _drain(q)

    back = spark.read.format("colf").load(out)
    got = {r["k"]: r["name"] for r in back.collect()}
    assert got == ({i: f"v{i}" for i in range(5)}
                   | {i: f"n{i}" for i in range(5, 10)})
    assert back.filter("name IS NULL").count() == 0


def test_changelog_max_commits_per_trigger(spark, tmp_path):
    """maxCommitsPerTrigger (round-11): a changelog stream over a
    table with a commit backlog drains a bounded number of PUBLISHED
    commits per trigger — the commit is the atomicity unit a change
    feed cannot split — and delivers exactly the same rows as an
    uncapped feed. Plain-stream misuse and the existing file/byte-cap
    refusal both stay loud."""
    import pytest as _pytest

    from columnar_format_spark.colf.format import ColfFormatError

    d = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], "k int, name string")
    base.coalesce(1).write.format("colf").mode("overwrite").save(d)
    for lo in (10, 20, 30):  # 3 more commits: backlog of 4 total
        spark.createDataFrame(
            [(lo, f"v{lo}")], "k int, name string") \
            .coalesce(1).write.format("colf").mode("append").save(d)

    r = _mk_reader(spark, d, readChangeFeed="true",
                   maxCommitsPerTrigger="1")
    offs = [r.initialOffset()]
    seen_rows = 0
    for _ in range(4):  # one commit per trigger: 4 triggers drain it
        end = r.latestOffset()
        assert end["cv"] == offs[-1]["cv"] + 1  # exactly one commit
        parts = r.partitions(offs[-1], end)
        for p in parts:
            for rb in r.read(p):
                seen_rows += rb.num_rows
        r.commit(end)
        offs.append(end)
    assert r.latestOffset() == offs[-1]  # drained: offset parks
    assert seen_rows == 7  # 4 base inserts + 3 appended inserts

    # batch of 2 commits per trigger
    r2 = _mk_reader(spark, d, readChangeFeed="true",
                    maxCommitsPerTrigger="2")
    o0 = r2.initialOffset()
    o1 = r2.latestOffset()
    assert o1["cv"] == 2
    r2.partitions(o0, o1)
    assert r2.latestOffset()["cv"] == 4  # head reached on trigger 2

    # restart semantics: a reader rehydrated from a checkpointed end
    # (partitions/commit before any latestOffset) never re-admits
    r3 = _mk_reader(spark, d, readChangeFeed="true",
                    maxCommitsPerTrigger="1")
    r3.commit({"cv": 3})
    assert r3.latestOffset()["cv"] == 4

    with _pytest.raises(ColfFormatError, match="maxCommitsPerTrigger"):
        _mk_reader(spark, d, maxCommitsPerTrigger="1")  # no changelog
    with _pytest.raises(ColfFormatError, match="maxCommitsPerTrigger"):
        _mk_reader(spark, d, readChangeFeed="true",
                   maxFilesPerTrigger="1")


def test_max_commits_per_trigger_rejects_negative(spark, tmp_path):
    import pytest as _pytest

    from columnar_format_spark.colf.format import ColfFormatError

    d = str(tmp_path / "ds")
    spark.createDataFrame([(1, "a")], "k int, name string") \
        .write.format("colf").mode("overwrite").save(d)
    with _pytest.raises(ColfFormatError, match="must be >= 1"):
        _mk_reader(spark, d, readChangeFeed="true",
                   maxCommitsPerTrigger="-1")
