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
