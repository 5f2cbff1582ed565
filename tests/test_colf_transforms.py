"""Partition transforms (Iceberg-style hidden partitioning):
``bucket(N,col)`` / ``truncate(N,col)`` entries in partitionColumns.
The derived value is never a materialized column — the split writer
groups on it and records it in the manifest tuple; the reader prunes
bucket files by mapping pushed EqualTo/In probes through the same
md5 bucket function, while truncate/identity files stay served
exactly by raw-column zone maps."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, In

from columnar_format_spark.colf.datasource import (
    ColfReader,
    bucket_of,
    current_partition_spec,
    live_files,
    load_manifest,
    parse_partition_transforms,
    register,
    transform_scalar,
)
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import compact


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


# ---------- pure parsing / derivation ----------


def test_parse_transforms():
    ts = parse_partition_transforms(
        ["a", "bucket(16, k)", "truncate(4,s)"])
    assert [(t.key, t.kind, t.col, t.n) for t in ts] == [
        ("a", "identity", "a", 0),
        ("bucket(16,k)", "bucket", "k", 16),
        ("truncate(4,s)", "truncate", "s", 4)]
    with pytest.raises(ColfFormatError):
        parse_partition_transforms(["bucket(0,k)"])
    with pytest.raises(ColfFormatError):
        parse_partition_transforms(["bucket(1,k)"])
    with pytest.raises(ColfFormatError):
        parse_partition_transforms(["month(ts)"])


def test_transform_scalar_semantics():
    t_b = parse_partition_transforms(["bucket(8,k)"])[0]
    t_ti = parse_partition_transforms(["truncate(100,k)"])[0]
    t_ts = parse_partition_transforms(["truncate(2,s)"])[0]
    assert transform_scalar(t_b, None, "int32") is None
    assert 0 <= transform_scalar(t_b, 12345, "int32") < 8
    # same value → same bucket, always
    assert (transform_scalar(t_b, 12345, "int32")
            == bucket_of(12345, "int32", 8))
    assert transform_scalar(t_ti, 250, "int32") == 200
    assert transform_scalar(t_ti, -1, "int32") == -100  # floor, not trunc
    assert transform_scalar(t_ts, "héllo", "utf8") == "hé"  # codepoints


# ---------- bucket: write layout + probe pruning ----------


@pytest.fixture()
def bucket_ds(colf_spark, tmp_path):
    p = str(tmp_path / "bds")
    df = colf_spark.range(1, 5001).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 97).cast("string").alias("tag"))
    (df.coalesce(2).write.format("colf")
     .option("partitionColumns", "bucket(8,k)")
     .mode("overwrite").save(p))
    return p


def test_bucket_layout_and_spec(colf_spark, bucket_ds):
    assert current_partition_spec(bucket_ds) == ["bucket(8,k)"]
    man = load_manifest(bucket_ds)
    live = [os.path.basename(f) for f in live_files(bucket_ds)]
    assert 8 <= len(live) <= 16  # ≤ tasks × buckets
    for b in live:
        part = man[b]["partition"]
        assert set(part) == {"bucket(8,k)"}
        assert 0 <= part["bucket(8,k)"] < 8
    # every file's ROWS actually belong to its recorded bucket
    back = colf_spark.read.format("colf").option("withFileColumn", "true") \
        .load(bucket_ds)
    for row in back.select("k", "_colf_file").collect()[:500]:
        assert (bucket_of(row.k, "int32", 8)
                == man[row["_colf_file"]]["partition"]["bucket(8,k)"])


def test_bucket_point_lookup_prunes(colf_spark, bucket_ds):
    man = load_manifest(bucket_ds)
    schema = colf_spark.read.format("colf").load(bucket_ds).schema

    def opened(flt):
        r = ColfReader({"path": bucket_ds, "pruning": "on"}, schema)
        r.pushFilters([flt])
        return {os.path.basename(p.file) for p in r.partitions()
                if p.file is not None}

    for probe in (17, 4242, 4999):
        b = bucket_of(probe, "int32", 8)
        expect = {f for f, e in man.items()
                  if e["partition"]["bucket(8,k)"] == b}
        assert opened(EqualTo(("k",), probe)) <= expect
        # the answer is right regardless
        got = (colf_spark.read.format("colf").load(bucket_ds)
               .filter(F.col("k") == probe).collect())
        assert len(got) == 1 and got[0].tag == str(probe % 97)
    # IN-list probes prune to the union of the probed buckets
    probes = [10, 20, 30]
    bs = {bucket_of(v, "int32", 8) for v in probes}
    expect = {f for f, e in man.items()
              if e["partition"]["bucket(8,k)"] in bs}
    assert opened(In(("k",), tuple(probes))) <= expect
    n = (colf_spark.read.format("colf").load(bucket_ds)
         .filter(F.col("k").isin(probes)).count())
    assert n == 3


def test_bucket_results_match_unpruned(colf_spark, bucket_ds):
    on = colf_spark.read.format("colf").load(bucket_ds)
    off = colf_spark.read.format("colf").option("pruning", "off") \
        .load(bucket_ds)
    for probe in (1, 777, 5000, 999999):
        assert (on.filter(F.col("k") == probe).count()
                == off.filter(F.col("k") == probe).count())


def test_string_bucket_roundtrip(colf_spark, tmp_path):
    p = str(tmp_path / "sbds")
    df = colf_spark.range(2000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("u"),
        F.col("id").cast("int").alias("v"))
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "bucket(4,u)")
     .mode("overwrite").save(p))
    man = load_manifest(p)
    assert {e["partition"]["bucket(4,u)"] for e in man.values()} <= set(range(4))
    got = (colf_spark.read.format("colf").load(p)
           .filter(F.col("u") == "user-1234").collect())
    assert len(got) == 1 and got[0].v == 1234
    schema = colf_spark.read.format("colf").load(p).schema
    r = ColfReader({"path": p, "pruning": "on"}, schema)
    r.pushFilters([EqualTo(("u",), "user-1234")])
    opened = {pt.file for pt in r.partitions() if pt.file is not None}
    b = bucket_of("user-1234", "utf8", 4)
    assert all(man[os.path.basename(f)]["partition"]["bucket(4,u)"] == b
               for f in opened)


def test_bucket_nulls_form_their_own_file(colf_spark, tmp_path):
    p = str(tmp_path / "nbds")
    df = colf_spark.range(100).select(
        F.when(F.col("id") < 10, None)
         .otherwise(F.col("id")).cast("int").alias("k"))
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "bucket(4,k)")
     .mode("overwrite").save(p))
    man = load_manifest(p)
    tuples = [e["partition"]["bucket(4,k)"] for e in man.values()]
    assert None in tuples  # all-null rows got their own file
    # fresh load() per differently-filtered query: upstream pyspark
    # caches a python-datasource read plan per relation, and a
    # FILTERLESS action reuses the last filtered plan (see
    # test_colf_pushdown.py::test_upstream_plan_cache_staleness)
    back = colf_spark.read.format("colf").load(p)
    assert back.filter(F.col("k").isNull()).count() == 10
    assert colf_spark.read.format("colf").load(p).count() == 100
    schema = back.schema
    r = ColfReader({"path": p, "pruning": "on"}, schema)
    r.pushFilters([EqualTo(("k",), 50)])
    opened = {os.path.basename(pt.file) for pt in r.partitions()
              if pt.file is not None}
    null_files = {b for b, e in man.items()
                  if e["partition"]["bucket(4,k)"] is None}
    assert not (opened & null_files)


# ---------- truncate ----------


def test_truncate_int_layout_and_zonemap_pruning(colf_spark, tmp_path):
    p = str(tmp_path / "tds")
    df = colf_spark.range(1, 1001).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("int").alias("v"))
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "truncate(100,k)")
     .mode("overwrite").save(p))
    man = load_manifest(p)
    for e in man.values():
        base = e["partition"]["truncate(100,k)"]
        assert base % 100 == 0
        # the file's raw zone map stays inside its truncate group —
        # that is why equality/range pruning needs no new reader code
        assert base <= e["columns"]["k"]["min"]
        assert e["columns"]["k"]["max"] < base + 100
    schema = colf_spark.read.format("colf").load(p).schema
    r = ColfReader({"path": p, "pruning": "on"}, schema)
    r.pushFilters([EqualTo(("k",), 250)])
    assert len({pt.file for pt in r.partitions()
                if pt.file is not None}) == 1
    assert (colf_spark.read.format("colf").load(p)
            .filter(F.col("k") == 250).first().v == 500)


def test_truncate_string_prefix_groups(colf_spark, tmp_path):
    p = str(tmp_path / "tsds")
    df = colf_spark.createDataFrame(
        [("alpha", 1), ("albatross", 2), ("beta", 3), ("bench", 4),
         ("gamma", 5)], "s string, v int")
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "truncate(2,s)")
     .mode("overwrite").save(p))
    man = load_manifest(p)
    groups = sorted(e["partition"]["truncate(2,s)"] for e in man.values())
    assert groups == ["al", "be", "ga"]
    back = colf_spark.read.format("colf").load(p)
    assert back.filter(F.col("s") == "bench").first().v == 4


# ---------- maintenance + guard ----------


def test_compact_preserves_bucket_layout(colf_spark, bucket_ds):
    compact(colf_spark, bucket_ds, 2)
    assert current_partition_spec(bucket_ds) == ["bucket(8,k)"]
    man = load_manifest(bucket_ds)
    live = [os.path.basename(f) for f in live_files(bucket_ds)]
    assert all(set(man[b]["partition"]) == {"bucket(8,k)"} for b in live)
    back = colf_spark.read.format("colf").load(bucket_ds)
    assert back.count() == 5000
    assert back.filter(F.col("k") == 4242).count() == 1


def test_high_cardinality_guard_suggests_bucket(colf_spark, tmp_path):
    df = colf_spark.range(200).select(F.col("id").cast("int").alias("k"))
    with pytest.raises(Exception) as ei:
        (df.coalesce(1).write.format("colf")
         .option("partitionColumns", "k")
         .option("partitionTupleCap", "50")
         .mode("overwrite").save(str(tmp_path / "guard")))
    assert "bucket(N,k)" in str(ei.value)


def test_float_source_rejected(colf_spark, tmp_path):
    df = colf_spark.range(10).select((F.col("id") * 0.5).alias("x"))
    with pytest.raises(Exception) as ei:
        (df.write.format("colf").option("partitionColumns", "bucket(4,x)")
         .mode("overwrite").save(str(tmp_path / "fl")))
    assert "float64" in str(ei.value)


# ---------- transforms through the streaming sink and CoW merge ----------


def test_stream_sink_bucket_transform(colf_spark, tmp_path):
    """The CDC sink shares the split writer, so a stream can land
    bucket-partitioned: every micro-batch file carries its bucket
    tuple and the spec is recorded on the first commit."""
    src = str(tmp_path / "bsrc")
    out = str(tmp_path / "bout")
    ckpt = str(tmp_path / "bckpt")
    df = colf_spark.range(1, 201).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 3).cast("int").alias("v"))
    df.coalesce(2).write.mode("overwrite").parquet(src)
    q = (colf_spark.readStream.schema("k int, v int").parquet(src)
         .writeStream.format("colf")
         .option("path", out)
         .option("partitionColumns", "bucket(4,k)")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert current_partition_spec(out) == ["bucket(4,k)"]
    man = load_manifest(out)
    for b, e in man.items():
        assert 0 <= e["partition"]["bucket(4,k)"] < 4
    back = colf_spark.read.format("colf").load(out)
    assert sorted(r.k for r in back.collect()) == list(range(1, 201))


def test_merge_into_prunes_by_bucket(colf_spark, tmp_path):
    """A key-UPSERT into a bucket-partitioned dataset must rewrite only
    files of the probed keys' buckets: discovery pushes .isin(keys) on
    the raw column, and the reader's bucket mapping prunes the rest —
    the GDPR/point-merge cost model on a high-cardinality key."""
    from columnar_format_spark.colf.maintenance import merge_into

    p = str(tmp_path / "mds")
    df = colf_spark.range(1, 4001).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("int").alias("v"))
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "bucket(8,k)")
     .mode("overwrite").save(p))
    man_before = load_manifest(p)
    n_files = len(live_files(p))
    assert n_files == 8  # one task → one file per bucket

    # upsert three keys — at most 3 distinct buckets touched
    src = colf_spark.createDataFrame(
        [(5, 500), (77, 700), (3999, 900)], "k int, v int")
    stats = merge_into(colf_spark, p, src, key_cols=["k"])
    touched_buckets = {bucket_of(k, "int32", 8) for k in (5, 77, 3999)}
    # discovery came from metadata and touched ONLY the probed
    # buckets' files: untouched = kept byte-identical
    assert stats["discovery"] == "metadata-in"
    assert n_files - stats["n_kept_files"] <= len(touched_buckets)
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 4000
    got = {r.k: r.v for r in back.filter(F.col("k").isin(5, 77, 3999)).collect()}
    assert got == {5: 500, 77: 700, 3999: 900}
    # rewrites stayed in-spec
    man = load_manifest(p)
    assert all(set(e["partition"]) == {"bucket(8,k)"} for e in man.values())


def test_truncate_int_min_edge(colf_spark, tmp_path):
    """truncate() of INT32_MIN-adjacent values leaves int32 range; the
    vectorized (group-key) path must agree with the scalar (manifest-
    tuple) path instead of wrapping."""
    p = str(tmp_path / "edge")
    df = colf_spark.createDataFrame(
        [(-2147483648,), (-2147483600,), (0,), (2147483647,)], "k int")
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "truncate(100,k)")
     .mode("overwrite").save(p))
    man = load_manifest(p)
    got = sorted(e["partition"]["truncate(100,k)"] for e in man.values())
    assert got == [-2147483700, -2147483600, 0, 2147483600]
    t = parse_partition_transforms(["truncate(100,k)"])[0]
    for v in (-2147483648, -2147483600, 0, 2147483647):
        assert transform_scalar(t, v, "int32") in got
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 4
    assert back.filter(F.col("k") == -2147483648).count() == 1


def test_delete_where_prunes_by_bucket(colf_spark, tmp_path):
    """A point DELETE on a bucket-partitioned dataset (the GDPR
    erasure shape on a high-cardinality key) must plan its touched
    files from metadata: the parsed equality probe maps through the
    bucket function, so only the key's bucket file is rewritten."""
    from columnar_format_spark.colf.maintenance import delete_where

    p = str(tmp_path / "dds")
    df = colf_spark.range(1, 2001).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("string").alias("tag"))
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "bucket(8,k)")
     .mode("overwrite").save(p))
    n_before = len(live_files(p))
    assert n_before == 8
    stats = delete_where(colf_spark, p, "k = 777")
    assert stats["n_deleted_rows"] == 1
    # exactly one input file was touched: the probe bucket's
    assert stats.get("n_rewritten_files", 1) >= 1
    assert n_before - stats["n_kept_files"] == 1
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 1999
    assert back.filter(F.col("k") == 777).count() == 0


def test_composite_identity_and_bucket_spec(colf_spark, tmp_path):
    """A spec can mix identity and transform entries — e.g. partition
    by tenant AND bucket of user id: tuples carry both keys, equality
    probes prune on either (zone maps for the identity key, bucket
    mapping for the transformed one)."""
    p = str(tmp_path / "comp")
    df = colf_spark.range(1, 1001).select(
        (F.col("id") % 3).cast("string").alias("tenant"),
        F.col("id").cast("int").alias("uid"),
        (F.col("id") * 7).cast("int").alias("v"))
    (df.coalesce(1).write.format("colf")
     .option("partitionColumns", "tenant,bucket(4,uid)")
     .mode("overwrite").save(p))
    assert current_partition_spec(p) == ["tenant", "bucket(4,uid)"]
    man = load_manifest(p)
    assert len(man) <= 12  # 3 tenants × 4 buckets
    for e in man.values():
        assert set(e["partition"]) == {"tenant", "bucket(4,uid)"}
    schema = colf_spark.read.format("colf").load(p).schema
    r = ColfReader({"path": p, "pruning": "on"}, schema)
    r.pushFilters([EqualTo(("tenant",), "1"), EqualTo(("uid",), 700)])
    opened = {os.path.basename(pt.file) for pt in r.partitions()
              if pt.file is not None}
    b = bucket_of(700, "int32", 4)
    assert all(man[f]["partition"] == {"tenant": "1",
                                       "bucket(4,uid)": b}
               for f in opened)
    assert len(opened) == 1
    got = (colf_spark.read.format("colf").load(p)
           .filter((F.col("tenant") == "1") & (F.col("uid") == 700))
           .collect())
    assert len(got) == 1 and got[0].v == 4900
