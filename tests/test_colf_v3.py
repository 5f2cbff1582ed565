"""COLF v3 striped files (engine extension; format.py docstring):
intra-file parallelism — one scan task per stripe — plus stripe-level
zone-map pruning from the manifest sidecar. v1/v2 behavior unchanged;
the stripes hold v2-encoded column blocks."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

from columnar_format_spark.colf.datasource import (
    ColfDataSource,
    ColfReader,
    load_manifest,
    register,
)
from columnar_format_spark.colf.format import (
    read_schema,
    read_stripes_info,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


@pytest.fixture()
def striped(colf_spark, tmp_path):
    p = str(tmp_path / "ds")
    df = colf_spark.range(50_000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 0.5).alias("v"),
        (F.col("id") % 7).cast("string").alias("tag"))
    (df.orderBy("id").coalesce(1).write.format("colf")
     .option("version", "3").option("stripeRows", "10000")
     .mode("append").save(p))
    return p


def _one_file(p):
    return [os.path.join(p, f) for f in os.listdir(p)
            if f.endswith(".colf")][0]


def test_v3_file_layout_and_roundtrip(colf_spark, striped):
    f = _one_file(striped)
    s = read_schema(f)
    assert s.version == 3
    assert read_stripes_info(f) == [10000] * 5
    back = colf_spark.read.format("colf").load(striped)
    assert back.count() == 50_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(50_000))
    assert back.filter("id = 31337").first().tag == str(31337 % 7)


def test_v3_plans_one_partition_per_stripe(striped):
    ds = ColfDataSource({"path": striped})
    parts = ds.reader(ds.schema()).partitions()
    assert len(parts) == 5
    assert sorted(p.stripe for p in parts) == [0, 1, 2, 3, 4]
    assert len({p.file for p in parts}) == 1


def test_v3_manifest_carries_stripe_stats(striped):
    m = load_manifest(striped)
    (stats,) = m.values()
    assert len(stats["stripes"]) == 5
    for i, st in enumerate(stats["stripes"]):
        assert st["num_rows"] == 10000
        assert st["columns"]["id"]["min"] == i * 10000
        assert st["columns"]["id"]["max"] == (i + 1) * 10000 - 1


def test_v3_stripe_pruning(striped):
    r = ColfReader({"path": striped}, None)
    r.pushFilters([GreaterThan(("id",), 42_000)])
    parts = r.partitions()
    assert [p.stripe for p in parts] == [4]
    r2 = ColfReader({"path": striped}, None)
    r2.pushFilters([LessThanOrEqual(("id",), 9_999)])
    assert [p.stripe for p in r2.partitions()] == [0]


def test_v3_pruned_scan_is_value_correct(colf_spark, striped):
    df = colf_spark.read.format("colf").load(striped).filter("id > 42000")
    assert df.count() == 7_999
    assert df.agg(F.min("id")).first()[0] == 42_001


def test_v3_mixed_version_dataset(colf_spark, tmp_path):
    p = str(tmp_path / "mixed")
    df = colf_spark.range(1000).select(F.col("id").cast("int").alias("id"),
                                       F.lit("x").alias("tag"))
    df.coalesce(1).write.format("colf").mode("append").save(p)
    (df.coalesce(1).write.format("colf").option("version", "3")
     .option("stripeRows", "250").mode("append").save(p))
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 2000
    ds = ColfDataSource({"path": p})
    parts = ds.reader(ds.schema()).partitions()
    # 1 partition for the v1 file + 4 stripes for the v3 file
    assert len(parts) == 5


def test_v3_stripes_use_v2_encodings(striped):
    from columnar_format_spark.colf.format import (
        ENC_BSS, ENC_DELTA, ENC_DICT, read_header_v3,
    )
    import zlib

    f = _one_file(striped)
    with open(f, "rb") as fh:
        schema, stripes, _ = read_header_v3(fh)
        for st in stripes:
            for meta, col in zip(st.metas, schema.columns):
                fh.seek(meta.offset)
                payload = zlib.decompress(fh.read(meta.comp_size))
                enc = payload[2]
                assert enc == {"id": ENC_DELTA, "v": ENC_BSS,
                               "tag": ENC_DICT}[col.name]


def test_v3_delete_where_preserves_striping(colf_spark, striped):
    from columnar_format_spark.colf.maintenance import delete_where

    stats = delete_where(colf_spark, striped, "id < 10000")
    assert stats["n_deleted_rows"] == 10000
    back = colf_spark.read.format("colf").load(striped)
    assert back.count() == 40_000
    from columnar_format_spark.colf.datasource import live_files

    live = live_files(striped)
    assert {read_schema(f).version for f in live} == {3}
    # the rewrite carries the dataset's stripe granularity (manifest
    # mean, 10k rows): the 40k-row survivor file keeps 4 stripes, so
    # the post-delete scan still plans one task per stripe
    assert all(len(read_stripes_info(f)) > 1 for f in live)
    ds = ColfDataSource({"path": striped})
    assert len(ds.reader(ds.schema()).partitions()) > len(live)


def test_v3_merge_into_preserves_striping(colf_spark, striped):
    from columnar_format_spark.colf.datasource import live_files
    from columnar_format_spark.colf.maintenance import merge_into

    src = colf_spark.range(49_000, 51_000).select(
        F.col("id").cast("int").alias("id"),
        F.lit(-1.0).alias("v"),
        F.lit("upd").alias("tag"))
    stats = merge_into(colf_spark, striped, src, ["id"])
    assert stats["n_replaced_rows"] == 1000
    assert stats["n_source_rows"] == 2000
    back = colf_spark.read.format("colf").load(striped)
    assert back.count() == 51_000
    assert back.filter("tag = 'upd'").count() == 2000
    live = live_files(striped)
    assert {read_schema(f).version for f in live} == {3}
    # survivor rewrite keeps the 10k stripe granularity: ~49k survivor
    # rows plan as ~5 stripes, not one monolithic task
    assert max(len(read_stripes_info(f)) for f in live) > 1
    ds = ColfDataSource({"path": striped})
    assert len(ds.reader(ds.schema()).partitions()) > len(live)


def test_v3_delete_all_leaves_valid_empty_dataset(colf_spark, striped):
    # delete-all on a v3 dataset adopts the 0-row sentinel path, which
    # must not choke on version=3 (sentinel is clamped to v2)
    from columnar_format_spark.colf.maintenance import delete_where

    stats = delete_where(colf_spark, striped, "id >= 0")
    assert stats["n_deleted_rows"] == 50_000
    back = colf_spark.read.format("colf").load(striped)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["id", "v", "tag"]


def test_v3_file_column_only_projection_counts(colf_spark, striped):
    # per-stripe metadata-only projection: row counts come from the
    # stripe footers, one task per stripe, no data columns decoded
    only = (colf_spark.read.format("colf")
            .option("withFileColumn", "true")
            .option("columns", "_colf_file").load(striped))
    per_file = dict(only.groupBy("_colf_file").count().collect())
    assert sum(per_file.values()) == 50_000


def test_v3_stream_read(colf_spark, striped, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        colf_spark.readStream.format("colf").load(striped)
        .writeStream.format("colf")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert colf_spark.read.format("colf").load(out).count() == 50_000


def test_v3_compact_keeps_stripe_parallelism(colf_spark, tmp_path):
    """Compacting a many-small-file v3 dataset into ONE file must
    still plan >1 scan task: compact() carries the dataset's stripe
    granularity (manifest mean stripe rows) into the rewrite, so
    file-count consolidation never costs intra-file parallelism."""
    from columnar_format_spark.colf.maintenance import compact

    p = str(tmp_path / "smalls")
    df = colf_spark.range(40_000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 9).cast("double").alias("v"))
    # 8 small files of 5k rows, each striped at 5k => 1 stripe each
    (df.repartition(8).write.format("colf").option("version", "3")
     .option("stripeRows", "5000").mode("append").save(p))
    n = compact(colf_spark, p, 1)
    assert n == 1
    f = _one_file(p)
    assert read_schema(f).version == 3
    stripes = read_stripes_info(f)
    assert len(stripes) > 1, "compacted file lost intra-file parallelism"
    assert sum(stripes) == 40_000
    # the scan plans one task per stripe of the single output file
    ds = ColfDataSource({"path": p})
    reader = ds.reader(ds.schema())
    assert len(reader.partitions()) == len(stripes)
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 40_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(40_000))


def test_v3_size_targeted_compact(colf_spark, tmp_path):
    """compact(target_file_bytes=...) — the maintenance-job form — must
    produce ceil(live_bytes/target) BALANCED striped files, each still
    planning one scan task per stripe, with no rows lost."""
    from columnar_format_spark.colf.datasource import live_files
    from columnar_format_spark.colf.maintenance import compact

    p = str(tmp_path / "sized")
    df = colf_spark.range(48_000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 9).cast("double").alias("v"))
    # 16 small files of 3k rows, 1 stripe each
    (df.repartition(16).write.format("colf").option("version", "3")
     .option("stripeRows", "3000").mode("append").save(p))
    live = live_files(p)
    assert len(live) == 16
    total = sum(os.path.getsize(f) for f in live)
    target = total // 4  # expect ceil(total/target) = 4 or 5 outputs
    n = compact(colf_spark, p, target_file_bytes=target)
    out = live_files(p)
    assert n == len(out)
    assert 1 < n <= 6, f"size target produced {n} files"
    # balanced: no output more than 2x the smallest (round-robin rows)
    sizes = sorted(os.path.getsize(f) for f in out)
    assert sizes[-1] <= 2 * sizes[0], f"unbalanced outputs: {sizes}"
    # every output keeps intra-file stripe parallelism
    total_stripes = 0
    for f in out:
        stripes = read_stripes_info(f)
        assert len(stripes) >= 1
        total_stripes += len(stripes)
    ds = ColfDataSource({"path": p})
    assert len(ds.reader(ds.schema()).partitions()) == total_stripes
    assert total_stripes >= n * 2, "compaction collapsed stripe granularity"
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 48_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(48_000))


def test_size_compact_ignores_dead_retained_files(colf_spark, tmp_path):
    """live_bytes for target_file_bytes must come from the snapshot's
    LIVE set: after delete_where the directory still holds the old
    (dead, time-travel-retained) part files until vacuum, and counting
    them would overshoot target_files — more, smaller outputs than the
    size target implies."""
    from columnar_format_spark.colf.datasource import (
        dataset_files, live_files)
    from columnar_format_spark.colf.maintenance import compact, delete_where

    p = str(tmp_path / "dead")
    df = colf_spark.range(24_000).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 9).cast("double").alias("v"))
    (df.repartition(8).write.format("colf").mode("append").save(p))
    # CoW delete touches every file -> 8 dead + rewritten live files
    delete_where(colf_spark, p, "id % 2 = 1")
    live = live_files(p)
    dead_inflation = (sum(os.path.getsize(f) for f in dataset_files(p))
                      / sum(os.path.getsize(f) for f in live))
    assert dead_inflation > 1.5, "fixture didn't retain dead files"
    target = sum(os.path.getsize(f) for f in live)  # => exactly 1 file
    n = compact(colf_spark, p, target_file_bytes=target)
    assert n == 1, f"dead retained bytes inflated the target: {n} files"
    back = colf_spark.read.format("colf").load(p)
    assert back.count() == 12_000


def test_compact_rejects_ambiguous_targets(colf_spark, tmp_path):
    from columnar_format_spark.colf.maintenance import compact

    p = str(tmp_path / "amb")
    (colf_spark.range(100).select(F.col("id").cast("int").alias("id"))
     .write.format("colf").mode("append").save(p))
    with pytest.raises(ValueError, match="exactly one"):
        compact(colf_spark, p)
    with pytest.raises(ValueError, match="exactly one"):
        compact(colf_spark, p, 2, target_file_bytes=1 << 20)


def test_compact_preserves_format_version(colf_spark, tmp_path):
    from columnar_format_spark.colf.datasource import live_files
    from columnar_format_spark.colf.maintenance import compact

    p = str(tmp_path / "cds")
    df = colf_spark.range(4000).select(F.col("id").cast("int").alias("id"),
                                       F.lit("x").alias("tag"))
    (df.repartition(8).write.format("colf").option("version", "2")
     .mode("append").save(p))
    n = compact(colf_spark, p, 2)
    assert n == 2
    assert {read_schema(f).version for f in live_files(p)} == {2}
    assert colf_spark.read.format("colf").load(p).count() == 4000


def test_v3_stream_plans_stripe_partitions(colf_spark, striped):
    from columnar_format_spark.colf.datasource import ColfStreamReader
    from pyspark.sql.types import (
        DoubleType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([StructField("id", IntegerType()),
                         StructField("v", DoubleType()),
                         StructField("tag", StringType())])
    r = ColfStreamReader({"path": striped}, schema)
    start = r.initialOffset()
    end = r.latestOffset()
    parts = r.partitions(start, end)
    assert len(parts) == 5
    assert sorted(p.stripe for p in parts) == [0, 1, 2, 3, 4]
    # rows delivered exactly once across the stripe partitions
    total = 0
    seen = set()
    for p in parts:
        for batch in r.read(p):
            ids = batch.column(0).to_pylist()
            assert not (set(ids) & seen)
            seen.update(ids)
            total += batch.num_rows
    assert total == 50_000


# --- property-based round-trip: striping must never change values ------

from hypothesis import given, settings, strategies as st  # noqa: E402

from columnar_format_spark.colf.format import (  # noqa: E402
    ColfColumn,
    ColfSchema,
    read_columns_arrow,
    read_columns_arrow_v3,
    write_colf_arrow_v3,
)

_ints = st.lists(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
                 max_size=60)
_floats = st.lists(st.one_of(st.none(), st.floats(allow_nan=False),
                             st.just(float("inf")), st.just(-float("inf"))),
                   max_size=60)
_strs = st.lists(st.one_of(st.none(), st.text(max_size=8)), max_size=60)


@settings(max_examples=60, deadline=None)
@given(ids=_ints, scores=_floats, texts=_strs,
       stripe_rows=st.integers(1, 25))
def test_v3_roundtrip_property(tmp_path_factory, ids, scores, texts,
                               stripe_rows):
    """Any (int32, float64, utf8) triple round-trips through v3 at any
    stripe granularity: the full read, the per-stripe reads
    concatenated, and a selective column read all reproduce the input
    exactly."""
    import pyarrow as pa

    n = max(len(ids), len(scores), len(texts))
    ids = ids + [None] * (n - len(ids))
    scores = scores + [None] * (n - len(scores))
    texts = texts + [None] * (n - len(texts))
    schema = ColfSchema(n, [ColfColumn("id", "int32", True),
                            ColfColumn("score", "float64", True),
                            ColfColumn("city", "utf8", True)])
    chunks = {"id": [pa.array(ids, type=pa.int32())],
              "score": [pa.array(scores, type=pa.float64())],
              "city": [pa.array(texts, type=pa.string())]}
    p = str(tmp_path_factory.mktemp("v3prop") / "t.colf")
    n_stripes = write_colf_arrow_v3(p, schema, chunks, stripe_rows)
    assert n_stripes == max(1, (n + stripe_rows - 1) // stripe_rows)
    assert read_stripes_info(p) == (
        [min(stripe_rows, n - s * stripe_rows) for s in range(n_stripes)]
        if n else [0])

    full = read_columns_arrow(p, ["id", "score", "city"])
    assert full["id"].to_pylist() == ids
    assert full["score"].to_pylist() == scores
    assert full["city"].to_pylist() == texts

    concat = {"id": [], "score": [], "city": []}
    for s in range(n_stripes):
        part = read_columns_arrow_v3(p, ["id", "score", "city"], stripe=s)
        for k in concat:
            concat[k].extend(part[k].to_pylist())
    assert concat["id"] == ids
    assert concat["score"] == scores
    assert concat["city"] == texts

    only = read_columns_arrow(p, ["city"])
    assert only["city"].to_pylist() == texts
