"""COLF v2 adaptive encodings (engine extension; format.py docstring).

v1 stays the byte-compatible default — every test here opts in with
version=2 and asserts (a) value round-trip equality with v1, (b) the
adaptive encoding decisions, (c) byte-identity between the pure and
Arrow write paths, (d) loud rejection everywhere a v1-only reader
(like the reference's reader.py:54-58) would see a v2 file.
"""

import math
import os
import zlib

import pytest

from columnar_format_spark.colf import format as colf_format
from columnar_format_spark.colf.format import (
    ColfColumn,
    ColfFormatError,
    ColfSchema,
    encode_column_v2,
    read_all,
    read_columns,
    read_columns_arrow,
    read_schema,
    write_colf,
    write_colf_arrow,
)

COLS = [("id", "int32"), ("score", "float64"), ("city", "utf8"),
        ("uid", "utf8")]


def _dataset(n=2000):
    import random

    rnd = random.Random(11)
    return {
        "id": sorted(rnd.sample(range(10**7), n)),
        "score": [None if i % 97 == 0 else rnd.random() * 1e6 - 5e5
                  for i in range(n)],
        "city": [None if i % 53 == 0 else f"city_{i % 37}"
                 for i in range(n)],
        # high-cardinality: every value distinct -> dict not beneficial
        "uid": [f"u{rnd.randrange(10**12)}-{i}" for i in range(n)],
    }


def _schema(n):
    return ColfSchema(n, [ColfColumn(name, t, True) for name, t in COLS])


def _write(tmp_path, data, version, fname="t.colf"):
    n = len(next(iter(data.values()))) if data else 0
    p = str(tmp_path / fname)
    write_colf(p, _schema(n), data, version=version)
    return p


def test_v2_roundtrip_equals_v1(tmp_path):
    data = _dataset()
    p1 = _write(tmp_path, data, 1, "v1.colf")
    p2 = _write(tmp_path, data, 2, "v2.colf")
    assert read_all(p1) == read_all(p2) == data


def test_v2_adaptive_encoding_choices(tmp_path):
    p2 = _write(tmp_path, _dataset(), 2)
    enc = {c.name: c.encoding for c in read_schema(p2).columns}
    assert enc == {"id": "delta", "score": "bss", "city": "dict",
                   "uid": "plain"}


def test_v2_smaller_on_sorted_ids_and_low_cardinality(tmp_path):
    data = _dataset()
    p1 = _write(tmp_path, data, 1, "v1.colf")
    p2 = _write(tmp_path, data, 2, "v2.colf")
    assert os.path.getsize(p2) < os.path.getsize(p1)


def test_v2_arrow_write_byte_identical(tmp_path):
    import pyarrow as pa

    data = _dataset()
    n = len(data["id"])
    pa_types = {"int32": pa.int32(), "float64": pa.float64(),
                "utf8": pa.string()}
    # two chunks, to exercise chunk concatenation
    chunks = {name: [pa.array(data[name][: n // 2], type=pa_types[t]),
                     pa.array(data[name][n // 2:], type=pa_types[t])]
              for name, t in COLS}
    p_pure = _write(tmp_path, data, 2, "pure.colf")
    p_arrow = str(tmp_path / "arrow.colf")
    write_colf_arrow(p_arrow, _schema(n), chunks, version=2)
    with open(p_pure, "rb") as a, open(p_arrow, "rb") as b:
        assert a.read() == b.read()


def test_v2_arrow_read(tmp_path):
    data = _dataset()
    p2 = _write(tmp_path, data, 2)
    arrays = read_columns_arrow(p2, [c for c, _ in COLS])
    for name, _ in COLS:
        assert arrays[name].to_pylist() == data[name]


def test_v2_plain_utf8_bytes_fallback_arrow_read(tmp_path):
    # high-cardinality utf8 -> dict not beneficial -> v2 ENC_PLAIN; a
    # non-UTF8 bytes value forces the Arrow reader's list-decoder
    # fallback, which must reparse with the v2 3-byte header base (a
    # v1 base leaks the encoding byte into the data and crashes)
    n = 64
    data = {
        "id": list(range(n)),
        "score": [float(i) for i in range(n)],
        "city": [f"c{i}" for i in range(n)],
        "uid": [b"\xff\xfe-not-utf8" if i == 3 else f"u{i}-{i * 7919}"
                for i in range(n)],
    }
    p2 = _write(tmp_path, data, 2)
    enc = {c.name: c.encoding for c in read_schema(p2).columns}
    assert enc["uid"] == "plain"
    pure = read_columns(p2, ["uid"])["uid"]
    assert pure[3] == b"\xff\xfe-not-utf8"  # bytes fallback, pure path
    arr = read_columns_arrow(p2, ["uid"])["uid"]
    assert len(arr) == n
    assert arr.slice(4).to_pylist() == pure[4:]  # valid rows agree
    import pyarrow as pa

    raw = arr.view(pa.binary()).slice(3, 1).to_pylist()[0]
    assert raw == b"\xff\xfe-not-utf8"  # raw bytes preserved


def test_v2_delta_fallback_on_extreme_values(tmp_path):
    # -2^31 -> 2^31-1 is a zigzag delta needing >4 bytes -> plain
    data = {"id": [-(2**31), 2**31 - 1, 0], "score": [1.0, 2.0, 3.0],
            "city": ["a", "b", "a"], "uid": ["x", "y", "z"]}
    p2 = _write(tmp_path, data, 2)
    enc = {c.name: c.encoding for c in read_schema(p2).columns}
    assert enc["id"] == "plain"
    assert read_all(p2) == data


def test_v2_edge_values(tmp_path):
    data = {
        "id": [None] * 8,
        "score": [float("nan"), float("inf"), -float("inf"), -0.0,
                  None, 1e-300, -1e300, 0.0],
        "city": ["", "", "a", "", None, "b", "", ""],
        "uid": [None] * 8,
    }
    p2 = _write(tmp_path, data, 2)
    back = read_all(p2)
    assert back["id"] == data["id"]
    assert back["city"] == data["city"]
    assert back["uid"] == data["uid"]
    assert math.isnan(back["score"][0])
    assert back["score"][1:] == data["score"][1:]
    arrays = read_columns_arrow(p2, ["city", "score"])
    assert arrays["city"].to_pylist() == data["city"]


def test_v2_zero_rows(tmp_path):
    p2 = _write(tmp_path, {k: [] for k, _ in COLS}, 2)
    assert read_schema(p2).num_rows == 0
    assert read_all(p2) == {k: [] for k, _ in COLS}


def test_v2_int32_overflow_still_rejected(tmp_path):
    data = {"id": [2**40], "score": [1.0], "city": ["a"], "uid": ["b"]}
    with pytest.raises(ColfFormatError, match="int32 overflow"):
        _write(tmp_path, data, 2)


def test_unknown_version_rejected(tmp_path):
    data = {k: [] for k, _ in COLS}
    with pytest.raises(ColfFormatError, match="Unsupported write version"):
        _write(tmp_path, data, 3)
    # a v1-only reader must reject v2 loudly, never mis-decode: corrupt
    # the version byte of a v1 file to 9 and confirm our reader's error
    p1 = _write(tmp_path, data, 1, "v1.colf")
    raw = bytearray(open(p1, "rb").read())
    raw[4] = 9
    bad = str(tmp_path / "bad.colf")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ColfFormatError, match="Unsupported version"):
        read_schema(bad)


def test_v2_preamble_version_byte_is_2(tmp_path):
    p2 = _write(tmp_path, _dataset(16), 2)
    with open(p2, "rb") as f:
        raw = f.read(5)
    assert raw[:4] == b"COLF" and raw[4] == 2
    assert read_schema(p2).version == 2


def test_v2_corrupt_encoding_byte_rejected(tmp_path):
    # flip the encoding byte inside the first column block to an
    # unknown tag and confirm a loud ColfFormatError, not garbage
    data = {"id": [1, 2, 3], "score": [1.0, 2.0, 3.0],
            "city": ["a", "b", "a"], "uid": ["x", "y", "z"]}
    p2 = _write(tmp_path, data, 2)
    with open(p2, "rb") as f:
        schema, metas, _ = colf_format.read_header(f)
        f.seek(metas[0].offset)
        payload = bytearray(zlib.decompress(f.read(metas[0].comp_size)))
    payload[2] = 7
    corrupted = zlib.compress(bytes(payload))
    raw = bytearray(open(p2, "rb").read())
    # only safe to splice if recompressed block fits where the old was
    import struct

    new_raw = raw[: metas[0].offset] + corrupted + raw[metas[0].offset +
                                                       metas[0].comp_size:]
    # rewrite column 0's metadata entry (offset unchanged, sizes shift)
    meta_pos = new_raw.index(struct.pack(
        "<QQQ", metas[0].offset, metas[0].comp_size, metas[0].uncomp_size))
    struct.pack_into("<QQQ", new_raw, meta_pos, metas[0].offset,
                     len(corrupted), len(payload))
    delta = len(corrupted) - metas[0].comp_size
    for i, m in enumerate(metas[1:], start=1):
        mp = new_raw.index(struct.pack(
            "<QQQ", m.offset, m.comp_size, m.uncomp_size))
        struct.pack_into("<QQQ", new_raw, mp, m.offset + delta,
                         m.comp_size, m.uncomp_size)
    bad = str(tmp_path / "badenc.colf")
    open(bad, "wb").write(bytes(new_raw))
    with pytest.raises(ColfFormatError, match="Unknown v2 encoding"):
        read_columns(bad, ["id"])


def test_v2_dict_code_width_scales(tmp_path):
    # >256 distinct but still <= n/2 -> dict with 2-byte codes
    n = 1200
    data = {"id": list(range(n)),
            "score": [0.5] * n,
            "city": [f"c{i % 500}" for i in range(n)],
            "uid": [f"u{i}" for i in range(n)]}
    p2 = _write(tmp_path, data, 2)
    enc = {c.name: c.encoding for c in read_schema(p2).columns}
    assert enc["city"] == "dict"
    assert read_columns(p2, ["city"]) == {"city": data["city"]}


def test_encode_column_v2_tags():
    payload, has_nulls, enc = encode_column_v2([1, 2, 3], "int32")
    assert (payload[0], payload[1], payload[2]) == (1, 0, enc)
    assert not has_nulls


def test_spark_write_option_version(spark, tmp_path):
    from columnar_format_spark.colf.datasource import register

    register(spark)
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 1.5).alias("val"),
        (F.col("id") % 7).cast("string").alias("bucket"),
    )
    p1 = str(tmp_path / "ds_v1")
    p2 = str(tmp_path / "ds_v2")
    df.coalesce(1).write.format("colf").mode("append").save(p1)
    df.coalesce(1).write.format("colf").option("version", "2") \
        .mode("append").save(p2)

    def one_colf(path):
        return [os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".colf")][0]

    assert read_schema(one_colf(p1)).version == 1
    s2 = read_schema(one_colf(p2))
    assert s2.version == 2
    assert {c.name: c.encoding for c in s2.columns} == {
        "id": "delta", "val": "bss", "bucket": "dict"}
    # readers need no option; filters still push down over v2 files
    a = spark.read.format("colf").load(p1).where("id >= 250")
    b = spark.read.format("colf").load(p2).where("id >= 250")
    assert sorted(a.collect()) == sorted(b.collect())
    assert b.count() == 250


def test_spark_mixed_version_dataset(spark, tmp_path):
    from columnar_format_spark.colf.datasource import register

    register(spark)
    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id").cast("int").alias("id"),
                                 F.lit("x").alias("tag"))
    p = str(tmp_path / "mixed")
    df.coalesce(1).write.format("colf").mode("append").save(p)
    df.coalesce(1).write.format("colf").option("version", "2") \
        .mode("append").save(p)
    back = spark.read.format("colf").load(p)
    assert back.count() == 200
    assert back.where("id = 7").count() == 2


def test_spark_bad_version_option(spark, tmp_path):
    from columnar_format_spark.colf.datasource import register

    register(spark)
    df = spark.range(3).selectExpr("cast(id as int) id")
    with pytest.raises(Exception, match="Unsupported colf write version"):
        df.write.format("colf").option("version", "5") \
            .mode("append").save(str(tmp_path / "bad"))


# --- property-based round-trip (both versions, both decoders) ------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_int_vals = st.lists(st.one_of(st.none(),
                               st.integers(-(2**31), 2**31 - 1)),
                     max_size=60)
_float_vals = st.lists(st.one_of(st.none(), st.floats(allow_nan=False),
                                 st.just(float("inf")),
                                 st.just(-float("inf"))),
                       max_size=60)
_str_vals = st.lists(st.one_of(st.none(), st.text(max_size=8)), max_size=60)


@settings(max_examples=60, deadline=None)
@given(ids=_int_vals, scores=_float_vals, texts=_str_vals)
def test_v2_roundtrip_property(tmp_path_factory, ids, scores, texts):
    """Any (int32, float64, utf8) column triple round-trips through v2
    identically to v1, via both the list and the Arrow decoder."""
    n = max(len(ids), len(scores), len(texts))
    data = {"id": ids + [None] * (n - len(ids)),
            "score": scores + [None] * (n - len(scores)),
            "city": texts + [None] * (n - len(texts)),
            "uid": [None] * n}
    tmp = tmp_path_factory.mktemp("prop")
    p1 = str(tmp / "a.colf")
    p2 = str(tmp / "b.colf")
    write_colf(p1, _schema(n), data, version=1)
    write_colf(p2, _schema(n), data, version=2)
    assert read_all(p1) == read_all(p2)
    a1 = read_columns_arrow(p1, ["id", "score", "city"])
    a2 = read_columns_arrow(p2, ["id", "score", "city"])
    for k in a1:
        assert a1[k].to_pylist() == a2[k].to_pylist()
