"""Codec-level COLF tests: round-trips, edge-case matrix (FIXTURES.md
F6 / SURVEY.md §1.4), and property-based round-trips with hypothesis."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from columnar_format_spark.colf.format import (
    ColfColumn,
    ColfFormatError,
    ColfSchema,
    decode_column,
    encode_column,
    read_all,
    read_columns,
    read_header,
    read_schema,
    write_colf,
)


def roundtrip(tmp_path, schema, columns):
    path = str(tmp_path / "t.colf")
    write_colf(path, schema, columns)
    return path, read_all(path)


def test_basic_roundtrip(tmp_path):
    schema = ColfSchema(3, [
        ColfColumn("id", "int32", False),
        ColfColumn("price", "float64", False),
        ColfColumn("name", "utf8", False),
    ])
    cols = {"id": [1, 2, 3], "price": [1.5, 2.0, -3.25], "name": ["a", "bb", "ccc"]}
    _, out = roundtrip(tmp_path, schema, cols)
    assert out == cols


def test_nulls_roundtrip(tmp_path):
    schema = ColfSchema(4, [
        ColfColumn("i", "int32", True),
        ColfColumn("f", "float64", True),
        ColfColumn("s", "utf8", True),
    ])
    cols = {"i": [1, None, 3, None], "f": [None, 2.5, None, 0.0],
            "s": [None, "x", None, "yz"]}
    _, out = roundtrip(tmp_path, schema, cols)
    assert out == cols


def test_all_null_column(tmp_path):
    schema = ColfSchema(3, [ColfColumn("x", "int32", True)])
    _, out = roundtrip(tmp_path, schema, {"x": [None, None, None]})
    assert out == {"x": [None, None, None]}


def test_zero_rows_is_valid(tmp_path):
    """Engine-defined behavior (SURVEY.md §7 M3b): the reference writer
    crashes on empty input; ours produces a valid 0-row file that the
    reference reader's own 0-row path could consume."""
    schema = ColfSchema(0, [ColfColumn("a", "int32", True),
                            ColfColumn("b", "utf8", True)])
    path, out = roundtrip(tmp_path, schema, {"a": [], "b": []})
    assert out == {"a": [], "b": []}
    assert read_schema(path).num_rows == 0


def test_unicode_roundtrip(tmp_path):
    schema = ColfSchema(2, [ColfColumn("u", "utf8", False)])
    cols = {"u": ["héllo", "日本語"]}
    _, out = roundtrip(tmp_path, schema, cols)
    assert out == cols


def test_whitespace_preserved(tmp_path):
    # non-blank strings keep surrounding whitespace (writer.py:129-134)
    schema = ColfSchema(2, [ColfColumn("s", "utf8", False)])
    cols = {"s": [" spaced  ", "x"]}
    _, out = roundtrip(tmp_path, schema, cols)
    assert out == cols


def test_int32_bounds_ok_overflow_rejected(tmp_path):
    schema = ColfSchema(2, [ColfColumn("x", "int32", False)])
    _, out = roundtrip(tmp_path, schema, {"x": [-(2**31), 2**31 - 1]})
    assert out == {"x": [-(2**31), 2**31 - 1]}
    with pytest.raises(ColfFormatError, match="int32 overflow"):
        encode_column([2**40], "int32")


def test_special_floats(tmp_path):
    import math

    schema = ColfSchema(3, [ColfColumn("f", "float64", False)])
    path = str(tmp_path / "t.colf")
    write_colf(path, schema, {"f": [float("nan"), float("inf"), -0.0]})
    out = read_all(path)["f"]
    assert math.isnan(out[0]) and out[1] == float("inf")


def test_selective_read_only_requested(tmp_path):
    schema = ColfSchema(2, [ColfColumn("a", "int32", False),
                            ColfColumn("b", "utf8", False)])
    path = str(tmp_path / "t.colf")
    write_colf(path, schema, {"a": [1, 2], "b": ["x", "y"]})
    out = read_columns(path, ["b"])
    assert out == {"b": ["x", "y"]}
    with pytest.raises(KeyError):
        read_columns(path, ["nope"])


def test_comp_size_zero_means_all_null(tmp_path):
    """reader.py:180-182: metadata comp_size==0 ⇒ all-NULL, no I/O."""
    schema = ColfSchema(3, [ColfColumn("a", "int32", True)])
    path = str(tmp_path / "t.colf")
    write_colf(path, schema, {"a": [1, 2, 3]})
    # zero out comp_size in the single metadata entry
    with open(path, "r+b") as f:
        schema_read, metas, header_size = read_header(f)
        meta_pos = 10 + 4 + (header_size - 4 - 25)  # one 25B entry at the end
        f.seek(meta_pos + 8)
        f.write(struct.pack("<Q", 0))
    assert read_all(path) == {"a": [None, None, None]}


def test_header_validation(tmp_path):
    path = str(tmp_path / "bad.colf")
    with open(path, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ColfFormatError, match="Bad magic"):
        read_all(path)
    with open(path, "wb") as f:  # bad version
        f.write(b"COLF" + struct.pack("<BBI", 9, 1, 100) + struct.pack("<I", 10))
    with pytest.raises(ColfFormatError, match="version"):
        read_all(path)
    with open(path, "wb") as f:  # bad endianness
        f.write(b"COLF" + struct.pack("<BBI", 1, 0, 100) + struct.pack("<I", 10))
    with pytest.raises(ColfFormatError, match="endianness"):
        read_all(path)


def test_invalid_utf8_falls_back_to_bytes():
    """reader.py:155-159: undecodable UTF-8 → raw bytes value."""
    payload, has_nulls = encode_column([b"\xff\xfe", "ok"], "utf8")
    out = decode_column(payload, "utf8", 2, has_nulls)
    assert out == [b"\xff\xfe", "ok"]


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
            st.one_of(st.none(), st.floats(allow_nan=False)),
            st.one_of(st.none(),
                      st.text(min_size=1).filter(lambda s: s.strip() != "")),
        ),
        min_size=0, max_size=200,
    )
)
def test_property_roundtrip(tmp_path_factory, data):
    """Random schema-conforming values survive write→read unchanged
    (replaces the reference's 3 fixed round-trip cases, SURVEY.md §5)."""
    tmp = tmp_path_factory.mktemp("prop")
    n = len(data)
    schema = ColfSchema(n, [
        ColfColumn("i", "int32", True),
        ColfColumn("f", "float64", True),
        ColfColumn("s", "utf8", True),
    ])
    cols = {
        "i": [t[0] for t in data],
        "f": [t[1] for t in data],
        "s": [t[2] for t in data],
    }
    path = str(tmp / "p.colf")
    write_colf(path, schema, cols)
    assert read_all(path) == cols


# -- random-SCHEMA property round-trip (SURVEY §5): column count, names,
# types, nullability, and values (incl. empty strings, whitespace-only
# strings, full unicode, ±0.0, subnormals) are all generated; a random
# projection must read back exactly the full read's slice.

_COL_TYPES = ["int32", "float64", "utf8"]


def _values_for(typ, n):
    if typ == "int32":
        elem = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    elif typ == "float64":
        elem = st.floats(allow_nan=False, width=64)
    else:
        # surrogate-free unicode INCLUDING "" and whitespace-only
        elem = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20)
    return st.lists(st.one_of(st.none(), elem), min_size=n, max_size=n)


@st.composite
def _random_table(draw):
    n_rows = draw(st.integers(min_value=0, max_value=60))
    n_cols = draw(st.integers(min_value=1, max_value=5))
    names = draw(st.lists(
        st.text(st.characters(blacklist_categories=("Cs",)), min_size=1,
                max_size=8),
        min_size=n_cols, max_size=n_cols, unique=True))
    types = draw(st.lists(st.sampled_from(_COL_TYPES),
                          min_size=n_cols, max_size=n_cols))
    cols = {nm: draw(_values_for(t, n_rows)) for nm, t in zip(names, types)}
    schema = ColfSchema(n_rows, [
        ColfColumn(nm, t, True) for nm, t in zip(names, types)])
    keep = draw(st.lists(st.sampled_from(names), min_size=1,
                         max_size=n_cols, unique=True))
    return schema, cols, keep


@settings(max_examples=50, deadline=None)
@given(tbl=_random_table())
def test_property_random_schema_roundtrip(tmp_path_factory, tbl):
    schema, cols, keep = tbl
    tmp = tmp_path_factory.mktemp("props")
    path = str(tmp / "p.colf")
    write_colf(path, schema, cols)
    assert read_schema(path).num_rows == schema.num_rows
    assert read_all(path) == cols
    # selective read returns exactly the projected columns, same values
    assert read_columns(path, keep) == {k: cols[k] for k in keep}


def test_corrupt_block_error_names_column_all_paths(tmp_path):
    """The engine's error-context standard on EVERY decode path
    (round-12 verdict item #5): a corrupt compressed block must raise
    ColfFormatError naming the column (and offset), never a bare
    zlib.error — v1 read_columns, the Arrow selective read, and the
    v3 stripe path alike. (The reference has the same inconsistency
    this pins against: its read_columns bypasses safe_decompress,
    reader.py:188.)"""
    import pyarrow as pa

    from columnar_format_spark.colf.format import (
        read_columns_arrow, read_columns_arrow_v3, write_colf_arrow_v3)

    schema = ColfSchema(4, [ColfColumn("id", "int32", False),
                            ColfColumn("name", "utf8", False)])
    cols = {"id": [1, 2, 3, 4], "name": ["a", "bb", "ccc", "dddd"]}

    def corrupt_block(path, colname):
        # flip bytes INSIDE the named column's compressed block
        with open(path, "rb") as f:
            _, metas, _ = read_header(f)
        sch = read_schema(path)
        meta = metas[[c.name for c in sch.columns].index(colname)]
        with open(path, "r+b") as f:
            f.seek(meta.offset)
            f.write(b"\xff" * min(4, meta.comp_size))

    p1 = str(tmp_path / "v1.colf")
    write_colf(p1, schema, cols)
    corrupt_block(p1, "name")
    with pytest.raises(ColfFormatError, match="'name'"):
        read_columns(p1, ["name"])
    with pytest.raises(ColfFormatError, match="'name'"):
        read_columns_arrow(p1, ["name"])
    assert read_columns(p1, ["id"])["id"] == cols["id"]  # other column fine

    p3 = str(tmp_path / "v3.colf")
    write_colf_arrow_v3(p3, schema,
                        {"id": [pa.array(cols["id"], type=pa.int32())],
                         "name": [pa.array(cols["name"])]},
                        stripe_rows=2)
    from columnar_format_spark.colf.format import read_header_v3
    with open(p3, "rb") as f:
        _, stripes, _ = read_header_v3(f)
    meta = stripes[1].metas[1]   # second stripe, "name"
    with open(p3, "r+b") as f:
        f.seek(meta.offset)
        f.write(b"\xff" * min(4, meta.comp_size))
    with pytest.raises(ColfFormatError, match="'name'"):
        read_columns_arrow_v3(p3, ["name"])
    # the untouched stripe still decodes
    assert read_columns_arrow_v3(
        p3, ["name"], stripe=0)["name"].to_pylist() == ["a", "bb"]
