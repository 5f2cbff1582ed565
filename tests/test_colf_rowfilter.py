"""Executor-side residual filter evaluation (_residual_mask): pushed
conjuncts are applied to the decoded Arrow arrays BEFORE the batch
crosses into the JVM, so selective scans transfer matching rows
instead of whole files. Correctness contract: a row the mask drops
must be one Spark's own row-level filter would drop (Spark re-applies
everything), pinned here by on/off equivalence over predicate shapes
including nulls, plus direct mask-semantics units."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

from columnar_format_spark.colf.datasource import (
    ColfReader,
    _residual_mask,
    register,
)

from tests.conftest import SF_SMALL


# ---------- mask semantics (pure units) ----------


def _data():
    return {
        "k": pa.array([1, 2, None, 4, 5], type=pa.int32()),
        "s": pa.array(["aa", "ab", None, "ba", "bb"], type=pa.string()),
        "f": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], type=pa.float64()),
    }


def _kept(mask):
    return [i for i, v in enumerate(mask.to_pylist()) if v]


def test_mask_null_comparison_is_false():
    # EqualTo/range against a NULL row → row dropped (Spark's 3VL
    # filter semantics), never kept and never an error
    m = _residual_mask(_data(), [EqualTo(("k",), 4)])
    assert _kept(m) == [3]
    m = _residual_mask(_data(), [GreaterThan(("k",), 1)])
    assert _kept(m) == [1, 3, 4]
    m = _residual_mask(_data(), [IsNull(("k",))])
    assert _kept(m) == [2]
    m = _residual_mask(_data(), [IsNotNull(("k",))])
    assert _kept(m) == [0, 1, 3, 4]


def test_mask_conjunction_and_strings():
    m = _residual_mask(_data(), [GreaterThan(("k",), 1),
                                 LessThanOrEqual(("k",), 4)])
    assert _kept(m) == [1, 3]
    m = _residual_mask(_data(), [StringStartsWith(("s",), "a")])
    assert _kept(m) == [0, 1]
    m = _residual_mask(_data(), [In(("s",), ("aa", "bb", None))])
    assert _kept(m) == [0, 4]


def test_mask_skips_what_it_cannot_evaluate():
    # unknown column (not in the projection) → skipped
    assert _residual_mask(_data(), [EqualTo(("z",), 1)]) is None
    # type-mismatched probe → exception path, skipped
    assert _residual_mask(_data(), [EqualTo(("s",), 7)]) is None
    # int32-overflowing IN probe → skipped, not a crash
    assert _residual_mask(_data(), [In(("k",), (2**40,))]) is None


NAN = float("nan")


def _fdata():
    return {"f": pa.array([1.0, None, NAN, 4.0, 5.0], type=pa.float64())}


def test_mask_float64_spark_nan_semantics():
    # plain ranges evaluate; NULL row drops (3VL)
    assert _kept(_residual_mask(_fdata(), [EqualTo(("f",), 4.0)])) == [3]
    assert _kept(_residual_mask(_fdata(),
                                [LessThanOrEqual(("f",), 4.0)])) == [0, 3]
    # Spark orders NaN above every double: the NaN row must survive
    # upper-bound compares (IEEE alone would drop it)...
    assert _kept(_residual_mask(_fdata(), [GreaterThan(("f",), 4.0)])) \
        == [2, 4]
    assert _kept(_residual_mask(_fdata(),
                                [GreaterThanOrEqual(("f",), 1.0)])) \
        == [0, 2, 3, 4]
    # ...but never a lower-bound one (NaN < v is false in Spark too)
    assert _kept(_residual_mask(_fdata(), [LessThan(("f",), 100.0)])) \
        == [0, 3, 4]
    # NaN probes are left to Spark entirely (mask must not guess)
    assert _residual_mask(_fdata(), [EqualTo(("f",), NAN)]) is None
    assert _residual_mask(_fdata(), [In(("f",), (1.0, NAN))]) is None
    # IN without NaN evaluates; null row drops
    assert _kept(_residual_mask(_fdata(), [In(("f",), (1.0, 5.0))])) == [0, 4]


def test_mask_float_in_matches_signed_zero():
    """Spark evaluates -0.0 = 0.0 as TRUE; pc.is_in matches bitwise.
    The mask must keep a stored -0.0 row for In(0.0) (and vice versa) —
    a dropped row is unrecoverable once the batch crosses to the JVM."""
    data = {"f": pa.array([-0.0, 1.0, 0.0, 2.0], type=pa.float64())}
    assert _kept(_residual_mask(data, [In(("f",), (0.0, 9.0))])) == [0, 2]
    assert _kept(_residual_mask(data, [In(("f",), (-0.0, 9.0))])) == [0, 2]
    # pc.equal is value-based (IEEE): EqualTo is already sign-blind
    assert _kept(_residual_mask(data, [EqualTo(("f",), 0.0)])) == [0, 2]


def test_zonemap_float_nan_never_pruned():
    """A file whose only rows satisfying `> v` are NaN must survive
    zone-map pruning: Arrow min/max skip NaN, Spark orders NaN above
    every double. nan_count==0 restores pruning; a pre-NaN-stats
    sidecar (no nan_count key) stays conservative."""
    from columnar_format_spark.colf.datasource import _file_may_match

    def stats(mn, mx, **extra):
        return {"num_rows": 5,
                "columns": {"f": {"min": mn, "max": mx, "null_count": 0,
                                  **extra}}}

    gt = GreaterThan(("f",), 100.0)
    # NaN present: file max 5.0 but the NaN row satisfies > 100.0
    assert _file_may_match(stats(1.0, 5.0, nan_count=2), gt)
    assert _file_may_match(stats(1.0, 5.0, nan_count=2),
                           GreaterThanOrEqual(("f",), 100.0))
    # unknown NaN count (old sidecar): conservative keep
    assert _file_may_match(stats(1.0, 5.0), gt)
    # proven NaN-free: range check prunes
    assert not _file_may_match(stats(1.0, 5.0, nan_count=0), gt)
    # lower bounds never involve NaN: prune regardless of NaN presence
    assert not _file_may_match(stats(200.0, 300.0, nan_count=2),
                               LessThan(("f",), 100.0))
    # NaN probe value: stats can't decide, keep
    assert _file_may_match(stats(1.0, 5.0, nan_count=0),
                           EqualTo(("f",), NAN))
    # poisoned stats (min/max are NaN): keep
    assert _file_may_match(stats(NAN, NAN, nan_count=0), gt)


# ---------- end-to-end equivalence ----------


@pytest.fixture(scope="module")
def ds(spark, tmp_path_factory):
    register(spark)
    d = str(tmp_path_factory.mktemp("colf_rowfilter"))
    (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .select(
            F.col("o_orderkey").cast("int").alias("o_orderkey"),
            F.when(F.col("o_orderkey") % 7 == 0, None)
            .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
            F.col("o_totalprice"),
            F.when(F.col("o_orderkey") % 11 == 0, F.lit(float("nan")))
            .when(F.col("o_orderkey") % 13 == 0, None)
            .otherwise(F.col("o_totalprice")).alias("nanprice"),
        )
        .repartition(4)
        .write.format("colf").mode("overwrite").save(d)
    )
    return d


PREDICATES = [
    lambda c: c("o_orderkey") == 42,
    lambda c: (c("o_orderkey") > 100) & (c("o_orderkey") <= 500),
    lambda c: c("o_orderpriority").isNull(),
    lambda c: c("o_orderpriority").isNotNull() & (c("o_orderkey") < 50),
    lambda c: c("o_orderpriority").startswith("1-"),
    lambda c: c("o_orderpriority").isin("1-URGENT", "5-LOW"),
    lambda c: c("o_totalprice") > 100000.0,
    # float64 with NaN + NULL rows: Spark keeps NaN on upper bounds
    lambda c: c("nanprice") > 100000.0,
    lambda c: c("nanprice") >= 50000.0,
    lambda c: c("nanprice") < 100000.0,
    lambda c: (c("nanprice") <= 200000.0) & (c("o_orderkey") > 10),
    lambda c: c("nanprice") == float("nan"),  # NaN probe: left to Spark
    lambda c: c("nanprice").isNull(),
    lambda c: c("nanprice").isin(float("nan"), 1.0),
]


@pytest.mark.parametrize("i", range(len(PREDICATES)))
def test_rowfilter_on_off_identical(spark, ds, i):
    pred = PREDICATES[i]
    on = (spark.read.format("colf").load(ds)
          .filter(pred(F.col)).collect())
    off = (spark.read.format("colf").option("rowFilter", "off").load(ds)
           .filter(pred(F.col)).collect())

    def norm(rows):  # NaN != NaN would break tuple equality
        return sorted(tuple("NaN" if isinstance(v, float) and v != v else v
                            for v in r) for r in rows)

    assert norm(on) == norm(off)


def test_reader_yields_only_matching_rows(spark, ds):
    """The transfer saving itself: with the filter pushed, the batches
    the reader emits contain exactly the matching rows, not the file."""
    schema = spark.read.format("colf").load(ds).schema
    r = ColfReader({"path": ds}, schema)
    r.pushFilters([EqualTo(("o_orderkey",), 42)])
    n = sum(b.num_rows for p in r.partitions() if p.file is not None
            for b in r.read(p))
    want = (spark.read.format("colf").option("rowFilter", "off").load(ds)
            .filter(F.col("o_orderkey") == 42).count())
    assert n == want >= 1


def test_reader_respects_off_option(spark, ds):
    schema = spark.read.format("colf").load(ds).schema
    total = (spark.read.format("colf").load(ds)).count()
    r = ColfReader({"path": ds, "rowFilter": "off", "pruning": "off"}, schema)
    r.pushFilters([EqualTo(("o_orderkey",), 42)])
    n = sum(b.num_rows for p in r.partitions() if p.file is not None
            for b in r.read(p))
    assert n == total  # whole files cross the boundary when disabled


def test_filter_on_unprojected_column_stays_correct(spark, ds):
    """columns-option projection that EXCLUDES the filter column: the
    mask cannot evaluate (column absent from the batch) and must leave
    filtering to Spark... which also can't see it — so the reader just
    yields the projection; the helper's contract is column subsetting,
    not predicate application. Assert no crash and full row count."""
    from columnar_format_spark.colf.datasource import read_colf

    got = read_colf(spark, ds, ["o_orderpriority"]).count()
    want = spark.read.format("colf").load(ds).count()
    assert got == want


def test_file_column_rows_match_after_residual_filter(spark, ds):
    """withFileColumn + pushed filter: the virtual column is attached
    AFTER masking, so its length matches the surviving rows (the
    maintenance discovery pass depends on this)."""
    tagged = (spark.read.format("colf").option("withFileColumn", "true")
              .load(ds).filter(F.col("o_orderkey") <= 100))
    want = (spark.read.format("colf").option("rowFilter", "off").load(ds)
            .filter(F.col("o_orderkey") <= 100).count())
    assert tagged.count() == want
    assert tagged.select("_colf_file").distinct().count() >= 1


# ---------- property: mask == naive 3VL evaluation ----------


from hypothesis import given, settings
from hypothesis import strategies as st


def _naive_keep(row, flt):
    """Reference 3VL semantics of one pushed conjunct on one row —
    what Spark's re-applied filter would do."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
        LessThan, LessThanOrEqual, StringStartsWith)

    v = row.get(flt.attribute[0])
    if isinstance(flt, IsNull):
        return v is None
    if isinstance(flt, IsNotNull):
        return v is not None
    if v is None:
        return False
    if isinstance(flt, EqualTo):
        return v == flt.value
    if isinstance(flt, In):
        return any(x is not None and v == x for x in flt.value)
    if isinstance(flt, GreaterThan):
        return v > flt.value
    if isinstance(flt, GreaterThanOrEqual):
        return v >= flt.value
    if isinstance(flt, LessThan):
        return v < flt.value
    if isinstance(flt, LessThanOrEqual):
        return v <= flt.value
    if isinstance(flt, StringStartsWith):
        return v.startswith(flt.value)
    raise AssertionError(flt)


@given(
    st.lists(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
             min_size=1, max_size=60),
    st.lists(st.one_of(st.none(), st.text(max_size=6)),
             min_size=1, max_size=60),
    st.integers(-(2**31), 2**31 - 1),
    st.text(max_size=4),
    st.integers(0, 8),
)
@settings(max_examples=120, deadline=None)
def test_mask_matches_naive_3vl(ints, strs, iprobe, sprobe, which):
    import pyarrow as pa
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull,
        LessThan, LessThanOrEqual, StringStartsWith)

    n = min(len(ints), len(strs))
    ints, strs = ints[:n], strs[:n]
    data = {"k": pa.array(ints, type=pa.int32()),
            "s": pa.array(strs, type=pa.string())}
    flt = [
        EqualTo(("k",), iprobe), GreaterThan(("k",), iprobe),
        GreaterThanOrEqual(("k",), iprobe), LessThan(("k",), iprobe),
        LessThanOrEqual(("k",), iprobe), In(("k",), (iprobe, None)),
        IsNull(("k",)), IsNotNull(("s",)),
        StringStartsWith(("s",), sprobe),
    ][which]
    mask = _residual_mask(data, [flt])
    assert mask is not None
    got = mask.to_pylist()
    want = [_naive_keep({"k": ints[i], "s": strs[i]}, flt)
            for i in range(n)]
    assert got == want
