"""Local replica of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly at sf0.001 (the driver
runs the same comparison at sf0.01)."""

import pytest

import columnar_format_spark.queries  # noqa: F401  (registers)
from columnar_format_spark.oracle import compare_query, pandas_dtype_parity
from columnar_format_spark.registry import QUERIES

from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    res = compare_query(spark, SF_SMALL, name)
    assert res["ok"], res["notes"]
    assert res["spark_rows"] >= 0
    # Driver-replica dtype gate: the driver hashes values AFTER pandas
    # materialization, where DuckDB HUGEINT becomes float64 while Spark
    # bigint stays int64 — equality by value is not enough (q33 r01/r02,
    # q177 r07 shipped exactly this way because this checker existed but
    # was wired into no gate).
    parity = pandas_dtype_parity(spark, SF_SMALL, name)
    assert parity["ok"], parity["notes"]


def test_percentile_sketch_within_rank_error(spark):
    """q128's in-query GK rank-bound audit must certify every group
    and quantile (the same bound this test used to recompute locally
    now lives inside the query; the driver oracle pins it to true),
    with group counts agreeing with q117's exact tier."""
    from columnar_format_spark.registry import QUERIES

    exact = {r.l_returnflag: r for r in
             QUERIES["q117_percentile_exact"].fn(spark, SF_SMALL).collect()}
    sk = {r.l_returnflag: r for r in
          QUERIES["q128_percentile_sketch"].fn(spark, SF_SMALL).collect()}
    assert set(sk) == set(exact)
    for flag, s in sk.items():
        assert s.n > 0
        assert s.p50_ok and s.p90_ok and s.p99_ok, (flag, s)
