"""Local replica of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly at sf0.001 (the driver
runs the same comparison at sf0.01)."""

import pytest

import columnar_format_spark.queries  # noqa: F401  (registers)
from columnar_format_spark.oracle import compare_query
from columnar_format_spark.registry import QUERIES

from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    res = compare_query(spark, SF_SMALL, name)
    assert res["ok"], res["notes"]
    assert res["spark_rows"] >= 0


def test_percentile_sketch_within_rank_error(spark):
    """q128's sketch values must be actual data values within the
    documented GK rank-error bound of q117's exact discrete
    percentiles. Checked on the real table, not a toy: rank error
    <= n/accuracy means at these SFs the sketch should essentially
    nail the exact answers."""
    from pyspark.sql import functions as F

    from columnar_format_spark.functions.pipeline_ops import SKETCH_ACCURACY
    from columnar_format_spark.registry import QUERIES, table

    exact = {r.l_returnflag: r for r in
             QUERIES["q117_percentile_exact"].fn(spark, SF_SMALL).collect()}
    sk = {r.l_returnflag: r for r in
          QUERIES["q128_percentile_sketch"].fn(spark, SF_SMALL).collect()}
    li = table(spark, SF_SMALL, "lineitem")
    assert set(sk) == set(exact)
    for flag, s in sk.items():
        vals = sorted(r.l_extendedprice for r in li.filter(
            F.col("l_returnflag") == flag).select("l_extendedprice").collect())
        n = len(vals)
        max_rank_err = max(1, (n + SKETCH_ACCURACY - 1) // SKETCH_ACCURACY)
        for p, approx in ((0.5, s.p50_approx), (0.9, s.p90_approx),
                          (0.99, s.p99_approx)):
            assert approx in vals, "sketch must return an actual data value"
            target = max(0, min(n - 1, int(p * n)))
            got_rank = vals.index(approx)
            assert abs(got_rank - target) <= max_rank_err + 1, (
                flag, p, got_rank, target)
