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
