"""Smoke tests for the driver contract in __spark_entry__.py."""

import __spark_entry__ as entrymod

from tests.conftest import SF_SMALL


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a matching query
    assert set(os_) <= set(qs)
    # the vast majority of queries must be oracle-checked
    assert len(os_) >= len(qs) - 5


def test_every_query_runs_and_has_schema(spark):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
