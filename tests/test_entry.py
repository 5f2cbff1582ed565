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


def test_every_oracle_less_query_runs_and_has_schema(spark):
    # Only the handful of queries WITHOUT a DuckDB oracle: every
    # oracle-backed query is executed end-to-end (collect + row/
    # schema/dtype compare) by test_queries_oracle in the same gate,
    # so re-building all 215 here re-ran ~5 minutes of fixture DML
    # for zero added coverage (r13 verdict item #2: the suite
    # outgrew the driver's budget).
    qs = entrymod.queries()
    oracled = set(entrymod.oracle_sql())
    ran = 0
    for name, fn in qs.items():
        if name in oracled:
            continue
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        ran += 1
    assert ran >= 1  # the oracle-less tail exists and was exercised
