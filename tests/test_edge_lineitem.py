"""Edge-case robustness for the exact-integer money arithmetic
(relational.cents/dsum/davg and the revenue pattern): crafted lineitem
and orders tables with negative amounts, NULLs, zero rows per group,
and large magnitudes must stay oracle-exact.
"""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

import columnar_format_spark.queries  # noqa: F401  (registers)
from columnar_format_spark.oracle import compare_query

MONEY_QUERIES = [
    "q01_pricing_summary",
    "q08_exact_quartiles",
    "q39_unpivot_metrics",
]

ORDER_QUERIES = [
    "q21_window_running_sum",
    "q23_window_range_30d",
]


def _stage(tables: dict[str, pd.DataFrame]) -> str:
    d = tempfile.mkdtemp(prefix="edge_li_")
    for name, df in tables.items():
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _lineitem(prices, quantities, discounts=None, taxes=None) -> pd.DataFrame:
    n = len(prices)
    return pd.DataFrame({
        "l_orderkey": np.arange(n, dtype=np.int64),
        "l_partkey": np.arange(n, dtype=np.int64) % 7,
        "l_suppkey": np.arange(n, dtype=np.int64) % 5,
        "l_linenumber": np.ones(n, dtype=np.int32),
        "l_quantity": np.asarray(quantities, dtype=np.float64),
        "l_extendedprice": np.asarray(prices, dtype=np.float64),
        "l_discount": np.asarray(
            discounts if discounts is not None else [0.05] * n, dtype=np.float64),
        "l_tax": np.asarray(taxes if taxes is not None else [0.04] * n,
                            dtype=np.float64),
        "l_returnflag": ["A", "N", "R"] * (n // 3) + ["A"] * (n % 3),
        "l_linestatus": ["O", "F"] * (n // 2) + ["O"] * (n % 2),
        "l_shipdate": pd.to_datetime(["1995-06-01"] * n).astype("datetime64[us]"),
    })


CASES = {
    # refunds/chargebacks: negative money must survive the cents cast
    "negative_amounts": _lineitem(
        prices=[-1234.56, 0.0, 9999.99, -0.01, 55.55, 10.10],
        quantities=[1, 2, 3, 4, 5, 6],
        discounts=[0.0, 0.1, 0.05, 0.02, 0.0, 0.1],
    ),
    # 2dp values that are NOT exactly representable as doubles
    "representation_hazards": _lineitem(
        prices=[0.1, 0.2, 0.3, 1.1, 2.675, 8.165, 3.335, 0.05, 0.15],
        quantities=[10, 20, 30, 40, 50, 1, 2, 3, 4],
        discounts=[0.07, 0.07, 0.07, 0.01, 0.03, 0.09, 0.02, 0.04, 0.06],
    ),
    # near the documented |money| domain for exact cents (10^14 scale)
    "large_magnitudes": _lineitem(
        prices=[99999999999.99, -99999999999.99, 12345678901.23] * 3,
        quantities=[1, 1, 1] * 3,
        discounts=[0.0, 0.0, 0.0] * 3,
        taxes=[0.0, 0.0, 0.0] * 3,
    ),
    # single row per group, identical values across rows
    "degenerate_groups": _lineitem(
        prices=[100.00] * 9,
        quantities=[7] * 9,
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_queries_on_crafted_lineitem(spark, case, name):
    sf_dir = _stage({"lineitem": CASES[case]})
    res = compare_query(spark, sf_dir, name)
    assert res["ok"], res["notes"]


def _orders(prices) -> pd.DataFrame:
    n = len(prices)
    return pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": np.arange(n, dtype=np.int64) % 3,
        "o_orderstatus": ["O"] * n,
        "o_totalprice": np.asarray(prices, dtype=np.float64),
        "o_orderdate": (pd.to_datetime("1995-01-01")
                        + pd.to_timedelta(np.arange(n) * 11, unit="D")
                        ).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT"] * n,
    })


@pytest.mark.parametrize("name", ORDER_QUERIES)
def test_window_sums_on_crafted_orders(spark, name):
    """Running/range window sums over negative and hazard values."""
    sf_dir = _stage({"orders": _orders(
        [-5000.25, 0.01, 0.1, 123456.78, -0.1, 2.675, 99999.99, 0.3, -0.3])})
    res = compare_query(spark, sf_dir, name)
    assert res["ok"], res["notes"]


def test_percentile_exact_ties_and_tiny_groups(spark):
    """q117 on a group that is ALL ties (every percentile = the tied
    value), a single-row group (all percentiles = that row), and a
    two-value group where cume_dist boundaries land exactly on 0.5."""
    li = _lineitem(
        prices=[7.0, 7.0, 7.0, 7.0,   # flag cycle A,N,R,A...
                42.0,
                1.0, 2.0],
        quantities=[1] * 7,
    )
    # force groups: A = all ties + extras, N = single row, R = pair
    li["l_returnflag"] = ["A", "A", "A", "A", "N", "R", "R"]
    sf = _stage({"lineitem": li})
    res = compare_query(spark, sf, "q117_percentile_exact")
    assert res["ok"], res["notes"]
    from columnar_format_spark.registry import QUERIES
    rows = {r.l_returnflag: r
            for r in QUERIES["q117_percentile_exact"].fn(spark, sf).collect()}
    assert rows["A"].p50 == rows["A"].p99 == 7.0
    assert rows["N"].p50 == rows["N"].p100 == 42.0
    assert rows["R"].p50 == 1.0 and rows["R"].p90 == 2.0
