"""Edge-case robustness for the timeseries/fuzzy operator family
(q95-q99): crafted tables probing empty fill inputs, LOCF across long
gaps, mode ties, promo-boundary strictness, degenerate names, and
window-boundary timestamps — each compared against the DuckDB oracle
on the same crafted parquet.
"""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

import columnar_format_spark.queries  # noqa: F401  (registers)
from columnar_format_spark.oracle import compare_query


def _stage(tables: dict[str, pd.DataFrame]) -> str:
    d = tempfile.mkdtemp(prefix="edge_ts_")
    for name, df in tables.items():
        df.to_parquet(os.path.join(d, f"{name}.parquet"))
    return d


def _events(ts, event_type, value, user_id=None) -> pd.DataFrame:
    n = len(ts)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts).astype("datetime64[us]"),
        "user_id": np.asarray(
            user_id if user_id is not None else np.arange(n) % 3,
            dtype=np.int64),
        "event_type": event_type,
        "value": np.asarray(value, dtype=np.float64),
        "props": ["{}"] * n,
    })


def _orders(dates, totalprice, status=None, priority=None) -> pd.DataFrame:
    n = len(dates)
    return pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": np.arange(n, dtype=np.int64) % 5,
        "o_orderstatus": status if status is not None else ["O"] * n,
        "o_totalprice": np.asarray(totalprice, dtype=np.float64),
        "o_orderdate": pd.to_datetime(dates).astype("datetime64[us]"),
        "o_orderpriority": priority if priority is not None
        else ["1-URGENT"] * n,
    })


def _part(names) -> pd.DataFrame:
    n = len(names)
    return pd.DataFrame({
        "p_partkey": np.arange(n, dtype=np.int64),
        "p_name": names,
        "p_brand": ["B1"] * n,
        "p_type": ["T"] * n,
        "p_size": np.ones(n, dtype=np.int32),
        "p_retailprice": np.full(n, 10.0),
    })


# ---------------------------------------------------------------------------
# q95 gap-fill + LOCF


def test_gapfill_no_qualifying_rows(spark):
    """Every event below the threshold → empty series, empty calendar:
    both engines must return zero rows, not crash on empty bounds."""
    d = _stage({"events": _events(
        ["2024-01-01 10:00:00", "2024-01-05 10:00:00"],
        ["view", "click"], [10.0, 20.0])})
    r = compare_query(spark, d, "q95_gapfill_locf")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 0


def test_gapfill_locf_across_long_gap(spark):
    """One type observed on day 1 and day 20 only: 18 interior gap
    days must all carry day 1's value; a second type observed only
    mid-range starts with leading NULL-fill (coalesce → 0)."""
    d = _stage({"events": _events(
        ["2024-01-01 09:00:00", "2024-01-20 09:00:00", "2024-01-10 09:00:00"],
        ["view", "view", "click"],
        [300.0, 400.0, 350.0])})
    r = compare_query(spark, d, "q95_gapfill_locf")
    assert r["ok"], r["notes"]
    # calendar = 2 types x 20 days
    assert r["spark_rows"] == 40


def test_gapfill_threshold_is_strict(spark):
    """value == threshold must be excluded (strict >) by both
    engines."""
    d = _stage({"events": _events(
        ["2024-01-01 09:00:00", "2024-01-02 09:00:00"],
        ["view", "view"], [250.0, 251.0])})
    r = compare_query(spark, d, "q95_gapfill_locf")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 1  # only the 251.0 day survives


# ---------------------------------------------------------------------------
# q96 median + deterministic mode


def test_mode_tie_breaks_alphabetically(spark):
    """Two statuses with identical counts: the alphabetically first
    must win in both engines (the explicit tie-break)."""
    d = _stage({"orders": _orders(
        ["1995-01-01"] * 4, [100.0, 200.0, 300.0, 400.0],
        status=["P", "F", "F", "P"])})
    r = compare_query(spark, d, "q96_median_mode")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 1


def test_median_even_count_interpolates_identically(spark):
    """Even row count forces the 0.5-fraction interpolation between
    two distinct cent values — must agree bit-for-bit."""
    d = _stage({"orders": _orders(
        ["1995-01-01"] * 4, [10.01, 10.02, 99999999.97, 0.03])})
    r = compare_query(spark, d, "q96_median_mode")
    assert r["ok"], r["notes"]


def test_median_single_row_groups(spark):
    """One order per priority: median == the value, mode == its
    status."""
    d = _stage({"orders": _orders(
        ["1995-01-01"] * 3, [5.55, 6.66, 7.77],
        status=["O", "F", "P"],
        priority=["1-URGENT", "2-HIGH", "3-MEDIUM"])})
    r = compare_query(spark, d, "q96_median_mode")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 3


# ---------------------------------------------------------------------------
# q97 interval overlap


def test_promo_boundaries_are_half_open(spark):
    """[start, end) x [o_orderdate, +30d) strictness: an order ON the
    promo end date does not overlap; an order whose 30-day interval
    ends exactly at promo start does not overlap; one day inside
    does."""
    d = _stage({"orders": _orders(
        ["1995-09-01",   # == summer95 end -> excluded
         "1995-05-02",   # interval ends 1995-06-01 == start -> excluded
         "1995-05-03",   # interval ends 1995-06-02 -> overlaps 1 day
         "1995-08-31"],  # starts inside -> overlaps
        [10.0, 20.0, 30.0, 40.0])})
    r = compare_query(spark, d, "q97_interval_overlap")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 1  # only summer95 gets orders (2 of them)


def test_order_spans_multiple_promos(spark):
    """An order interval bridging holiday95's window boundary into
    1996 counts once per overlapped promo."""
    d = _stage({"orders": _orders(
        ["1996-01-10",  # overlaps holiday95 tail (ends 01-15)
         "1996-02-25"],  # interval runs to 03-26 -> overlaps spring96
        [11.0, 22.0])})
    r = compare_query(spark, d, "q97_interval_overlap")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 2


# ---------------------------------------------------------------------------
# q98 blocked fuzzy match


def test_fuzzy_duplicate_names_collapse(spark):
    """Repeated identical p_name rows must dedupe before pairing: 3
    copies of each of two names in one block -> exactly one pair."""
    d = _stage({"part": _part(
        ["blue anvil"] * 3 + ["bold anvil"] * 3)})
    r = compare_query(spark, d, "q98_fuzzy_blocked")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 1


def test_fuzzy_single_word_names(spark):
    """Names with no second token block on the empty-string noun in
    both engines (split_part out-of-range -> '' in Spark and DuckDB)."""
    d = _stage({"part": _part(["anvil", "angle", "blue anvil"])})
    r = compare_query(spark, d, "q98_fuzzy_blocked")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 1  # anvil<->angle pair via '' block


def test_fuzzy_distance_threshold(spark):
    """Adjectives beyond edit distance 3 must not pair."""
    d = _stage({"part": _part(
        ["blue anvil", "blues anvil", "turquoise anvil"])})
    r = compare_query(spark, d, "q98_fuzzy_blocked")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 1  # blue<->blues only


# ---------------------------------------------------------------------------
# q99 batch sliding windows


def test_sliding_window_boundary_timestamps(spark):
    """Events exactly on the 30-min grid and 1 us before it fall into
    exactly 2 windows each, assigned identically by both engines."""
    d = _stage({"events": _events(
        ["2024-01-01 10:00:00.000000", "2024-01-01 10:29:59.999999",
         "2024-01-01 10:30:00.000000", "2024-01-01 09:59:59.999999"],
        ["view"] * 4, [1.0, 2.0, 4.0, 8.0])})
    r = compare_query(spark, d, "q99_sliding_window_batch")
    assert r["ok"], r["notes"]


def test_sliding_window_value_sums_are_exact(spark):
    """Cent-sum determinism inside sliding windows: many 0.01 values
    in one window must sum exactly."""
    ts = pd.date_range("2024-01-01 10:00:00", periods=200, freq="s")
    d = _stage({"events": _events(
        ts.astype(str).tolist(), ["click"] * 200, [0.01] * 200)})
    r = compare_query(spark, d, "q99_sliding_window_batch")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 2  # all events in the same 2 windows


# ---------------------------------------------------------------------------
# Seeded-random differential sweep: the whole family on a randomized
# corpus (wider value coverage than the hand-crafted cases above).


def test_family_on_seeded_random_tables(spark):
    import random

    rng = random.Random(20260813)
    n_ev, n_ord = 400, 300
    ev = _events(
        ts=[f"2024-01-{rng.randint(1, 28):02d} "
            f"{rng.randint(0, 23):02d}:{rng.randint(0, 59):02d}:"
            f"{rng.randint(0, 59):02d}.{rng.randint(0, 999999):06d}"
            for _ in range(n_ev)],
        event_type=[rng.choice(["view", "click", "purchase"])
                    for _ in range(n_ev)],
        value=[round(rng.uniform(0, 500), 2) for _ in range(n_ev)],
        user_id=[rng.randint(0, 20) for _ in range(n_ev)],
    )
    orders = _orders(
        dates=[f"199{rng.randint(5, 9)}-{rng.randint(1, 12):02d}-"
               f"{rng.randint(1, 28):02d}" for _ in range(n_ord)],
        totalprice=[round(rng.uniform(-1000, 100000), 2)
                    for _ in range(n_ord)],
        status=[rng.choice(["O", "F", "P"]) for _ in range(n_ord)],
        priority=[rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"])
                  for _ in range(n_ord)],
    )
    customer = pd.DataFrame({
        "c_custkey": np.arange(97, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(97)],
        "c_nationkey": np.asarray([rng.randint(0, 24) for _ in range(97)],
                                  dtype=np.int64),
        "c_acctbal": np.asarray([round(rng.uniform(-999, 9999), 2)
                                 for _ in range(97)]),
    })
    part = _part([f"{rng.choice(['red', 'rod', 'ride', 'green', 'grain'])} "
                  f"{rng.choice(['bolt', 'belt'])}" for _ in range(60)])
    d = _stage({"events": ev, "orders": orders,
                "customer": customer, "part": part})
    for name in ["q95_gapfill_locf", "q96_median_mode",
                 "q97_interval_overlap", "q98_fuzzy_blocked",
                 "q99_sliding_window_batch", "q100_scd2_upsert"]:
        r = compare_query(spark, d, name)
        assert r["ok"], (name, r["notes"])


def test_scd2_null_update_value_still_matches(spark):
    """A change-batch key whose computed update value is NULL is still
    a MATCHED row: it must close the old version and open a new one
    with the NULL value — not silently pass through as untouched."""
    customer = pd.DataFrame({
        "c_custkey": np.asarray([3, 13, 7], dtype=np.int64),
        "c_name": ["a", "b", "c"],
        "c_nationkey": pd.array([None, 5, 9], dtype="Int64"),
        "c_acctbal": np.asarray([1.0, 2.0, 3.0]),
    })
    d = _stage({"customer": customer})
    r = compare_query(spark, d, "q100_scd2_upsert")
    assert r["ok"], r["notes"]
    # keys 3,13 matched (2 rows each), key 7 untouched (1 row)
    assert r["spark_rows"] == 5


def test_sliding_window_null_timestamps_dropped(spark):
    """NULL event timestamps belong to no window in either engine."""
    ev = _events(
        ["2024-01-01 10:05:00", "2024-01-01 10:05:00"],
        ["view", "view"], [1.0, 2.0])
    ev.loc[1, "ts"] = pd.NaT
    d = _stage({"events": ev})
    r = compare_query(spark, d, "q99_sliding_window_batch")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 2  # one event x its 2 windows


# ---------------------------------------------------------------------------
# TPC-H shapes (q103/q104/q105) on crafted tables


def test_q13_zero_order_customers_bucket(spark):
    """Customers with no orders must land in the c_count=0 bucket —
    the left-join-count trap q105 exists to pin."""
    customer = pd.DataFrame({
        "c_custkey": np.arange(5, dtype=np.int64),
        "c_name": [f"c{i}" for i in range(5)],
        "c_nationkey": np.zeros(5, dtype=np.int64),
        "c_acctbal": np.zeros(5),
        "c_mktsegment": ["BUILDING"] * 5,
    })
    orders = _orders(["1995-01-01"] * 3, [10.0, 20.0, 30.0])
    orders["o_custkey"] = np.asarray([1, 1, 2], dtype=np.int64)
    d = _stage({"customer": customer, "orders": orders})
    r = compare_query(spark, d, "q105_tpch_q13")
    assert r["ok"], r["notes"]
    # buckets: 0 orders (3 customers), 1 order (1), 2 orders (1)
    assert r["spark_rows"] == 3


def test_q3_boundary_dates_are_strict(spark):
    """o_orderdate == cutoff and l_shipdate == cutoff must both be
    excluded (strict < and > in both engines)."""
    customer = pd.DataFrame({
        "c_custkey": np.asarray([0, 1], dtype=np.int64),
        "c_name": ["a", "b"],
        "c_nationkey": np.zeros(2, dtype=np.int64),
        "c_acctbal": np.zeros(2),
        "c_mktsegment": ["BUILDING", "MACHINERY"],
    })
    orders = _orders(
        ["1996-01-01", "1995-12-31", "1995-12-31"], [1.0, 2.0, 3.0])
    orders["o_custkey"] = np.asarray([0, 0, 1], dtype=np.int64)
    lineitem = pd.DataFrame({
        "l_orderkey": np.asarray([0, 1, 1, 2], dtype=np.int64),
        "l_partkey": np.zeros(4, dtype=np.int64),
        "l_suppkey": np.zeros(4, dtype=np.int64),
        "l_linenumber": np.ones(4, dtype=np.int32),
        "l_quantity": np.ones(4),
        "l_extendedprice": np.asarray([100.0, 200.0, 300.0, 400.0]),
        "l_discount": np.asarray([0.1, 0.0, 0.05, 0.0]),
        "l_tax": np.zeros(4),
        "l_returnflag": ["N"] * 4,
        "l_linestatus": ["O"] * 4,
        "l_shipdate": pd.to_datetime(
            ["1996-02-01",   # order 0: o_orderdate==cutoff -> excluded
             "1996-01-01",   # order 1: shipdate==cutoff -> excluded
             "1996-03-01",   # order 1: qualifies (BUILDING customer)
             "1996-03-01"]   # order 2: MACHINERY customer -> excluded
        ).astype("datetime64[us]"),
    })
    d = _stage({"customer": customer, "orders": orders,
                "lineitem": lineitem})
    r = compare_query(spark, d, "q103_tpch_q3")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 1  # only order 1's 1996-03-01 line


def test_q7_nation_pair_is_bidirectional(spark):
    """Trade in both directions must appear as separate
    (supp_nation, cust_nation) rows; same-nation trade is excluded."""
    nation = pd.DataFrame({
        "n_nationkey": np.asarray([18, 19], dtype=np.int64),
        "n_name": ["NATION_18", "NATION_19"],
        "n_regionkey": np.zeros(2, dtype=np.int64),
    })
    supplier = pd.DataFrame({
        "s_suppkey": np.asarray([0, 1], dtype=np.int64),
        "s_name": ["s0", "s1"],
        "s_nationkey": np.asarray([18, 19], dtype=np.int64),
        "s_acctbal": np.zeros(2),
    })
    customer = pd.DataFrame({
        "c_custkey": np.asarray([0, 1], dtype=np.int64),
        "c_name": ["a", "b"],
        "c_nationkey": np.asarray([19, 18], dtype=np.int64),
        "c_acctbal": np.zeros(2),
        "c_mktsegment": ["BUILDING"] * 2,
    })
    orders = _orders(["1995-06-01", "1995-06-01"], [1.0, 2.0])
    orders["o_custkey"] = np.asarray([0, 1], dtype=np.int64)
    lineitem = pd.DataFrame({
        "l_orderkey": np.asarray([0, 0, 1], dtype=np.int64),
        "l_partkey": np.zeros(3, dtype=np.int64),
        # order 0 (cust nation 19): supp 18 -> 18->19; supp 19 -> same-pair
        # order 1 (cust nation 18): supp 19 -> 19->18
        "l_suppkey": np.asarray([0, 1, 1], dtype=np.int64),
        "l_linenumber": np.ones(3, dtype=np.int32),
        "l_quantity": np.ones(3),
        "l_extendedprice": np.asarray([100.0, 200.0, 300.0]),
        "l_discount": np.zeros(3),
        "l_tax": np.zeros(3),
        "l_returnflag": ["N"] * 3,
        "l_linestatus": ["O"] * 3,
        "l_shipdate": pd.to_datetime(["1995-07-01"] * 3)
        .astype("datetime64[us]"),
    })
    d = _stage({"nation": nation, "supplier": supplier,
                "customer": customer, "orders": orders,
                "lineitem": lineitem})
    r = compare_query(spark, d, "q104_tpch_q7")
    assert r["ok"], r["notes"]
    assert r["spark_rows"] == 2  # 18->19 and 19->18, same-nation dropped


def test_quality_audit_counts_real_violations(spark):
    """Crafted dirty data: duplicate customer keys, orphaned orders and
    lineitems, NULL user_ids, negative totals — every check must count
    its violations, not just agree on zero."""
    customer = pd.DataFrame({
        "c_custkey": np.asarray([1, 1, 1, 2], dtype=np.int64),  # 2 dups
        "c_name": ["a", "a2", "a3", "b"],
        "c_nationkey": np.zeros(4, dtype=np.int64),
        "c_acctbal": np.zeros(4),
        "c_mktsegment": ["BUILDING"] * 4,
    })
    orders = _orders(["1995-01-01"] * 4, [10.0, -5.0, -0.01, 20.0])
    orders["o_custkey"] = np.asarray([1, 2, 9, 9], dtype=np.int64)  # 2 orphans
    lineitem = pd.DataFrame({
        "l_orderkey": np.asarray([0, 1, 77], dtype=np.int64),  # 1 orphan
        "l_partkey": np.zeros(3, dtype=np.int64),
        "l_suppkey": np.zeros(3, dtype=np.int64),
        "l_linenumber": np.ones(3, dtype=np.int32),
        "l_quantity": np.ones(3),
        "l_extendedprice": np.ones(3),
        "l_discount": np.zeros(3),
        "l_tax": np.zeros(3),
        "l_returnflag": ["N"] * 3,
        "l_linestatus": ["O"] * 3,
        "l_shipdate": pd.to_datetime(["1995-02-01"] * 3)
        .astype("datetime64[us]"),
    })
    ev = _events(["2024-01-01 10:00:00"] * 3, ["view"] * 3, [1.0, 2.0, 3.0])
    ev["user_id"] = pd.array([1, None, None], dtype="Int64")  # 2 nulls
    d = _stage({"customer": customer, "orders": orders,
                "lineitem": lineitem, "events": ev})
    r = compare_query(spark, d, "q106_data_quality_audit")
    assert r["ok"], r["notes"]
    from columnar_format_spark.registry import QUERIES
    got = {row["check_name"]: row["n_violations"]
           for row in QUERIES["q106_data_quality_audit"].fn(spark, d).collect()}
    assert got == {
        "customer_dup_custkey": 2,
        "events_null_user": 2,
        "lineitem_orphan_orderkey": 1,
        "orders_negative_total": 2,
        "orders_orphan_custkey": 2,
    }

def test_incremental_merge_equals_full_recompute(spark):
    """The merged partial states must equal a direct full aggregate on
    the same crafted events — the mergeability property itself."""
    ev = _events(
        ["2024-01-10 09:00:00", "2024-01-14 23:59:59",
         "2024-01-15 00:00:00", "2024-01-20 01:00:00"],
        ["view", "view", "view", "click"],
        [1.11, 2.22, 4.44, 8.88])
    d = _stage({"events": ev})
    r = compare_query(spark, d, "q107_incremental_agg")
    assert r["ok"], r["notes"]
    from columnar_format_spark.registry import QUERIES
    got = {row["event_type"]: (row["n_events"], row["sum_value"])
           for row in QUERIES["q107_incremental_agg"].fn(spark, d).collect()}
    assert got == {"view": (3, 7.77), "click": (1, 8.88)}


def test_temporal_join_covers_every_order_exactly_once(spark):
    """The SCD2 versions partition each key's timeline, so the
    point-in-time join must match every order exactly once — no drops
    at the version boundary, no double-matches."""
    from columnar_format_spark.registry import QUERIES

    customer = pd.DataFrame({
        "c_custkey": np.asarray([3, 7], dtype=np.int64),  # 3 = changed key
        "c_name": ["a", "b"],
        "c_nationkey": np.asarray([5, 9], dtype=np.int64),
        "c_acctbal": np.zeros(2),
        "c_mktsegment": ["BUILDING"] * 2,
    })
    orders = _orders(
        ["1995-06-01",   # key 3, era 1 -> nation 5
         "1996-01-01",   # key 3, ON the boundary -> era 2, nation 6
         "1997-03-01",   # key 3, era 2 -> nation 6
         "1999-01-01"],  # key 7, unchanged -> nation 9
        [10.0, 20.0, 40.0, 80.0])
    orders["o_custkey"] = np.asarray([3, 3, 3, 7], dtype=np.int64)
    d = _stage({"customer": customer, "orders": orders})
    r = compare_query(spark, d, "q110_temporal_join")
    assert r["ok"], r["notes"]
    got = {row["c_nationkey"]: (row["n_orders"], row["revenue"])
           for row in QUERIES["q110_temporal_join"].fn(spark, d).collect()}
    assert got == {5: (1, 10.0), 6: (2, 60.0), 9: (1, 80.0)}
    assert sum(n for n, _ in got.values()) == len(orders)


def test_quality_audit_empty_tables_count_zero(spark):
    """Zero-row tables must audit as 0 violations, not NULL (the
    empty-aggregate coalesce in every conditional-sum check)."""
    d = _stage({
        "customer": pd.DataFrame({
            "c_custkey": pd.array([], dtype="int64"),
            "c_name": pd.array([], dtype="str"),
            "c_nationkey": pd.array([], dtype="int64"),
            "c_acctbal": pd.array([], dtype="float64"),
            "c_mktsegment": pd.array([], dtype="str"),
        }),
        "orders": _orders([], []),
        "lineitem": pd.DataFrame({
            "l_orderkey": pd.array([], dtype="int64"),
            "l_quantity": pd.array([], dtype="float64"),
        }),
        "events": _events([], [], []),
    })
    r = compare_query(spark, d, "q106_data_quality_audit")
    assert r["ok"], r["notes"]
    from columnar_format_spark.registry import QUERIES
    got = {row["check_name"]: row["n_violations"]
           for row in QUERIES["q106_data_quality_audit"].fn(spark, d).collect()}
    assert got["events_null_user"] == 0
    assert got["orders_negative_total"] == 0


def test_incremental_agg_null_ts_not_dropped(spark):
    """A NULL-ts event must land in exactly one partial (the fresh
    slice) so the merge equals a true full recompute."""
    ev = _events(["2024-01-10 09:00:00", "2024-01-20 09:00:00"],
                 ["view", "view"], [1.0, 2.0])
    ev.loc[2] = [2, pd.NaT, 0, "view", 4.0, "{}"]
    ev["event_id"] = ev["event_id"].astype("int64")
    ev["user_id"] = ev["user_id"].astype("int64")
    d = _stage({"events": ev})
    r = compare_query(spark, d, "q107_incremental_agg")
    assert r["ok"], r["notes"]
    from columnar_format_spark.registry import QUERIES
    row = QUERIES["q107_incremental_agg"].fn(spark, d).collect()[0]
    assert (row["n_events"], row["sum_value"]) == (3, 7.0)


# --- q121 strict funnel / q118 skew distinct edge semantics ------------


def test_strict_funnel_click_before_view_trap(spark):
    """User 0 clicks BEFORE their first view and never again: q92's
    first-touch rule would pass them (click_ts >= view_ts is False
    here, so actually both fail) — the decisive case is user 1, whose
    first click precedes the view but who clicks AGAIN after it:
    strict funnel must count user 1, and must NOT count user 0.
    User 2 has view→click at the SAME timestamp (strictly-after ⇒ no).
    """
    t0 = "2024-03-01 12:00:00"
    ev = _events(
        ts=[
            # user 0: click, then view, no later click
            "2024-03-01 10:00:00", "2024-03-01 11:00:00",
            # user 1: click, view, click (later), purchase (later still)
            "2024-03-01 10:00:00", "2024-03-01 11:00:00", t0,
            "2024-03-01 13:00:00",
            # user 2: view and click at the identical timestamp
            "2024-03-01 10:00:00", "2024-03-01 10:00:00",
        ],
        event_type=["click", "view",
                    "click", "view", "click", "purchase",
                    "view", "click"],
        value=[1.0] * 8,
        user_id=[0, 0, 1, 1, 1, 1, 2, 2],
    )
    sf = _stage({"events": ev})
    res = compare_query(spark, sf, "q121_strict_funnel")
    assert res["ok"], res["notes"]
    from columnar_format_spark.registry import QUERIES
    row = QUERIES["q121_strict_funnel"].fn(spark, sf).collect()[0]
    assert row.n_viewed == 3
    assert row.n_clicked_after == 1   # only user 1
    assert row.n_purchased_after == 1


def test_skew_exact_distinct_single_hot_key(spark):
    """Everything lands on one event_type (maximum key skew); the
    composite-key expansion must still produce the exact distinct."""
    n = 500
    ev = _events(
        ts=pd.date_range("2024-01-01", periods=n, freq="1min"),
        event_type=["click"] * n,
        value=np.round(np.linspace(0.01, 5.0, n), 2),
        user_id=np.arange(n) % 7,
    )
    sf = _stage({"events": ev})
    res = compare_query(spark, sf, "q118_skew_exact_distinct")
    assert res["ok"], res["notes"]
    from columnar_format_spark.registry import QUERIES
    row = QUERIES["q118_skew_exact_distinct"].fn(spark, sf).collect()[0]
    assert row.n_users == 7 and row.n_events == n


# ---------------------------------------------------------------------------
# q162 anomaly z-score


def test_anomaly_zero_variance_window(spark):
    """A constant trailing window has zero sample variance: any
    deviating value is an anomaly (infinite z), an equal value is not
    — the integer form ((n-1)dev^2 > 9n*var_term with var_term=0)
    encodes that without a division, identically in both engines."""
    ts = pd.date_range("2024-01-01", periods=40, freq="1min")
    vals = [5.0] * 30 + [5.0, 9.99] + [5.0] * 8
    sf = _stage({"events": _events(ts, ["x"] * 40, vals)})
    res = compare_query(spark, sf, "q162_anomaly_zscore")
    assert res["ok"], res["notes"]
    out = {r.event_id for r in
           __import__("columnar_format_spark.queries", fromlist=["x"])
           .QUERIES["q162_anomaly_zscore"].fn(spark, sf).collect()}
    assert 31 in out        # the deviating value is flagged
    assert 30 not in out    # an equal value is not


def test_anomaly_warmup_boundary(spark):
    """Rows with fewer than ANOM_MIN_WIN trailing samples are skipped
    on both sides — the first flaggable row is index ANOM_MIN_WIN."""
    from columnar_format_spark.operators.timeseries import ANOM_MIN_WIN

    n = ANOM_MIN_WIN + 5
    ts = pd.date_range("2024-01-01", periods=n, freq="1min")
    # every value wildly different from the constant prefix
    vals = [1.0] * ANOM_MIN_WIN + [100.0, 1.0, 1.0, 1.0, 1.0]
    sf = _stage({"events": _events(ts, ["x"] * n, vals)})
    res = compare_query(spark, sf, "q162_anomaly_zscore")
    assert res["ok"], res["notes"]


def test_anomaly_null_ts_and_value_dropped(spark):
    ts = list(pd.date_range("2024-01-01", periods=30, freq="1min"))
    df = _events(ts, ["x"] * 30, [3.0] * 29 + [50.0])
    df.loc[5, "ts"] = pd.NaT
    df.loc[7, "value"] = np.nan
    sf = _stage({"events": df})
    res = compare_query(spark, sf, "q162_anomaly_zscore")
    assert res["ok"], res["notes"]
