"""Window-function operators: parity + semantics."""

from __future__ import annotations

import pytest

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import windows as W

from conftest import assert_same

PARITY = [
    ("orders_running_total", W.RUNNING_TOTAL_ORACLE),
    ("customer_spend_rank_in_segment", W.SPEND_RANK_ORACLE),
    ("events_moving_avg", W.MOVING_AVG_ORACLE),
    ("events_users_exact", W.USERS_EXACT_ORACLE),
]


@pytest.mark.parametrize("name,oracle", PARITY, ids=[n for n, _ in PARITY])
def test_parity(spark, sf_dir, ddb, name, oracle):
    assert_same(getattr(W, name)(spark, sf_dir), ddb, oracle)


def test_running_total_is_monotone_per_customer(spark, sf_dir):
    rows = W.orders_running_total(spark, sf_dir).collect()
    last: dict[int, float] = {}
    # accumulation order is (orderdate, orderkey) within each customer
    for r in sorted(rows, key=lambda r: (r.o_custkey, r.orderdate, r.o_orderkey)):
        prev = last.get(r.o_custkey, 0.0)
        assert r.running_spend >= prev - 1e-9
        last[r.o_custkey] = r.running_spend


def test_rank_starts_at_one_per_segment(spark, sf_dir):
    rows = W.customer_spend_rank_in_segment(spark, sf_dir).collect()
    segs = {r.c_mktsegment for r in rows}
    firsts = {r.c_mktsegment for r in rows if r.seg_rank == 1}
    assert firsts == segs


def test_approx_users_within_rsd(spark, sf_dir):
    """The contract view: exact counts match the exact twin and every
    HLL estimate is flagged in-tolerance (the hashed property)."""
    exact = {r.event_type: r.n_users for r in W.events_users_exact(spark, sf_dir).collect()}
    rows = W.events_users_approx(spark, sf_dir).collect()
    assert {r.event_type: r.n_users for r in rows} == exact
    assert all(r.within_tol for r in rows), rows


def test_monthly_growth_parity(spark, sf_dir, ddb):
    assert_same(W.orders_monthly_growth(spark, sf_dir), ddb, W.MONTHLY_GROWTH_ORACLE)


def test_monthly_growth_first_month_null(spark, sf_dir):
    rows = W.orders_monthly_growth(spark, sf_dir).collect()
    assert rows[0].growth_pct is None  # no prior month
    assert all(r.growth_pct is not None for r in rows[1:])


def test_balance_tiles_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import windows as wd
    from conftest import assert_same

    assert_same(wd.customer_balance_tiles(spark, sf_dir), ddb, wd.BALANCE_TILES_ORACLE)


def test_balance_tiles_single_window_exchange(spark, sf_dir):
    """All five ranking functions share one partitioning+ordering, so the
    plan must contain exactly ONE window exchange (shuffle on segment)."""
    from data_catalog_spark.operators import windows as wd

    plan = (
        wd.customer_balance_tiles(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") <= 2  # Window exec + possible WindowGroupLimit


def test_trailing_hour_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import windows as W

    assert_same(
        W.events_trailing_hour_stats(spark, sf_dir), ddb, W.TRAILING_HOUR_ORACLE
    )


def test_trailing_hour_includes_self(spark, sf_dir):
    from data_catalog_spark.operators import windows as W

    rows = W.events_trailing_hour_stats(spark, sf_dir).collect()
    assert all(r.n_1h >= 1 for r in rows)  # frame always contains the row itself


def test_latest_order_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import windows as wd

    assert_same(
        wd.latest_order_per_customer(spark, sf_dir), ddb, wd.LATEST_ORDER_ORACLE
    )


def test_latest_order_is_max_date(spark, sf_dir):
    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import windows as wd

    latest = {r.o_custkey: r.orderdate for r in wd.latest_order_per_customer(spark, sf_dir).collect()}
    from pyspark.sql import functions as F

    maxd = {
        r.o_custkey: r.d
        for r in read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("d"))
        .collect()
    }
    assert latest == maxd


def test_approx_percentiles_bounded_error(spark, sf_dir):
    """The sketch's guarantee is on RANK, not value: each reported
    percentile must be an actual data value whose empirical quantile is
    within a small neighborhood of the target (tail values can differ a
    lot in VALUE space while being rank-adjacent)."""
    import bisect

    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import windows as wd

    approx = {
        r.event_type: tuple(r.ap)
        for r in wd._value_percentile_estimates(spark, sf_dir).collect()
    }
    vals = {}
    for r in read_table(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(approx) == set(vals)
    for t, (p50, p90, p99) in approx.items():
        v = sorted(vals[t])
        n = len(v)
        # tolerance = max(discreteness, the sketch's 1/accuracy rank
        # guarantee with 2x slack) — a fixed 2/n bound would drop below
        # the guaranteed error once n > 2*accuracy and flake on correct
        # output
        tol = max(2 / n, 2 / 10000)
        for q, a in [(0.5, p50), (0.9, p90), (0.99, p99)]:
            lo = bisect.bisect_left(v, a) / n
            hi = bisect.bisect_right(v, a) / n
            assert lo - tol <= q <= hi + tol, (t, q, a, lo, hi)


def test_approx_percentiles_contract_view(spark, sf_dir):
    """The registered entry emits the exact percentile trio (same values
    as the exact operator) and all-true within_tol flags."""
    from data_catalog_spark.operators import windows as wd
    from data_catalog_spark.operators.events_analytics import (
        events_value_percentiles,
    )

    rows = wd.events_value_percentiles_approx(spark, sf_dir).collect()
    assert rows and all(r.within_tol for r in rows), rows
    exact = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in events_value_percentiles(spark, sf_dir).collect()
    }
    assert {r.event_type: (r.p50, r.p90, r.p99) for r in rows} == exact
