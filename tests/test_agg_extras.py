"""Aggregate extras: array agg, ratio-to-report, FILTER clause."""

from __future__ import annotations

from data_catalog_spark.operators import agg_extras as ax

from conftest import assert_same


def test_priority_profile_parity(spark, sf_dir, ddb):
    assert_same(
        ax.customer_priority_profile(spark, sf_dir), ddb, ax.PRIORITY_PROFILE_ORACLE
    )


def test_priority_profile_arrays_sorted_distinct(spark, sf_dir):
    rows = ax.customer_priority_profile(spark, sf_dir).collect()
    assert rows
    for r in rows[:100]:
        parts = r.priorities.split(",")
        assert parts == sorted(set(parts))


def test_revenue_share_parity(spark, sf_dir, ddb):
    assert_same(ax.nation_revenue_share(spark, sf_dir), ddb, ax.REVENUE_SHARE_ORACLE)


def test_revenue_shares_sum_to_one(spark, sf_dir):
    rows = ax.nation_revenue_share(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4


def test_filtered_aggs_parity(spark, sf_dir, ddb):
    assert_same(ax.orders_filtered_aggs(spark, sf_dir), ddb, ax.FILTER_AGG_SQL)


def test_filtered_aggs_partition_counts(spark, sf_dir):
    rows = ax.orders_filtered_aggs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_finished + r.n_open <= r.n  # P status also exists


def test_value_trend_parity(spark, sf_dir, ddb):
    assert_same(ax.events_value_trend(spark, sf_dir), ddb, ax.VALUE_TREND_ORACLE)


def test_value_trend_r2_bounds(spark, sf_dir):
    for r in ax.events_value_trend(spark, sf_dir).collect():
        assert 0.0 <= r.r2 <= 1.0


def test_balance_position_parity(spark, sf_dir, ddb):
    assert_same(
        ax.customer_balance_position(spark, sf_dir), ddb, ax.BALANCE_POSITION_ORACLE
    )


def test_balance_position_bounds(spark, sf_dir):
    rows = ax.customer_balance_position(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert r.pct_rank <= r.cume <= 1.0


def test_cooccurrence_parity(spark, sf_dir, ddb):
    assert_same(
        ax.event_type_cooccurrence(spark, sf_dir), ddb, ax.COOCCURRENCE_ORACLE
    )


def test_cooccurrence_cosine_bounds(spark, sf_dir):
    rows = ax.event_type_cooccurrence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b  # canonical pair order, no self-pairs
        assert 0.0 < r.cosine <= 1.0


def test_argmax_parity(spark, sf_dir, ddb):
    assert_same(ax.nation_argmax_customer(spark, sf_dir), ddb, ax.ARGMAX_ORACLE)


def test_argmax_semantics(spark, sf_dir):
    """richest/poorest must be the actual balance extremes per nation."""
    from data_catalog_spark.io import read_table

    cust = read_table(spark, sf_dir, "customer").collect()
    by_nation = {}
    for c in cust:
        by_nation.setdefault(c.c_nationkey, []).append(c)
    for r in ax.nation_argmax_customer(spark, sf_dir).collect():
        grp = by_nation[r.nationkey]
        max_bal = max(c.c_acctbal for c in grp)
        assert any(
            c.c_custkey == r.richest_cust and c.c_acctbal == max_bal for c in grp
        )


def test_dow_bitmask_parity(spark, sf_dir, ddb):
    assert_same(ax.user_dow_bitmask(spark, sf_dir), ddb, ax.DOW_BITMASK_ORACLE)


def test_dow_bitmask_bounds(spark, sf_dir):
    for r in ax.user_dow_bitmask(spark, sf_dir).collect():
        assert 1 <= r.dow_mask <= 127  # 7-bit mask, at least one day active
        assert 1 <= r.n_active_dows <= 7
        assert bin(r.dow_mask).count("1") == r.n_active_dows
