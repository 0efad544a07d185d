"""Temporal operators: interval join, activity streaks, transitions."""

from __future__ import annotations

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import temporal

from conftest import assert_same


def test_interval_join_parity(spark, sf_dir, ddb):
    assert_same(
        temporal.clicks_before_purchase_interval(spark, sf_dir),
        ddb,
        temporal.INTERVAL_JOIN_ORACLE,
    )


def test_interval_join_bounds(spark, sf_dir):
    rows = temporal.clicks_before_purchase_interval(spark, sf_dir).collect()
    assert rows, "expect some click-before-purchase pairs"
    assert all(0 <= r.gap_sec <= temporal.INTERVAL_SEC for r in rows)


def test_interval_join_is_superset_of_asof_within_window(spark, sf_dir):
    """Every as-of match with gap <= window must appear as an interval pair."""
    from data_catalog_spark.operators import joins

    asof = {
        (r.purchase_id, r.click_id)
        for r in joins.purchases_with_last_click(spark, sf_dir).collect()
        if r.click_id is not None and r.gap_sec <= temporal.INTERVAL_SEC
    }
    pairs = {
        (r.purchase_id, r.click_id)
        for r in temporal.clicks_before_purchase_interval(spark, sf_dir).collect()
    }
    assert asof <= pairs


def test_streaks_parity(spark, sf_dir, ddb):
    assert_same(
        temporal.user_activity_streaks(spark, sf_dir), ddb, temporal.STREAKS_ORACLE
    )


def test_streaks_invariants(spark, sf_dir):
    rows = temporal.user_activity_streaks(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert len(rows) == n_users
    for r in rows:
        assert 1 <= r.longest_streak <= r.n_active_days
        assert r.n_streaks <= r.n_active_days
        # streaks partition the active days
        assert r.longest_streak + (r.n_streaks - 1) <= r.n_active_days


def test_transitions_parity(spark, sf_dir, ddb):
    assert_same(
        temporal.event_type_transitions(spark, sf_dir),
        ddb,
        temporal.TRANSITIONS_ORACLE,
    )


def test_transitions_rows_sum_to_one(spark, sf_dir):
    rows = temporal.event_type_transitions(spark, sf_dir).collect()
    by_src: dict[str, float] = {}
    n_by_src: dict[str, int] = {}
    for r in rows:
        by_src[r.src] = by_src.get(r.src, 0.0) + r.p
        n_by_src[r.src] = n_by_src.get(r.src, 0) + r.n
    ev_count = sum(n_by_src.values())
    assert ev_count > 0
    for src, total_p in by_src.items():
        assert abs(total_p - 1.0) < 1e-4, (src, total_p)


def test_conversion_parity(spark, sf_dir, ddb):
    assert_same(
        temporal.time_to_conversion(spark, sf_dir), ddb, temporal.CONVERSION_ORACLE
    )


def test_conversion_semantics(spark, sf_dir):
    rows = temporal.time_to_conversion(spark, sf_dir).collect()
    assert rows, "expect users with signups"
    converted = [r for r in rows if r.purchase_ts is not None]
    assert converted, "some users must convert"
    assert all(r.hours_to_convert >= 0 for r in converted)
    # unconverted users keep NULL latency (left-join semantics)
    assert all(
        r.hours_to_convert is None for r in rows if r.purchase_ts is None
    )


def test_interval_join_plan_is_equi_join(spark, sf_dir):
    """The time band must ride an equi-key join, never a broadcast
    nested-loop / cartesian product."""
    plan = (
        temporal.clicks_before_purchase_interval(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
