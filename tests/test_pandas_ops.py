"""applyInPandas operators: the pandas path must agree with the
oracle-checked SQL path."""

from __future__ import annotations

from data_catalog_spark.operators import pandas_ops as po

from conftest import assert_same


def test_zscore_sql_parity(spark, sf_dir, ddb):
    assert_same(po.user_event_zscore_sql(spark, sf_dir), ddb, po.ZSCORE_SQL_ORACLE)


def test_pandas_matches_sql_path(spark, sf_dir):
    p = {r.event_id: r.z for r in po.user_event_zscore(spark, sf_dir).collect()}
    s = {r.event_id: r.z for r in po.user_event_zscore_sql(spark, sf_dir).collect()}
    assert p.keys() == s.keys()
    # the pandas body replicates the SQL decimal moments bit-for-bit
    assert all(p[k] == s[k] for k in p)


def test_zscore_is_normalized(spark, sf_dir):
    rows = po.user_event_zscore(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.z)
    some = list(by_user.values())[:10]
    for zs in some:
        if len(zs) > 1:
            # z is rounded to 6dp, so the group mean is 0 up to rounding
            assert abs(sum(zs) / len(zs)) < 1e-6


def test_sessionize_native_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators.sessionize import (
        SESSIONIZE_NATIVE_ORACLE,
        sessionize_native,
    )
    from conftest import assert_same

    assert_same(sessionize_native(spark, sf_dir), ddb, SESSIONIZE_NATIVE_ORACLE)


def test_sessionize_native_matches_lag_based(spark, sf_dir):
    """The declarative session_window form and the lag/running-sum form
    must produce the same sessions on this corpus (no exact-gap-boundary
    events in the test data)."""
    from data_catalog_spark.operators.sessionize import (
        sessionize_events,
        sessionize_native,
    )

    native = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in sessionize_native(spark, sf_dir).collect()
    }
    lagged = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in sessionize_events(spark, sf_dir).collect()
    }
    assert native == lagged


def test_cogroup_click_history_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import pandas_ops as po
    from conftest import assert_same

    assert_same(
        po.purchases_click_history_cogroup(spark, sf_dir), ddb, po.COGROUP_ORACLE
    )


def test_cogroup_counts_are_monotone_per_user(spark, sf_dir):
    """Within a user, clicks_before is non-decreasing in purchase time."""
    from collections import defaultdict

    from data_catalog_spark.operators import pandas_ops as po

    rows = po.purchases_click_history_cogroup(spark, sf_dir).collect()
    seen = defaultdict(int)
    for r in rows:  # already ordered by (user_id, purchase_id)
        assert r.clicks_before >= 0
        seen[r.user_id] = max(seen[r.user_id], r.clicks_before)
