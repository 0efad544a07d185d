"""Funnel / cohort / percentile / pivot operators: oracle parity +
semantic invariants."""

from __future__ import annotations

import pytest

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import events_analytics as ea

from conftest import assert_same

PARITY = [
    ("funnel_view_click_purchase", ea.FUNNEL_ORACLE),
    ("cohort_weekly_retention", ea.COHORT_ORACLE),
    ("events_value_percentiles", ea.PERCENTILES_ORACLE),
    ("events_day_type_pivot", ea.PIVOT_ORACLE),
]


@pytest.mark.parametrize("name,oracle", PARITY, ids=[n for n, _ in PARITY])
def test_parity(spark, sf_dir, ddb, name, oracle):
    assert_same(getattr(ea, name)(spark, sf_dir), ddb, oracle)


def test_funnel_is_monotone(spark, sf_dir):
    """Each stage can only lose users: n_view >= n_click >= n_purchase."""
    ns = [r.n for r in ea.funnel_view_click_purchase(spark, sf_dir).collect()]
    assert len(ns) == 3 and ns[0] >= ns[1] >= ns[2] > 0


def test_cohort_week0_covers_every_user(spark, sf_dir):
    """Every user is active in their own cohort week, so the week_offset=0
    counts sum to the distinct user count."""
    rows = ea.cohort_weekly_retention(spark, sf_dir).collect()
    n_users = (
        read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.active_users for r in rows if r.week_offset == 0) == n_users


def test_pivot_rows_sum_to_event_count(spark, sf_dir):
    rows = ea.events_day_type_pivot(spark, sf_dir).collect()
    total = sum(
        r.click + r.error + r.purchase + r.signup + r.view for r in rows
    )
    assert total == read_table(spark, sf_dir, "events").count()


def test_percentiles_ordered(spark, sf_dir):
    for r in ea.events_value_percentiles(spark, sf_dir).collect():
        assert r.p50 <= r.p90 <= r.p99


def test_histogram_parity(spark, sf_dir, ddb):
    assert_same(ea.events_value_histogram(spark, sf_dir), ddb, ea.HISTOGRAM_ORACLE)


def test_histogram_covers_all_events(spark, sf_dir):
    rows = ea.events_value_histogram(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == read_table(spark, sf_dir, "events").count()
    assert all(0 <= r.bucket <= ea.HIST_BINS + 1 for r in rows)


def test_multires_rollup_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import events_analytics as ea
    from conftest import assert_same

    assert_same(ea.events_multires_rollup(spark, sf_dir), ddb, ea.MULTIRES_ORACLE)


def test_multires_day_equals_sum_of_hours(spark, sf_dir):
    """The cascade invariant: each day bucket equals the sum of its hour
    buckets (counts and sums compose exactly through DECIMAL)."""
    from collections import defaultdict

    from data_catalog_spark.operators import events_analytics as ea

    rows = ea.events_multires_rollup(spark, sf_dir).collect()
    hours = defaultdict(lambda: [0, 0.0])
    days = {}
    for r in rows:
        if r.resolution == "hour":
            d = r.bucket_start[:10]
            hours[d][0] += r.n_events
            hours[d][1] += r.sum_value
        else:
            days[r.bucket_start[:10]] = (r.n_events, r.sum_value)
    assert set(hours) == set(days)
    for d, (n, s) in days.items():
        assert hours[d][0] == n
        assert abs(hours[d][1] - s) < 1e-6


def test_mad_outliers_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import events_analytics as ea
    from conftest import assert_same

    assert_same(ea.events_outliers_mad(spark, sf_dir), ddb, ea.MAD_ORACLE)


def test_eqdepth_parity(spark, sf_dir, ddb):
    assert_same(
        ea.events_value_deciles_eqdepth(spark, sf_dir),
        ddb,
        ea.EQDEPTH_ORACLE,
    )


def test_eqdepth_buckets_roughly_equal(spark, sf_dir):
    rows = ea.events_value_deciles_eqdepth(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, 11))
    total = sum(r.n for r in rows)
    for r in rows:
        assert abs(r.n - total / 10) <= max(2, total * 0.02), (r.bucket, r.n)
    # buckets tile the value range in order
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_winsorized_parity(spark, sf_dir, ddb):
    assert_same(
        ea.events_winsorized_stats(spark, sf_dir),
        ddb,
        ea.WINSOR_ORACLE,
    )


def test_winsorized_tames_spread(spark, sf_dir):
    """Winsorized stddev must not exceed the raw stddev per type."""
    from data_catalog_spark.io import read_table
    from pyspark.sql import functions as F

    raw = {
        r.event_type: r.s
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.stddev_samp("value").alias("s"))
        .collect()
    }
    for r in ea.events_winsorized_stats(spark, sf_dir).collect():
        assert r.wstd <= raw[r.event_type] + 1e-9


def test_props_variant_parity(spark, sf_dir, ddb):
    assert_same(
        ea.events_props_variant_stats(spark, sf_dir),
        ddb,
        ea.PROPS_VARIANT_ORACLE,
    )


def test_props_variant_counts(spark, sf_dir):
    rows = ea.events_props_variant_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_with_k <= r.n
        if r.n_with_k:
            assert r.avg_k <= r.max_k


def test_unpivot_parity(spark, sf_dir, ddb):
    assert_same(
        ea.events_day_type_unpivot(spark, sf_dir), ddb, ea.UNPIVOT_ORACLE
    )


def test_unpivot_roundtrips_pivot(spark, sf_dir):
    """melt(pivot(x)) recovers the plain groupBy counts."""
    from data_catalog_spark.io import read_table
    from pyspark.sql import functions as F

    direct = {
        (r.day, r.event_type): r.n
        for r in read_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    melted = {
        (r.day, r.event_type): r.n
        for r in ea.events_day_type_unpivot(spark, sf_dir).collect()
    }
    assert melted == direct


def test_hopping_window_parity(spark, sf_dir, ddb):
    assert_same(ea.events_hopping_window(spark, sf_dir), ddb, ea.HOPPING_ORACLE)


def test_hopping_windows_cover_each_event_four_times(spark, sf_dir):
    """Every purchase lands in exactly 4 hopping windows (1h / 15min), so
    Σ n_events = 4 × purchase count."""
    from pyspark.sql import functions as F

    total = sum(r.n_events for r in ea.events_hopping_window(spark, sf_dir).collect())
    n_purch = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert total == 4 * n_purch


# -- next-event training sequences ---------------------------------------------


def test_event_sequences_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import events_analytics as ea
    from conftest import assert_same

    assert_same(
        ea.event_training_sequences(spark, sf_dir),
        ddb,
        ea.EVENT_SEQUENCES_ORACLE,
    )


def test_event_sequences_tile_the_stream(spark, sf_dir):
    """Per user: examples == max(0, n_events - SEQ_LEN); each context is
    a contiguous slice of the user's time-ordered stream with the label
    as its successor."""
    from pyspark.sql import functions as F

    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import events_analytics as ea

    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        streams.setdefault(r.user_id, []).append((r.event_id, r.event_type))
    got = {}
    for r in ea.event_training_sequences(spark, sf_dir).collect():
        got.setdefault(r.user_id, []).append(r)
    L = ea.SEQ_LEN
    for uid, stream in streams.items():
        rows = got.get(uid, [])
        assert len(rows) == max(0, len(stream) - L)
        by_anchor = {e[0]: i for i, e in enumerate(stream)}
        for r in rows:
            i = by_anchor[r.anchor_id]
            assert r.context == " ".join(e[1] for e in stream[i : i + L])
            assert r.label == stream[i + L][1]


def test_events_daily_trend_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import analytics as an
    from conftest import assert_same

    assert_same(
        an.events_daily_trend(spark, sf_dir), ddb, an.DAILY_TREND_ORACLE
    )


def test_events_daily_trend_matches_numpy(spark, sf_dir):
    """The decimal-summed sufficient statistics give the same line as a
    straight numpy polyfit over the same daily means (to fit tolerance)."""
    import numpy as np

    from data_catalog_spark.operators import analytics as an

    rows = an.events_daily_trend(spark, sf_dir).collect()
    assert rows
    from pyspark.sql import functions as F
    from data_catalog_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
            .cast("bigint")
            .alias("day"),
        )
        .agg((F.sum("value") / F.count(F.lit(1))).alias("y"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.y))
    for r in rows:
        pts = sorted(series[r.event_type])
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(r.slope_per_day - slope) < 1e-4
        assert abs(r.intercept - intercept) < max(1e-3, abs(intercept) * 1e-3)
        assert 0.0 <= r.r2 <= 1.0
        assert r.n_days == len(pts)


def test_events_changepoint_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import analytics as an
    from conftest import assert_same

    assert_same(
        an.events_changepoint(spark, sf_dir), ddb, an.CHANGEPOINT_ORACLE
    )


def test_events_changepoint_is_the_argmax_split(spark, sf_dir):
    """Brute-force every split of the collected daily series: the
    operator's split maximizes the |before-mean − after-mean| gap."""
    from pyspark.sql import functions as F

    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import analytics as an

    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg((F.sum("value") / F.count(F.lit(1))).alias("y"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.y))
    got = {r.event_type: r for r in an.events_changepoint(spark, sf_dir).collect()}
    for etype, pts in series.items():
        pts.sort()
        ys = [p[1] for p in pts]
        n = len(ys)
        best_gap = max(
            abs(sum(ys[t:]) / (n - t) - sum(ys[:t]) / t) for t in range(1, n)
        )
        r = got[etype]
        assert r.n_days == n
        assert abs(r.gap - best_gap) < 1e-4
        assert abs(abs(r.mean_after - r.mean_before) - r.gap) < 2e-6


def test_events_trend_anomalies_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import analytics as an
    from conftest import assert_same

    assert_same(
        an.events_trend_anomalies(spark, sf_dir), ddb, an.TREND_ANOMALY_ORACLE
    )


def test_events_trend_anomalies_semantics(spark, sf_dir):
    """Every flagged day really exceeds the threshold; residual is the
    observed-minus-fitted gap; non-trivial result at this SF."""
    from data_catalog_spark.operators import analytics as an

    rows = an.events_trend_anomalies(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.residual) > an.ANOMALY_SIGMAS * r.sigma - 1e-6
        assert abs((r.daily_mean - r.fitted) - r.residual) < 2e-6
        assert r.sigma > 0
