"""Join operators: as-of semantics, rollup, distinct, anti join."""

from __future__ import annotations

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import joins

from conftest import assert_same


def test_asof_parity_vs_native_duckdb_asof(spark, sf_dir, ddb):
    assert_same(joins.purchases_with_last_click(spark, sf_dir), ddb, joins.ASOF_ORACLE)


def test_asof_semantics(spark, sf_dir):
    rows = joins.purchases_with_last_click(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    n_purchases = ev.where("event_type = 'purchase'").count()
    assert len(rows) == n_purchases  # left semantics: every purchase kept
    matched = [r for r in rows if r.click_id is not None]
    assert matched, "some purchases must have a preceding click"
    assert all(r.gap_sec >= 0 for r in matched)  # click at-or-before purchase


def test_asof_picks_latest_click(spark, sf_dir):
    """Spot-check one purchase: its matched click is the max-ts click <= it."""
    ev = {r.event_id: r for r in read_table(spark, sf_dir, "events").collect()}
    rows = [r for r in joins.purchases_with_last_click(spark, sf_dir).collect() if r.click_id]
    r = rows[len(rows) // 2]
    p = ev[r.purchase_id]
    best = max(
        (e for e in ev.values()
         if e.event_type == "click" and e.user_id == r.user_id and e.ts <= p.ts),
        key=lambda e: e.ts,
    )
    assert r.click_id == best.event_id


def test_rollup_parity(spark, sf_dir, ddb):
    assert_same(joins.q_rollup_lineitem(spark, sf_dir), ddb, joins.ROLLUP_ORACLE)


def test_rollup_grand_total(spark, sf_dir):
    rows = {(r.returnflag, r.linestatus): r.n for r in joins.q_rollup_lineitem(spark, sf_dir).collect()}
    li_count = read_table(spark, sf_dir, "lineitem").count()
    assert rows[("ALL", "ALL")] == li_count
    leaf_sum = sum(n for (rf, ls), n in rows.items() if rf != "ALL" and ls != "ALL")
    assert leaf_sum == li_count


def test_distinct_parity(spark, sf_dir, ddb):
    assert_same(joins.q_distinct_parts_per_flag(spark, sf_dir), ddb, joins.DISTINCT_ORACLE)


def test_anti_join_parity(spark, sf_dir, ddb):
    assert_same(joins.customers_without_urgent_orders(spark, sf_dir), ddb, joins.ANTI_ORACLE)


def test_anti_join_nonempty_and_correct(spark, sf_dir):
    rows = joins.customers_without_urgent_orders(spark, sf_dir).collect()
    assert rows, "fixture must have customers without urgent orders"
    urgent_cust = {
        r.o_custkey
        for r in read_table(spark, sf_dir, "orders").where("o_orderpriority = '1-URGENT'").collect()
    }
    assert all(r.c_custkey not in urgent_cust for r in rows)


def test_range_band_join_parity(spark, sf_dir, ddb):
    assert_same(
        joins.range_band_join_quantity(spark, sf_dir), ddb, joins.RANGE_BAND_ORACLE
    )


def test_range_bands_partition_all_rows(spark, sf_dir):
    """Bands are disjoint and covering: band counts sum to the table count."""
    rows = joins.range_band_join_quantity(spark, sf_dir).collect()
    total = read_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_lines for r in rows) == total


def test_cube_parity(spark, sf_dir, ddb):
    assert_same(joins.q_cube_lineitem(spark, sf_dir), ddb, joins.CUBE_ORACLE)


def test_cube_grand_total_and_margins(spark, sf_dir):
    rows = {(r.returnflag, r.linestatus): r.n for r in joins.q_cube_lineitem(spark, sf_dir).collect()}
    total = read_table(spark, sf_dir, "lineitem").count()
    assert rows[("ALL", "ALL")] == total
    # both one-dimensional margins must each sum to the grand total
    assert sum(n for (rf, ls), n in rows.items() if rf == "ALL" and ls != "ALL") == total
    assert sum(n for (rf, ls), n in rows.items() if rf != "ALL" and ls == "ALL") == total


def test_grouping_sets_parity(spark, sf_dir, ddb):
    assert_same(
        joins.q_grouping_sets_lineitem(spark, sf_dir), ddb, joins.GROUPING_SETS_ORACLE
    )


def test_grouping_sets_shape(spark, sf_dir):
    """Three sets: (flag,status) has year=ALL; (flag) has status=year=ALL;
    (year) has flag=status=ALL.  gid disambiguates NULL-slot vs data-NULL."""
    rows = joins.q_grouping_sets_lineitem(spark, sf_dir).collect()
    gids = {r.gid for r in rows}
    assert gids == {1, 3, 6}  # bitmask: year-only grouped, flag+status, flag
    for r in rows:
        if r.gid == 1:
            assert r.ship_year == "ALL" and r.returnflag != "ALL"
        elif r.gid == 3:
            assert r.linestatus == "ALL" and r.ship_year == "ALL"
        elif r.gid == 6:
            assert r.returnflag == "ALL" and r.linestatus == "ALL"
