"""Dataset profiling operator."""

from __future__ import annotations

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import profiling

from conftest import assert_same


def test_profile_parity(spark, sf_dir, ddb):
    assert_same(
        profiling.profile_lineitem(spark, sf_dir), ddb, profiling._profile_oracle()
    )


def test_profile_one_row_per_column_and_sane_stats(spark, sf_dir):
    rows = {r.column: r for r in profiling.profile_lineitem(spark, sf_dir).collect()}
    assert set(rows) == set(profiling.PROFILE_COLUMNS)
    n = read_table(spark, sf_dir, "lineitem").count()
    for r in rows.values():
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n
        assert r.min_value <= r.max_value


def test_profile_is_single_scan(spark, sf_dir):
    """The whole profile must read the table once — no per-column scans."""
    plan = (
        profiling.profile_lineitem(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1


def test_corr_profile_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import profiling

    assert_same(profiling.lineitem_corr_profile(spark, sf_dir), ddb, profiling.CORR_ORACLE)


def test_corr_profile_bounds(spark, sf_dir):
    from data_catalog_spark.operators import profiling

    rows = profiling.lineitem_corr_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.corr_qty_price <= 1.0
        # correlation and covariance must agree in sign
        assert (r.corr_qty_price >= 0) == (r.covar_qty_price >= 0)
