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


def test_quality_report_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import profiling as pf

    assert_same(pf.orders_quality_report(spark, sf_dir), ddb, pf._quality_oracle())


def test_quality_report_clean_corpus(spark, sf_dir):
    """The synthetic tables are clean: every expectation passes — which is
    itself the assertion that the rules compile and count correctly."""
    from data_catalog_spark.operators import profiling as pf

    rows = pf.orders_quality_report(spark, sf_dir).collect()
    assert len(rows) == len(pf.ORDER_EXPECTATIONS) + 1  # + FK rule
    for r in rows:
        assert r.n_violations == 0 and bool(r["pass"]) is True


def test_quality_report_counts_planted_violations(spark, sf_dir):
    """Plant dirty rows through the same rule set (rules are data, so the
    suite must count violations, not just pass clean data)."""
    from pyspark.sql import functions as F

    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import profiling as pf

    o = read_table(spark, sf_dir, "orders")
    dirty = o.limit(3).withColumn("o_totalprice", F.lit(-1.0)).unionByName(o)
    rule_aggs = [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias(name)
        for name, pred in pf.ORDER_EXPECTATIONS
    ]
    row = dirty.agg(*rule_aggs).first()
    assert row["totalprice_positive"] == 3
    assert row["orderdate_not_null"] == 0


def test_source_dup_rates_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import profiling as P

    assert_same(P.source_dup_rates(spark, sf_dir), ddb, P._source_dup_oracle())


def test_source_dup_rates_invariants(spark, sf_dir):
    from data_catalog_spark.operators import profiling as P

    rows = P.source_dup_rates(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_docs <= r.n_docs
        assert r.distinct_fps <= r.n_docs
        assert abs(r.dup_rate - r.dup_docs / r.n_docs) < 1e-6


def test_docs_length_histogram_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import profiling as P

    assert_same(P.docs_length_histogram(spark, sf_dir), ddb, P.DOCS_LENGTH_HIST_ORACLE)


def test_docs_length_histogram_covers_corpus(spark, sf_dir):
    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import profiling as P

    rows = P.docs_length_histogram(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.where("n_chars > 0").count()
    for r in rows:
        assert r.hi_chars == 2 * r.lo_chars  # power-of-two buckets
