"""Canonical-URL dedup (operators/urls.py)."""

from __future__ import annotations

import pytest


def test_canonical_url_oracle_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import urls

    assert_same(
        urls.dedup_canonical_url(spark, sf_dir), ddb, urls.CANONICAL_URL_ORACLE
    )


def test_url_savings_oracle_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import urls

    assert_same(urls.url_dedup_savings(spark, sf_dir), ddb, urls.URL_SAVINGS_ORACLE)


@pytest.mark.parametrize(
    ("raw", "canonical"),
    [
        # host + scheme case-folded, fragment dropped
        ("HTTP://WWW.Site1.COM/p/3#sec", "http://www.site1.com/p/3"),
        # default ports stripped, non-default kept
        ("http://h.com:80/x", "http://h.com/x"),
        ("https://h.com:443/x", "https://h.com/x"),
        ("http://h.com:8080/x", "http://h.com:8080/x"),
        ("https://h.com:80/x", "https://h.com:80/x"),  # 80 is NOT https default
        # tracking params dropped, the rest sorted; '?' vanishes when empty
        ("http://h.com/x?b=2&a=1", "http://h.com/x?a=1&b=2"),
        ("http://h.com/x?utm_source=n&a=1", "http://h.com/x?a=1"),
        ("http://h.com/x?utm_campaign=c", "http://h.com/x"),
        ("http://h.com/x?gclid=1&fbclid=2", "http://h.com/x"),
        # trailing slashes stripped; bare root stays '/'
        ("http://h.com/x/", "http://h.com/x"),
        ("http://h.com/x///", "http://h.com/x"),
        ("http://h.com/", "http://h.com/"),
        ("http://h.com/?a=1#f", "http://h.com/?a=1"),
    ],
)
def test_canonicalization_rules(spark, raw, canonical):
    """Each normalization rule pinned one URL at a time through the SAME
    canonicalization SQL the registered queries use."""
    from data_catalog_spark.operators import urls

    spark.createDataFrame([(0, raw)], "doc_id long, url string").createOrReplaceTempView(
        "raw_urls"
    )
    got = spark.sql(
        f"SELECT canonical_url FROM ({urls.SPARK_CANON_SQL})"
    ).first()[0]
    assert got == canonical, f"{raw!r} -> {got!r}, want {canonical!r}"


def test_clusters_actually_collapse(spark, sf_dir):
    """The planted corpus must exercise the collapse: at every SF there is
    at least one cluster with >1 URL, and keeper is its min doc_id."""
    from pyspark.sql import functions as F

    from data_catalog_spark.operators import urls

    top = urls.dedup_canonical_url(spark, sf_dir)
    head = top.first()
    assert head["n_urls"] > 1
    # savings identity: sum over buckets of (n_urls - n_clusters) tallies
    sav = urls.url_dedup_savings(spark, sf_dir).agg(
        F.sum("n_skipped_fetches").alias("sk"),
        F.sum("n_urls").alias("u"),
        F.sum("n_clusters").alias("c"),
    ).first()
    assert sav["sk"] == sav["u"] - sav["c"] > 0
