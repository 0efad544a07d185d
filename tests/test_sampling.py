"""Deterministic hash sampling."""

from __future__ import annotations

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import sampling

from conftest import assert_same


def test_flat_sample_parity(spark, sf_dir, ddb):
    assert_same(sampling.sample_documents_hash(spark, sf_dir), ddb, sampling.SAMPLE_ORACLE)


def test_stratified_sample_parity(spark, sf_dir, ddb):
    assert_same(
        sampling.stratified_sample_documents(spark, sf_dir),
        ddb,
        sampling.STRATIFIED_ORACLE,
    )


def test_sample_is_stable_and_subset(spark, sf_dir):
    """Same rows on every run (hash, not RNG) and a genuine subset near
    the nominal rate."""
    a = {r.doc_id for r in sampling.sample_documents_hash(spark, sf_dir).collect()}
    b = {r.doc_id for r in sampling.sample_documents_hash(spark, sf_dir).collect()}
    assert a == b
    n = read_table(spark, sf_dir, "documents").count()
    assert 0 < len(a) < n
    assert abs(len(a) / n - sampling.SAMPLE_PCT / 100) < 0.08


def test_stratified_rates_respected(spark, sf_dir):
    """The downsampled stratum ('en' at 5%) must sample at a lower rate
    than the 20% strata."""
    docs = read_table(spark, sf_dir, "documents")
    totals = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    sampled: dict[str, int] = {}
    for r in sampling.stratified_sample_documents(spark, sf_dir).collect():
        sampled[r.lang] = sampled.get(r.lang, 0) + 1
    rate_en = sampled.get("en", 0) / totals["en"]
    others = [sampled.get(l, 0) / totals[l] for l in ("de", "es", "fr") if l in totals]
    assert others and rate_en < min(others)
