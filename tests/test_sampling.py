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


def test_cap_docs_per_source_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import sampling as sm

    assert_same(sm.cap_docs_per_source(spark, sf_dir), ddb, sm.SOURCE_CAP_ORACLE)


def test_cap_docs_per_source_semantics(spark, sf_dir):
    """No source exceeds the cap, the kept docs are each source's longest,
    and the cap actually removes something on this corpus."""
    from collections import Counter

    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators import sampling as sm

    rows = sm.cap_docs_per_source(spark, sf_dir).collect()
    total = read_table(spark, sf_dir, "documents").count()
    per_src = Counter(r.source for r in rows)
    assert max(per_src.values()) <= sm.SOURCE_CAP
    assert len(rows) < total  # the cap does real work
    # kept docs dominate dropped docs within each source (length proxy)
    docs = read_table(spark, sf_dir, "documents").collect()
    kept = {r.doc_id for r in rows}
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d)
    for src, ds in by_src.items():
        kept_lens = [d.n_chars for d in ds if d.doc_id in kept]
        drop_lens = [d.n_chars for d in ds if d.doc_id not in kept]
        if drop_lens:
            assert min(kept_lens) >= max(drop_lens) - 0  # ties broken by id
