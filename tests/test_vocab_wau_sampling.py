"""Vocabulary coverage, weighted sampling, rolling WAU: oracle parity +
semantic invariants."""

from __future__ import annotations

import pytest

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import sampling as sp
from data_catalog_spark.operators import tfidf as tf
from data_catalog_spark.operators import windows as w

from conftest import assert_same

PARITY = [
    (tf.vocab_coverage, tf._vocab_oracle()),
    (sp.weighted_sample_documents, sp.WEIGHTED_ORACLE),
    (w.events_rolling_wau, w.ROLLING_WAU_ORACLE),
]


@pytest.mark.parametrize("fn,oracle", PARITY, ids=[f.__name__ for f, _ in PARITY])
def test_parity(spark, sf_dir, ddb, fn, oracle):
    assert_same(fn(spark, sf_dir), ddb, oracle)


def test_vocab_has_oov_mass(spark, sf_dir):
    """VOCAB_SIZE is tuned below the corpus vocabulary so the OOV math is
    actually exercised; rates stay in (0, 1)."""
    rows = tf.vocab_coverage(spark, sf_dir).collect()
    assert rows and any(r.n_oov > 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_oov < r.n_subwords
        assert 0.0 <= r.oov_rate < 1.0


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """Inclusion probability ∝ n_chars ⇒ the sample's mean length exceeds
    the corpus mean (a property check, not a distribution test — the sample
    is deterministic)."""
    sample = sp.weighted_sample_documents(spark, sf_dir).collect()
    assert len(sample) == sp.WEIGHTED_K
    corpus = read_table(spark, sf_dir, "documents").where("n_chars > 0")
    corpus_mean = corpus.agg({"n_chars": "avg"}).first()[0]
    sample_mean = sum(r.n_chars for r in sample) / len(sample)
    assert sample_mean > corpus_mean


def test_weighted_sample_keys_sorted_unique_docs(spark, sf_dir):
    sample = sp.weighted_sample_documents(spark, sf_dir).collect()
    keys = [r.res_key for r in sample]
    assert keys == sorted(keys)
    assert len({r.doc_id for r in sample}) == len(sample)


def test_wau_bounds(spark, sf_dir):
    """WAU is sandwiched between any single day's DAU and total distinct
    users, and a trailing window can only see more than one day once the
    window has warmed up."""
    ev = read_table(spark, sf_dir, "events")
    total_users = ev.select("user_id").distinct().count()
    wau = {r.day: r.wau for r in w.events_rolling_wau(spark, sf_dir).collect()}
    dau = {
        r.day: r.n
        for r in ev.selectExpr("date_format(ts, 'yyyy-MM-dd') AS day", "user_id")
        .distinct()
        .groupBy("day")
        .agg({"*": "count"})
        .withColumnRenamed("count(1)", "n")
        .collect()
    }
    assert set(dau) <= set(wau)
    for day, n in dau.items():
        assert n <= wau[day] <= total_users
