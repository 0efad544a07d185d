"""Count-min sketch: one-sided error, ε-bound in practice, and heavy-hitter
recall against exact token counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_catalog_spark.operators import sketches as sk
from data_catalog_spark.operators.text import SPARK_TOKENS
from data_catalog_spark.io import read_table


def _exact_counts(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(SPARK_TOKENS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_cms_overestimates_never_under(spark, sf_dir):
    exact = {r.tok: r.n for r in _exact_counts(spark, sf_dir).collect()}
    est = {r.tok: r.est_count for r in sk.corpus_heavy_hitters_cms(spark, sf_dir).collect()}
    assert est, "some heavy hitters must exist"
    n_stream = sum(exact.values())
    for tok, e in est.items():
        assert e >= exact[tok]  # CMS never underestimates
        # practical ε check: error well under 1% of the stream at w=1024
        assert e - exact[tok] <= 0.01 * n_stream


def test_cms_recall_of_true_heavy_hitters(spark, sf_dir):
    """Every token whose TRUE frequency clears the threshold must be
    reported (one-sided error ⇒ no false negatives)."""
    exact = {r.tok: r.n for r in _exact_counts(spark, sf_dir).collect()}
    n_stream = sum(exact.values())
    thresh = int(n_stream * sk.HH_THRESHOLD_FRAC)
    truth = {t for t, n in exact.items() if n >= thresh}
    est = {r.tok for r in sk.corpus_heavy_hitters_cms(spark, sf_dir).collect()}
    assert truth <= est


def test_cms_state_is_bounded(spark, sf_dir):
    """The sketch has at most d×w rows no matter the vocabulary."""
    tokens = sk._token_stream(spark, sf_dir)
    assert sk.cms_build(tokens).count() <= sk.CMS_DEPTH * sk.CMS_WIDTH
