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


def test_hll_mergeable_error_bound(spark, sf_dir):
    """The raw sketch estimates (pre-contract view) stay within a 5%
    bound of exact, tighter than the 10% the hashed within_tol asserts."""
    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators.sketches import _users_hll_estimates
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    rows = _users_hll_estimates(spark, sf_dir).collect()
    got = {r.event_type: r.est for r in rows}
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])
    # the registered contract view carries the exact counts and all-true
    # tolerance flags (what the driver hash checks)
    from data_catalog_spark.operators.sketches import users_hll_mergeable

    for r in users_hll_mergeable(spark, sf_dir).collect():
        assert r.within_tol, r
        assert r.n_users == exact[r.event_type]


def test_hll_union_never_below_max_component(spark, sf_dir):
    """The union estimate must be >= every per-type estimate (set union
    can't shrink)."""
    from data_catalog_spark.operators.sketches import _users_hll_estimates

    rows = {
        r.event_type: r.est for r in _users_hll_estimates(spark, sf_dir).collect()
    }
    overall = rows.pop("ALL")
    assert overall >= max(rows.values()) - 1e-9
