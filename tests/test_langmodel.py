"""Corpus bigram LM perplexity scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_catalog_spark.operators import langmodel as lm
from data_catalog_spark.operators.text import SPARK_TOKENS

from conftest import assert_same


def test_bigram_lm_parity(spark, sf_dir, ddb):
    assert_same(
        lm.bigram_lm_perplexity(spark, sf_dir), ddb, lm.BIGRAM_LM_ORACLE
    )


def test_bigram_counts_complete(spark, sf_dir):
    """The LM is trained on the scored corpus itself, so every doc bigram is
    in the model: n_bigrams must equal n_tokens - 1 exactly (no rows lost
    in the model join)."""
    from data_catalog_spark.io import read_table

    got = {r.doc_id: r.n_bigrams for r in lm.bigram_lm_perplexity(spark, sf_dir).collect()}
    toks = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.expr(SPARK_TOKENS)).alias("n"))
        .collect()
    )
    for r in toks:
        if r.n >= 2:
            assert got[r.doc_id] == r.n - 1, r.doc_id
        else:
            assert r.doc_id not in got


def test_perplexity_positive_and_smoothed(spark, sf_dir):
    rows = lm.bigram_lm_perplexity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ppl > 1.0  # add-one smoothing ⇒ p < 1 for every bigram
        assert r.avg_logp < 0.0


# -- CCNet perplexity buckets -------------------------------------------------


def test_ppl_bucket_parity(spark, sf_dir, ddb):
    from conftest import assert_same

    assert_same(
        lm.ppl_bucket_profile(spark, sf_dir),
        ddb,
        lm.PPL_BUCKET_ORACLE,
    )


def test_ppl_buckets_partition_the_corpus_in_order(spark, sf_dir):
    """Terciles cover every scored doc once, boundaries sit at the ntile
    cut ranks up to ties-to-lower drift (equal-ppl docs never split across
    buckets), and the ppl ranges are disjoint ascending head<middle<tail."""
    rows = {r.bucket: r for r in lm.ppl_bucket_profile(spark, sf_dir).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    assert rows["head"].max_ppl <= rows["middle"].min_ppl
    assert rows["middle"].max_ppl <= rows["tail"].min_ppl
    ppls = sorted(
        r.ppl for r in lm.bigram_lm_perplexity(spark, sf_dir).collect()
    )
    n = len(ppls)
    q, r3 = divmod(n, 3)
    k1 = q + (1 if r3 >= 1 else 0)
    k2 = k1 + q + (1 if r3 >= 2 else 0)
    # |head| = #{ppl <= v_k1}, |head|+|middle| = #{ppl <= v_k2}: exact
    # tercile cuts with boundary ties pulled into the lower bucket
    assert rows["head"].n_docs == sum(1 for p in ppls if p <= ppls[k1 - 1])
    assert rows["head"].n_docs + rows["middle"].n_docs == sum(
        1 for p in ppls if p <= ppls[k2 - 1]
    )
    assert sum(rows[b].n_docs for b in rows) == n


def test_doremi_weights_parity(spark, sf_dir, ddb):
    from conftest import assert_same
    from data_catalog_spark.operators import langmodel as lm

    assert_same(lm.doremi_source_weights(spark, sf_dir), ddb, lm.DOREMI_ORACLE)


def test_doremi_weights_are_a_smoothed_distribution(spark, sf_dir):
    """Weights sum to 1 (within 6dp rounding), every weight carries at
    least the uniform-smoothing floor c/k, excess is non-negative and
    zero for at least one source only when no source is harder than the
    corpus average — and harder sources (higher excess NLL) never get a
    smaller weight than easier ones."""
    from data_catalog_spark.operators import langmodel as lm

    rows = lm.doremi_source_weights(spark, sf_dir).collect()
    assert rows
    k = len(rows)
    total = sum(r.doremi_weight for r in rows)
    assert abs(total - 1.0) < k * 1e-6
    floor = lm.DOREMI_SMOOTH / k
    for r in rows:
        assert r.excess_nll >= 0.0
        assert r.doremi_weight >= floor - 1e-9
        assert r.n_docs > 0 and r.n_bigrams >= r.n_docs
    by_excess = sorted(rows, key=lambda r: r.excess_nll)
    for a, b in zip(by_excess, by_excess[1:]):
        assert a.doremi_weight <= b.doremi_weight + 1e-9
