"""Bloom-filter decontamination (operators/bloom.py): oracle parity,
the no-false-negative guarantee, filter sizing, and the scale-shape plan."""

from __future__ import annotations

from data_catalog_spark.operators import bloom, traindata

from conftest import assert_same


def test_bloom_parity(spark, sf_dir, ddb):
    assert_same(
        bloom.docs_decontaminate_bloom(spark, sf_dir), ddb, bloom._bloom_oracle()
    )


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every exact contamination hit MUST be a bloom hit (the defining
    Bloom-filter guarantee), and the false-positive count is the exact
    difference — per document."""
    rows = {r.doc_id: r for r in bloom.docs_decontaminate_bloom(spark, sf_dir).collect()}
    exact = {
        r.doc_id: r.n_hits
        for r in traindata.docs_decontaminate(spark, sf_dir).collect()
    }
    # every exactly-contaminated doc appears with at least that many bloom hits
    for doc_id, n_exact in exact.items():
        assert doc_id in rows, f"doc {doc_id} exactly contaminated but bloom-missed"
        assert rows[doc_id].n_bloom_hits >= n_exact
        assert rows[doc_id].n_exact_hits == n_exact
    for r in rows.values():
        assert r.n_false_pos == r.n_bloom_hits - r.n_exact_hits
        assert r.n_false_pos >= 0


def test_bloom_table_is_bounded(spark, sf_dir):
    """The built filter fits its declared envelope: ≤ M/32 word rows,
    every mask within the 32-bit word."""
    from pyspark.sql import functions as F

    tok = (
        traindata._docs(spark, sf_dir)
        .withColumn("t", F.split("text", " "))
        .where(F.size("t") >= traindata.NGRAM)
    )
    bench_grams = (
        traindata._grams(tok.where(F.col("doc_id") % 50 == 0))
        .select("gram")
        .distinct()
    )
    bloom_tbl = (
        bloom._word_mask(
            bench_grams.select(
                F.explode(F.expr(bloom._spark_positions("gram"))).alias("p")
            )
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bf"))
        .collect()
    )
    assert 0 < len(bloom_tbl) <= bloom.BLOOM_M_BITS // bloom.BLOOM_WORD_BITS
    for r in bloom_tbl:
        assert 0 <= r.word < bloom.BLOOM_M_BITS // bloom.BLOOM_WORD_BITS
        assert 0 < r.bf < (1 << bloom.BLOOM_WORD_BITS)


def test_bloom_plan_shape(spark, sf_dir):
    """Scale pins: the probe side joins the bloom table via BROADCAST
    (the corpus gram stream never shuffles on the word key) and nothing
    compiles to a cartesian product."""
    plan = bloom.docs_decontaminate_bloom(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_repeated_gram_is_not_a_false_negative(spark, tmp_path):
    """Regression: a benchmark gram occurring MORE THAN ONCE in a corpus
    doc must still be a bloom member (probing per occurrence made a
    twice-repeated gram count 2K probe rows != K and vanish)."""
    import pandas as pd

    gram = "a b c d e f g h"  # exactly NGRAM tokens -> one benchmark gram
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            # doc 0 (doc_id % 50 == 0) is the benchmark; doc 1 repeats
            # the benchmark gram twice
            "text": [gram, gram + " " + gram],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [len(gram), 2 * len(gram) + 1],
        }
    )
    docs.to_parquet(str(tmp_path / "documents.parquet"), index=False)
    rows = {
        r.doc_id: r
        for r in bloom.docs_decontaminate_bloom(spark, str(tmp_path)).collect()
    }
    assert 1 in rows, "contaminated doc bloom-missed"
    assert rows[1].n_exact_hits >= 1
    assert rows[1].n_bloom_hits >= rows[1].n_exact_hits
    assert rows[1].n_false_pos >= 0
