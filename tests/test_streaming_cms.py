"""Streaming CMS: additive micro-batch merge equals the batch-built sketch."""

from __future__ import annotations

from data_catalog_spark.operators import sketches
from data_catalog_spark.streaming import cms as scms


def test_stream_cms_equals_batch_cms(spark, sf_dir):
    streamed = {
        (r.tok, r.est_count)
        for r in scms.stream_cms_heavy_hitters(spark, sf_dir).collect()
    }
    batch = {
        (r.tok, r.est_count)
        for r in sketches.corpus_heavy_hitters_cms(spark, sf_dir).collect()
    }
    assert streamed == batch
    assert streamed, "heavy hitters must exist in the corpus"


def test_stream_cms_estimates_upper_bound_truth(spark, sf_dir):
    """CMS never underestimates: every reported token's estimate >= its
    exact count."""
    from pyspark.sql import functions as F
    from data_catalog_spark.io import read_table
    from data_catalog_spark.operators.text import SPARK_TOKENS

    exact = {
        r.tok: r.n
        for r in read_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr(SPARK_TOKENS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in scms.stream_cms_heavy_hitters(spark, sf_dir).collect():
        assert r.est_count >= exact[r.tok]


def test_recover_target_heals_crash_window(spark, tmp_path):
    """If a crash strands the live dir as .old, the next merge restores it
    instead of silently restarting from empty state."""
    import os
    from data_catalog_spark.streaming.sink import recover_target

    target = str(tmp_path / "table")
    spark.range(3).write.parquet(target)
    os.rename(target, target + ".old")  # simulate crash between renames
    recover_target(target)
    assert spark.read.parquet(target).count() == 3
    assert not os.path.exists(target + ".old")
