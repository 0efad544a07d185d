"""Salted aggregation + streaming dedup: parity and physical/semantic
properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_catalog_spark.io import read_table
from data_catalog_spark.operators import skew
from data_catalog_spark.streaming import dedup as sd

from conftest import assert_same


def test_salted_agg_parity(spark, sf_dir, ddb):
    assert_same(skew.salted_returnflag_stats(spark, sf_dir), ddb, skew.SALTED_ORACLE)


def test_salted_agg_two_shuffles(spark, sf_dir):
    """The salted form must actually shuffle twice: once on (key, salt),
    once on key — that's the mechanism being pinned."""
    plan = (
        skew.salted_returnflag_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") >= 2


def test_stream_dedup_removes_replay_exactly(spark, sf_dir):
    """2× replayed input → exactly the original row set (by event_id)."""
    out = sd.run_dedup_replay_available_now(spark, sf_dir, "t_dedup_replay")
    n = read_table(spark, sf_dir, "events").count()
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_stream_dedup_stats_parity(spark, sf_dir, ddb):
    assert_same(
        sd.stream_dedup_type_stats(spark, sf_dir), ddb, sd.STREAM_DEDUP_ORACLE
    )


def test_salted_join_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import skew
    from conftest import assert_same

    assert_same(
        skew.salted_join_priority_stats(spark, sf_dir), ddb, skew.SALTED_JOIN_ORACLE
    )


def test_salted_join_key_is_composite(spark, sf_dir):
    """The physical join key must include the salt (no reducer owns a whole
    priority) — visible as the dim-side explode of SALT_BUCKETS rows."""
    from data_catalog_spark.operators import skew

    df = skew.salted_join_priority_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan


def test_scd2_history_invariants(spark, sf_dir, ddb):
    from data_catalog_spark.operators import scd2
    from conftest import assert_same

    assert_same(scd2.scd2_dataset_formats(spark, sf_dir), ddb, scd2.SCD2_ORACLE)
    rows = scd2.scd2_dataset_formats(spark, sf_dir).collect()
    by_id: dict[str, list] = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    for rid, versions in by_id.items():
        current = [v for v in versions if v.is_current]
        assert len(current) == 1  # exactly one open version per key
        assert current[0].valid_to is None
        closed = [v for v in versions if not v.is_current]
        for c in closed:
            assert c.valid_to == scd2.CHANGE_TS  # every closed row is bounded


def test_stream_embedding_dedup_matches_batch_arm(spark, sf_dir):
    """Batching-invariance: the two-micro-batch streamed probe must land
    exactly the batch incremental arm's matches."""
    from data_catalog_spark.operators.similarity import (
        dedup_embedding_incremental,
    )
    from data_catalog_spark.streaming.dedup import stream_embedding_dedup

    got = [tuple(r) for r in stream_embedding_dedup(spark, sf_dir).collect()]
    want = [
        tuple(r) for r in dedup_embedding_incremental(spark, sf_dir).collect()
    ]
    assert got == want and got


def test_stream_ann_pq_serve_matches_batch_topk(spark, sf_dir):
    """Serving-invariance: query top-k answered per micro-batch from the
    PERSISTED code table must equal the one-shot batch top-k bit-for-bit
    (per-query work is batching-independent by construction)."""
    from data_catalog_spark.operators.similarity import ann_pq_topk
    from data_catalog_spark.streaming.ann import stream_ann_pq_serve

    got = [tuple(r) for r in stream_ann_pq_serve(spark, sf_dir).collect()]
    want = [tuple(r) for r in ann_pq_topk(spark, sf_dir).collect()]
    assert got == want and got


def test_stream_cluster_maintenance_matches_batch_merge(spark, sf_dir):
    """Batching-invariance for cluster state: merging the incoming slice
    in two micro-batches (star edges re-contracted after each) lands
    exactly the one-shot incremental merge — cross-batch pairs appear
    when their LATER endpoint arrives and probes the accumulated table."""
    from data_catalog_spark.operators.corpus import dedup_clusters_incremental
    from data_catalog_spark.streaming.clusters import stream_cluster_maintenance

    got = [
        tuple(r) for r in stream_cluster_maintenance(spark, sf_dir).collect()
    ]
    want = [
        tuple(r) for r in dedup_clusters_incremental(spark, sf_dir).collect()
    ]
    assert got == want and got
