"""Frozen-weights quality classifier (FineWeb-Edu/DCLM-style scoring)."""

from __future__ import annotations

import math

from data_catalog_spark.operators import quality_model as qm

from conftest import assert_same


def test_quality_score_parity(spark, sf_dir, ddb):
    assert_same(
        qm.quality_classifier_score(spark, sf_dir),
        ddb,
        qm._quality_model_oracle(),
    )


def test_both_classes_populated_and_consistent(spark, sf_dir):
    rows = qm.quality_classifier_score(spark, sf_dir).collect()
    assert rows
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped, "frozen weights must split the corpus"
    for r in rows:
        assert r.keep == (r.logit >= 0)
        # prob is the 4dp sigmoid of the 6dp logit
        assert abs(r.prob - round(1.0 / (1.0 + math.exp(-r.logit)), 4)) <= 1e-9
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 < r.ttr <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0


def test_keep_best_parity(spark, sf_dir, ddb):
    assert_same(
        qm.dedup_keep_best(spark, sf_dir), ddb, qm._keep_best_oracle()
    )


def test_keep_best_is_cluster_argmax(spark, sf_dir):
    """The kept doc is a member of its cluster with the max logit
    (lowest doc_id on ties), and n_members matches the resolved clusters."""
    from collections import defaultdict

    from data_catalog_spark.operators.corpus import dup_clusters

    members = defaultdict(list)
    for r in dup_clusters(spark, sf_dir).collect():
        members[r.cluster_id].append(r.doc_id)
    logits = {
        r.doc_id: r.logit
        for r in qm.quality_classifier_score(spark, sf_dir).collect()
    }
    kept = qm.dedup_keep_best(spark, sf_dir).collect()
    assert set(r.cluster_id for r in kept) == set(members)
    for r in kept:
        docs = members[r.cluster_id]
        assert r.kept_doc_id in docs
        assert r.n_members == len(docs) and r.n_dropped == len(docs) - 1
        assert r.n_members >= 2  # clusters come from pairs
        best = min(docs, key=lambda d: (-logits[d], d))
        assert r.kept_doc_id == best and r.kept_logit == logits[best]


def test_scoring_is_map_only(spark, sf_dir):
    """The 100 TB contract: no Python eval and no hash-shuffle before the
    final sort — scoring runs at scan speed on every executor."""
    plan = (
        qm.quality_classifier_score(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "hashpartitioning" not in plan  # only the orderBy's range exchange


def test_stream_quality_profile_equals_batch(spark, sf_dir, ddb):
    """Streaming twin: scoring is stateless, so the availableNow stream
    profile matches the batch oracle bit-for-bit."""
    from data_catalog_spark.streaming.quality import (
        STREAM_QUALITY_ORACLE,
        stream_quality_profile,
    )

    assert_same(
        stream_quality_profile(spark, sf_dir), ddb, STREAM_QUALITY_ORACLE
    )


def test_stream_quality_profile_is_two_classes(spark, sf_dir):
    from data_catalog_spark.streaming.quality import stream_quality_profile

    rows = stream_quality_profile(spark, sf_dir).collect()
    assert [r.keep for r in rows] == [False, True]
    for r in rows:
        assert r.n_docs > 0 and 0.0 <= r.mean_prob <= 1.0


def test_stream_contamination_gate_equals_batch(spark, sf_dir, ddb):
    """Ingest-time gate twin: the eval grams ride as a literal into a
    stateless map, so the availableNow stream profile matches the batch
    oracle bit-for-bit."""
    from data_catalog_spark.streaming.quality import (
        _contamination_gate_oracle,
        stream_contamination_gate,
    )

    assert_same(
        stream_contamination_gate(spark, sf_dir),
        ddb,
        _contamination_gate_oracle(),
    )


def test_stream_contamination_gate_consistent_with_report(spark, sf_dir):
    """The gate's corpus-wide dirty-doc total equals the per-item
    report's distinct collision set size cannot be compared directly
    (a doc can hit several items), but both must agree that SOME docs
    collide and that every contaminated doc carries at least one eval
    gram verbatim."""
    from data_catalog_spark.operators.traindata import (
        benchmark_contamination_report,
    )
    from data_catalog_spark.streaming.quality import stream_contamination_gate

    gate = stream_contamination_gate(spark, sf_dir).collect()
    assert gate and all(0.0 <= r.contamination_rate <= 1.0 for r in gate)
    n_dirty_docs = sum(r.n_contaminated for r in gate)
    report = benchmark_contamination_report(spark, sf_dir).collect()
    n_docs_hit = max(r.n_docs_hit for r in report)
    # the report's per-item doc hits are a lower bound on the gate's
    # union count, and both sides must see contamination on this corpus
    assert n_dirty_docs >= n_docs_hit > 0
