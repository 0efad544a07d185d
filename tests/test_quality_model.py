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
