"""DSIR importance-resampling selection (operators/dsir.py): oracle
parity, model-direction sanity, determinism, and the scale-shape plan."""

from __future__ import annotations

from data_catalog_spark.operators import dsir

from conftest import assert_same


def test_dsir_parity(spark, sf_dir, ddb):
    assert_same(dsir.dsir_select_topk(spark, sf_dir), ddb, dsir.DSIR_ORACLE)


def test_dsir_target_lang_dominates_top(spark, sf_dir):
    """The whole point of the importance weight: documents from the target
    distribution (lang='en') must dominate the top of the ranking, and
    the top-of-list weight must exceed the bottom-of-list weight."""
    rows = dsir.dsir_select_topk(spark, sf_dir).collect()
    assert len(rows) == dsir.DSIR_TOP_N
    top50 = rows[:50]
    en_frac = sum(r.lang == dsir.DSIR_TARGET_LANG for r in top50) / len(top50)
    assert en_frac >= 0.8, f"target-lang fraction in top-50 only {en_frac}"
    assert rows[0].dsir_logweight > rows[-1].dsir_logweight
    # ranks are 1..N in order
    assert [r.rank for r in rows] == list(range(1, dsir.DSIR_TOP_N + 1))


def test_dsir_deterministic(spark, sf_dir):
    a = [tuple(r) for r in dsir.dsir_select_topk(spark, sf_dir).collect()]
    b = [tuple(r) for r in dsir.dsir_select_topk(spark, sf_dir).collect()]
    assert a == b


def test_dsir_plan_shape(spark, sf_dir):
    """Scale pins: the per-document scoring join against the ≤B-bucket
    ratio table is a BROADCAST join (no shuffle of the feature stream on
    bucket id), the top-N is a TakeOrderedAndProject (never a global
    single-partition sort of the scored corpus), and nothing compiles to
    a cartesian product."""
    plan = (
        dsir.dsir_select_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the broadcast of the 1-row
    # totals scalar (the audited broadcast-scalar shape)
    import re

    bnlj = re.findall(r"BroadcastNestedLoopJoin \S+, (\w+)", plan)
    assert all(k == "Cross" for k in bnlj) and len(bnlj) <= 1
