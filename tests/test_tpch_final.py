"""Final TPC-H batch (q9/q11/q16/q20/q21): oracle parity + plan-shape
assertions pinning the scale design (broadcast dims, aggregate-first,
profile-collapse of the q21 self-joins)."""

from __future__ import annotations

import pytest

from data_catalog_spark.operators import tpch_final as tf

from conftest import assert_same

PARITY = [
    ("q9_product_profit", tf.Q9_ORACLE),
    ("q11_important_part_share", tf.Q11_ORACLE),
    ("q16_supplier_part_diversity", tf.Q16_ORACLE),
    ("q20_dominant_part_suppliers", tf.Q20_ORACLE),
    ("q21_waiting_suppliers", tf.Q21_ORACLE),
]


@pytest.mark.parametrize("name,oracle", PARITY, ids=[n for n, _ in PARITY])
def test_parity(spark, sf_dir, ddb, name, oracle):
    assert_same(getattr(tf, name)(spark, sf_dir), ddb, oracle)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q9_broadcasts_all_dims(spark, sf_dir):
    """part/supplier/nation must be broadcast — the only SortMerge/shuffled
    join allowed is lineitem⋈orders on the orderkey."""
    plan = _plan(tf.q9_product_profit(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q11_reuses_per_part_exchange(spark, sf_dir):
    """The global total derives from the per-part aggregate: at runtime the
    per-part shuffle exchange (scan + partial agg below it) is computed once
    and REUSED by the total side — visible only in the final adaptive plan."""
    df = tf.q11_important_part_share(spark, sf_dir)
    df.collect()
    assert "ReusedExchange" in _plan(df)


def test_q16_exclusion_is_left_anti(spark, sf_dir):
    assert "LeftAnti" in _plan(tf.q16_supplier_part_diversity(spark, sf_dir))


def test_q20_semi_join_and_single_scan(spark, sf_dir):
    plan = _plan(tf.q20_dominant_part_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan
    # correlated per-part total via window over the pair agg, not a rescan
    assert plan.count("lineitem.parquet") == 1


def test_q21_no_self_join_of_fact(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair collapses into the per-order profile:
    lineitem appears at most twice (lines + late reuse one subtree pre-AQE)
    and there is no cartesian/nested-loop join anywhere."""
    plan = _plan(tf.q21_waiting_suppliers(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("lineitem.parquet") <= 2
