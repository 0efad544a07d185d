"""Extended TPC-H-style operators: oracle parity + plan-shape assertions.

Parity pins semantics; the plan assertions pin the SCALE design — the
whole point of q4/q22/q19 is WHICH physical join they compile to."""

from __future__ import annotations

import pytest

from data_catalog_spark.operators import tpch_extra as tx

from conftest import assert_same

PARITY = [
    ("q2_top_supplier_per_nation", tx.Q2_ORACLE),
    ("q4_priority_with_returns", tx.Q4_ORACLE),
    ("q7_nation_trade_volume", tx.Q7_ORACLE),
    ("q8_market_share", tx.Q8_ORACLE),
    ("q10_returned_top_customers", tx.Q10_ORACLE),
    ("q12_priority_by_linestatus", tx.Q12_ORACLE),
    ("q13_order_count_distribution", tx.Q13_ORACLE),
    ("q14_promo_revenue_share", tx.Q14_ORACLE),
    ("q15_top_revenue_supplier", tx.Q15_ORACLE),
    ("q17_small_quantity_revenue", tx.Q17_ORACLE),
    ("q19_disjunctive_predicate_join", tx.Q19_ORACLE),
    ("q22_idle_rich_customers", tx.Q22_ORACLE),
]


@pytest.mark.parametrize("name,oracle", PARITY, ids=[n for n, _ in PARITY])
def test_parity(spark, sf_dir, ddb, name, oracle):
    assert_same(getattr(tx, name)(spark, sf_dir), ddb, oracle)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_compiles_to_left_semi(spark, sf_dir):
    assert "LeftSemi" in _plan(tx.q4_priority_with_returns(spark, sf_dir))


def test_q22_compiles_to_left_anti(spark, sf_dir):
    assert "LeftAnti" in _plan(tx.q22_idle_rich_customers(spark, sf_dir))


def test_q19_broadcasts_part_no_nested_loop_on_fact(spark, sf_dir):
    plan = _plan(tx.q19_disjunctive_predicate_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # equi-key drives the join
    # The OR-band must be a join residual/filter, not a cartesian product.
    assert "CartesianProduct" not in plan


def test_q10_topk_is_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in _plan(
        tx.q10_returned_top_customers(spark, sf_dir)
    )


def test_q13_zero_order_bucket_semantics(spark, sf_dir):
    """Every customer lands in exactly one bucket: buckets sum to the
    customer count (the LEFT OUTER + count(col) null-skip contract)."""
    from data_catalog_spark.io import read_table

    rows = tx.q13_order_count_distribution(spark, sf_dir).collect()
    n_cust = read_table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust
