"""Bucketed-layout co-located join — the zero-shuffle fact⋈fact design.

ARCHITECTURE.md claims lineitem⋈orders "becomes a zero-shuffle sort-merge
join with bucketed tables"; this pins that claim: both facts written
bucketed+sorted by the join key, the join plan must contain NO Exchange,
and results must equal the plain (shuffling) join.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from data_catalog_spark.io import read_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    li_t, ord_t = f"li_b_{suffix}", f"ord_b_{suffix}"
    (
        read_table(spark, sf_dir, "lineitem")
        .write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(li_t)
    )
    (
        read_table(spark, sf_dir, "orders")
        .write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ord_t)
    )
    yield li_t, ord_t
    spark.sql(f"DROP TABLE IF EXISTS {li_t}")
    spark.sql(f"DROP TABLE IF EXISTS {ord_t}")


def _joined(spark, li_t, ord_t):
    li = spark.table(li_t)
    orders = spark.table(ord_t)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li_t, ord_t = bucketed
    # disable broadcast so the bucketed sort-merge path is what's planned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            _joined(spark, li_t, ord_t)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join_part = plan.split("HashAggregate")[-1]  # below the agg: the join
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, f"bucketed join must not shuffle:\n{join_part}"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    li_t, ord_t = bucketed
    got = {(r.o_orderpriority, r.n) for r in _joined(spark, li_t, ord_t).collect()}
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    want = {
        (r.o_orderpriority, r.n)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
