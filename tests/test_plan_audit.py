"""Physical-plan lint (scripts/audit_plans.py): unit pins for each
anti-pattern detector plus the registry-wide sweep the r8 verdict asked
for — a green value hash must not hide a plan that funnels a full table
through one task (the ppl_bucket_profile ntile regression class)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from audit_plans import ALLOWED, audit_plan, audit_registry  # noqa: E402


def _cats(df):
    return {c for c, _ in audit_plan(df._jdf.queryExecution().executedPlan())}


@pytest.fixture(scope="module")
def base(spark):
    return spark.range(1000).withColumn("g", F.col("id") % 3)


def test_unpartitioned_window_is_flagged(base):
    bad = base.withColumn("r", F.ntile(3).over(Window.orderBy("id")))
    assert "global-window" in _cats(bad)


def test_partitioned_window_is_clean(base):
    good = base.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert _cats(good) == set()


def test_window_over_limited_input_is_clean(base):
    lim = base.orderBy("id").limit(5).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    assert _cats(lim) == set()


def test_global_aggregate_is_clean(base):
    assert _cats(base.agg(F.sum("id").alias("s"))) == set()


def test_repartition_to_one_is_flagged(base):
    bad = base.repartition(1).withColumn("x", F.col("id") + 1)
    assert "single-partition-shuffle" in _cats(bad)


def test_coalesce_to_one_is_flagged(base):
    bad = base.coalesce(1).withColumn("x", F.col("id") + 1)
    assert "coalesce-1" in _cats(bad)


def test_cartesian_is_flagged(base, spark):
    other = spark.range(10).select(F.col("id").alias("j"))
    assert "cartesian" in _cats(base.crossJoin(other))


def test_registry_has_no_unadjudicated_plan_hits(spark, sf_dir):
    """Every registered query's plan is free of the four anti-patterns,
    or carries an explicit adjudication in audit_plans.ALLOWED — and no
    allowlist row is stale (the plan it excuses no longer exists)."""
    import __spark_entry__ as e

    hits, errors = audit_registry(spark, sf_dir, e.queries())
    assert not errors, f"queries failed to plan: {errors}"
    unadjudicated = {
        name: {c: d for c, d in cats.items() if c not in ALLOWED.get(name, {})}
        for name, cats in hits.items()
    }
    unadjudicated = {n: c for n, c in unadjudicated.items() if c}
    assert not unadjudicated, f"unadjudicated plan anti-patterns: {unadjudicated}"
    stale = [
        (name, cat)
        for name, cats in ALLOWED.items()
        for cat in cats
        if cat not in hits.get(name, {})
    ]
    assert not stale, f"stale ALLOWED rows (plans no longer hit): {stale}"
