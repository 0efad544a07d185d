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

from audit_plans import ALLOWED, adjudicate, audit_plan, audit_registry  # noqa: E402


def _hits(df):
    return audit_plan(df._jdf.queryExecution().executedPlan())


def _cats(df):
    return set(_hits(df))


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


def test_hit_counts_are_per_instance(base, spark):
    """Two separate cartesians in one plan must count as 2, not dedup to
    1 — the r9 ADVICE hole where an adjudicated query silently gained a
    second instance of its allowed category."""
    a = spark.range(3).select(F.col("id").alias("a"))
    b = spark.range(3).select(F.col("id").alias("b"))
    double = base.crossJoin(a).crossJoin(b)
    cnt, _detail = _hits(double)["cartesian"]
    assert cnt == 2


def test_adjudication_rejects_count_overrun():
    allowed_rows, bad_rows = adjudicate(
        {"ann_pq_topk": {"cartesian": (2, "CartesianProductExec")}}
    )
    assert not allowed_rows and len(bad_rows) == 1  # allowed max is 1


def test_repeated_scan_is_flagged(spark, sf_dir):
    """>4 scans of the same parquet relation in one plan is the r9
    web_corpus_funnel defect class; ≤4 (self-joins, totals legs) is fine."""
    import functools

    reads = [
        spark.read.parquet(f"{sf_dir}/region.parquet").select("r_regionkey")
        for _ in range(5)
    ]
    bad = functools.reduce(lambda x, y: x.unionAll(y), reads)
    assert "repeated-scan" in _cats(bad)
    ok = functools.reduce(lambda x, y: x.unionAll(y), reads[:4])
    assert "repeated-scan" not in _cats(ok)


def test_registry_has_no_unadjudicated_plan_hits(spark, sf_dir, registry_frames):
    """Every registered query's plan is free of the five anti-patterns,
    or carries an explicit adjudication (with an instance-count cap) in
    audit_plans.ALLOWED — and no allowlist row is stale (the plan it
    excuses no longer exists).  Consumes the shared once-per-suite
    registry_frames fixture (the schema guard reads the same frames), so
    eager entries construct once, not once per guard."""
    import __spark_entry__ as e

    frames, build_errors = registry_frames
    assert not build_errors, f"queries failed to construct: {build_errors}"
    assert set(frames) == set(e.queries())
    hits, errors = audit_registry(
        spark, sf_dir, {n: (lambda s, d, _df=df: _df) for n, df in frames.items()}
    )
    assert not errors, f"queries failed to plan: {errors}"
    _allowed, bad = adjudicate(hits)
    assert not bad, f"unadjudicated plan anti-patterns: {bad}"
    stale = [
        (name, cat)
        for name, cats in ALLOWED.items()
        for cat in cats
        if cat not in hits.get(name, {})
    ]
    assert not stale, f"stale ALLOWED rows (plans no longer hit): {stale}"
