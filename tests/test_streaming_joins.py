"""Watermarked stream-stream join vs its batch-expressible oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_catalog_spark.io import read_table
from data_catalog_spark.streaming import joins as sj

from conftest import assert_same


def test_stream_join_parity(spark, sf_dir, ddb):
    assert_same(
        sj.stream_purchase_click_pairs(spark, sf_dir), ddb, sj.STREAM_JOIN_ORACLE
    )


def test_stream_join_matches_batch_join(spark, sf_dir):
    """The availableNow stream-stream join must emit exactly the batch
    join's pairs — watermarks may only expire state that can no longer
    match, never drop valid pairs."""
    ev = read_table(spark, sf_dir, "events")
    p = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    batch = p.join(
        c,
        (p.user_id == c.c_user)
        & (c.c_ts <= p.p_ts)
        & (c.c_ts >= p.p_ts - F.expr(f"INTERVAL {sj.JOIN_WINDOW_SEC} SECONDS")),
    )
    want = batch.groupBy("user_id").count().collect()
    got = {
        r.user_id: r.n_pairs
        for r in sj.stream_purchase_click_pairs(spark, sf_dir).collect()
    }
    assert got == {r.user_id: r["count"] for r in want}
    assert got, "must match some purchase/click pairs"


def test_stream_static_rollup_parity(spark, sf_dir, ddb):
    from conftest import assert_same

    assert_same(
        sj.stream_segment_rollup(spark, sf_dir), ddb, sj.STREAM_STATIC_ORACLE
    )


def test_stream_static_join_is_stateless_broadcast(spark, sf_dir):
    """A stream-static inner join needs no state store: the logical plan
    joins the streaming source to a broadcast-hinted static relation, and
    no watermark is required for it to make progress (the parity test above
    already proved completion without one)."""
    from data_catalog_spark.io import read_table
    from data_catalog_spark.streaming.events import read_events_stream

    df = sj.enriched_events_stream(
        read_events_stream(spark, sf_dir), read_table(spark, sf_dir, "customer")
    )
    assert df.isStreaming
    plan = df._jdf.queryExecution().logical().toString()
    assert "c_mktsegment" in plan


def test_stream_louter_parity(spark, sf_dir, ddb):
    assert_same(
        sj.stream_purchase_click_louter(spark, sf_dir),
        ddb,
        sj.STREAM_LOUTER_ORACLE,
    )


def test_stream_louter_orphans_respect_watermark(spark, sf_dir):
    """Matched pairs equal the inner join exactly; orphans are the batch
    anti-join MINUS purchases still inside the final watermark horizon
    (state not yet evictable ⇒ nothing emitted for them)."""
    out = {r.user_id: r for r in sj.stream_purchase_click_louter(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events")
    wm = ev.selectExpr(
        "least(max(CASE WHEN event_type='click' THEN ts END),"
        "      max(CASE WHEN event_type='purchase' THEN ts END))"
        " - INTERVAL 1 HOUR AS w"
    ).first()[0]
    p = ev.where("event_type = 'purchase'")
    c = ev.where("event_type = 'click'").selectExpr(
        "user_id AS cu", "ts AS c_ts"
    )
    cond = (
        (p.user_id == F.col("cu"))
        & (F.col("c_ts") <= p.ts)
        & (F.col("c_ts") >= p.ts - F.expr(f"INTERVAL {sj.JOIN_WINDOW_SEC} SECONDS"))
    )
    unmatched = p.join(c, cond, "left_anti")
    evictable = {
        r.user_id: r.n
        for r in unmatched.where(F.col("ts") < F.lit(wm))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_orphans = {u: r.n_orphans for u, r in out.items() if r.n_orphans > 0}
    assert got_orphans == {u: n for u, n in evictable.items() if n > 0}
    # at least one purchase must be withheld for the semantics to be visible
    withheld = unmatched.where(F.col("ts") >= F.lit(wm)).count()
    assert withheld >= 1
