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
