"""Watermarked stream-stream join — purchases joined to preceding clicks.

The hardest Structured Streaming primitive: both sides are unbounded, so
matches require state; the event-time bound (click within 30 min before
the purchase) plus watermarks lets Spark expire state — without the time
bound the join state would grow forever, the canonical unbounded-state
mistake.  State is keyed by user_id (the equi-join key = shuffle key).

Batch parity: an availableNow pass over the full table must produce
exactly the rows of the equivalent batch join (the time bound makes the
join semantics batch-expressible, which is what the oracle checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.registry import register
from .events import read_events_stream

JOIN_WINDOW_SEC = 1800


def purchases_with_recent_clicks_stream(events: DataFrame) -> DataFrame:
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS")),
    )


def stream_purchase_click_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: run the stream-stream join availableNow, then a batch
    summary of the matched pairs (count + distinct purchases per user)."""
    import uuid

    name = f"ss_join_pairs_{uuid.uuid4().hex[:8]}"  # fresh sink per run
    q = (
        purchases_with_recent_clicks_stream(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("purchase_id").alias("n_purchases_with_click"),
        )
        .orderBy("user_id")
    )


STREAM_JOIN_ORACLE = f"""
SELECT p.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases_with_click
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND c.ts <= p.ts
 AND c.ts >= p.ts - INTERVAL {JOIN_WINDOW_SEC} SECONDS
WHERE p.event_type = 'purchase'
GROUP BY p.user_id
ORDER BY p.user_id
"""


register("stream_purchase_click_pairs", stream_purchase_click_pairs, STREAM_JOIN_ORACLE)


# -- stream-static dimension enrichment --------------------------------------


def enriched_events_stream(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch of events joins the static
    customer dimension (user_id == c_custkey).  The static side is
    BROADCAST — no state, no watermark needed (stream-static inner joins
    are stateless by construction), and the stream side never shuffles for
    the join.  At deployment scale the dimension is re-read per trigger,
    picking up slowly-changing updates for free."""
    dim = customers.select("c_custkey", "c_mktsegment")
    return events.join(F.broadcast(dim), events.user_id == dim.c_custkey)


def stream_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: availableNow pass of the stream-static join, rolled up
    to per-(market segment, event type) counts and value sums."""
    import uuid

    from ..io import read_table

    name = f"ss_static_{uuid.uuid4().hex[:8]}"
    enriched = enriched_events_stream(
        read_events_stream(spark, sf_dir), read_table(spark, sf_dir, "customer")
    )
    q = (
        enriched.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("c_mktsegment", "event_type")


STREAM_STATIC_ORACLE = """
SELECT c_mktsegment, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
ORDER BY c_mktsegment, event_type
"""


register("stream_segment_rollup", stream_segment_rollup, STREAM_STATIC_ORACLE)


# -- left-outer stream-stream join (watermark-gated null emission) -----------


def purchases_louter_clicks_stream(events: DataFrame) -> DataFrame:
    """LEFT OUTER variant of the purchase⋈click stream join: purchases with
    no qualifying click eventually emit with a NULL click side — but only
    once the watermark proves no match can still arrive.  This is the
    streaming-specific semantics the inner join doesn't exercise: null
    emission is *deferred state eviction*, not a per-batch anti-join."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_SEC} SECONDS")
        ),
        "left_outer",
    )


def stream_purchase_click_louter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: availableNow left-outer pass, then per-user counts of
    matched pairs vs orphan purchases (NULL click side).

    The oracle encodes Spark's exact emission rule rather than pretending
    the stream equals a batch LEFT JOIN: matched pairs always emit, but an
    orphan emits only when the final global watermark — ``min`` over both
    inputs of (max event time − 1 h delay) — has passed its ``p_ts``, i.e.
    no future click could still satisfy ``c_ts <= p_ts``.  Purchases
    younger than the final watermark stay buffered in state forever (the
    stream never ends), so they are absent from BOTH engines' results."""
    import uuid

    name = f"ss_louter_{uuid.uuid4().hex[:8]}"
    q = (
        purchases_louter_clicks_stream(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.sum(F.when(F.col("click_id").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_pairs"),
            F.sum(F.when(F.col("click_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        )
        .orderBy("user_id")
    )


STREAM_LOUTER_ORACLE = f"""
WITH wm AS (
  SELECT least(max(ts) FILTER (event_type = 'click'),
               max(ts) FILTER (event_type = 'purchase'))
         - INTERVAL 1 HOUR AS w
  FROM events
), emitted AS (
  SELECT p.user_id, c.event_id AS click_id
  FROM events p
  JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL {JOIN_WINDOW_SEC} SECONDS
  WHERE p.event_type = 'purchase'
  UNION ALL
  SELECT p.user_id, NULL AS click_id
  FROM events p, wm
  WHERE p.event_type = 'purchase'
    AND p.ts < wm.w
    AND NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL {JOIN_WINDOW_SEC} SECONDS)
)
SELECT user_id,
       CAST(sum(CASE WHEN click_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs,
       CAST(sum(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM emitted
GROUP BY user_id ORDER BY user_id
"""


register("stream_purchase_click_louter", stream_purchase_click_louter, STREAM_LOUTER_ORACLE)
