"""Temporal operators: interval join, gaps-and-islands streaks, and the
event-type transition matrix.

These extend the join/window families (SURVEY §2.6 notes the reference has
none — these are north-star pipeline operators) with the three temporal
shapes every event-log workload needs:

* **interval join** — all right rows within a bounded time window of each
  left row (Flink's interval join).  With a shared equi-key (``user_id``)
  this is a plain sort-merge equi-join plus a range residual — the window
  bound keeps the per-key expansion finite, so it scales linearly with the
  pair count.  For *keyless* interval joins the scale path is bucketing both
  sides by ``floor(ts / window)`` and joining bucket b to {b-1, b} — same
  plan shape, still an equi-join, never a broadcast-nested-loop.
* **gaps-and-islands** — consecutive-day activity streaks via the classic
  ``day − row_number()`` island key: two window passes over one shuffle by
  user, then a per-user aggregate.  No self-join, no explosion.
* **transition matrix** — first-order Markov transitions between event
  types per user (``lead`` over (user, time)), then a global count + row-
  normalised probability.  One shuffle for the window, one for the final
  (src, dst) aggregate; the matrix is |types|² rows — tiny at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

INTERVAL_SEC = 21600  # 6 h look-back from each purchase


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


# -- interval join -----------------------------------------------------------


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_sec: float,
    upper_sec: float,
) -> DataFrame:
    """All (left, right) pairs sharing ``on`` with
    ``left_ts - lower_sec <= right_ts <= left_ts + upper_sec``.

    Equi-join on the key with the time band as a residual predicate —
    Catalyst plans a shuffled sort-merge join, so cost is driven by the
    true pair count, not |L|×|R|.
    """
    lo = F.col(left_ts).cast("double") - F.lit(float(lower_sec))
    hi = F.col(left_ts).cast("double") + F.lit(float(upper_sec))
    r_ts = F.col(right_ts).cast("double")
    return left.join(right, on=on, how="inner").where((r_ts >= lo) & (r_ts <= hi))


def clicks_before_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every click by the same user in the 6 hours at-or-before each
    purchase, with the gap in seconds — the bounded-window variant of the
    as-of join (which keeps only the latest click)."""
    ev = _ev(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    joined = interval_join(
        purchases, clicks, on="user_id",
        left_ts="p_ts", right_ts="c_ts",
        lower_sec=INTERVAL_SEC, upper_sec=0.0,
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "click_id",
        F.round(
            F.col("p_ts").cast("double") - F.col("c_ts").cast("double"), 3
        ).alias("gap_sec"),
    ).orderBy("purchase_id", "click_id")


INTERVAL_JOIN_ORACLE = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       c.event_id AS click_id,
       round(epoch(p.ts) - epoch(c.ts), 3) AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL {INTERVAL_SEC} SECOND
 AND c.ts <= p.ts
ORDER BY purchase_id, click_id
"""


# -- gaps-and-islands: activity streaks --------------------------------------


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: active-day count, number of consecutive-day streaks, and
    the longest streak, via the day − row_number() island key."""
    ev = _ev(spark, sf_dir)
    days = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("streak_len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("streak_len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), islands AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS island
  FROM days
), streaks AS (
  SELECT user_id, island, count(*) AS streak_len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(streak_len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(streak_len) AS BIGINT) AS longest_streak
FROM streaks GROUP BY user_id ORDER BY user_id
"""


# -- event-type transition matrix --------------------------------------------


def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts + probabilities between event types
    per user timeline (deterministic order: ts then event_id)."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    wsrc = Window.partitionBy("src")
    return (
        counts.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(wsrc), 6)
        )
        .orderBy("src", "dst")
    )


TRANSITIONS_ORACLE = """
WITH pairs AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
), counts AS (
  SELECT src, dst, count(*) AS n FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, n,
       round(n / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
FROM counts ORDER BY src, dst
"""


# -- time to conversion ------------------------------------------------------


def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: first signup, first purchase at-or-after it, and the
    latency in hours (NULL when never converted).  Two per-user min-aggs
    on the same shuffle key plus a left join — no window needed."""
    ev = _ev(spark, sf_dir)
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    first_purchase = (
        purchases.join(signups, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        signups.join(first_purchase, "user_id", "left")
        .select(
            "user_id",
            F.date_format("signup_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
            F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.round(
                (
                    F.col("purchase_ts").cast("double")
                    - F.col("signup_ts").cast("double")
                )
                / 3600.0,
                3,
            ).alias("hours_to_convert"),
        )
        .orderBy("user_id")
    )


CONVERSION_ORACLE = """
WITH s AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT s.user_id,
       strftime(s.signup_ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       round((epoch(p.purchase_ts) - epoch(s.signup_ts)) / 3600.0, 3)
         AS hours_to_convert
FROM s LEFT JOIN p ON s.user_id = p.user_id
ORDER BY s.user_id
"""


register(
    "clicks_before_purchase_interval",
    clicks_before_purchase_interval,
    INTERVAL_JOIN_ORACLE,
)
register("user_activity_streaks", user_activity_streaks, STREAKS_ORACLE)
register("time_to_conversion", time_to_conversion, CONVERSION_ORACLE)
register("event_type_transitions", event_type_transitions, TRANSITIONS_ORACLE)
