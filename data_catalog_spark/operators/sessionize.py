"""Event sessionization — gap-based session assignment over the events
table (the batch twin of the streaming module's stateful operator).

Classic two-window shape: lag() to detect session boundaries (gap > 30 min),
running sum to number sessions, then one aggregation per session.  Both
windows partition by user_id — a single shuffle on the natural key, no
global ordering anywhere.

Timestamp arithmetic is done in epoch seconds as DOUBLE on both engines
(Spark ``cast(ts as double)`` == DuckDB ``epoch(ts)``, microsecond-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

SESSION_GAP_SEC = 1800


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag(F.col("ts").cast("double")).over(w)
    new_session = F.when(
        lag_ts.isNull() | ((F.col("ts").cast("double") - lag_ts) > SESSION_GAP_SEC), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn("new_s", new_session)
        .withColumn("session_seq", F.sum("new_s").over(wsum))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.round(
                F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double")), 6
            ).alias("duration_sec"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events",
            "session_start",
            "duration_sec",
        )
        .orderBy("user_id", "session_seq")
    )


SESSIONIZE_ORACLE = f"""
WITH x AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM x
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       round(epoch(MAX(ts)) - epoch(MIN(ts)), 6) AS duration_sec
FROM y
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


register("sessionize_events", sessionize_events, SESSIONIZE_ORACLE)


def sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same sessions via Spark's built-in session_window — the fully
    declarative form (one groupBy, no explicit lag/running-sum windows;
    Catalyst plans the session merge).  Boundary nuance vs the lag-based
    operator above: session_window starts a NEW session at a gap of
    exactly SESSION_GAP_SEC (windows touch but don't overlap), the
    lag-based one merges it (`>` test) — the oracle uses `>=` to pin the
    native semantics."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_SEC} seconds"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.round(
                F.max(F.col("ts").cast("double")) - F.min(F.col("ts").cast("double")), 6
            ).alias("duration_sec"),
        )
        .select("user_id", "session_start", "n_events", "duration_sec")
        .orderBy("user_id", "session_start")
    )


SESSIONIZE_NATIVE_ORACLE = f"""
WITH x AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM x
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(epoch(MAX(ts)) - epoch(MIN(ts)), 6) AS duration_sec
FROM y
GROUP BY user_id, session_seq
ORDER BY user_id, session_start
"""


register("sessionize_native", sessionize_native, SESSIONIZE_NATIVE_ORACLE)
