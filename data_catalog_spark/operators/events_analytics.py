"""Behavioral event analytics — funnel, cohort retention, percentiles,
pivot.  North-star breadth (SURVEY §2.6: the reference has no aggregation
beyond terms facets); all four are classic product-analytics operators a
catalog's event stream needs at scale.

Scale design:
- funnel: three cascaded per-user conditional aggs, all shuffling on the
  SAME key (user_id) — with AQE + same-key partitioning the later stages
  reuse the first shuffle's layout; nothing is ever collected.
- retention: cohorting is one groupBy(user) + one broadcast-back join of
  the (tiny) per-user cohort table; the distinct-count shuffles on the
  (cohort, offset) pair — bounded by weeks², not rows.
- percentiles: Spark's exact `percentile` is a single-pass partial
  aggregate; at 100 TB swap to approx_percentile (t-digest) — same call
  shape, bounded memory.
- pivot: an explicit value list keeps the pivot a plain hash aggregate
  (no extra pass to discover the domain) with one output column per value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

FUNNEL_STAGES = ["view", "click", "purchase"]


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


# -- funnel ------------------------------------------------------------------


def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel user counts: view → click-after-view →
    purchase-after-that-click.  Each stage is min(ts) of the stage event
    AFTER the previous stage's ts — per-user conditional aggregations,
    cascaded; a user advances only in event-time order."""
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts")
    # each stage aggregate is checkpointed: the cascade re-derived v
    # inside c and (v, c) inside p, inlining SIX events scans into the
    # union plan (r10 repeated-scan lint) — with the barriers the plan
    # is exactly three filter-pushed scans, one per stage's event type
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("1_view").alias("stage"), "n")
        .unionAll(
            c.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("2_click").alias("stage"), "n"
            )
        )
        .unionAll(
            p.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("3_purchase").alias("stage"), "n"
            )
        )
        .orderBy("stage")
    )


FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
SELECT '1_view' AS stage, CAST((SELECT count(*) FROM v) AS BIGINT) AS n
UNION ALL
SELECT '2_click', CAST((SELECT count(*) FROM c) AS BIGINT)
UNION ALL
SELECT '3_purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
ORDER BY stage
"""


# -- cohort retention --------------------------------------------------------


def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users per (signup-cohort week, weeks-since-cohort) — the cohort table
    is one row per user (broadcast), activity distinct-counts shuffle on the
    small (cohort, offset) domain."""
    ev = _ev(spark, sf_dir).select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .withColumn(
            "week_offset",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).cast("int"),
        )
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort"),
            "week_offset",
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort", "week_offset")
    )


COHORT_ORACLE = """
WITH coh AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort,
       CAST(floor(date_diff('day', cohort_week, date_trunc('week', ts)) / 7)
            AS INTEGER) AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
FROM events e JOIN coh USING (user_id)
GROUP BY cohort, week_offset
ORDER BY cohort, week_offset
"""


# -- exact percentiles -------------------------------------------------------


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of `value` per event type (single-pass partial
    aggregate).  At 100 TB: approx_percentile, same call shape."""
    return (
        _ev(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


PERCENTILES_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


# -- pivot (crosstab) --------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_day_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per day × type, types as columns.  The explicit value list
    makes the pivot a plain one-pass hash aggregate."""
    return (
        _ev(spark, sf_dir)
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
        .orderBy("day")
    )


PIVOT_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY day ORDER BY day
"""


# -- histogram ---------------------------------------------------------------

HIST_LO, HIST_HI, HIST_BINS = 0.0, 500.0, 10


# width_bucket semantics, spelled out so the IDENTICAL arithmetic runs in
# both engines (DuckDB has no width_bucket): 0 below range, bins+1 above,
# else 1-based fixed-step bin.
_BUCKET_EXPR = (
    f"CASE WHEN value < {HIST_LO} THEN 0 "
    f"WHEN value >= {HIST_HI} THEN {HIST_BINS + 1} "
    f"ELSE CAST(floor((value - {HIST_LO}) / "
    f"(({HIST_HI} - {HIST_LO}) / {HIST_BINS})) AS BIGINT) + 1 END"
)


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram — one map-side-combined aggregation; the
    standard distribution profile at any scale."""
    return (
        _ev(spark, sf_dir)
        .select(F.expr(_BUCKET_EXPR).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


HISTOGRAM_ORACLE = f"""
SELECT {_BUCKET_EXPR} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY bucket ORDER BY bucket
"""


register("funnel_view_click_purchase", funnel_view_click_purchase, FUNNEL_ORACLE)
register("events_value_histogram", events_value_histogram, HISTOGRAM_ORACLE)
register("cohort_weekly_retention", cohort_weekly_retention, COHORT_ORACLE)
register("events_value_percentiles", events_value_percentiles, PERCENTILES_ORACLE)
register("events_day_type_pivot", events_day_type_pivot, PIVOT_ORACLE)


# -- cascading multi-resolution rollup (continuous-aggregate pattern) --------


def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour and day aggregates derived by CASCADE: events → minute buckets →
    hours (from minutes) → days (from hours), then unioned with a
    `resolution` tag.  The hypertable/continuous-aggregate pattern: each
    coarser level reads the (much smaller) finer aggregate, never the base
    table — at 100 TB the day rollup aggregates |hours| rows, not 10^12
    events.  Counts and DECIMAL sums compose exactly, so cascade == direct
    (which is exactly what the oracle computes from the base table)."""
    ev = _ev(spark, sf_dir)
    minutes = (
        ev.groupBy(F.date_trunc("minute", "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_dec"),
        )
    )
    hours = (
        minutes.groupBy(F.date_trunc("hour", "bucket").alias("bucket"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_dec").alias("sum_dec"))
    )
    days = (
        hours.groupBy(F.date_trunc("day", "bucket").alias("bucket"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_dec").alias("sum_dec"))
    )
    out_cols = lambda df, res: df.select(  # noqa: E731
        F.lit(res).alias("resolution"),
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )
    return (
        out_cols(hours, "hour")
        .union(out_cols(days, "day"))
        .orderBy("resolution", "bucket_start")
    )


MULTIRES_ORACLE = """
SELECT * FROM (
  SELECT 'hour' AS resolution,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 2
  UNION ALL
  SELECT 'day',
         strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
  FROM events GROUP BY 2
)
ORDER BY resolution, bucket_start
"""


# -- robust outlier detection (median / MAD) ---------------------------------


def events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: median, MAD (median absolute deviation), and the
    count of |value − median| > 3·1.4826·MAD outliers.  Two aggregate
    passes with a broadcast join of the tiny per-type medians between them
    — the robust-statistics shape that plain stddev z-scores (which the
    outliers themselves corrupt) can't deliver."""
    ev = _ev(spark, sf_dir)
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    # The outlier threshold needs the finished MAD, so count in a third
    # lightweight pass (broadcast of per-type (med, mad) onto the scan).
    thr = dev.groupBy("event_type").agg(
        F.round(F.first("med"), 6).alias("median"),
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad"),
    )
    return (
        ev.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("median")) > 3 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         round(any_value(m.med), 6) AS median,
         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type, any_value(s.median) AS median, any_value(s.mad) AS mad,
       CAST(SUM(CASE WHEN abs(e.value - s.median) > 3 * 1.4826 * s.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN mad s USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


register("events_multires_rollup", events_multires_rollup, MULTIRES_ORACLE)
register("events_outliers_mad", events_outliers_mad, MAD_ORACLE)


# -- equi-depth histogram (quantile-bounded buckets) -------------------------

_DECILES = [i / 10.0 for i in range(1, 10)]


def events_value_deciles_eqdepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of `value`: bucket bounds are the exact global
    deciles (one tiny agg, broadcast back), assignment is a case-chain —
    no global window / ntile, so it scales where `ntile(10) OVER ()` (a
    single-partition sort) cannot.  Bounds are rounded to 6dp before the
    comparison so both engines bucket identically."""
    ev = _ev(spark, sf_dir)
    bounds = ev.select(
        *[
            F.round(F.expr(f"percentile(value, {q})"), 6).alias(f"b{i+1}")
            for i, q in enumerate(_DECILES)
        ]
    )
    bucket = F.lit(1)
    for i in range(len(_DECILES)):
        bucket = bucket + F.when(F.col("value") > F.col(f"b{i+1}"), 1).otherwise(0)
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .orderBy("bucket")
    )


EQDEPTH_ORACLE = """
WITH bounds AS (
  SELECT round(quantile_cont(value, 0.1), 6) AS b1,
         round(quantile_cont(value, 0.2), 6) AS b2,
         round(quantile_cont(value, 0.3), 6) AS b3,
         round(quantile_cont(value, 0.4), 6) AS b4,
         round(quantile_cont(value, 0.5), 6) AS b5,
         round(quantile_cont(value, 0.6), 6) AS b6,
         round(quantile_cont(value, 0.7), 6) AS b7,
         round(quantile_cont(value, 0.8), 6) AS b8,
         round(quantile_cont(value, 0.9), 6) AS b9
  FROM events
)
SELECT 1 + CAST(value > b1 AS INTEGER) + CAST(value > b2 AS INTEGER)
         + CAST(value > b3 AS INTEGER) + CAST(value > b4 AS INTEGER)
         + CAST(value > b5 AS INTEGER) + CAST(value > b6 AS INTEGER)
         + CAST(value > b7 AS INTEGER) + CAST(value > b8 AS INTEGER)
         + CAST(value > b9 AS INTEGER) AS bucket,
       count(*) AS n,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi
FROM events CROSS JOIN bounds
GROUP BY bucket ORDER BY bucket
"""


# -- winsorized moments ------------------------------------------------------


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type moments: clamp `value` to the [p05, p95] band of its
    own type, then mean/stddev.  Per-group bounds are a small agg joined
    back (broadcast at any scale — |types| rows)."""
    ev = _ev(spark, sf_dir)
    bounds = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    clamped = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "wv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("wv"), 6).alias("wmean"),
            F.round(F.stddev_samp("wv"), 6).alias("wstd"),
        )
        .orderBy("event_type")
    )


WINSOR_ORACLE = """
WITH b AS (
  SELECT event_type,
         round(quantile_cont(value, 0.05), 6) AS lo,
         round(quantile_cont(value, 0.95), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       round(avg(least(greatest(e.value, b.lo), b.hi)), 6) AS wmean,
       round(stddev_samp(least(greatest(e.value, b.lo), b.hi)), 6) AS wstd
FROM events e JOIN b USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


register("events_value_deciles_eqdepth", events_value_deciles_eqdepth, EQDEPTH_ORACLE)
register("events_winsorized_stats", events_winsorized_stats, WINSOR_ORACLE)


# -- semi-structured props via VARIANT ---------------------------------------


def events_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats over the semi-structured ``props`` column using
    Spark 4's VARIANT type: ``parse_json`` once into a binary variant,
    ``variant_get`` with a typed path for extraction.  Variant keeps the
    parsed tree in a compact binary form, so repeated path extraction
    doesn't re-parse the JSON text per access (the schema-on-read path
    for heterogeneous props at scale — no fixed from_json schema to
    maintain)."""
    ev = _ev(spark, sf_dir)
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


PROPS_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(count(CAST(props ->> 'k' AS INTEGER)) AS BIGINT) AS n_with_k,
       round(avg(CAST(props ->> 'k' AS INTEGER)), 6) AS avg_k,
       CAST(max(CAST(props ->> 'k' AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type ORDER BY event_type
"""


register(
    "events_props_variant_stats", events_props_variant_stats, PROPS_VARIANT_ORACLE
)


# -- unpivot (melt) -----------------------------------------------------------


def events_day_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the day×type pivot back to long form with ``unpivot`` — the
    wide→long reshape (ids=day, values=type columns).  Round-tripping the
    pivot proves both directions are lossless; unpivot is a narrow
    projection (no shuffle)."""
    wide = events_day_type_pivot(spark, sf_dir)
    return (
        wide.unpivot("day", EVENT_TYPES, "event_type", "n")
        .where(F.col("n") > 0)
        .orderBy("day", "event_type")
    )


UNPIVOT_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY day, event_type
HAVING count(*) > 0
ORDER BY day, event_type
"""


register("events_day_type_unpivot", events_day_type_unpivot, UNPIVOT_ORACLE)


# -- calendar densification (gap fill) ---------------------------------------


def events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts densified over the full [min_day, max_day] calendar
    — missing days appear with zeros (the time-series 'gap fill' every
    dashboarding stack needs; naive GROUP BY silently drops empty days).

    Shape: the calendar is generated from ONE aggregate row via
    ``sequence()`` + ``explode`` (driver never loops), then LEFT-joined to
    the daily aggregate.  Both sides are tiny post-aggregation frames — the
    join broadcasts; the only real shuffle is the daily groupBy of the base
    scan, which map-side combines first."""
    ev = _ev(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_dec"),
    )
    calendar = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    return (
        calendar.join(F.broadcast(daily), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("sum_dec").cast("double"), F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("day")
    )


GAPFILL_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         count(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,4))) AS sum_dec
  FROM events GROUP BY day
), cal AS (
  SELECT unnest(generate_series(min(CAST(ts AS DATE)),
                                max(CAST(ts AS DATE)),
                                INTERVAL 1 DAY)) AS day
  FROM events
)
SELECT strftime(CAST(cal.day AS DATE), '%Y-%m-%d') AS day,
       CAST(coalesce(daily.n_events, 0) AS BIGINT) AS n_events,
       coalesce(CAST(daily.sum_dec AS DOUBLE), 0.0) AS sum_value
FROM cal LEFT JOIN daily ON CAST(cal.day AS DATE) = daily.day
ORDER BY day
"""


# -- full-outer reconciliation -----------------------------------------------


def events_daily_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile two independently-aggregated daily series (clicks vs
    purchases) with a FULL OUTER join — days present in either side survive,
    absent sides coalesce to 0 (the ledger-comparison shape: neither side is
    authoritative, so inner/left joins would drop rows).

    Scale: both inputs are post-aggregation day-grain frames (≤ thousands of
    rows at any SF); the full-outer join is a single small shuffle on day."""
    ev = _ev(spark, sf_dir)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_clicks"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_purchases"))
    )
    return (
        clicks.join(purchases, "day", "full_outer")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_clicks", F.lit(0)).cast("long").alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
            (
                F.coalesce("n_clicks", F.lit(0)) - F.coalesce("n_purchases", F.lit(0))
            )
            .cast("long")
            .alias("click_excess"),
        )
        .orderBy("day")
    )


RECONCILE_ORACLE = """
WITH c AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY day
), p AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY day
)
SELECT strftime(coalesce(c.day, p.day), '%Y-%m-%d') AS day,
       CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
       CAST(coalesce(c.n_clicks, 0) - coalesce(p.n_purchases, 0) AS BIGINT)
         AS click_excess
FROM c FULL OUTER JOIN p ON c.day = p.day
ORDER BY day
"""


register("events_gapfill_daily", events_gapfill_daily, GAPFILL_ORACLE)
register("events_daily_reconcile", events_daily_reconcile, RECONCILE_ORACLE)


# -- hopping (sliding) event-time windows ------------------------------------


def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 1-hour window hopping every 15 minutes: event count and value
    sum for 'purchase' events.  ``F.window(ts, '1 hour', '15 minutes')``
    expands each event into the 4 overlapping windows it belongs to
    (Expand node — the same map-side expansion Structured Streaming uses,
    so this batch query is the exact backfill twin of the streaming one);
    then a plain hash agg on the window struct.  At 100 TB the 4× expansion
    happens AFTER the event_type filter pushdown, and the shuffle key is
    (window), bounded by the time range, not the event count."""
    ev = _ev(spark, sf_dir).where(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("win_start")
    )


# DuckDB twin: explode each event into its 4 slide-aligned windows via
# generate_series over the offsets, mirroring Spark's Expand.
HOPPING_ORACLE = """
WITH p AS (SELECT ts, value FROM events WHERE event_type = 'purchase'),
expanded AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts)
           - unnest([INTERVAL '0' MINUTE, INTERVAL '15' MINUTE,
                     INTERVAL '30' MINUTE, INTERVAL '45' MINUTE]) AS win_start,
         value
  FROM p
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM expanded
GROUP BY win_start
ORDER BY win_start
"""


register("events_hopping_window", events_hopping_window, HOPPING_ORACLE)


# -- next-event-prediction training sequences ---------------------------------
#
# The behavioral-data counterpart of token-window chunking (traindata.py):
# turn each user's ordered event stream into fixed-length (context → label)
# examples for a next-event/sequence model.  Built FLAT with lead() over
# one (user, time) window — no collect_list of a whole user history, so a
# power user's million-event stream never materializes as a single array;
# at 100 TB this is one shuffle on user_id and map-side window evaluation.
# Ordering ties broken by event_id so both engines slice identically.
# The context is emitted as a single space-joined STRING (not array<string>):
# the driver's canonicalizer hashes rows with pandas, which cannot factorize
# list cells, so every registered query's output schema must be scalar-only
# (guarded by tests/test_registry_schemas.py).

SEQ_LEN = 4  # context length; the (SEQ_LEN+1)-th event is the label


def event_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, anchor event_id, space-joined context of SEQ_LEN event
    types, label): every position with a full window contributes one
    example."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = [
        F.lead("event_type", k).over(w).alias(f"e{k}")
        for k in range(1, SEQ_LEN + 1)
    ]
    base = _ev(spark, sf_dir).select(
        "user_id", "event_id", F.col("event_type").alias("e0"), *steps
    )
    return (
        base.where(F.col(f"e{SEQ_LEN}").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("anchor_id"),
            F.concat_ws(
                " ", *[F.col(f"e{k}") for k in range(SEQ_LEN)]
            ).alias("context"),
            F.col(f"e{SEQ_LEN}").alias("label"),
        )
        .orderBy("user_id", "anchor_id")
    )


_SEQ_LEADS = ",\n         ".join(
    f"lead(event_type, {k}) OVER w AS e{k}" for k in range(1, SEQ_LEN + 1)
)

EVENT_SEQUENCES_ORACLE = f"""
WITH s AS (
  SELECT user_id, event_id, event_type AS e0,
         {_SEQ_LEADS}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS anchor_id,
       concat_ws(' ', {", ".join(f"e{k}" for k in range(SEQ_LEN))}) AS context,
       e{SEQ_LEN} AS label
FROM s WHERE e{SEQ_LEN} IS NOT NULL
ORDER BY user_id, anchor_id
"""

register(
    "event_training_sequences", event_training_sequences, EVENT_SEQUENCES_ORACLE
)
