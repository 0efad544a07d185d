"""Window-function operators — running totals, ranking over aggregates,
frame-bounded moving averages, approximate distinct counts.

North-star breadth (SURVEY §2.6: the reference has no window functions).
Scale rules: every window partitions by a real key (user/customer/segment)
— no global, single-partition windows; ORDER BY inside a window always
carries a unique tiebreaker so results are total-ordered and
oracle-comparable at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# -- running (cumulative) total ----------------------------------------------


def orders_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative order spend per customer in order-date order.  One shuffle
    on custkey; the frame is the default UNBOUNDED PRECEDING..CURRENT ROW.
    DECIMAL accumulation so every prefix sum is exact (a running double
    would drift differently per engine)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


RUNNING_TOTAL_ORACLE = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# -- rank over an aggregate --------------------------------------------------


def customer_spend_rank_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank of customers by total spend within market segment — window
    over a pre-aggregated (small) input: aggregate first, rank the
    aggregate, never window the raw fact table."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("spend_dec"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend_dec").desc(), F.col("o_custkey")
    )
    return (
        spend.select(
            "c_mktsegment",
            F.col("o_custkey").alias("custkey"),
            F.col("spend_dec").cast("double").alias("total_spend"),
            F.dense_rank().over(w).alias("seg_rank"),
        )
        .where(F.col("seg_rank") <= 5)
        .orderBy("c_mktsegment", "seg_rank", "custkey")
    )


SPEND_RANK_ORACLE = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend_dec
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment, o_custkey AS custkey,
       CAST(spend_dec AS DOUBLE) AS total_spend,
       CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment
                               ORDER BY spend_dec DESC, o_custkey) AS BIGINT)
           AS seg_rank
FROM spend JOIN customer ON o_custkey = c_custkey
QUALIFY seg_rank <= 5
ORDER BY c_mktsegment, seg_rank, custkey
"""


# -- frame-bounded moving average --------------------------------------------


def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-event moving average of `value` per user (ROWS 2 PRECEDING..CURRENT)
    — the bounded-frame window every metrics pipeline needs; partition key
    user_id, unique tiebreaker event_id."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(
                (
                    F.sum(F.col("value").cast("decimal(18,4)")).over(w)
                    / F.count(F.lit(1)).over(w)
                ).cast("double"),
                6,
            ).alias("mov_avg3"),
        )
        .orderBy("user_id", "event_id")
    )


MOVING_AVG_ORACLE = """
SELECT user_id, event_id,
       round(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                  / COUNT(*)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 6) AS mov_avg3
FROM events
ORDER BY user_id, event_id
"""


# -- lag: period-over-period growth ------------------------------------------


def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — aggregate to months first (tiny),
    then lag() over the ordered month series.  The growth ratio divides two
    exact decimal sums, so it's engine-portable."""
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"))
    w = Window.orderBy("month")
    return (
        monthly.withColumn("prev_dec", F.lag("rev_dec").over(w))
        .select(
            "month",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.round(
                (F.col("rev_dec").cast("double") / F.col("prev_dec").cast("double") - 1) * 100,
                6,
            ).alias("growth_pct"),
        )
        .orderBy("month")
    )


MONTHLY_GROWTH_ORACLE = """
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
  FROM orders GROUP BY month
)
SELECT month, CAST(rev_dec AS DOUBLE) AS revenue,
       round((CAST(rev_dec AS DOUBLE)
              / CAST(lag(rev_dec) OVER (ORDER BY month) AS DOUBLE) - 1) * 100, 6)
           AS growth_pct
FROM monthly ORDER BY month
"""


# -- approximate distinct (HLL) ----------------------------------------------


def events_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type — the oracle twin of the approx
    path below."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


USERS_EXACT_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type (rsd 2%).  The 100 TB
    path: fixed-size sketch per group, map-side mergeable — no exact-distinct
    shuffle explosion.

    Sketch internals differ per engine, so the raw estimate can't be
    value-hashed — instead the accuracy contract itself is the hashed
    output: emit the EXACT count plus ``within_tol`` = |estimate − exact|
    ≤ max(10% · exact, 5) (rsd 2% ⇒ a 5σ bound; the absolute floor covers
    tiny groups where HLL++ runs in its exact sparse mode).  The DuckDB
    oracle computes the exact column and literal TRUE, so a sketch that
    drifts out of tolerance is a hash-checked failure, not a silent
    rows-only pass."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("est"),
        )
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("est") - F.col("n_users"))
                <= F.greatest(F.col("n_users") * 0.1, F.lit(5.0))
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


USERS_APPROX_ORACLE = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS within_tol
FROM events GROUP BY event_type ORDER BY event_type
"""


register("orders_running_total", orders_running_total, RUNNING_TOTAL_ORACLE)
register("orders_monthly_growth", orders_monthly_growth, MONTHLY_GROWTH_ORACLE)
register(
    "customer_spend_rank_in_segment", customer_spend_rank_in_segment, SPEND_RANK_ORACLE
)
register("events_moving_avg", events_moving_avg, MOVING_AVG_ORACLE)
register("events_users_exact", events_users_exact, USERS_EXACT_ORACLE)
register("events_users_approx", events_users_approx, USERS_APPROX_ORACLE)


# -- full ranking-family showcase (ntile / percent_rank / cume_dist / lead /
#    first_value) — the window shapes the other entries don't touch ----------


def customer_balance_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per market segment: decile (ntile), percent_rank, cume_dist, the gap
    to the next-richer customer (lead) and distance to the segment top
    (first_value).  ONE shuffle on the segment key serves all five window
    functions (same partitioning + ordering ⇒ one Window exec); ordering
    carries c_custkey as tiebreaker so every function is deterministic."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.ntile(10).over(w).alias("decile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.round(
                F.col("c_acctbal") - F.lead("c_acctbal").over(w), 2
            ).alias("gap_to_next"),
            F.round(
                F.first("c_acctbal").over(w) - F.col("c_acctbal"), 2
            ).alias("below_top"),
        )
        .orderBy("c_mktsegment", F.desc("c_acctbal"), "c_custkey")
    )


BALANCE_TILES_ORACLE = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(ntile(10) OVER w AS INT) AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       round(c_acctbal - lead(c_acctbal) OVER w, 2) AS gap_to_next,
       round(first_value(c_acctbal) OVER w - c_acctbal, 2) AS below_top
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
"""


register("customer_balance_tiles", customer_balance_tiles, BALANCE_TILES_ORACLE)


# -- time-RANGE window frame -------------------------------------------------


def events_trailing_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: count and sum of the same user's events in the trailing
    hour — a RANGE frame over event-time (microsecond precision), the
    time-based sibling of the ROWS moving average.  One shuffle on
    user_id; frame evaluation is a per-partition ordered sweep, so cost is
    O(rows) regardless of frame width."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double"), 4
            ).alias("sum_1h"),
        )
        .orderBy("user_id", "event_id")
    )


TRAILING_HOUR_ORACLE = """
SELECT user_id, event_id,
       CAST(count(*) OVER wr AS BIGINT) AS n_1h,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER wr AS DOUBLE), 4) AS sum_1h
FROM events
WINDOW wr AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


register(
    "events_trailing_hour_stats", events_trailing_hour_stats, TRAILING_HOUR_ORACLE
)


# -- rolling 7-day active users (contribution expansion) ---------------------


def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: distinct users active in the trailing 7 days (WAU).

    A sliding COUNT(DISTINCT) has no efficient window form — the classic
    rewrite is *contribution expansion*: dedupe to (user, day), explode each
    pair into the 7 report-days it contributes to, then a plain groupBy
    count-distinct.  The 7× expansion applies to the DEDUPED day-grain
    frame (≪ raw events), and both shuffles are on small keys; at 100 TB
    this is the only shape that avoids a per-day rescan."""
    ev = _t(spark, sf_dir, "events")
    pairs = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    return (
        pairs.select(
            F.explode(
                F.expr("sequence(day, date_add(day, 6), interval 1 day)")
            ).alias("day"),
            "user_id",
        )
        .join(F.broadcast(bounds), on=F.col("day") <= F.col("d1"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


ROLLING_WAU_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), expanded AS (
  SELECT unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))
           AS report_day,
         user_id
  FROM pairs
), bounds AS (SELECT max(CAST(ts AS DATE)) AS d1 FROM events)
SELECT strftime(CAST(report_day AS DATE), '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS wau
FROM expanded, bounds
WHERE CAST(report_day AS DATE) <= d1
GROUP BY day ORDER BY day
"""


register("events_rolling_wau", events_rolling_wau, ROLLING_WAU_ORACLE)


# -- latest record per key (QUALIFY-style dedup-by-recency) -------------------


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's most recent order — the single most common warehouse
    dedup shape (CDC snapshots, SCD current-row extraction): row_number
    over (key ORDER BY recency DESC, unique tiebreak) filtered to 1.  One
    shuffle on the key; at 100 TB prefer this over groupBy+max+self-join
    (one pass, no second scan)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("o_custkey")
    )


LATEST_ORDER_ORACLE = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
ORDER BY o_custkey
"""


register("latest_order_per_customer", latest_order_per_customer, LATEST_ORDER_ORACLE)


# -- approximate percentiles (t-digest-style sketch) --------------------------


def events_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per event type — the bounded-memory sketch twin of
    the exact percentile operator: partial sketches merge map-side, state
    is O(accuracy) per group instead of O(rows), which is the only viable
    shape for percentiles at 100 TB.

    Sketch internals are engine-specific, so — as with the HLL entries —
    the hashed output is the accuracy CONTRACT: the exact p50/p90/p99
    (oracle-matched; same exact-vs-quantile_cont precedent as
    ``events_value_percentiles``) plus ``within_tol`` asserting every
    estimate lies between the exact percentiles at p±0.01 — a 100× margin
    over the sketch's guaranteed 1/accuracy = 1e-4 rank error (p99's
    upper bound is the group max)."""
    return (
        _value_percentile_estimates(spark, sf_dir)
        .select(
            "event_type",
            F.round(F.col("ex")[0], 6).alias("p50"),
            F.round(F.col("ex")[1], 6).alias("p90"),
            F.round(F.col("ex")[2], 6).alias("p99"),
            (
                F.col("ap")[0].between(F.col("bd")[0], F.col("bd")[1])
                & F.col("ap")[1].between(F.col("bd")[2], F.col("bd")[3])
                & F.col("ap")[2].between(F.col("bd")[4], F.col("mx"))
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


def _value_percentile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the raw t-digest estimates (``ap``), the exact
    percentiles (``ex``), the exact p±0.01 rank bounds (``bd``) and the
    group max — ONE aggregate pass; kept separate so pytest can pin
    sketch-level rank accuracy the hashed contract view doesn't expose."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr(
            "approx_percentile(value, array(0.5, 0.9, 0.99), 10000)"
        ).alias("ap"),
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("ex"),
        F.expr("percentile(value, array(0.49,0.51,0.89,0.91,0.98))").alias("bd"),
        F.max("value").alias("mx"),
    )


PERCENTILES_APPROX_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       TRUE AS within_tol
FROM events GROUP BY event_type ORDER BY event_type
"""


register(
    "events_value_percentiles_approx",
    events_value_percentiles_approx,
    PERCENTILES_APPROX_ORACLE,
)
