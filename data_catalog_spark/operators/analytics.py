"""General analytics operators over the star schema — the engine breadth the
reference gets "for free" from ES but our build gets from Spark SQL
(SURVEY §2.6: joins/windows/aggregations have no reference counterpart to
cite; they are north-star scope).

Numeric policy for oracle parity: any *aggregated* double is first cast
per-row to DECIMAL(18,4) so the sum is exact and order-independent, then the
aggregate is cast back to DOUBLE.  Raw (un-aggregated) doubles pass through
untouched — both engines read the same parquet bits.  Timestamps are emitted
as formatted strings to dodge tz-object differences between engines.

Scale notes per operator are in each docstring; the common ones: dimension
joins are broadcast (customer/supplier/nation/region are small by design in
a star schema), fact-fact joins shuffle on the join key with AQE handling
skew, window functions partition by their natural key (no global windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dec(col):
    return F.col(col).cast("decimal(18,4)")


# -- q1: pricing summary (scan + filter + hash agg; fully map-side partial) --


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: single scan, predicate pushed to parquet, partial
    aggregation map-side — the canonical 100TB-friendly shape."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# -- q3: shipping-priority top-k (broadcast dim join + agg + top-k) ----------


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue.  customer is a dimension — broadcast it so the
    orders⋈customer join is shuffle-free; orders⋈lineitem shuffles on
    orderkey (the natural co-partitioning key; with bucketed tables this
    becomes a zero-shuffle sort-merge join).  Top-k compiles to
    TakeOrderedAndProject — no global sort at any scale."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


# -- q5: multi-way star join (all dims broadcast) ----------------------------


def q5_supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: lineitem is the only fact; supplier/nation are
    broadcast so the whole plan is one pass over the fact table plus
    broadcast hash joins — zero fact-side shuffles before the final agg."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# -- window: top-N per group -------------------------------------------------


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank within partition — shuffles once on the partition key; raw
    doubles pass through untouched (no arithmetic → bit-identical)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


TOP3_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) t
WHERE rnk <= 3
"""


# -- event-time: hourly rollup (the batch shape of the streaming agg) --------


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate in batch form; the streaming module runs the
    identical logical plan with a watermark (streaming/events.py)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# -- q6: forecast revenue change (pure filter-agg, fully pushed down) --------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: every predicate reaches the parquet scan
    (PushedFilters), the aggregation is a single map-side-combined scalar."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# -- q18: large-volume customers (agg + HAVING + join back) ------------------


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: per-order quantity totals, HAVING threshold,
    then a broadcast join back to customers.  The HAVING filter runs on the
    aggregated (small) side before the join — orders of magnitude less join
    input at scale."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("orderkey"))
    )


Q18_ORACLE = """
SELECT c_custkey, c_name, l_orderkey AS orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, total_qty
FROM (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
) t
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, orderkey
"""


# -- semi-structured: JSON props extraction ----------------------------------


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a field from the JSON ``props`` column and aggregate — the
    semi-structured path (get_json_object is codegen'd; no Python).  At scale
    prefer materializing hot JSON fields to columns at ingest; this shows the
    query-time path."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k").cast("decimal(18,4)")).cast("double").alias("sum_k"),
        )
        .orderBy("event_type")
    )


EVENTS_PROPS_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,4))) AS DOUBLE) AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
"""


register("q1_pricing_summary", q1_pricing_summary, Q1_ORACLE)
register("q6_forecast_revenue", q6_forecast_revenue, Q6_ORACLE)
register("q18_large_volume_customers", q18_large_volume_customers, Q18_ORACLE)
register("events_props_stats", events_props_stats, EVENTS_PROPS_ORACLE)
register("q3_top_revenue_orders", q3_top_revenue_orders, Q3_ORACLE)
register("q5_supplier_nation_revenue", q5_supplier_nation_revenue, Q5_ORACLE)
register("top3_orders_per_customer", top3_orders_per_customer, TOP3_ORACLE)
register("events_hourly_rollup", events_hourly_rollup, EVENTS_HOURLY_ORACLE)


# -- day-of-week seasonality --------------------------------------------------


def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue seasonality by day-of-week: order count, revenue, and a
    seasonal index (revenue share vs a flat 1/7 baseline; >1 = heavy day).

    Portability note: engines disagree on day-of-week numbering (Spark
    ``dayofweek`` is 1=Sunday, DuckDB ``dow`` is 0=Sunday), so the day
    number is computed as plain integer arithmetic on days-since-epoch
    (1970-01-01 was a Thursday ⇒ +4 mod 7 lands Sunday=0) — identical in
    both engines and immune to locale/session settings."""
    o = _t(spark, sf_dir, "orders")
    by_dow = o.groupBy(
        ((F.datediff("o_orderdate", F.lit("1970-01-01")) + 4) % 7).alias("dow_num"),
        F.date_format("o_orderdate", "EEEE").alias("dow_name"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"),
    )
    total = by_dow.agg(F.sum("rev_dec").alias("tot")).select("tot")
    return (
        by_dow.join(F.broadcast(total))
        .select(
            "dow_num",
            "dow_name",
            "n_orders",
            F.col("rev_dec").cast("double").alias("sum_revenue"),
            F.round((F.col("rev_dec") / F.col("tot")).cast("double") * 7, 6).alias(
                "seasonal_index"
            ),
        )
        .orderBy("dow_num")
    )


DOW_SEASONALITY_ORACLE = """
WITH by_dow AS (
  SELECT (date_diff('day', DATE '1970-01-01', o_orderdate) + 4) % 7 AS dow_num,
         strftime(o_orderdate, '%A') AS dow_name,
         CAST(count(*) AS BIGINT) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
  FROM orders GROUP BY dow_num, dow_name
), total AS (SELECT sum(rev_dec) AS tot FROM by_dow)
SELECT dow_num, dow_name, n_orders,
       CAST(rev_dec AS DOUBLE) AS sum_revenue,
       round(CAST(rev_dec / tot * 7 AS DOUBLE), 6) AS seasonal_index
FROM by_dow, total
ORDER BY dow_num
"""


register("orders_dow_seasonality", orders_dow_seasonality, DOW_SEASONALITY_ORACLE)


# -- grouped linear trend (regr_slope family) ----------------------------------
#
# Per event type: OLS slope/intercept of the DAILY MEAN value over the day
# index — the monitoring question "is this metric drifting, and how fast
# per day?".  Two hash aggregations (day rollup, then the five regression
# sufficient statistics per group), no window, no collect; both layers'
# sums go through DECIMAL so the statistics are partition-order-independent
# and cross-engine exact.  x = epoch-day index (integer, exact); y = the
# day's mean (deterministic: decimal sum / count).


def _daily_means(ev: DataFrame) -> DataFrame:
    """(event_type, day, x, y): per-type daily mean value on the exact
    epoch-day index — the shared base of the trend fit and the residual
    anomaly scan."""
    return (
        ev.groupBy(
            "event_type",
            (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
            .cast("bigint")
            .alias("day"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("y")
        )
        .withColumn("x", F.col("day").cast("double"))
    )


def _trend_sums(daily: DataFrame) -> DataFrame:
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,10)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,10)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(28,10)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,10)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(28,10)"))
        .cast("double")
        .alias("syy"),
    )
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, slope_per_day, intercept, r2): the per-type
    drift line fitted over daily means."""
    sums = _trend_sums(_daily_means(read_table(spark, sf_dir, "events")))
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # vary == 0 (constant daily means) would make r2 a 0/0 — which Spark's
    # non-ANSI division NULLs while DuckDB IEEE-NaNs, so the degenerate
    # group is dropped on BOTH engines instead
    return (
        sums.where((varx != 0) & (vary != 0))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.round(cov / varx, 6).alias("slope_per_day"),
            F.round((F.col("sy") - (cov / varx) * F.col("sx")) / F.col("n"), 6).alias(
                "intercept"
            ),
            F.round((cov * cov) / (varx * vary), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


DAILY_TREND_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS y
  FROM events GROUP BY 1, 2
), pts AS (
  SELECT event_type, CAST(day AS DOUBLE) AS x, y FROM daily
), sums AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS DECIMAL(28,10))) AS DOUBLE) AS syy
  FROM pts GROUP BY event_type
)
SELECT event_type, n AS n_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_per_day,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
           AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM sums
WHERE (n * sxx - sx * sx) != 0 AND (n * syy - sy * sy) != 0
ORDER BY event_type
"""

register("events_daily_trend", events_daily_trend, DAILY_TREND_ORACLE)


# -- single changepoint (binary segmentation via prefix sums) -------------------
#
# Per event type: the day that best splits the daily-mean series into two
# level regimes — argmax over t of the absolute before/after mean gap
# (the first step of binary-segmentation changepoint detection; CUSUM's
# recursive fold re-expressed as prefix sums so it stays one window +
# one aggregation, no driver loop and no recursion).  The cumulative sums
# run in DECIMAL (exact), so every candidate split's means — and hence
# the argmax — are bit-identical across engines and partitionings; ties
# break on the earliest day.


def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, split_day, mean_before, mean_after, gap):
    the best two-regime split of the daily-mean series."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("y")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_all = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cand = (
        daily.withColumn(
            "s_t",
            F.sum(F.col("y").cast("decimal(28,10)")).over(w_ord),
        )
        .withColumn("t", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn("s_n", F.sum(F.col("y").cast("decimal(28,10)")).over(w_all))
        .where(F.col("t") < F.col("n"))
        .withColumn("mean_before", F.col("s_t").cast("double") / F.col("t"))
        .withColumn(
            "mean_after",
            (F.col("s_n") - F.col("s_t")).cast("double") / (F.col("n") - F.col("t")),
        )
        .withColumn("gap", F.abs(F.col("mean_after") - F.col("mean_before")))
    )
    # argmax by (gap, earliest day): max of struct(gap, -t, payload)
    best = cand.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("gap"),
                (-F.col("t")).alias("neg_t"),
                F.col("day"),
                F.col("n"),
                F.col("mean_before"),
                F.col("mean_after"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.n").alias("n_days"),
        F.date_format("b.day", "yyyy-MM-dd").alias("split_day"),
        F.round("b.mean_before", 6).alias("mean_before"),
        F.round("b.mean_after", 6).alias("mean_after"),
        F.round("b.gap", 6).alias("gap"),
    ).orderBy("event_type")


CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS y
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, day,
         sum(CAST(y AS DECIMAL(28,10)))
             OVER (PARTITION BY event_type ORDER BY day) AS s_t,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(CAST(y AS DECIMAL(28,10))) OVER (PARTITION BY event_type) AS s_n
  FROM daily
), g AS (
  SELECT event_type, day, t, n,
         CAST(s_t AS DOUBLE) / t AS mean_before,
         CAST(s_n - s_t AS DOUBLE) / (n - t) AS mean_after
  FROM c WHERE t < n
), r AS (
  SELECT event_type, day, n, mean_before, mean_after,
         abs(mean_after - mean_before) AS gap,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(mean_after - mean_before) DESC, t)
             AS rk
  FROM g
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       strftime(day, '%Y-%m-%d') AS split_day,
       round(mean_before, 6) AS mean_before,
       round(mean_after, 6) AS mean_after,
       round(gap, 6) AS gap
FROM r WHERE rk = 1 ORDER BY event_type
"""

register("events_changepoint", events_changepoint, CHANGEPOINT_ORACLE)


# -- trend-residual anomaly days ------------------------------------------------
#
# Composition of the trend fit: a day is anomalous when its mean value
# sits more than 3 residual-sigmas off the type's own fitted drift line —
# level shifts and spikes that a static threshold misses when the metric
# trends.  2 sigma is the common alerting threshold (3 sigma on the
# synthetic corpus's thin-tailed noise flags nothing at any SF).  Three hash aggregations total (daily rollup, fit sums, residual
# variance), then a broadcast of the |types|-row fit frame back onto the
# daily frame; everything decimal-exact, so the flag itself is
# cross-engine deterministic.

ANOMALY_SIGMAS = 2.0


def events_trend_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous (event_type, day) rows: observed daily mean, fitted
    value, residual, and the type's residual sigma."""
    daily = _daily_means(read_table(spark, sf_dir, "events"))
    sums = _trend_sums(daily)
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = sums.where(varx != 0).select(
        "event_type",
        (cov / varx).alias("slope"),
        ((F.col("sy") - (cov / varx) * F.col("sx")) / F.col("n")).alias("b0"),
    )
    resid = (
        daily.join(F.broadcast(fit), "event_type")
        .withColumn("yhat", F.col("b0") + F.col("slope") * F.col("x"))
        .withColumn("resid", F.col("y") - F.col("yhat"))
    )
    sigma = resid.groupBy("event_type").agg(
        F.sqrt(
            F.sum((F.col("resid") * F.col("resid")).cast("decimal(28,10)"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("sigma")
    )
    return (
        resid.join(F.broadcast(sigma), "event_type")
        .where(F.abs(F.col("resid")) > F.lit(ANOMALY_SIGMAS) * F.col("sigma"))
        .select(
            "event_type",
            F.col("day").alias("epoch_day"),
            F.round("y", 6).alias("daily_mean"),
            F.round("yhat", 6).alias("fitted"),
            F.round("resid", 6).alias("residual"),
            F.round("sigma", 6).alias("sigma"),
        )
        .orderBy("event_type", "epoch_day")
    )


TREND_ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         CAST(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS y
  FROM events GROUP BY 1, 2
), pts AS (
  SELECT event_type, CAST(day AS DOUBLE) AS x, day, y FROM daily
), sums AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE) AS sxx
  FROM pts GROUP BY event_type
), fit AS (
  SELECT event_type,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS b0
  FROM sums WHERE (n * sxx - sx * sx) != 0
), resid AS (
  SELECT p.event_type, p.day, p.y,
         f.b0 + f.slope * p.x AS yhat,
         p.y - (f.b0 + f.slope * p.x) AS resid
  FROM pts p JOIN fit f USING (event_type)
), sigma AS (
  SELECT event_type,
         sqrt(CAST(sum(CAST(resid * resid AS DECIMAL(28,10))) AS DOUBLE)
              / count(*)) AS sigma
  FROM resid GROUP BY event_type
)
SELECT r.event_type, r.day AS epoch_day,
       round(r.y, 6) AS daily_mean,
       round(r.yhat, 6) AS fitted,
       round(r.resid, 6) AS residual,
       round(s.sigma, 6) AS sigma
FROM resid r JOIN sigma s USING (event_type)
WHERE abs(r.resid) > {ANOMALY_SIGMAS!r} * s.sigma
ORDER BY r.event_type, epoch_day
"""

register("events_trend_anomalies", events_trend_anomalies, TREND_ANOMALY_ORACLE)
