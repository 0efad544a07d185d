"""Aggregate-family extras: array/string aggregation, percent-of-total
windows, and the SQL FILTER clause.

Small but distinct aggregate shapes a warehouse surface needs beyond
sums/counts: collection-valued aggregates (the profile row), ratio-to-
report (share of a global total without a self-join), and per-aggregate
predicates (FILTER (WHERE ...) — one pass instead of N filtered scans).
All are single-shuffle hash aggregates; the global-total window in the
share query is a 1-row broadcast-style exchange, not a second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register


def customer_priority_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: order count and the SORTED distinct set of order
    priorities — a collection-valued aggregate row (dedup + sort inside
    the agg keeps the output deterministic)."""
    o = read_table(spark, sf_dir, "orders")
    # Collection-valued aggregates are rendered as delimited strings (not
    # array columns): the correctness harness hash-compares via pandas,
    # where list cells are unhashable — and a joined string pins the same
    # deterministic order anyway.
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
        )
        .orderBy("o_custkey")
    )


PRIORITY_PROFILE_ORACLE = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
"""


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation plus its share of the global total — ratio-to-
    report via an empty-frame window sum over the (tiny) aggregated
    frame; the base table is scanned once."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev")
        )
    )
    return (
        rev.select(
            "n_name",
            F.round(F.col("rev").cast("double"), 4).alias("revenue"),
            F.round(
                (F.col("rev") / F.sum("rev").over(Window.partitionBy())).cast(
                    "double"
                ),
                6,
            ).alias("share"),
        )
        .orderBy("n_name")
    )


REVENUE_SHARE_ORACLE = """
WITH rev AS (
  SELECT n_name,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
       round(CAST(rev AS DOUBLE), 4) AS revenue,
       round(CAST(rev / SUM(rev) OVER () AS DOUBLE), 6) AS share
FROM rev
ORDER BY n_name
"""


FILTER_AGG_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
       round(CAST(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F')
                  AS DOUBLE), 4) AS avg_price_finished
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def orders_filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-aggregate predicates via the ANSI FILTER clause — one scan and
    one hash aggregate computing differently-filtered aggregates side by
    side (the alternative is N scans or N CASE-wrapped columns).  The
    same SQL text runs on both engines."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(FILTER_AGG_SQL)


register("customer_priority_profile", customer_priority_profile, PRIORITY_PROFILE_ORACLE)
register("nation_revenue_share", nation_revenue_share, REVENUE_SHARE_ORACLE)
register("orders_filtered_aggs", orders_filtered_aggs, FILTER_AGG_SQL)


# -- linear-regression aggregates --------------------------------------------


def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of `value` over event time via the ANSI
    regression aggregates (regr_slope/intercept/r2) — one-pass moment
    aggregates, same partial-aggregation contract as avg/stddev, so they
    scale like any hash aggregate.  Time axis: hours since epoch."""
    ev = read_table(spark, sf_dir, "events")
    x = F.col("ts").cast("double") / 3600.0
    return (
        ev.select("event_type", F.col("value").alias("y"), x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.regr_slope("y", "x"), 6).alias("slope"),
            F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
            F.round(F.regr_r2("y", "x"), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


VALUE_TREND_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(regr_slope(value, epoch(ts) / 3600.0), 6) AS slope,
       round(regr_intercept(value, epoch(ts) / 3600.0), 4) AS intercept,
       round(regr_r2(value, epoch(ts) / 3600.0), 6) AS r2
FROM events
GROUP BY event_type ORDER BY event_type
"""


# -- distribution-position windows (cume_dist / percent_rank) -----------------


def customer_balance_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's position within their market segment's balance
    distribution: percent_rank (share strictly below) and cume_dist
    (share at-or-below).  One shuffle on the segment key."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_custkey")
    )


BALANCE_POSITION_ORACLE = """
SELECT c_custkey,
       c_mktsegment,
       round(c_acctbal, 2) AS acctbal,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


# -- item-item co-occurrence similarity ---------------------------------------


def event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering primitive over the user×type
    incidence matrix: for each event-type pair, the number of users doing
    both and the cosine similarity n_ab / sqrt(n_a·n_b).  The user-type
    matrix is tiny after the distinct (users × ≤5 types); the self-join
    shuffles on user_id once."""
    ev = read_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    counts = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(b, "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = counts.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(F.col("n_both") / F.sqrt(F.col("n_a") * F.col("n_b")), 6).alias(
                "cosine"
            ),
        )
        .orderBy("type_a", "type_b")
    )


COOCCURRENCE_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
counts AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_both,
       round(n_both / sqrt(ca.n * cb.n), 6) AS cosine
FROM pairs
JOIN counts ca ON pairs.type_a = ca.event_type
JOIN counts cb ON pairs.type_b = cb.event_type
ORDER BY type_a, type_b
"""


register("events_value_trend", events_value_trend, VALUE_TREND_ORACLE)
register("customer_balance_position", customer_balance_position, BALANCE_POSITION_ORACLE)
register("event_type_cooccurrence", event_type_cooccurrence, COOCCURRENCE_ORACLE)


# -- argmax / ordered-set aggregates ------------------------------------------


def nation_argmax_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: the customer holding the max account balance (max_by),
    the one holding the min (min_by), plus median and mode-ish summary of
    balances — the argmax-aggregate family in ONE hash aggregation (no
    self-join back to the row, no window).  Ties on balance are broken
    INSIDE the aggregate by packing (balance, custkey) into a struct and
    max-ing the pair — max_by alone is tie-nondeterministic, which an
    oracle-checked result can't tolerate."""
    c = read_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.expr("max(struct(c_acctbal, c_custkey)).c_custkey").alias("richest_cust"),
            F.expr("min(struct(c_acctbal, c_custkey)).c_custkey").alias("poorest_cust"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.col("c_nationkey").cast("int").alias("nationkey"),
            "richest_cust",
            "poorest_cust",
            "median_bal",
            "n_customers",
        )
        .orderBy("nationkey")
    )


ARGMAX_ORACLE = """
SELECT CAST(c_nationkey AS INT) AS nationkey,
       first(c_custkey ORDER BY c_acctbal DESC, c_custkey DESC) AS richest_cust,
       first(c_custkey ORDER BY c_acctbal ASC, c_custkey ASC) AS poorest_cust,
       round(median(c_acctbal), 4) AS median_bal,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer
GROUP BY c_nationkey
ORDER BY nationkey
"""


register("nation_argmax_customer", nation_argmax_customer, ARGMAX_ORACLE)


# -- bitmask rollup (bit_or aggregation) --------------------------------------


def user_dow_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: a 7-bit day-of-week activity mask (bit i set ⟺ active on
    dow i), assembled by OR-ing per-event one-hot masks — the bitmap-rollup
    pattern: masks are fixed-width ints, the aggregate is associative and
    commutative (map-side combinable), and set-cardinality questions become
    bit_count on the packed value instead of a distinct-count shuffle."""
    ev = read_table(spark, sf_dir, "events")
    # dayofweek: Spark is 1=Sunday..7, DuckDB 0=Sunday..6; both oracles
    # ISO-normalize to 0=Monday..6 before the shift.
    return (
        ev.groupBy("user_id")
        .agg(F.expr(f"bit_or({_MASK_EXPR})").alias("dow_mask"))
        .select(
            "user_id",
            "dow_mask",
            F.expr("bit_count(dow_mask)").cast("int").alias("n_active_dows"),
        )
        .orderBy("user_id")
    )


_MASK_EXPR = "shiftleft(CAST(1 AS BIGINT), (dayofweek(ts) + 5) % 7)"

DOW_BITMASK_ORACLE = """
SELECT user_id,
       bit_or((CAST(1 AS BIGINT) << ((dayofweek(ts) + 6) % 7))) AS dow_mask,
       CAST(bit_count(bit_or((CAST(1 AS BIGINT) << ((dayofweek(ts) + 6) % 7))))
            AS INT) AS n_active_dows
FROM events
GROUP BY user_id
ORDER BY user_id
"""


register("user_dow_bitmask", user_dow_bitmask, DOW_BITMASK_ORACLE)
