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
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sort_array(F.collect_set("o_orderpriority")).alias("priorities"),
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
        )
        .orderBy("o_custkey")
    )


PRIORITY_PROFILE_ORACLE = """
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       list_sort(list(DISTINCT o_orderpriority)) AS priorities,
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
