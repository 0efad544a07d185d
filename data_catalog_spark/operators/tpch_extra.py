"""Extended TPC-H-style analytics — the operator shapes q1/q3/q5/q6/q18
don't cover: semi/anti joins (EXISTS / NOT EXISTS), correlated and scalar
subqueries, disjunctive join predicates, conditional-aggregation ratios,
left-outer distribution aggs, and window-equality "argmax" selection.

Like ``analytics.py``, these have no reference counterpart to cite
(SURVEY §2.6 — the reference has no joins at all); they are north-star
breadth implemented Spark-first.  Adapted to the driver's slimmed star
schema (no partsupp; see TESTDATA.md).

Scale notes follow each docstring.  Common design rules:
  * dimension tables (customer 150k @ SF100, supplier, nation, part) are
    broadcast — the fact-side scan never shuffles for them;
  * fact-fact joins (lineitem⋈orders) shuffle once on the orderkey, the
    natural co-partitioning key (bucketed tables make it zero-shuffle);
  * scalar subqueries (q15/q17/q22) aggregate FIRST — the correlated side
    collapses to per-key rows before any join, so the join input is the
    aggregate's cardinality, not the fact's;
  * sums that feed equality/comparison go through DECIMAL(18,4) so they
    are exact and order-independent (double sums are not associative).
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


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")


# -- q2-style: per-group argmax (window-equality selection) ------------------


def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers holding their nation's max account balance — the TPC-H Q2
    correlated-min pattern (`s_acctbal = (SELECT max(..) WHERE same nation)`)
    done with a window max: ONE shuffle on the partition key instead of a
    self-join (two shuffles + a broadcast back)."""
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        sup.withColumn("max_bal", F.max("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("max_bal"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", "s_acctbal")
        .orderBy("n_name", "s_name")
    )


Q2_ORACLE = """
SELECT n_name, s_name, s_acctbal
FROM (SELECT s_name, s_nationkey, s_acctbal,
             max(s_acctbal) OVER (PARTITION BY s_nationkey) AS max_bal
      FROM supplier) s
JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = max_bal
ORDER BY n_name, s_name
"""


# -- q4-style: EXISTS semi-join ----------------------------------------------


def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority for orders with ≥1 returned line — EXISTS
    compiled to LEFT SEMI: the probe side streams, the build side is the
    matched-key set only, and no row duplication can occur (unlike an inner
    join + distinct, which would shuffle the duplicates first)."""
    orders = _t(spark, sf_dir, "orders")
    returned = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# -- q7-style: nation-pair trade volume (two aliased dim joins) --------------


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between two nations by year.  The same `nation` dim
    joins twice under different aliases (supplier side / customer side) —
    both broadcast, so the only shuffles are lineitem⋈orders (orderkey) and
    the final small agg."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == n1.sn_key)
        .join(F.broadcast(n2), cust.c_nationkey == n2.cn_key)
        .where(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# -- q8-style: market-share conditional ratio --------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers' share of total revenue per order year — the
    numerator is a conditional aggregate over the SAME pass as the
    denominator (one scan, one shuffle; never two queries).  Both sums are
    exact decimals, so the double division is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_5", _rev()).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_5'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY o_year
ORDER BY o_year
"""


# -- q10-style: returned-item top customers ----------------------------------


def q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returns.  The returnflag filter
    is pushed to the lineitem scan; customer+nation broadcast; the final
    top-k compiles to TakeOrderedAndProject (no global sort)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# -- q12-style: CASE-WHEN priority counts ------------------------------------


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High- vs low-priority line counts per linestatus — CASE WHEN inside
    SUM, fully codegen'd; the orders side projects only (orderkey, priority)
    so the shuffle payload is 2 columns, not the whole row."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# -- q13-style: left-outer count distribution --------------------------------


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count — LEFT OUTER so zero-order
    customers land in the c_count=0 bucket (count(col) skips the nulls the
    outer join injects).  Two cascading aggs: the first shuffles on custkey,
    the second on the (tiny) count domain."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -- q14-style: promo revenue share (broadcast dim + ratio) ------------------


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of one quarter's revenue from PROMO parts — shipdate range is
    pushed to the scan, part is broadcast, numerator+denominator in one agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


Q14_ORACLE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
"""


# -- q15-style: global-argmax scalar subquery --------------------------------


def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the global max — aggregate
    FIRST, then compare against the broadcast 1-row global max (the q22
    scalar pattern).  NOT a window max over the per-supplier frame: that
    frame scales with |supplier| (SF×10k — ~1e9 rows at the 100 TB SF),
    and an unpartitioned window would sort all of it in one task; the
    global max is a partial-aggregated 1-row frame instead, and the
    per-supplier rows are filtered in place, fully parallel.  The
    per-supplier aggregate is localCheckpointed so the two consumers
    (max + filter) share one shuffle instead of re-reading lineitem."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    sup = _t(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_rev()).cast("double").alias("total_revenue")
    ).localCheckpoint(eager=False)
    max_rev = per_supp.agg(F.max("total_revenue").alias("max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# -- q17-style: correlated per-key average subquery --------------------------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue from small-quantity orders of Brand#15 parts —
    the correlated `l_quantity < 0.5 * (SELECT avg(..) same part)` becomes:
    aggregate per-part averages (small), broadcast them back, filter, sum.
    The average is sum(DECIMAL)/count so the threshold is exact and
    order-independent in both engines."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#15")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    avg_q = brand_li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        brand_li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_ORACLE = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#15'
), avg_q AS (
  SELECT l_partkey AS a_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
             AS avg_qty
  FROM brand_li GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
           AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM brand_li JOIN avg_q ON l_partkey = a_partkey
WHERE l_quantity < 0.5 * avg_qty
"""


# -- q19-style: disjunctive join predicate -----------------------------------


def q19_disjunctive_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three brand/size/quantity bands OR-ed together in the
    join condition.  The equi-key (partkey) still drives a broadcast hash
    join; the disjunction evaluates as a post-join filter inside the same
    codegen stage — no nested-loop fallback."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (
            (F.col("p_brand") == "Brand#15")
            & (F.col("p_size") <= 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size") <= 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return li.join(
        F.broadcast(part), (li.l_partkey == part.p_partkey) & band
    ).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
 AND ((p_brand = 'Brand#15' AND p_size <= 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size <= 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size <= 35 AND l_quantity BETWEEN 20 AND 30))
"""


# -- q22-style: scalar-avg threshold + NOT EXISTS anti-join ------------------


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no partially-shipped ('P')
    orders, counted per nation.  The global average is an exact-decimal
    scalar broadcast (crossJoin of a 1-row agg — Spark plans it as a
    BroadcastNestedLoopJoin over one row, effectively free); NOT EXISTS is
    LEFT ANTI against only the 'P' order keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    p_custs = orders.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(p_custs, cust.c_custkey == p_custs.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_ORACLE = """
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                          / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


register("q2_top_supplier_per_nation", q2_top_supplier_per_nation, Q2_ORACLE)
register("q4_priority_with_returns", q4_priority_with_returns, Q4_ORACLE)
register("q7_nation_trade_volume", q7_nation_trade_volume, Q7_ORACLE)
register("q8_market_share", q8_market_share, Q8_ORACLE)
register("q10_returned_top_customers", q10_returned_top_customers, Q10_ORACLE)
register("q12_priority_by_linestatus", q12_priority_by_linestatus, Q12_ORACLE)
register("q13_order_count_distribution", q13_order_count_distribution, Q13_ORACLE)
register("q14_promo_revenue_share", q14_promo_revenue_share, Q14_ORACLE)
register("q15_top_revenue_supplier", q15_top_revenue_supplier, Q15_ORACLE)
register("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_ORACLE)
register(
    "q19_disjunctive_predicate_join", q19_disjunctive_predicate_join, Q19_ORACLE
)
register("q22_idle_rich_customers", q22_idle_rich_customers, Q22_ORACLE)
