"""Final TPC-H-style batch: q9/q11/q16/q20/q21 — the operator shapes the
earlier batches (analytics.py, tpch_extra.py) still lacked: a 5-way
multi-join profit rollup (q9), a global-scalar-subquery HAVING threshold
(q11), distinct-count grouping with a NOT-IN exclusion subquery (q16), a
nested two-level correlated-aggregate semi-join (q20), and the double
EXISTS / NOT-EXISTS self-join (q21).

Like the rest of the TPC-H suite these have no reference counterpart to
cite (SURVEY §2.6 — the reference has no joins); they are north-star
breadth implemented Spark-first.  Adapted to the driver's slimmed star
schema (no partsupp, no l_commitdate/l_receiptdate — see TESTDATA.md):

  * q9's supply cost is proxied as ``0.6 * p_retailprice * l_quantity``
    (part.p_retailprice exists; partsupp.ps_supplycost does not);
  * q11's "important stock" becomes important *revenue* share per part;
  * q16's "customer complaints" exclusion becomes negative-balance
    suppliers (same NOT-IN-subquery shape);
  * q20/q21's date logic uses l_shipdate vs o_orderdate (+ interval)
    since commit/receipt dates don't exist.

Scale rules (same as tpch_extra.py): dims broadcast; the only fact-fact
shuffle is lineitem⋈orders on orderkey (zero-shuffle when bucketed);
aggregate-first before correlated comparison so join inputs are the agg's
cardinality; money sums go through DECIMAL(18,4) for exact,
order-independent results at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dec(col):
    return F.col(col).cast("decimal(18,4)")


# -- q9: product-type profit by nation and year ------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'widget'-named parts per supplier nation per order year.
    Profit = revenue − 0.6·retailprice·qty (supply-cost proxy).  Plan: the
    part filter broadcasts (name predicate prunes part BEFORE the join, so
    the broadcast side is the filtered subset), supplier+nation broadcast,
    and lineitem⋈orders is the single big shuffle on orderkey.  The final
    agg is tiny (nations × years)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity
                     AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


# -- q11: important revenue share (global scalar-subquery threshold) ---------


def q11_important_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 0.2% of TOTAL revenue.  Aggregate-first:
    one shuffle to per-part sums; the global total is a second-stage agg of
    those sums (NOT a rescan of lineitem), broadcast back as a 1-row
    crossJoin.  At 100 TB the threshold compare runs on |parts| rows, and
    the fact table is scanned exactly once."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .alias("value")
    )
    total = per_part.agg(F.sum("value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.lit(0.002) * F.col("total_value"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM per_part
WHERE value > 0.002 * (SELECT SUM(value) FROM per_part)
ORDER BY value DESC, l_partkey
"""


# -- q16: supplier diversity per part attribute, with NOT-IN exclusion -------


def q16_supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) for non-'Brand#13' parts,
    excluding negative-balance suppliers (the NOT-IN complaints shape).
    lineitem is the part↔supplier association (no partsupp); the exclusion
    list is a broadcast LEFT ANTI — never a shuffled NOT IN.  Distinct
    count shuffles once on the (brand,type,size,suppkey) grouping;
    partial map-side distinct keeps the shuffle small."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") != "Brand#13")
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_sup = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_sup), li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# -- q20: dominant suppliers via two-level correlated aggregate --------------


def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped >40% of a 'blue'-named part's 1996 volume —
    the q20 nested-subquery shape (per-(supplier,part) agg compared against
    a correlated per-part agg).  Both levels aggregate the SAME filtered
    scan: per-(part,supplier) sums shuffle once; per-part totals derive
    from those sums (window over l_partkey — no second scan, no re-shuffle
    since partitioning on l_partkey,l_suppkey co-locates l_partkey); the
    qualifying pairs collapse to a distinct supplier set that semi-joins
    supplier (broadcast)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    part_blue = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = (
        li.where(F.year("l_shipdate") == 1996)
        .join(F.broadcast(part_blue), li.l_partkey == part_blue.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("sup_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        pair.withColumn("part_qty", F.sum("sup_qty").over(w))
        .where(F.col("sup_qty") > F.lit(0.4) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_ORACLE = """
WITH pair AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sup_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'blue%'
  WHERE YEAR(l_shipdate) = 1996
  GROUP BY l_partkey, l_suppkey
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM pair p1
  WHERE sup_qty > 0.4 * (SELECT SUM(sup_qty) FROM pair p2
                         WHERE p2.l_partkey = p1.l_partkey)
)
ORDER BY s_name
"""


# -- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS self-join) --


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For finished ('F') orders: count, per supplier, the orders where that
    supplier shipped late (>100 days after order date), at least one OTHER
    supplier participated (EXISTS), and NO other supplier was late
    (NOT EXISTS).  No l_receiptdate/l_commitdate in the slimmed schema, so
    "late" = l_shipdate > o_orderdate + 100 days.

    Plan shape: lines of F-orders computed once (one orderkey shuffle),
    then per-order supplier/late-supplier profiles come from ONE groupBy
    over that set (count distinct suppliers, count distinct late
    suppliers) — the EXISTS and NOT-EXISTS collapse into two conditions on
    the profile instead of two self-joins, turning TPC-H's most notorious
    4-way self-join into two shuffles total (orderkey, then suppkey)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    # lines feeds BOTH the profile agg and the late set; materialize the slim
    # 3-column frame once (CTE materialization) instead of re-running the
    # lineitem⋈orders join per branch — measured 2.3 s → 1.5 s at sf0.1.
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"))
            .cast("int")
            .alias("is_late"),
        )
        .localCheckpoint(eager=False)
    )
    profile = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_sup"),
        F.countDistinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("n_late_sup"),
    )
    late = (
        lines.where(F.col("is_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(
            profile.where((F.col("n_sup") > 1) & (F.col("n_late_sup") == 1)),
            "l_orderkey",
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_ORACLE = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 100 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
profile AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_sup,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_sup
  FROM lines GROUP BY l_orderkey
),
late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late = 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late
JOIN profile USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_sup > 1 AND n_late_sup = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


register("q9_product_profit", q9_product_profit, Q9_ORACLE)
register("q11_important_part_share", q11_important_part_share, Q11_ORACLE)
register("q16_supplier_part_diversity", q16_supplier_part_diversity, Q16_ORACLE)
register("q20_dominant_part_suppliers", q20_dominant_part_suppliers, Q20_ORACLE)
register("q21_waiting_suppliers", q21_waiting_suppliers, Q21_ORACLE)
