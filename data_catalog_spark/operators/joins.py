"""Join-shaped operators beyond plain equi-joins: as-of join, rollup,
distinct aggregation, anti join.

The as-of join is the canonical "operator Spark lacks as a primitive"
(SURVEY §2.6 / build-brief custom-operator case): implemented as a
composition of existing DataFrame ops — union the two streams, one window
per key carrying the running "last left-side row" — rather than a
Pandas-UDF fallback.  One shuffle on the join key, no range explosion,
works at any scale.  The DuckDB oracle uses its native ``ASOF LEFT JOIN``,
so our composition is checked against a genuine independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# -- as-of join --------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row (right.ts <=
    left.ts) with the same key — the time-series as-of join.

    Implementation: tag and union both sides, sort per key by (ts, side)
    with right rows first on ties (<= semantics), then a running
    ``last(..., ignorenulls)`` carries the latest right values onto each
    left row.  Single shuffle on ``on``; state is one row per column —
    O(1) memory per key regardless of history length.
    """
    lt = left.withColumn("__side", F.lit(1))
    rt = right.withColumn("__side", F.lit(0))
    cols = list({*left.columns, *right.columns})
    aligned = []
    for df in (lt, rt):
        missing = [c for c in cols if c not in df.columns]
        sel = df
        for c in missing:
            sel = sel.withColumn(c, F.lit(None))
        aligned.append(sel.select(*cols, "__side"))
    u = aligned[0].unionByName(aligned[1])
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u
    for c in right_cols:
        carried = carried.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return carried.where(F.col("__side") == 1).drop("__side", *right_cols)


def purchases_with_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the user's most recent click at-or-before
    it, plus the gap in seconds (NULL when no prior click)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    ).drop("ts").withColumnRenamed("click_ts", "ts").select("user_id", "ts", "click_id")
    joined = asof_join(purchases, clicks, on="user_id", ts="ts", right_cols=["click_id"])
    ev_click = ev.select(F.col("event_id").alias("cid"), F.col("ts").alias("c_ts"))
    return (
        joined.join(ev_click, joined.asof_click_id == ev_click.cid, "left")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.col("asof_click_id").alias("click_id"),
            F.round(F.col("ts").cast("double") - F.col("c_ts").cast("double"), 3).alias(
                "gap_sec"
            ),
        )
        .orderBy("purchase_id")
    )


ASOF_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.event_id AS click_id,
       round(epoch(p.ts) - epoch(c.ts), 3) AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
"""


# -- rollup / grouping sets --------------------------------------------------


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus) — subtotals + grand total in one
    pass (Spark expands grouping sets map-side; still one shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


# -- distinct aggregation ----------------------------------------------------


def q_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — expands to a two-phase aggregate;
    at 100 TB swap to approx_count_distinct (HLL) for one-pass."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# -- anti join ---------------------------------------------------------------


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — set-difference by key; the right side reduces to a
    keys-only projection (filter pushed to its scan), broadcast when it
    fits."""
    cust = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


# -- cube --------------------------------------------------------------------


def q_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass (Expand + single hash agg — not 4 scans).  NULL grouping slots are
    labeled 'ALL' so the output is total-ordered and oracle-comparable."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


# -- explicit GROUPING SETS + grouping_id ------------------------------------


def q_grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked GROUPING SETS — (flag, status), (flag), (ship-year) —
    the shape ROLLUP/CUBE can't express (mixed dimensions, no cross
    products you didn't ask for), plus grouping_id() to disambiguate which
    set produced each row (needed because a NULL slot is ambiguous with a
    NULL data value).  Same single Expand + hash agg execution as rollup:
    one shuffle regardless of how many sets."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("int")
    )
    li.createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               coalesce(CAST(ship_year AS STRING), 'ALL') AS ship_year,
               CAST(grouping_id(l_returnflag, l_linestatus, ship_year) AS INT)
                 AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag),
                                (ship_year))
        ORDER BY gid, returnflag, linestatus, ship_year
        """
    )


GROUPING_SETS_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       coalesce(CAST(ship_year AS VARCHAR), 'ALL') AS ship_year,
       CAST(GROUPING(l_returnflag, l_linestatus, ship_year) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM (SELECT *, CAST(year(l_shipdate) AS INT) AS ship_year FROM lineitem)
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag),
                        (ship_year))
ORDER BY gid, returnflag, linestatus, ship_year
"""


# -- range (band) join -------------------------------------------------------

QUANTITY_BANDS = [
    ("small", 0.0, 10.0),
    ("medium", 10.0, 25.0),
    ("large", 25.0, 51.0),
]


def range_band_join_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join: each lineitem lands in the band
    whose [lo, hi) contains its quantity.  The band dim is tiny and
    broadcast, so the non-equi condition runs as a BroadcastNestedLoopJoin
    — O(rows × bands) with bands a constant, i.e. a scan-speed operator at
    any scale.  (With a large interval table the scale path is binning both
    sides to an equi-key — see dedup LSH banding for that pattern.)"""
    li = _t(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(QUANTITY_BANDS, "band string, lo double, hi double")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("band")
    )


RANGE_BAND_ORACLE = """
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM lineitem
JOIN (VALUES ('small', 0.0, 10.0), ('medium', 10.0, 25.0), ('large', 25.0, 51.0))
     AS bands(band, lo, hi)
  ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
ORDER BY band
"""


register("asof_purchases_last_click", purchases_with_last_click, ASOF_ORACLE)
register("range_band_join_quantity", range_band_join_quantity, RANGE_BAND_ORACLE)
register("q_rollup_lineitem", q_rollup_lineitem, ROLLUP_ORACLE)
register("q_cube_lineitem", q_cube_lineitem, CUBE_ORACLE)
register("q_grouping_sets_lineitem", q_grouping_sets_lineitem, GROUPING_SETS_ORACLE)
register("q_distinct_parts_per_flag", q_distinct_parts_per_flag, DISTINCT_ORACLE)
register("customers_without_urgent_orders", customers_without_urgent_orders, ANTI_ORACLE)
