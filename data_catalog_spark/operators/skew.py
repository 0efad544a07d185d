"""Skew-handling: two-phase (salted) aggregation.

A low-cardinality / heavy-hitter grouping key (here ``l_returnflag``,
3 values) degenerates a single-phase shuffle: 3 reducers do all the work
no matter how many executors exist.  The salted form shuffles on
(key, salt) — fan-out bounded by SALT_BUCKETS × |keys| — then combines the
per-salt partials with a second (tiny) shuffle.  Result is IDENTICAL to the
direct aggregation (oracle-checked); only the physical distribution
changes.

Note Spark's partial (map-side) aggregation already mitigates this shape
when the upstream is many map tasks; explicit salting is the general tool
when partial aggregation can't help — e.g. distinct-style aggregates or
post-join skew.  At 100 TB pair it with AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`) for the join-side equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .registry import register

SALT_BUCKETS = 32


def salted_returnflag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/count per l_returnflag via explicit two-phase salted shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("ps"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("pc").alias("n_lines"),
            F.sum("ps").cast("double").alias("total_price"),
        )
        .orderBy("l_returnflag")
    )


SALTED_ORACLE = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


register("salted_returnflag_stats", salted_returnflag_stats, SALTED_ORACLE)
