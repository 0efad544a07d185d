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


# -- salted (replicated-broadcast) skew join ---------------------------------


def salted_join_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted join: lineitem joined to orders on a SKEWED key
    image — o_orderpriority replicated onto the fact side via the order —
    then aggregated.  The skewed (fact) side gets a random-but-deterministic
    salt in [0, SALT_BUCKETS); the small side is REPLICATED once per salt
    value (explode of a salt sequence), so the join key becomes
    (priority, salt) and no single reducer owns a whole heavy key.  Result
    is provably identical to the unsalted join (oracle).

    This is the manual form of what AQE skew-join splitting does at runtime;
    it matters when the build side is too big to broadcast AND the
    probe-side key histogram is pathological (a handful of keys owning most
    rows — here 5 priorities own everything)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    pri = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # Fact side: deterministic salt per row.
    fact = (
        li.join(pri, li.l_orderkey == pri.o_orderkey)
        .select("o_orderpriority", "l_extendedprice")
        .withColumn("salt", F.pmod(F.xxhash64("l_extendedprice"), F.lit(SALT_BUCKETS)))
    )
    # Dim side: one distinct row per priority, replicated across all salts.
    dim = (
        pri.select("o_orderpriority")
        .distinct()
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))))
        .withColumn("priority_rank", F.expr("CAST(substring(o_orderpriority, 1, 1) AS INT)"))
    )
    joined = fact.alias("f").join(
        dim.alias("d"),
        (F.col("f.o_orderpriority") == F.col("d.o_orderpriority"))
        & (F.col("f.salt") == F.col("d.salt")),
    )
    return (
        joined.groupBy(F.col("f.o_orderpriority").alias("o_orderpriority"), "priority_rank")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


SALTED_JOIN_ORACLE = """
SELECT o_orderpriority,
       CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_rank,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


register("salted_join_priority_stats", salted_join_priority_stats, SALTED_JOIN_ORACLE)
