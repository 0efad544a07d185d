"""Grouped Pandas operators — the ``applyInPandas`` escape hatch, used ONLY
where column algebra genuinely can't express the computation per group.

``user_event_zscore`` is deliberately implemented twice:
- ``user_event_zscore``            — applyInPandas (Arrow-batched pandas per
                                     user group), the template for custom
                                     stateful/grouped logic;
- ``user_event_zscore_sql``        — pure window/aggregate algebra with
                                     decimal-exact moments, oracle-checked.

BOTH register the same value-hash oracle: the pandas body computes the
group moments with Python ``Decimal`` arithmetic that replicates the SQL
side bit-for-bit — ``Decimal(repr(v)).quantize(1e-10, HALF_UP)`` is
exactly Spark's double→DECIMAL(28,10) cast (BigDecimal.valueOf uses the
same shortest-decimal representation as Python's repr), the exact decimal
sums are order-independent, and the final 6dp rounding is HALF_UP on the
shortest repr — exactly Spark's ``round(double, 6)``.  pytest additionally
asserts the two twins agree exactly.

Scale note: applyInPandas shuffles once on the grouping key and streams one
Arrow batch per group through a worker — memory is bounded by the largest
group, so the grouping key must be chosen with cardinality in mind (users,
not e.g. a constant).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import read_table
from .registry import register

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def user_event_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values via applyInPandas, with moments
    computed in exact decimal arithmetic that reproduces the SQL twin
    (and hence the shared DuckDB oracle) bit-for-bit:

    - per-value DECIMAL(28,10) quantization = Spark's double→decimal cast
      (HALF_UP on the shortest decimal repr; Python ``repr`` and Java
      ``BigDecimal.valueOf`` produce the same shortest string);
    - moments from exact integer-valued decimal sums (order-free) divided
      at 50 sig digits, then collapsed to double — the same correctly-
      rounded double both engines reach through their decimal quotients;
    - z itself in plain IEEE double ops (identical to the engines'), then
      6dp HALF_UP rounding on the shortest repr = Spark ``round(z, 6)``.
    """
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        import decimal
        import math
        from decimal import Decimal

        q10 = Decimal("1e-10")
        vals = pdf["value"].tolist()
        n = len(vals)
        d1 = sum(
            Decimal(repr(v)).quantize(q10, decimal.ROUND_HALF_UP) for v in vals
        )
        d2 = sum(
            Decimal(repr(v * v)).quantize(q10, decimal.ROUND_HALF_UP)
            for v in vals
        )
        with decimal.localcontext() as ctx:
            ctx.prec = 50
            mean = float(d1 / n)
            m2 = float(d2 / n)
        var = m2 - mean * mean
        sd = math.sqrt(var) if var >= 0.0 else float("nan")

        def z_of(v: float) -> float:
            num = v - mean
            if sd == 0.0:  # IEEE double semantics, as both engines compute
                return (
                    float("nan") if num == 0.0 else math.copysign(float("inf"), num)
                )
            z = num / sd
            if not math.isfinite(z):
                return z
            return float(
                Decimal(repr(z)).quantize(Decimal("1e-6"), decimal.ROUND_HALF_UP)
            )

        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value": pdf["value"],
                "z": [z_of(v) for v in vals],
            }
        )

    return ev.groupBy("user_id").applyInPandas(norm, schema=ZSCORE_SCHEMA).orderBy(
        "event_id"
    )


def user_event_zscore_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same z-score as decimal-exact column algebra: population moments
    from exact decimal sums (order-independent), so the result is
    deterministic and oracle-comparable."""
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    stats = ev.groupBy("user_id").agg(
        (F.sum(F.col("value").cast("decimal(28,10)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("mean"),
        (
            F.sum((F.col("value") * F.col("value")).cast("decimal(28,10)"))
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("m2"),
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
    return (
        ev.join(F.broadcast(stats), "user_id")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(z, 6).alias("z"),
        )
        .orderBy("event_id")
    )


ZSCORE_SQL_ORACLE = """
WITH s AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) / COUNT(*) AS DOUBLE) AS mean,
         CAST(SUM(CAST(value * value AS DECIMAL(28,10))) / COUNT(*) AS DOUBLE) AS m2
  FROM events GROUP BY user_id
)
SELECT event_id, events.user_id, value,
       round((value - mean) / sqrt(m2 - mean * mean), 6) AS z
FROM events JOIN s ON events.user_id = s.user_id
ORDER BY event_id
"""


register("user_event_zscore_pandas", user_event_zscore, ZSCORE_SQL_ORACLE)
register("user_event_zscore_sql", user_event_zscore_sql, ZSCORE_SQL_ORACLE)


# -- cogrouped applyInPandas --------------------------------------------------

COGROUP_SCHEMA = (
    "user_id bigint, purchase_id bigint, clicks_before bigint"
)


def purchases_click_history_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase, the count of that user's clicks at or before it —
    via ``cogroup(...).applyInPandas``: purchases and clicks shuffle ONCE
    each on user_id, then arrive as two aligned pandas frames per user.
    The pandas body is a searchsorted (vectorized, Arrow-batched); use this
    API when per-key logic needs BOTH sides materialized (merge_asof-style
    alignment) and can't be a join + window.

    The SQL twin (oracle) proves the semantics are relationally expressible
    here — the entry exists to exercise/benchmark the cogroup path itself."""
    import numpy as np
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")

    def align(p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame(
                {"user_id": [], "purchase_id": [], "clicks_before": []}
            ).astype({"user_id": "int64", "purchase_id": "int64", "clicks_before": "int64"})
        ct = np.sort(c["ts"].values) if not c.empty else np.array([], dtype="datetime64[us]")
        n = np.searchsorted(ct, p["ts"].values, side="right")
        return pd.DataFrame(
            {
                "user_id": p["user_id"].values,
                "purchase_id": p["purchase_id"].values,
                "clicks_before": n.astype("int64"),
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(align, schema=COGROUP_SCHEMA)
        .orderBy("user_id", "purchase_id")
    )


COGROUP_ORACLE = """
SELECT p.user_id, p.event_id AS purchase_id,
       CAST(COUNT(c.ts) AS BIGINT) AS clicks_before
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.user_id, p.event_id
ORDER BY p.user_id, purchase_id
"""


register(
    "purchases_click_history_cogroup",
    purchases_click_history_cogroup,
    COGROUP_ORACLE,
)
