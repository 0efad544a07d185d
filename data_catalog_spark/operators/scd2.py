"""Slowly-changing-dimension (type 2) history apply — the warehouse-side
mutation pattern the catalog's MERGE upsert (S3/S4, catalog.py) does NOT
cover: instead of overwriting, every change closes the current row
(valid_to = change time) and opens a new version (valid_from = change
time), preserving full history.

The change batch here is deterministic (datasets with id % 5 == 0 switch
format to 'avro' at CHANGE_TS) so the result is oracle-checkable; a real
pipeline feeds an arbitrary change DataFrame through the same plan.

Scale: the apply is two hash splits of one scan (semi/anti by key — here a
pure predicate) + a union — no joins at all when the change batch carries
full rows.  With a keyed change batch it becomes MERGE-shaped: broadcast
the change keys, anti-join for untouched rows, inner-join for closed/new
versions; either way ONE pass over the dimension, which is what matters
when the dimension is 10^9 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets_source import ORACLE_DATASETS_CTE, datasets_df
from .registry import register

CHANGE_TS = "2015-06-01T00:00:00"
OPEN_TS = "2014-01-01T00:00:00"


def scd2_dataset_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = datasets_df(spark, sf_dir).select("id", "format", "orgUUID")
    is_changed = F.col("id").cast("bigint") % 5 == 0
    current_unchanged = base.where(~is_changed).select(
        "id",
        "format",
        "orgUUID",
        F.lit(OPEN_TS).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closed_old = base.where(is_changed).select(
        "id",
        "format",
        "orgUUID",
        F.lit(OPEN_TS).alias("valid_from"),
        F.lit(CHANGE_TS).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened_new = base.where(is_changed).select(
        "id",
        F.lit("avro").alias("format"),
        "orgUUID",
        F.lit(CHANGE_TS).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        current_unchanged.union(closed_old)
        .union(opened_new)
        .orderBy(F.col("id").cast("bigint"), "valid_from")
    )


SCD2_ORACLE = f"""{ORACLE_DATASETS_CTE}
SELECT * FROM (
  SELECT id, format, orgUUID, '{OPEN_TS}' AS valid_from,
         CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
  FROM datasets WHERE CAST(id AS BIGINT) % 5 <> 0
  UNION ALL
  SELECT id, format, orgUUID, '{OPEN_TS}', '{CHANGE_TS}', FALSE
  FROM datasets WHERE CAST(id AS BIGINT) % 5 = 0
  UNION ALL
  SELECT id, 'avro', orgUUID, '{CHANGE_TS}', CAST(NULL AS VARCHAR), TRUE
  FROM datasets WHERE CAST(id AS BIGINT) % 5 = 0
)
ORDER BY CAST(id AS BIGINT), valid_from
"""


register("scd2_dataset_formats", scd2_dataset_formats, SCD2_ORACLE)
